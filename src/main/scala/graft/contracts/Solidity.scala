package graft.contracts

import scala.collection.mutable.ArrayBuffer

import graft.functions.{Keccak, TextBytes}

/** One extracted function definition. `sourceCode` is the exact text slice
  * from `function` keyword through the closing `}` (or `;` for bodyless
  * declarations) — the same span the reference slices from the solc AST
  * (`plain_contract.rs:389-481`, golden string `:560-562`).
  */
final case class SolFunction(
    contractName: String,
    functionName: String,
    visibility: String,
    signature: String,
    /** null when `resolved` is false — see [[SolFunction.resolved]]. */
    selector: String,
    sourceCode: String,
    /** False when any parameter is a user-defined type the scanner's
      * symbol table cannot expand to its ABI encoding. Since r13 the
      * scanner resolves types DEFINED IN THE SAME SOURCE TREE itself
      * (struct → member tuple, enum → uint8, contract/interface →
      * address, user-defined value type → its underlying type — the
      * same expansion the reference gets from solc's ABI output,
      * `plain_contract.rs:499-508` / `functions.rs:28-31`), so this
      * flag now marks only genuinely compiler-territory rows: types
      * imported from OUTSIDE the artifact, function-typed params,
      * ambiguous bare names (two same-named defs in sibling scopes) and
      * mapping-bearing structs. A selector computed over a raw type
      * NAME would be silently wrong, so flagged rows emit selector =
      * null, never a guess.
      */
    resolved: Boolean = true)

/** User-type definitions visible to one contract ARTIFACT (all of its
  * source files together — the same compilation unit solc sees). Keys
  * are (scope, name): scope = the defining contract/library/interface
  * block's name, or "" for file-top-level definitions.
  */
final case class SymbolTable(
    defs: Map[(String, String), SymbolTable.UserDef],
    contractNames: Set[String]) {
  /** Union with CONFLICT POISONING: when two files define the same
    * (scope, name) key IDENTICALLY (sibling files of one artifact
    * routinely repeat the same vendored source), either copy serves;
    * when the definitions DIFFER (two vendored versions of a library
    * whose struct layout changed), the key is poisoned to
    * [[SymbolTable.ConflictDef]] so nothing resolves through it —
    * picking a side would emit a confidently WRONG selector with
    * resolved=true, violating the never-a-wrong-guess invariant.
    * solc itself would reject such an artifact when both files are
    * imported together; flagging is the honest compiler-free analog.
    */
  def merge(o: SymbolTable): SymbolTable = {
    val conflicts = defs.keySet.intersect(o.defs.keySet)
      .filter(k => defs(k) != o.defs(k))
    SymbolTable(
      o.defs ++ defs ++ conflicts.map(_ -> SymbolTable.ConflictDef),
      contractNames ++ o.contractNames)
  }
}

object SymbolTable {
  sealed trait UserDef extends Serializable
  /** ABI-encodes as uint8. */
  case object EnumDef extends UserDef
  /** ABI-encodes as the tuple of its members' encodings; `members` are
    * canonicalized (but unresolved) member types, expanded recursively
    * at resolution time in the struct's own scope.
    */
  final case class StructDef(members: Seq[String]) extends UserDef
  /** `type X is uint128` — ABI-encodes as the underlying type. */
  final case class ValueDef(underlying: String) extends UserDef
  /** Two files define this key DIFFERENTLY — never resolves. */
  case object ConflictDef extends UserDef

  val empty: SymbolTable = SymbolTable(Map.empty, Set.empty)
}

/** Pure-Scala Solidity surface scanner — the compiler-free re-derivation of
  * the reference's compile→AST→slice pipeline (`plain_contract.rs:327-481`)
  * plus alloy's signature/selector computation (`functions.rs:20-44`).
  *
  * Instead of invoking solc (unavailable offline; SURVEY §7.4), a
  * comment/string-aware lexical scan finds `contract|library|interface`
  * blocks and their `function` definitions, canonicalizes parameter types
  * per the ABI rules (uint→uint256 etc.), and computes 4-byte keccak
  * selectors.
  *
  * Fidelity notes (shared with the reference, whose own test documents
  * them as known misses — `plain_contract.rs:564-574`):
  *  - inherited functions are reported under their *defining* contract
  *    only;
  *  - public-state-variable getters are not synthesized;
  *  - user-defined types (contract/enum/struct params) are not resolved to
  *    their ABI encodings — that genuinely needs a compiler symbol table.
  * Only ABI-visible functions (public/external; pre-0.5 default public)
  * are emitted, matching the reference's ABI-driven iteration
  * (`plain_contract.rs:499-508`).
  */
object Solidity {

  /** Mask comments and string literals so structural scanning (braces,
    * keywords) ignores them. Returns a char array where commented/string
    * chars are replaced by spaces (newlines kept for offset stability).
    */
  def codeMask(src: String): Array[Char] = {
    val out = src.toCharArray
    var i = 0
    val n = src.length
    var state = 0 // 0 code, 1 line comment, 2 block comment, 3 dquote, 4 squote
    while (i < n) {
      val c = src.charAt(i)
      state match {
        case 0 =>
          if (c == '/' && i + 1 < n && src.charAt(i + 1) == '/') { state = 1; out(i) = ' ' }
          else if (c == '/' && i + 1 < n && src.charAt(i + 1) == '*') { state = 2; out(i) = ' ' }
          else if (c == '"') state = 3
          else if (c == '\'') state = 4
        case 1 =>
          if (c == '\n') state = 0 else out(i) = ' '
        case 2 =>
          if (c == '*' && i + 1 < n && src.charAt(i + 1) == '/') {
            out(i) = ' '; out(i + 1) = ' '; i += 1; state = 0
          } else if (c != '\n') out(i) = ' '
        case 3 =>
          if (c == '\\') { out(i) = ' '; if (i + 1 < n) { out(i + 1) = ' '; i += 1 } }
          else if (c == '"') state = 0
          else out(i) = ' '
        case 4 =>
          if (c == '\\') { out(i) = ' '; if (i + 1 < n) { out(i + 1) = ' '; i += 1 } }
          else if (c == '\'') state = 0
          else out(i) = ' '
      }
      i += 1
    }
    out
  }

  private def isIdentChar(c: Char): Boolean =
    Character.isLetterOrDigit(c) || c == '_' || c == '$'

  /** index of the brace matching the one at `open` in the masked source. */
  private def matchBrace(mask: Array[Char], open: Int): Int = {
    var depth = 0
    var i = open
    while (i < mask.length) {
      val c = mask(i)
      if (c == '{') depth += 1
      else if (c == '}') { depth -= 1; if (depth == 0) return i }
      i += 1
    }
    -1
  }

  /** Elementary-type ABI canonicalization (`functions.rs:30` via alloy):
    * uint→uint256, int→int256, byte→bytes1; array suffixes preserved.
    */
  def canonicalType(raw: String): String = {
    val arrIdx = raw.indexOf('[')
    val (stem, suffix) = if (arrIdx >= 0) (raw.substring(0, arrIdx), raw.substring(arrIdx)) else (raw, "")
    val canon = stem match {
      case "uint" => "uint256"
      case "int"  => "int256"
      case "byte" => "bytes1"
      case "address payable" => "address"
      case other => other
    }
    canon + suffix
  }

  /** Canonicalize one parameter declaration ("uint a", "address payable x",
    * "uint256[] memory xs", "string calldata s") to its ABI type.
    */
  def canonicalParam(param: String): String = {
    val toks = param.trim.split("\\s+").toList.filterNot(
      Set("memory", "calldata", "storage").contains)
    toks match {
      case t :: "payable" :: _ => canonicalType(t + " payable")
      case t :: _ => canonicalType(t)
      case Nil => ""
    }
  }

  /** The elementary ABI types the scanner can encode without a compiler
    * symbol table (alloy's primitive set, `functions.rs:28-31` context).
    * `fixed`/`ufixed` and external-function-type params are deliberately
    * absent: vanishingly rare, and their encodings are compiler territory.
    */
  private val Elementary: Set[String] =
    (8 to 256 by 8).flatMap(n => Seq(s"uint$n", s"int$n")).toSet ++
      (1 to 32).map(n => s"bytes$n").toSet ++
      Set("address", "bool", "string", "bytes")

  /** True iff a CANONICAL type is elementary (arrays of elementary
    * included) — i.e. its selector can be derived without resolving
    * user-defined types through a compiler.
    */
  def isElementaryType(canon: String): Boolean = {
    val stem = canon.takeWhile(_ != '[')
    Elementary.contains(stem) &&
      canon.drop(stem.length).matches("(\\[[0-9]*\\])*")
  }

  /** Split a parameter list on top-level commas (nesting-aware). */
  def splitParams(params: String): Seq[String] = {
    if (params.trim.isEmpty) return Seq.empty
    val out = ArrayBuffer.empty[String]
    var depth = 0
    var start = 0
    var i = 0
    while (i < params.length) {
      params.charAt(i) match {
        case '(' | '[' => depth += 1
        case ')' | ']' => depth -= 1
        case ',' if depth == 0 => out += params.substring(start, i); start = i + 1
        case _ =>
      }
      i += 1
    }
    out += params.substring(start)
    out.toSeq
  }

  private val BlockKinds = Set("contract", "library", "interface")

  /** All `contract|library|interface` blocks as (name, bodyStart, bodyEnd). */
  private def blocks(src: String, mask: Array[Char]): Seq[(String, Int, Int)] = {
    val out = ArrayBuffer.empty[(String, Int, Int)]
    val masked = new String(mask)
    val kw = "\\b(contract|library|interface)\\s+([A-Za-z_$][A-Za-z0-9_$]*)".r
    for (m <- kw.findAllMatchIn(masked)) {
      // skip `abstract contract` handled implicitly (same keyword) ✓
      val open = masked.indexOf('{', m.end)
      if (open >= 0) {
        val close = matchBrace(mask, open)
        if (close > open) out += ((m.group(2), open + 1, close))
      }
    }
    out.toSeq
  }

  private val VisKeywords = Set("public", "external", "internal", "private")

  /** Collect one source's user-type definitions (struct/enum/value-type
    * declarations plus contract/interface/library names). Definitions
    * inside a block get that block's name as scope; file-level ones get
    * scope "". Struct members are canonicalized but NOT resolved here —
    * resolution is lazy and artifact-scoped ([[resolveType]]), so a
    * member referencing a type from a SIBLING file still expands once
    * the per-file tables are merged.
    */
  /** One lexical pass over a source, shared by [[symbolTable]] and
    * [[extractFunctions]] so artifact-scoped extraction (which needs
    * both) pays the CRLF-normalize + comment/string mask + block scan
    * ONCE per file, not twice — this map stage runs corpus-wide.
    */
  private final case class Lexed(
      src: String, mask: Array[Char], masked: String,
      blks: Seq[(String, Int, Int)])

  private def lex(source: String): Lexed = {
    val src = TextBytes.normalizeCrlf(source)
    val mask = codeMask(src)
    Lexed(src, mask, new String(mask), blocks(src, mask))
  }

  def symbolTable(source: String): SymbolTable = symbolTable(lex(source))

  private def symbolTable(lx: Lexed): SymbolTable = {
    val Lexed(_, mask, masked, blks) = lx
    def scopeOf(pos: Int): String =
      blks.find { case (_, s, e) => pos >= s && pos < e }
        .map(_._1).getOrElse("")
    val defs = Map.newBuilder[(String, String), SymbolTable.UserDef]
    for (m <- "\\benum\\s+([A-Za-z_$][A-Za-z0-9_$]*)\\s*\\{".r
        .findAllMatchIn(masked))
      defs += ((scopeOf(m.start), m.group(1)) -> SymbolTable.EnumDef)
    for (m <- "\\btype\\s+([A-Za-z_$][A-Za-z0-9_$]*)\\s+is\\s+([A-Za-z0-9_$]+)\\s*;".r
        .findAllMatchIn(masked))
      defs += ((scopeOf(m.start), m.group(1)) ->
        SymbolTable.ValueDef(canonicalType(m.group(2))))
    for (m <- "\\bstruct\\s+([A-Za-z_$][A-Za-z0-9_$]*)\\s*\\{".r
        .findAllMatchIn(masked)) {
      val open = masked.indexOf('{', m.end - 1)
      val close = if (open >= 0) matchBrace(mask, open) else -1
      if (close > open) {
        // member statements: `Type name;` — canonicalParam extracts the
        // type (location keywords are illegal in structs; a mapping or
        // function member yields a garbage stem that simply never
        // resolves, which is correct: such structs cannot be ABI params)
        val members = masked.substring(open + 1, close).split(";")
          .map(_.trim).filter(_.nonEmpty).toSeq
          .map(canonicalParam)
        defs += ((scopeOf(m.start), m.group(1)) ->
          SymbolTable.StructDef(members))
      }
    }
    SymbolTable(defs.result(), blks.map(_._1).toSet)
  }

  /** Expand a canonical parameter type to its ABI encoding through the
    * artifact's symbol table — None when the type (or any struct member
    * reachable from it) is not defined in the artifact. Name resolution
    * order mirrors Solidity's: the referencing scope's own definitions,
    * then file-level ones, then a qualified `Scope.Name` lookup, then
    * contract names (always globally visible → address), and finally a
    * UNIQUE bare-name match anywhere in the artifact — the pragmatic
    * stand-in for import/inheritance visibility the scanner does not
    * model; an AMBIGUOUS bare name stays unresolved rather than guessing.
    */
  def resolveType(canon: String, scope: String, st: SymbolTable): Option[String] =
    resolve0(canon, scope, st, Set.empty)

  private def resolve0(canon: String, scope: String, st: SymbolTable,
      visiting: Set[(String, String)]): Option[String] = {
    val stem = canon.takeWhile(_ != '[')
    val suffix = canon.drop(stem.length)
    if (suffix.nonEmpty && !suffix.matches("(\\[[0-9]*\\])*")) return None
    if (isElementaryType(stem)) return Some(canon)
    val hit: Option[((String, String), SymbolTable.UserDef)] =
      if (stem.contains('.')) {
        val parts = stem.split("\\.", 2)
        st.defs.get((parts(0), parts(1))).map(((parts(0), parts(1)), _))
      } else
        st.defs.get((scope, stem)).map(((scope, stem), _))
          .orElse(st.defs.get(("", stem)).map((("", stem), _)))
          .orElse {
            if (st.contractNames(stem)) None // address case below wins
            else {
              val byName = st.defs.filter(_._1._2 == stem)
              if (byName.size == 1) Some(byName.head) else None
            }
          }
    hit match {
      case Some((_, SymbolTable.ConflictDef)) => None // poisoned (merge doc)
      case Some((_, SymbolTable.EnumDef)) => Some("uint8" + suffix)
      case Some((_, SymbolTable.ValueDef(u))) =>
        if (isElementaryType(u)) Some(u + suffix) else None
      case Some((key, SymbolTable.StructDef(members))) =>
        if (visiting(key) || members.isEmpty) None // recursive or empty
        else {
          val rs = members.map(resolve0(_, key._1, st, visiting + key))
          if (rs.forall(_.isDefined))
            Some(rs.map(_.get).mkString("(", ",", ")") + suffix)
          else None
        }
      case None =>
        if (!stem.contains('.') && st.contractNames(stem))
          Some("address" + suffix) // contract/interface param encodes as address
        else None
    }
  }

  /** Extract ABI-visible functions from one source, resolving user types
    * against the source's OWN definitions (single-file convenience; the
    * pipeline passes an artifact-wide table via the two-arg overload).
    */
  def extractFunctions(source: String): Seq[SolFunction] = {
    val lx = lex(source)
    extractFunctions(lx, symbolTable(lx))
  }

  /** Extract ABI-visible functions from one (CRLF-normalized) source,
    * expanding user-defined param types through `syms` (an artifact-wide
    * [[symbolTable]] merge).
    */
  def extractFunctions(source: String, syms: SymbolTable): Seq[SolFunction] =
    extractFunctions(lex(source), syms)

  /** Artifact-scoped extraction: lex every file ONCE, merge the symbol
    * tables, extract with the merged table — the single-lex form behind
    * [[ScannerBackend.extractAll]].
    */
  def extractAll(files: Seq[(String, String)]): Seq[(String, SolFunction)] = {
    val lexed = files.map { case (n, c) => n -> lex(c) }
    val st = lexed.map(f => symbolTable(f._2))
      .foldLeft(SymbolTable.empty)(_ merge _)
    lexed.flatMap { case (n, lx) => extractFunctions(lx, st).map(n -> _) }
  }

  private def extractFunctions(lx: Lexed, syms: SymbolTable): Seq[SolFunction] = {
    val Lexed(src, mask, masked, lxBlocks) = lx
    val out = ArrayBuffer.empty[SolFunction]
    val fnKw = "\\bfunction\\s+([A-Za-z_$][A-Za-z0-9_$]*)\\s*\\(".r
    for ((cname, bStart, bEnd) <- lxBlocks) {
      val body = masked.substring(bStart, bEnd)
      // single forward pass for the top-level check: matches arrive in
      // increasing position, so carry (scanPos, depth) forward instead of
      // recounting from bStart per match (which is O(functions × body))
      var scanPos = bStart
      var depth = 0
      for (m <- fnKw.findAllMatchIn(body)) {
        val fnStart = bStart + m.start
        while (scanPos < fnStart) {
          if (mask(scanPos) == '{') depth += 1
          else if (mask(scanPos) == '}') depth -= 1
          scanPos += 1
        }
        if (depth == 0) {
          val parenOpen = bStart + m.end - 1
          // match the parameter close paren
          var pd = 0
          var i = parenOpen
          var parenClose = -1
          while (i < bEnd && parenClose < 0) {
            val c = mask(i)
            if (c == '(') pd += 1
            else if (c == ')') { pd -= 1; if (pd == 0) parenClose = i }
            i += 1
          }
          if (parenClose > 0) {
            // header runs to the body `{` or declaration-terminating `;`
            var j = parenClose + 1
            var hd = 0
            var end = -1
            var bodyOpen = -1
            while (j < bEnd && end < 0) {
              val c = mask(j)
              if (c == '(') hd += 1
              else if (c == ')') hd -= 1
              else if (c == '{' && hd == 0) { bodyOpen = j; end = j }
              else if (c == ';' && hd == 0) end = j
              j += 1
            }
            if (end >= 0) {
              val sliceEnd = if (bodyOpen >= 0) matchBrace(mask, bodyOpen) else end
              if (sliceEnd >= 0) {
                val header = masked.substring(parenClose + 1, end)
                val headerToks = header.split("[^A-Za-z0-9_$]+").filter(_.nonEmpty).toSet
                val vis = VisKeywords.find(headerToks.contains).getOrElse("public")
                val fname0 = m.group(1)
                // pre-0.5 old-style constructors are named after their
                // contract; solc's ABI lists them as type "constructor",
                // which the reference's type=="function" iteration skips
                if ((vis == "public" || vis == "external") && fname0 != cname) {
                  val fname = fname0
                  val params = splitParams(src.substring(parenOpen + 1, parenClose))
                  val canon = params.map(canonicalParam)
                  // expand user-defined param types through the artifact
                  // symbol table (struct → tuple, enum → uint8, contract
                  // → address — the reference's ABI-driven derivation);
                  // anything the table cannot expand (external imports,
                  // function types, ambiguity) keeps the RAW signature,
                  // selector = null — never a wrong guess
                  val abiTypes = canon.map(resolveType(_, cname, syms))
                  val resolved = abiTypes.forall(_.isDefined)
                  val sig = fname + "(" + (if (resolved) abiTypes.map(_.get)
                    else canon).mkString(",") + ")"
                  out += SolFunction(cname, fname, vis, sig,
                    if (resolved) Keccak.selector(sig) else null,
                    src.substring(fnStart, sliceEnd + 1), resolved)
                }
              }
            }
          }
        }
      }
    }
    out.toSeq
  }
}
