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
    /** False when any parameter is a user-defined type (struct / enum /
      * contract) the compiler-free scanner cannot expand to its ABI
      * encoding — the reference derives these from solc's ABI output
      * (`plain_contract.rs:499-508`), which resolves them to tuples. A
      * selector computed over the raw type NAME would be silently wrong,
      * so the scanner emits selector = null and flags the row instead.
      */
    resolved: Boolean = true)

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

  /** Extract ABI-visible functions from one (CRLF-normalized) source. */
  def extractFunctions(source: String): Seq[SolFunction] = {
    val src = TextBytes.normalizeCrlf(source)
    val mask = codeMask(src)
    val masked = new String(mask)
    val out = ArrayBuffer.empty[SolFunction]
    val fnKw = "\\bfunction\\s+([A-Za-z_$][A-Za-z0-9_$]*)\\s*\\(".r
    for ((cname, bStart, bEnd) <- blocks(src, mask)) {
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
                  val sig = fname + "(" + canon.mkString(",") + ")"
                  // user-defined param types (struct/enum/contract) need a
                  // compiler symbol table to reach their ABI encoding — a
                  // selector over the raw name would be confidently wrong
                  // vs the reference's ABI-driven derivation, so flag it
                  val resolved = canon.forall(isElementaryType)
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
