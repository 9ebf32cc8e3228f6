package graft.contracts

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Hashing

/** S1–S4: build the `contract` table from a directory tree of verified
  * contract sources — the Spark re-expression of the reference's
  * `pre-process` ingest (`main.rs:90-160`, `plain_contract.rs:252-320`).
  *
  * Spark-first shape: one `binaryFile` scan of the tree, a broadcast
  * prefix-join against the (tiny) set of metadata dirs, a groupBy(folder)
  * to assemble per-contract file lists, and pure column expressions for
  * classification, hashing and metadata coercion. At 100 TB of contract
  * dumps the scan parallelizes per-file; the only shuffle is the
  * per-folder groupBy (and the id-dedup in the sink), keyed well below
  * executor memory.
  *
  * Contract table schema (SURVEY §1.4):
  *   id, name, source_type ∈ {json, vyper, single_sol, multi_sol},
  *   metadata struct<contract_name, compiler_version, runs,
  *                   optimization_used, bytecode_hash>,
  *   files array<struct<name, content>>.
  */
object Ingest {

  /** Raw recursive file scan → (path, dir, fname, content:string). */
  def scanTree(s: SparkSession, root: String): DataFrame =
    s.read.format("binaryFile")
      .option("recursiveFileLookup", "true")
      .load(root)
      .select(col("path"),
        regexp_replace(col("path"), "/[^/]+$", "").as("dir"),
        regexp_extract(col("path"), "([^/]+)$", 1).as("fname"),
        col("content").cast("string").as("content"))

  private val metaSchema = StructType(Seq(
    StructField("ContractName", StringType),
    StructField("CompilerVersion", StringType),
    StructField("Runs", StringType),
    StructField("OptimizationUsed", StringType),
    StructField("BytecodeHash", StringType)))

  /** Lossy Etherscan-style coercions (F7, `plain_contract.rs:52-62`):
    * runs: string→int default 0; optimization: "1"/"true" → true.
    */
  private def metaStruct(m: org.apache.spark.sql.Column) = struct(
    m.getField("ContractName").as("contract_name"),
    m.getField("CompilerVersion").as("compiler_version"),
    coalesce(expr("try_cast(m.Runs AS INT)"), lit(0)).as("runs"),
    (m.getField("OptimizationUsed").isin("1", "true")).as("optimization_used"),
    coalesce(m.getField("BytecodeHash"), lit("")).as("bytecode_hash"))

  /** S1+S3: metadata-folder contracts (fiesta layout, `main.rs:90-115` +
    * `plain_contract.rs:284-320`). Each dir containing `metadata.json`
    * becomes one contract; files classify it:
    * contract.json → json, main.sol → single_sol, main.vy → vyper,
    * else all *.sol (recursive) → multi_sol.
    */
  def metadataContracts(s: SparkSession, root: String): DataFrame = {
    val files = scanTree(s, root)
    val metaDirs = files.filter(col("fname") === "metadata.json")
      .select(col("dir").as("cdir"), from_json(col("content"), metaSchema).as("m"))
    // nearest-ancestor prefix join: tiny dim side → broadcast; window picks
    // the deepest matching metadata dir per file
    val owned = files.join(broadcast(metaDirs),
        col("dir") === col("cdir") || col("path").startsWith(concat(col("cdir"), lit("/"))))
      .withColumn("rk", row_number().over(
        Window.partitionBy("path").orderBy(length(col("cdir")).desc)))
      .filter(col("rk") === 1).drop("rk")
    val grouped = owned
      .filter(col("fname") =!= "metadata.json")
      .groupBy(col("cdir"), col("m"))
      .agg(collect_list(struct(col("fname").as("name"), col("content").as("content")))
        .as("allfiles"))
    val names = array_sort(transform(col("allfiles"), f => f.getField("name")))
    val classified = grouped.withColumn("source_type",
      when(array_contains(names, "contract.json"), "json")
        .when(array_contains(names, "main.sol"), "single_sol")
        .when(array_contains(names, "main.vy"), "vyper")
        .otherwise("multi_sol"))
    // files kept per variant (`plain_contract.rs:288-320`): the designated
    // file for json/single/vyper; every *.sol for multi_sol
    val kept = when(col("source_type") === "json",
        filter(col("allfiles"), f => f.getField("name") === "contract.json"))
      .when(col("source_type") === "single_sol",
        filter(col("allfiles"), f => f.getField("name") === "main.sol"))
      .when(col("source_type") === "vyper",
        filter(col("allfiles"), f => f.getField("name") === "main.vy"))
      .otherwise(filter(col("allfiles"), f => f.getField("name").endsWith(".sol")))
    classified
      .withColumn("files", array_sort(kept))
      .withColumn("id", contentId(col("files")))
      .select(col("id"), col("m").getField("ContractName").as("name"),
        metaStruct(col("m")).as("metadata"), col("source_type"), col("files"))
  }

  /** F1/A2 content id (`plain_contract.rs:166-181`): single file → md5 of
    * whitespace-stripped content; multi-file → md5 of the sorted per-file
    * hashes concatenated (order-insensitive multiset hash).
    */
  def contentId(files: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val perFile = transform(files,
      f => md5(regexp_replace(f.getField("content"), "\\s+", "")))
    when(size(files) === 1, element_at(perFile, 1))
      .otherwise(md5(concat_ws("", array_sort(perFile))))
  }

  private val stdJsonSourcesSchema =
    MapType(StringType, StructType(Seq(StructField("content", StringType))))

  /** S2+S4: Etherscan verified-contract dumps (`main.rs:118-160`,
    * `plain_contract.rs:252-281`): *.json files outside metadata folders;
    * `SourceCode` is either `{{…}}`-wrapped solc standard-json (→ json
    * variant, one file per `sources` entry) or plain source (→
    * single_sol).
    */
  def etherscanContracts(s: SparkSession, root: String): DataFrame = {
    val files = scanTree(s, root)
    val metaDirSet = files.filter(col("fname") === "metadata.json")
      .select(col("dir").as("mdir"))
    // ownership must mirror metadataContracts' PREFIX rule: any file under
    // a metadata folder (at any depth) belongs to that contract — an
    // exact-dir check would double-ingest a SourceCode-bearing json in a
    // subdirectory of a metadata folder
    val cands = files
      .filter(lower(col("fname")).endsWith(".json") && col("fname") =!= "metadata.json")
      .join(broadcast(metaDirSet),
        col("dir") === col("mdir") || col("path").startsWith(concat(col("mdir"), lit("/"))),
        "left_anti")
      .filter(get_json_object(col("content"), "$.SourceCode").isNotNull)
    val unwrapped = cands
      .withColumn("sc", get_json_object(col("content"), "$.SourceCode"))
      // F12 double-brace unwrap (`plain_contract.rs:258-263`)
      .withColumn("sc", when(col("sc").startsWith("{{"),
        expr("substring(sc, 2, length(sc) - 2)")).otherwise(col("sc")))
      .withColumn("m", from_json(col("content"), metaSchema))
      .withColumn("srcmap", from_json(get_json_object(col("sc"), "$.sources"),
        stdJsonSourcesSchema))
    unwrapped
      .withColumn("source_type",
        when(col("srcmap").isNotNull, "json").otherwise("single_sol"))
      .withColumn("files",
        when(col("srcmap").isNotNull,
          array_sort(transform(map_entries(col("srcmap")),
            e => struct(e.getField("key").as("name"),
              e.getField("value").getField("content").as("content")))))
          .otherwise(array(struct(
            concat(col("m").getField("ContractName"), lit(".sol")).as("name"),
            col("sc").as("content")))))
      .withColumn("id", contentId(col("files")))
      .select(col("id"), col("m").getField("ContractName").as("name"),
        metaStruct(col("m")).as("metadata"), col("source_type"), col("files"))
  }

  /** Full contract table: both sources, PK-deduped on content id (S9,
    * `db.rs:172-196` `ON CONFLICT DO NOTHING` ⇒ keep-first).
    */
  def contracts(s: SparkSession, root: String): DataFrame =
    metadataContracts(s, root)
      .unionByName(etherscanContracts(s, root))
      .dropDuplicates("id")
}
