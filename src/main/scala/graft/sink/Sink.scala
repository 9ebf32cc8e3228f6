package graft.sink

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions.col

/** S9/S10 sink semantics: the reference's `INSERT … ON CONFLICT DO
  * NOTHING` (`db.rs:172-196`, `:206-234`) as a keep-first dedup-append
  * parquet writer. Spark has no write-time PK, so uniqueness is enforced
  * as: dedup the batch on the key, anti-join against the existing sink,
  * append the remainder.
  *
  * Scale notes: the anti-join shuffles only the KEY column of the
  * existing sink (projection pushdown) against the new batch; with the
  * sink laid out via `partitionBy`/`bucketBy` on the key the probe reads
  * prune further. Append is atomic per task file — a failed job leaves no
  * partial duplicates because reruns re-anti-join.
  */
object Sink {

  /** Append `batch` to the parquet table at `path`, dropping rows whose
    * `key` already exists there and intra-batch duplicates. Returns the
    * number of rows actually appended.
    *
    * Intra-batch dedup is DETERMINISTIC: the survivor is the row that
    * sorts first across all columns — `dropDuplicates` alone keeps a
    * partition-order-dependent row, which would make reruns over the same
    * input persist different payloads for a duplicated key.
    */
  /** Keep-first intra-batch dedup: the survivor is the row that sorts
    * first across all columns — `dropDuplicates` alone keeps a
    * partition-order-dependent row, which would make reruns over the same
    * input persist different payloads for a duplicated key.
    */
  private def dedupKeepFirst(batch: DataFrame, key: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(key)
      .orderBy(batch.columns.map(col): _*)
    batch
      .withColumn("__rn", org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Anti-join away keys already in the sink, then count + append via
    * `write`. The count-then-write pair reads the shuffled output once
    * through the cache; an accumulator would save the pass but complicate
    * a batch-oriented sink for nothing.
    */
  private def appendFresh(deduped: DataFrame,
      existingKeys: Option[DataFrame], key: String,
      write: DataFrame => Unit): Long = {
    val fresh = existingKeys match {
      case Some(existing) => deduped.join(existing, Seq(key), "left_anti")
      case None => deduped
    }
    val persisted = fresh.persist()
    try {
      val n = persisted.count()
      if (n > 0) write(persisted)
      n
    } finally { persisted.unpersist() }
  }

  def upsertAppend(batch: DataFrame, path: String, key: String): Long = {
    val spark = batch.sparkSession
    // Try, not an exists() check: a sink dir that exists but holds no
    // parquet (failed first write, pre-created dir) must count as fresh —
    // an unreadable existing sink would otherwise wedge every rerun
    val existingKeys =
      scala.util.Try(spark.read.parquet(path).select(col(key))).toOption
    appendFresh(dedupKeepFirst(batch, key), existingKeys, key,
      _.write.mode(SaveMode.Append).parquet(path))
  }

  /** S9/S10 over JDBC — the reference's stated sink shape is "DataFrame
    * ops … write to an embedded database via JDBC" (`db.rs:172-196`
    * against a DuckDB file): the same keep-first upsert against any JDBC
    * url. The existing-key probe reads ONLY the key column through the
    * JDBC source (column pruning pushes into the remote SELECT); a
    * missing table counts as fresh and Spark's JDBC writer creates it on
    * first append. Exercised in SinkSpec against Spark's bundled
    * embedded Derby — the same in-process-database shape as the
    * reference's DuckDB.
    */
  def upsertJdbc(batch: DataFrame, url: String, table: String,
      key: String): Long = {
    val spark = batch.sparkSession
    val props = new java.util.Properties
    val existingKeys =
      scala.util.Try(spark.read.jdbc(url, table, props).select(col(key))
        // JDBC relations are re-queried per action; snapshot the keys so
        // the anti-join cannot race the append below
        .persist()).toOption.filter(df => scala.util.Try(df.count()).isSuccess)
    try appendFresh(dedupKeepFirst(batch, key), existingKeys, key,
      _.write.mode(SaveMode.Append).jdbc(url, table, props))
    finally existingKeys.foreach(_.unpersist())
  }

  /** Training-shard writer: materializes a q87-style shard layout
    * (rows carrying `shard` and in-shard `pos` columns) as one parquet
    * directory per shard (`shard=K/`) whose file row order IS the
    * layout order — the webdataset/TFRecord-shard shape a training job
    * streams sequentially.
    *
    * Scale: ONE shuffle (`repartition(numShards, shard)`) co-locates
    * each shard in a single task, and `sortWithinPartitions(shard, pos)`
    * orders rows before the writer sees them, so each shard directory
    * holds that task's files with rows already in reading order —
    * parquet preserves within-file row order, and a shard never spans
    * tasks, so read-back order equals layout order with no sort at read
    * time. Two shards hashing to one task is fine (the dynamic-partition
    * writer splits directories; each stays sorted). For shards larger
    * than one sane file, set `spark.sql.files.maxRecordsPerFile` —
    * files split in order, named so lexical file order preserves row
    * order within the directory.
    */
  def writeShards(layout: DataFrame, path: String, numShards: Int): Unit =
    layout
      .repartition(numShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("pos"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("shard")
      .parquet(path)

}
