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
  def upsertAppend(batch: DataFrame, path: String, key: String): Long = {
    val spark = batch.sparkSession
    val w = org.apache.spark.sql.expressions.Window.partitionBy(key)
      .orderBy(batch.columns.map(col): _*)
    val deduped = batch
      .withColumn("__rn", org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    // Try, not an exists() check: a sink dir that exists but holds no
    // parquet (failed first write, pre-created dir) must count as fresh —
    // an unreadable existing sink would otherwise wedge every rerun
    val existingKeys = scala.util.Try(spark.read.parquet(path).select(col(key))).toOption
    val fresh = existingKeys match {
      case Some(existing) => deduped.join(existing, Seq(key), "left_anti")
      case None => deduped
    }
    // count + write in one materialization would need an accumulator; the
    // sink is batch-oriented, so count-then-write keeps it simple and the
    // second pass reads the shuffled output of the first via cache
    val persisted = fresh.persist()
    try {
      val n = persisted.count()
      if (n > 0) persisted.write.mode(SaveMode.Append).parquet(path)
      n
    } finally { persisted.unpersist() }
  }

}
