package graft

import org.scalatest.funsuite.AnyFunSuite

/** The opt-in session table cache (`spark.graft.cacheTables`, Bench's
  * storage-warmth posture) must be semantically TRANSPARENT: same rows,
  * same order, for every query — including the ones most sensitive to
  * scan partitioning (paging, sampling, multiset hashes, collects).
  */
class TableCacheSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // the partitioning/order-sensitive corner of the registry, plus one
  // representative of each scan-heavy family
  private val sensitive = Seq(
    "q04_page_scan", "q05_sampled_lookup", "q12_multiset_hash",
    "q16_collect_roundtrip", "q26_row_id", "q41_sliding_window",
    "q57_asof_join", "q67_domain_mix", "q78_bpe_merge_pairs")

  test("cacheTables=true returns byte-identical results (rows AND order)") {
    for (name <- sensitive) {
      def rows(flag: Boolean): Seq[String] = {
        spark.sqlContext.clearCache()
        graft.util.Caches.clearTransient()
        if (flag) spark.conf.set("spark.graft.cacheTables", "true")
        else spark.conf.unset("spark.graft.cacheTables")
        try SparkEntry.queries(name)(spark, TestSpark.sfDir)
          .collect().map(_.toString).toSeq
        finally spark.conf.unset("spark.graft.cacheTables")
      }
      val cold = rows(flag = false)
      val cached = rows(flag = true)
      assert(cold == cached, s"$name diverges under the table cache")
    }
    spark.sqlContext.clearCache()
  }

  test("cache sizing sums the part files of a Spark-written parquet DIRECTORY") {
    // File.length on a directory returns the ~4 KiB dirent size, which
    // used to compute parts=0 and silently leave the cached table at the
    // serial scan's partitioning — defeating the parallel-cache purpose
    // exactly for generated corpora (ScaleCheck) and test fixtures.
    val dir = java.nio.file.Files.createTempDirectory("graft-cachedir").toString
    spark.range(0, 200000)
      .selectExpr("id AS doc_id", "md5(CAST(id AS STRING)) AS text")
      .repartition(4)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    spark.conf.set("spark.graft.cacheTables", "true")
    try {
      val df = graft.util.Tables.documents(spark, dir)
      assert(df.rdd.getNumPartitions >= 2,
        s"directory-backed cached table stayed at ${df.rdd.getNumPartitions} partition(s)")
    } finally {
      spark.conf.unset("spark.graft.cacheTables")
      spark.sqlContext.clearCache()
    }
  }
}
