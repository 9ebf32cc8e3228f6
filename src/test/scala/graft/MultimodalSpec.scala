package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{MediaRow, Multimodal}

/** Multimodal plumbing: typed mapPartitions decode over binary payloads.
  * The decode step is a deterministic stub (no codecs in this container);
  * these tests pin the Spark-side contract — schema, batch shape,
  * determinism, empty-payload behavior.
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("decodeStub: histogram partitions all bytes, mean is exact") {
    val payload = Array[Byte](0, 1, 15, 16, 17, -1) // -1 = 0xff = 255
    val (hist, mean) = Multimodal.decodeStub(payload)
    assert(hist.length == 16)
    assert(hist.sum == payload.length)
    assert(hist(0) == 2) // 0x00, 0x10
    assert(hist(1) == 2) // 0x01, 0x11
    assert(hist(15) == 2) // 0x0f, 0xff
    assert(mean == (0 + 1 + 15 + 16 + 17 + 255) / 6.0)
  }

  test("decodeStub: empty payload yields zero features, not NaN") {
    val (hist, mean) = Multimodal.decodeStub(Array.emptyByteArray)
    assert(hist.forall(_ == 0L) && mean == 0.0)
  }

  test("extractFeatures preserves rows, schema and per-row values") {
    import spark.implicits._
    val media = Seq(
      MediaRow(1L, "image/fake", "abc".getBytes("UTF-8")),
      MediaRow(2L, "audio/fake", Array.emptyByteArray),
      MediaRow(3L, "video/fake", Array.tabulate(300)(_.toByte))
    ).toDS().repartition(2) // exercise the partition-batch path
    val out = Multimodal.extractFeatures(media).collect().sortBy(_.doc_id)
    assert(out.map(_.doc_id).toSeq == Seq(1L, 2L, 3L))
    assert(out(0).n_bytes == 3 && out(1).n_bytes == 0 && out(2).n_bytes == 300)
    assert(out(0).byte_hist.sum == 3)
    // deterministic across runs
    val again = Multimodal.extractFeatures(media).collect().sortBy(_.doc_id)
    assert(out.zip(again).forall { case (a, b) =>
      a.byte_hist.sameElements(b.byte_hist) && a.mean_byte == b.mean_byte })
  }

  test("featureQuery runs on the corpus with stable ordering") {
    val df = Multimodal.featureQuery(spark, TestSpark.sfDir)
    val rows = df.limit(3).collect()
    assert(rows.nonEmpty)
    assert(df.columns.toSeq ==
      Seq("doc_id", "media_type", "n_bytes", "mean_byte", "hist_csv"))
    assert(rows.head.getAs[String]("media_type") == "text/plain")
  }
}
