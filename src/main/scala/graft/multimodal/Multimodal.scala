package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Tables

/** One media item: opaque binary payload + typed metadata. At 100 TB the
  * payload column stays columnar parquet binary; decode happens
  * executor-side in partition batches, never on the driver.
  */
final case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])

/** Decoded feature row — fixed-width schema so downstream joins/aggs stay
  * columnar and codegen-friendly.
  */
final case class MediaFeatures(
    doc_id: Long,
    media_type: String,
    n_bytes: Int,
    byte_hist: Array[Long], // 16 buckets over byte values
    mean_byte: Double)

/** Multimodal column plumbing: decode / feature-extract over opaque binary
  * payloads as a typed `mapPartitions` stage (the Scala analog of
  * `mapInPandas` batches).
  *
  * The decode step itself is a DETERMINISTIC STUB — this container has no
  * image/audio codecs — but everything Spark-side is real: schema, encoder,
  * partition batching, and the executor-side per-partition loop where a
  * codec (libjpeg, ffmpeg, …) would be initialized once per partition and
  * fed each payload.
  */
object Multimodal {

  /** STUB decoder: byte histogram + mean byte value stand in for real
    * decode/resize/frame-sample. Replace the body (not the signature) with
    * a codec call in production.
    */
  def decodeStub(payload: Array[Byte]): (Array[Long], Double) = {
    val hist = new Array[Long](16)
    var sum = 0L
    var i = 0
    while (i < payload.length) {
      val b = payload(i) & 0xff
      hist(b % 16) += 1
      sum += b
      i += 1
    }
    (hist, if (payload.length == 0) 0.0 else sum.toDouble / payload.length)
  }

  /** Decode features in partition batches. Expensive per-partition setup
    * (codec init) amortizes across the batch — the reason this is
    * mapPartitions, not a per-row UDF.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition codec init would go here
      rows.map { r =>
        // null payload (nullable source column) → zero features, not an NPE
        val payload = if (r.payload == null) Array.emptyByteArray else r.payload
        val (hist, mean) = decodeStub(payload)
        MediaFeatures(r.doc_id, r.media_type, payload.length, hist, mean)
      }
    }
  }

  /** Registry query (q43): documents' text bytes stand in for media
    * payloads; output is the decoded feature table, stable-ordered.
    */
  def featureQuery(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val media = Tables.documents(s, d)
      .select(col("doc_id"), lit("text/plain").as("media_type"),
        col("text").cast("binary").as("payload"))
      .as[MediaRow]
    extractFeatures(media)
      .select(col("doc_id"), col("media_type"), col("n_bytes"),
        col("mean_byte"), concat_ws(",", col("byte_hist")).as("hist_csv"))
      .orderBy("doc_id")
  }
}
