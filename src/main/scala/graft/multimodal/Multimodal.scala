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

  /** The documents table viewed as a media table — text bytes stand in
    * for payloads (no real media in the corpus); the ONE definition the
    * three registry queries share so the media shape cannot silently
    * diverge between them. `dropNullText` matches each query's oracle:
    * q43's oracle EMITS a (coalesced) row for a null text, so it keeps
    * them; the q62/q63 oracles filter null texts out (a stub-decoded
    * empty output would diverge from their NULL propagation otherwise),
    * so those drop them at the SCAN (pushed isnotnull filter).
    */
  private def mediaView(s: SparkSession, d: String,
      dropNullText: Boolean): Dataset[MediaRow] = {
    import s.implicits._
    val docs = Tables.documents(s, d)
    val base = if (dropNullText) docs.filter(col("text").isNotNull) else docs
    base
      .select(col("doc_id"), lit("text/plain").as("media_type"),
        col("text").cast("binary").as("payload"))
      .as[MediaRow]
  }

  /** Registry query (q43): documents' text bytes stand in for media
    * payloads; output is the decoded feature table, stable-ordered.
    */
  def featureQuery(s: SparkSession, d: String): DataFrame = {
    extractFeatures(mediaView(s, d, dropNullText = false))
      .select(col("doc_id"), col("media_type"), col("n_bytes"),
        col("mean_byte"), concat_ws(",", col("byte_hist")).as("hist_csv"))
      .orderBy("doc_id")
  }

  /** A fixed-width "thumbnail" row (resize output). */
  final case class MediaThumb(doc_id: Long, n_bytes: Int, thumb: Array[Byte])

  /** STUB resize: nearest-neighbor byte downsample to a fixed 32-byte
    * thumbnail — `out(j) = payload((j·n)/32)` — standing in for a pixel
    * resize (which needs a codec this container lacks). Deterministic and
    * byte-slice-expressible, so the WHOLE mapPartitions pipeline is
    * oracle-checkable; replace the body (not the signature) with a real
    * scaler in production. Empty payload → empty thumbnail.
    */
  def resizeStub(payload: Array[Byte], width: Int): Array[Byte] = {
    if (payload.length == 0) return Array.emptyByteArray
    val out = new Array[Byte](width)
    var j = 0
    while (j < width) {
      // long arithmetic: j * length overflows Int for payloads ≥ ~69 MB
      // (real media sizes), which would index negative and kill the task
      out(j) = payload(((j.toLong * payload.length) / width).toInt)
      j += 1
    }
    out
  }

  /** Resize in partition batches — same codec-seam shape as
    * [[extractFeatures]]: per-partition setup amortizes, payloads never
    * leave the executor.
    */
  def resize(media: Dataset[MediaRow], width: Int): Dataset[MediaThumb] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val payload = if (r.payload == null) Array.emptyByteArray else r.payload
        MediaThumb(r.doc_id, payload.length, resizeStub(payload, width))
      }
    }
  }

  /** Registry query (q62): 32-byte thumbnails of every payload, hex-coded
    * so the DuckDB oracle can hash-compare the exact bytes.
    */
  def resizeQuery(s: SparkSession, d: String): DataFrame = {
    resize(mediaView(s, d, dropNullText = true), 32)
      .select(col("doc_id"), col("n_bytes"),
        lower(hex(col("thumb"))).as("thumb_hex"))
      .orderBy("doc_id")
  }

  /** One sampled frame of a media payload. */
  final case class MediaFrame(doc_id: Long, frame_idx: Int, frame: Array[Byte])

  /** STUB frame sampler: k fixed-size byte windows at uniform stride —
    * `frame_i = payload[i·stride, i·stride+frameLen)`, stride =
    * max(1, n/k) — standing in for video frame extraction. Windows past
    * the payload end are empty/truncated, exactly like SQL byte
    * `substring`, which keeps the whole 1→N pipeline oracle-checkable.
    */
  def frameSampleStub(payload: Array[Byte], frames: Int, frameLen: Int): Seq[(Int, Array[Byte])] = {
    val n = payload.length
    val stride = math.max(1, n / frames)
    (0 until frames).map { i =>
      val from = math.min(n, i * stride)
      val until = math.min(n, from + frameLen)
      i -> java.util.Arrays.copyOfRange(payload, from, until)
    }
  }

  /** Frame-sample in partition batches (1 row → k frame rows) — the video
    * analog of [[resize]]; a real build swaps the stub for a demuxer
    * initialized once per partition.
    */
  def frameSample(media: Dataset[MediaRow], frames: Int, frameLen: Int): Dataset[MediaFrame] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val payload = if (r.payload == null) Array.emptyByteArray else r.payload
        frameSampleStub(payload, frames, frameLen).map { case (i, f) =>
          MediaFrame(r.doc_id, i, f)
        }
      }
    }
  }

  /** Registry query (q63): 4 frames × 16 bytes per payload with per-frame
    * digests — the typed 1→N explode the driver gate hash-checks.
    */
  def frameSampleQuery(s: SparkSession, d: String): DataFrame = {
    frameSample(mediaView(s, d, dropNullText = true), 4, 16)
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
        length(col("frame")).as("n_frame"), md5(col("frame")).as("digest"))
      .orderBy("doc_id", "frame_idx")
  }

  /** Minimum payload bytes for a [[fingerprintOf]] sketch — below this
    * there are fewer trigrams than buckets and the parity bits carry
    * too little signal to band on (the q125 convention; callers filter).
    */
  val FingerprintMinBytes = 62

  /** X109's 60-bit perceptual fingerprint over an opaque payload: a
    * trigram-parity sketch (every byte trigram feature-hashed into 60
    * buckets, bit_j = parity of bucket j's count — a 1-bit count-sketch).
    * Position-invariant; a k-byte edit flips O(k) bits; unrelated
    * payloads sit at the 60-bit binomial mean. Integer-only and exactly
    * oracle-expressible (the q43 ASCII char==byte identity). Design
    * measurements — including the blockhash-style grid this replaced —
    * in BASELINE.md r14. ONE definition shared by the q125 audit query
    * and the sink-tier probe, so the fingerprint the index persists and
    * the one a probe computes can never drift.
    */
  def fingerprintOf(payload: Array[Byte]): Long = {
    val hist = new Array[Long](60)
    val n = payload.length
    var i = 0
    while (i + 2 < n) {
      val b = ((payload(i) & 0xff) * 65536 + (payload(i + 1) & 0xff) * 256
        + (payload(i + 2) & 0xff)) % 60
      hist(b) += 1
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < 60) { if ((hist(j) & 1L) == 1L) fp |= 1L << j; j += 1 }
    fp
  }

  /** [[fingerprintOf]] as a column (tight-loop UDF — the simhash/q64
    * precedent: the 60-long histogram lives in the loop, never in a
    * shuffle). */
  def fingerprint(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    udf((p: Array[Byte]) => fingerprintOf(p)).apply(payload)
}
