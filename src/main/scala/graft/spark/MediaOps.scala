package graft.spark

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for the training-data pipeline: image/audio/video as
  * opaque BINARY columns with typed metadata, plus the decode /
  * feature-extract / frame-sample plumbing a 100 TB media corpus needs.
  *
  * The container has no media codecs, so `decodeStub` parses a
  * DETERMINISTIC FAKE container format (16-byte header + payload) — a
  * clearly-marked stand-in for a real decoder. Everything AROUND the stub
  * is real and tested: the table schema (binary payload + struct metadata),
  * the batch-shaped `mapPartitions` execution (one decoder instance per
  * partition, not per row — the shape a JNI/FFI codec needs), the
  * histogram feature extraction (real computation over the payload bytes),
  * and deterministic frame sampling.
  */
object MediaOps extends Serializable {

  final case class MediaMeta(kind: String, width: Int, height: Int,
      sample_rate: Int, frames: Int)

  private val Magic = 0x4D454431 // "MED1"
  private val Kinds = Array("image", "audio", "video")

  def kindOf(id: Long): String = Kinds((id % 3).toInt)
  def widthOf(id: Long): Int = 16 + ((id % 7).toInt * 16)
  def heightOf(id: Long): Int = 16 + ((id % 5).toInt * 16)
  def rateOf(id: Long): Int = if (kindOf(id) == "image") 0 else 8000 + ((id % 4).toInt * 8000)
  def framesOf(id: Long): Int = if (kindOf(id) == "video") 1 + (id % 24).toInt else 1
  /** constant payload byte per media: makes the dominant histogram bin a
    * closed-form function of the id for the DuckDB oracle. */
  def payloadByteOf(id: Long): Int = (id % 251).toInt

  /** deterministic fake media container: 16-byte header + payload. */
  def synth(id: Long): Array[Byte] = {
    val payloadLen = 64 + ((id % 17).toInt * 16)
    val out = new Array[Byte](16 + payloadLen)
    def i32(off: Int, v: Int): Unit = {
      out(off) = (v >>> 24).toByte; out(off + 1) = (v >>> 16).toByte
      out(off + 2) = (v >>> 8).toByte; out(off + 3) = v.toByte
    }
    def i16(off: Int, v: Int): Unit = {
      out(off) = (v >>> 8).toByte; out(off + 1) = v.toByte
    }
    i32(0, Magic)
    out(4) = (id % 3).toInt.toByte
    i16(5, widthOf(id)); i16(7, heightOf(id))
    i32(9, rateOf(id)); i16(13, framesOf(id))
    out(15) = 0
    java.util.Arrays.fill(out, 16, out.length, payloadByteOf(id).toByte)
    out
  }

  /** STUB decoder: parses the fake header. A production build swaps this
    * single function for a real codec binding (libjpeg/ffmpeg via FFI) —
    * the per-partition batching around it does not change. Null on any
    * malformed input, never an exception. */
  def decodeStub(bytes: Array[Byte]): MediaMeta = {
    if (bytes == null || bytes.length < 16) return null
    def i32(off: Int): Int =
      ((bytes(off) & 0xFF) << 24) | ((bytes(off + 1) & 0xFF) << 16) |
        ((bytes(off + 2) & 0xFF) << 8) | (bytes(off + 3) & 0xFF)
    def i16(off: Int): Int = ((bytes(off) & 0xFF) << 8) | (bytes(off + 1) & 0xFF)
    if (i32(0) != Magic) return null
    val k = bytes(4) & 0xFF
    if (k >= Kinds.length) return null
    MediaMeta(Kinds(k), i16(5), i16(7), i32(9), i16(13))
  }

  /** REAL feature op: L1-normalized byte histogram of the payload. */
  def histogramFeatures(bytes: Array[Byte], bins: Int = 16): Array[Float] = {
    val out = new Array[Float](bins)
    if (bytes == null || bytes.length <= 16) return out
    var i = 16
    while (i < bytes.length) {
      out((bytes(i) & 0xFF) * bins / 256) += 1f
      i += 1
    }
    val n = (bytes.length - 16).toFloat
    var b = 0
    while (b < bins) { out(b) /= n; b += 1 }
    out
  }

  /** deterministic frame sampling: up to `k` evenly-spaced payload slices. */
  def frameSample(bytes: Array[Byte], meta: MediaMeta, k: Int): Array[Array[Byte]] = {
    if (bytes == null || meta == null || meta.frames <= 0) return Array.empty
    val take = math.min(k, meta.frames)
    val payload = bytes.length - 16
    if (payload <= 0) return Array.empty
    val frameLen = math.max(1, payload / meta.frames)
    Array.tabulate(take) { f =>
      val at = 16 + (f.toLong * meta.frames / take).toInt * frameLen
      java.util.Arrays.copyOfRange(bytes, at, math.min(at + frameLen, bytes.length))
    }
  }

  /** media table synthesized from the documents table (binary payload +
    * typed struct metadata — the input_hint shape for media corpora). */
  def mediaTable(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").as[Long])
      .map { id =>
        val bytes = synth(id)
        val m = decodeStub(bytes)
        (id, m.kind, bytes, m)
      }.toDF("media_id", "kind", "bytes", "meta")
  }

  /** batch decode + feature extraction: mapPartitions so a real codec would
    * init once per partition (the FFI-friendly execution shape). */
  def extractFeatures(spark: SparkSession, media: DataFrame, sampleK: Int = 4): DataFrame = {
    import spark.implicits._
    media.select(col("media_id").as[Long], col("bytes").as[Array[Byte]])
      .mapPartitions { it =>
        // per-partition decoder scope: a real binding would open here
        it.map { case (id, bytes) =>
          val meta = decodeStub(bytes)
          if (meta == null) (id, null.asInstanceOf[String], -1, -1, -1, -1L,
            Array.empty[Float], 0)
          else {
            val feats = histogramFeatures(bytes)
            var dom = 0
            var b = 1
            while (b < feats.length) { if (feats(b) > feats(dom)) dom = b; b += 1 }
            val frames = frameSample(bytes, meta, sampleK)
            (id, meta.kind, meta.width, meta.height, meta.sample_rate,
              dom.toLong, feats, frames.length)
          }
        }
      }.toDF("media_id", "kind", "width", "height", "sample_rate",
        "dominant_bin", "features", "sampled_frames")
  }
}
