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

  /** REAL feature op: L1-normalized byte histogram of a payload span. */
  def histogramFeatures(bytes: Array[Byte], off: Int, len: Int, bins: Int): Array[Float] = {
    val out = new Array[Float](bins)
    if (bytes == null || len <= 0 || off < 0 || off + len > bytes.length) return out
    var i = off
    val end = off + len
    while (i < end) {
      out((bytes(i) & 0xFF) * bins / 256) += 1f
      i += 1
    }
    var b = 0
    while (b < bins) { out(b) /= len.toFloat; b += 1 }
    out
  }

  def histogramFeatures(bytes: Array[Byte], bins: Int = 16): Array[Float] =
    if (bytes == null) new Array[Float](bins)
    else histogramFeatures(bytes, 16, bytes.length - 16, bins)

  // ---------- REAL container parsers (pure JVM, no codec libraries) ----------
  // BMP (BITMAPINFOHEADER) and WAV (RIFF/WAVE fmt+data) fill the SAME decode
  // slot as the stub — swap-in proof that the per-partition plumbing is
  // format-agnostic. Both return the payload span so the histogram /
  // frame-sample feature ops run over real pixel / PCM bytes.

  final case class Decoded(meta: MediaMeta, payloadOff: Int, payloadLen: Int)

  private def leU16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)
  private def leI32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
      ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)

  /** BMP: 'BM' magic, pixel-array offset at 10, BITMAPINFOHEADER width/height
    * at 18/22 (height may be negative = top-down). Null on malformed input. */
  def decodeBmp(bytes: Array[Byte]): Decoded = {
    if (bytes == null || bytes.length < 54) return null
    if (bytes(0) != 'B' || bytes(1) != 'M') return null
    val pixelOff = leI32(bytes, 10)
    val dibSize = leI32(bytes, 14)
    if (dibSize < 40 || pixelOff < 54 || pixelOff > bytes.length) return null
    val width = leI32(bytes, 18)
    val height = leI32(bytes, 22)
    if (width <= 0 || height == 0) return null
    Decoded(MediaMeta("image", width, math.abs(height), 0, 1),
      pixelOff, bytes.length - pixelOff)
  }

  /** WAV: RIFF/WAVE chunk walk for fmt (channels, sample rate, block align)
    * and data (frame count = size / block align). Null on malformed input. */
  def decodeWav(bytes: Array[Byte]): Decoded = {
    if (bytes == null || bytes.length < 44) return null
    if (bytes(0) != 'R' || bytes(1) != 'I' || bytes(2) != 'F' || bytes(3) != 'F' ||
      bytes(8) != 'W' || bytes(9) != 'A' || bytes(10) != 'V' || bytes(11) != 'E') return null
    var at = 12
    var sampleRate = 0
    var blockAlign = 0
    var dataOff = -1
    var dataLen = 0
    while (at + 8 <= bytes.length) {
      val id = new String(bytes, at, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val size = leI32(bytes, at + 4)
      if (size < 0 || at + 8 + size > bytes.length) return null
      if (id == "fmt ") {
        if (size < 16) return null
        sampleRate = leI32(bytes, at + 12)
        blockAlign = leU16(bytes, at + 20)
      } else if (id == "data") {
        dataOff = at + 8
        dataLen = size
      }
      at += 8 + size + (size & 1) // chunks are word-aligned
    }
    if (sampleRate <= 0 || blockAlign <= 0 || dataOff < 0) return null
    Decoded(MediaMeta("audio", 0, 0, sampleRate, dataLen / blockAlign),
      dataOff, dataLen)
  }

  /** format dispatch on magic bytes: the single decode slot. */
  def decodeReal(bytes: Array[Byte]): Decoded = {
    if (bytes == null || bytes.length < 4) return null
    if (bytes(0) == 'B' && bytes(1) == 'M') decodeBmp(bytes)
    else if (bytes(0) == 'R' && bytes(1) == 'I') decodeWav(bytes)
    else {
      val m = decodeStub(bytes)
      if (m == null) null else Decoded(m, 16, bytes.length - 16)
    }
  }

  /** a true 24-bpp BMP file with deterministic dims and constant pixels. */
  def synthBmp(id: Long): Array[Byte] = {
    val w = widthOf(id)
    val h = heightOf(id)
    val rowSize = ((w * 3 + 3) / 4) * 4
    val pixels = rowSize * h
    val out = new Array[Byte](54 + pixels)
    def le32(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >>> 8).toByte
      out(off + 2) = (v >>> 16).toByte; out(off + 3) = (v >>> 24).toByte
    }
    def le16(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >>> 8).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    le32(2, 54 + pixels); le32(10, 54)
    le32(14, 40); le32(18, w); le32(22, h)
    le16(26, 1); le16(28, 24)
    le32(34, pixels)
    java.util.Arrays.fill(out, 54, out.length, payloadByteOf(id).toByte)
    out
  }

  /** a true 16-bit mono PCM WAV with deterministic rate/frames and constant
    * sample bytes. */
  def synthWav(id: Long): Array[Byte] = {
    val rate = 8000 + ((id % 4).toInt * 8000)
    val frames = 64 + ((id % 17).toInt * 16)
    val dataLen = frames * 2
    val out = new Array[Byte](44 + dataLen)
    def le32(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >>> 8).toByte
      out(off + 2) = (v >>> 16).toByte; out(off + 3) = (v >>> 24).toByte
    }
    def le16(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >>> 8).toByte
    }
    out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
    le32(4, 36 + dataLen)
    out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
    out(12) = 'f'; out(13) = 'm'; out(14) = 't'; out(15) = ' '
    le32(16, 16)
    le16(20, 1) // PCM
    le16(22, 1) // mono
    le32(24, rate)
    le32(28, rate * 2) // byte rate
    le16(32, 2) // block align
    le16(34, 16) // bits/sample
    out(36) = 'd'; out(37) = 'a'; out(38) = 't'; out(39) = 'a'
    le32(40, dataLen)
    java.util.Arrays.fill(out, 44, out.length, payloadByteOf(id).toByte)
    out
  }

  /** real-format media pipeline: synthesize true BMP (even ids) / WAV (odd
    * ids) bytes, decode through the REAL parsers per partition, extract the
    * histogram dominant bin over the actual pixel / PCM payload. Every
    * output column is a closed-form function of the id for the DuckDB
    * oracle. */
  def realMediaFeatures(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").as[Long])
      .mapPartitions { it =>
        it.map { id =>
          val bytes = if (id % 2 == 0) synthBmp(id) else synthWav(id)
          val d = decodeReal(bytes)
          val feats = histogramFeatures(bytes, d.payloadOff, d.payloadLen, 16)
          var dom = 0
          var b = 1
          while (b < feats.length) { if (feats(b) > feats(dom)) dom = b; b += 1 }
          (id, d.meta.kind, d.meta.width.toLong, d.meta.height.toLong,
            d.meta.sample_rate.toLong, d.meta.frames.toLong, dom.toLong)
        }
      }.toDF("media_id", "kind", "width", "height", "sample_rate", "frames", "dom_bin")
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
