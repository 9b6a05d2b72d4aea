package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.spark.MediaOps

/** Multimodal-column plumbing: stub decoder contract, real histogram
  * features, deterministic frame sampling. */
class MediaOpsSpec extends AnyFunSuite {

  test("decodeStub round-trips the synthesized container header") {
    (0L until 300L).foreach { id =>
      val m = MediaOps.decodeStub(MediaOps.synth(id))
      assert(m != null, s"id $id")
      assert(m.kind == MediaOps.kindOf(id))
      assert(m.width == MediaOps.widthOf(id))
      assert(m.height == MediaOps.heightOf(id))
      assert(m.sample_rate == MediaOps.rateOf(id))
      assert(m.frames == MediaOps.framesOf(id))
    }
  }

  test("decodeStub: malformed input yields null, never throws") {
    assert(MediaOps.decodeStub(null) == null)
    assert(MediaOps.decodeStub(Array.empty[Byte]) == null)
    assert(MediaOps.decodeStub(Array.fill(15)(1.toByte)) == null)
    assert(MediaOps.decodeStub(Array.fill(32)(0.toByte)) == null) // bad magic
    val badKind = MediaOps.synth(0L).clone(); badKind(4) = 9
    assert(MediaOps.decodeStub(badKind) == null)
  }

  test("histogram features: L1-normalized, dominant bin = payload byte / 16") {
    (0L until 100L).foreach { id =>
      val f = MediaOps.histogramFeatures(MediaOps.synth(id))
      assert(f.length == 16)
      assert(math.abs(f.sum - 1f) < 1e-5)
      assert(f.indexOf(f.max) == MediaOps.payloadByteOf(id) / 16)
    }
  }

  test("frame sampling: min(k, frames) deterministic slices") {
    (0L until 100L).foreach { id =>
      val bytes = MediaOps.synth(id)
      val m = MediaOps.decodeStub(bytes)
      val frames = MediaOps.frameSample(bytes, m, 4)
      assert(frames.length == math.min(4, m.frames))
      assert(frames.forall(_.nonEmpty))
      val again = MediaOps.frameSample(bytes, m, 4)
      assert(frames.zip(again).forall { case (a, b) => a.sameElements(b) })
    }
    assert(MediaOps.frameSample(null, null, 4).isEmpty)
  }

  test("REAL BMP parser: synth round-trips, payload span correct") {
    (0L until 64L).foreach { id =>
      val bytes = MediaOps.synthBmp(id)
      val d = MediaOps.decodeBmp(bytes)
      assert(d != null)
      assert(d.meta == MediaOps.MediaMeta("image", MediaOps.widthOf(id),
        MediaOps.heightOf(id), 0, 1))
      assert(d.payloadOff == 54 && d.payloadOff + d.payloadLen == bytes.length)
      // dispatch picks the right parser on magic
      assert(MediaOps.decodeReal(bytes) == d)
    }
    // top-down BMP (negative height) and malformed inputs
    val neg = MediaOps.synthBmp(3L)
    val h = MediaOps.heightOf(3L)
    neg(22) = (-h).toByte; neg(23) = ((-h) >> 8).toByte
    neg(24) = ((-h) >> 16).toByte; neg(25) = ((-h) >> 24).toByte
    assert(MediaOps.decodeBmp(neg).meta.height == h)
    assert(MediaOps.decodeBmp(null) == null)
    assert(MediaOps.decodeBmp("BMxx".getBytes) == null)
    assert(MediaOps.decodeBmp(new Array[Byte](54)) == null)
  }

  test("REAL WAV parser: synth round-trips, frames from data/blockAlign") {
    (0L until 64L).foreach { id =>
      val bytes = MediaOps.synthWav(id)
      val d = MediaOps.decodeWav(bytes)
      assert(d != null)
      assert(d.meta.kind == "audio")
      assert(d.meta.sample_rate == 8000 + ((id % 4).toInt * 8000))
      assert(d.meta.frames == 64 + ((id % 17).toInt * 16))
      assert(d.payloadOff == 44 && d.payloadOff + d.payloadLen == bytes.length)
      assert(MediaOps.decodeReal(bytes) == d)
    }
    // truncated data chunk must not decode
    val bad = MediaOps.synthWav(1L)
    assert(MediaOps.decodeWav(java.util.Arrays.copyOf(bad, bad.length - 10)) == null)
    assert(MediaOps.decodeWav(new Array[Byte](44)) == null)
  }

  test("realMediaFeatures: closed-form columns over true BMP/WAV bytes") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").appName("graft-media-real-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = MediaOps.realMediaFeatures(spark, "/root/testdata/sf0.001").orderBy("media_id")
    df.collect().foreach { r =>
      val id = r.getLong(0)
      if (id % 2 == 0) {
        assert(r.getString(1) == "image")
        assert(r.getLong(2) == MediaOps.widthOf(id).toLong)
        assert(r.getLong(5) == 1L)
      } else {
        assert(r.getString(1) == "audio")
        assert(r.getLong(4) == 8000L + (id % 4) * 8000)
        assert(r.getLong(5) == 64L + (id % 17) * 16)
      }
      assert(r.getLong(6) == (id % 251) / 16)
    }
    spark.stop()
  }
}
