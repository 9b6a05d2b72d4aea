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
}
