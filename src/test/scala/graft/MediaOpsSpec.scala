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

  test("REAL AVI parser: synth round-trips, true frame offsets from movi walk") {
    (0L until 64L).foreach { id =>
      val bytes = MediaOps.synthAvi(id)
      val d = MediaOps.decodeAvi(bytes)
      assert(d != null, s"id $id")
      assert(d.meta == MediaOps.MediaMeta("video", MediaOps.widthOf(id),
        MediaOps.heightOf(id), MediaOps.fpsOf(id), MediaOps.videoFramesOf(id)))
      // one frame offset per '00db' chunk, each pointing at true payload
      assert(d.frameOffsets.length == MediaOps.videoFramesOf(id))
      d.frameOffsets.foreach { case (off, len) =>
        assert(len == 32)
        (off until off + len).foreach(i =>
          assert((bytes(i) & 0xFF) == MediaOps.payloadByteOf(id)))
        // the 4 bytes before the length word are the '00db' fourcc
        assert(bytes(off - 8) == '0' && bytes(off - 6) == 'd' && bytes(off - 5) == 'b')
      }
      // frame spans tile the movi payload exactly (headers excluded)
      assert(d.frameOffsets.map(_._2 + 8).sum == d.payloadLen)
      assert(MediaOps.decodeReal(bytes) == d) // dispatch on RIFF form type
    }
    // malformed: truncation, zero dims, no frames
    val good = MediaOps.synthAvi(5L)
    assert(MediaOps.decodeAvi(java.util.Arrays.copyOf(good, good.length - 4)) == null)
    assert(MediaOps.decodeAvi(null) == null)
    assert(MediaOps.decodeAvi("RIFFxxxxAVI ".getBytes) == null)
    val zeroW = good.clone(); zeroW(64) = 0; zeroW(65) = 0; zeroW(66) = 0; zeroW(67) = 0
    assert(MediaOps.decodeAvi(zeroW) == null)
    // WAV bytes must not decode as AVI (form-type dispatch)
    assert(MediaOps.decodeAvi(MediaOps.synthWav(1L)) == null)
  }

  test("frameSampleOffsets: evenly spaced seeks into true frame spans") {
    val id = 23L // 24 frames
    val bytes = MediaOps.synthAvi(id)
    val d = MediaOps.decodeAvi(bytes)
    val s4 = MediaOps.frameSampleOffsets(bytes, d.frameOffsets, 4)
    assert(s4.length == 4)
    s4.foreach { f =>
      assert(f.length == 32)
      assert(f.forall(b => (b & 0xFF) == MediaOps.payloadByteOf(id)))
    }
    // k > frames clamps; k = frames returns all, in order
    val all = MediaOps.frameSampleOffsets(bytes, d.frameOffsets, 1000)
    assert(all.length == d.frameOffsets.length)
    assert(MediaOps.frameSampleOffsets(bytes, Nil, 4).isEmpty)
    assert(MediaOps.frameSampleOffsets(null, d.frameOffsets, 4).isEmpty)
  }

  test("decode fuzz: random bytes, truncations and mutations never throw") {
    // deterministic fuzz stream (mix64 counter) — any outcome is legal
    // except an exception; valid-prefix corruptions exercise the chunk
    // walks' bounds checks specifically
    def mix(x: Long): Long = {
      var z = x + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    (0 until 200).foreach { i =>
      val len = (mix(i).abs % 300).toInt
      val junk = Array.tabulate(len)(j => mix(i * 1000L + j).toByte)
      MediaOps.decodeReal(junk) // must not throw
      MediaOps.decodeAvi(junk); MediaOps.decodeBmp(junk); MediaOps.decodeWav(junk)
    }
    (0 until 200).foreach { i =>
      val len = (mix(i + 7777).abs % 300).toInt
      val junk = Array.tabulate(len)(j => mix(i * 2000L + j).toByte)
      MediaOps.decodePng(junk); MediaOps.decodeJpeg(junk) // must not throw
      MediaOps.decodeMp3(junk); MediaOps.decodeMp4(junk)
    }
    Seq(MediaOps.synthAvi(7L), MediaOps.synthBmp(8L), MediaOps.synthWav(9L),
      MediaOps.synthPng(10L), MediaOps.synthJpeg(11L), MediaOps.synthMp3(12L),
      MediaOps.synthMp4(13L)).foreach { valid =>
      // every truncation length
      (0 until valid.length by 7).foreach { cut =>
        MediaOps.decodeReal(java.util.Arrays.copyOf(valid, cut))
      }
      // single-byte mutations across the header region
      (0 until math.min(valid.length, 96)).foreach { pos =>
        val m = valid.clone()
        m(pos) = (m(pos) ^ 0x5a).toByte
        MediaOps.decodeReal(m)
      }
      // size-field corruption to huge/negative values
      Seq(4, 16, 28).foreach { off =>
        if (off + 4 <= valid.length) {
          val m = valid.clone()
          m(off) = 0xff.toByte; m(off + 1) = 0xff.toByte
          m(off + 2) = 0xff.toByte; m(off + 3) = 0x7f.toByte
          MediaOps.decodeReal(m)
          val neg = valid.clone()
          neg(off + 3) = 0xff.toByte
          MediaOps.decodeReal(neg)
        }
      }
    }
  }

  test("REAL PNG parser: synth round-trips, IDAT payload dominated by the pixel byte") {
    (0L until 40L).foreach { id =>
      val bytes = MediaOps.synthPng(id)
      // true PNG signature + CRC'd chunks (javax.imageio-free check: the
      // IHDR CRC recomputes)
      assert((bytes(0) & 0xFF) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N')
      val d = MediaOps.decodePng(bytes)
      assert(d != null, s"id=$id")
      assert(d.meta == MediaOps.MediaMeta("image", MediaOps.widthOf(id), MediaOps.heightOf(id), 0, 1))
      // the IDAT span opens with the zlib header and holds the stored rows
      assert((bytes(d.payloadOff) & 0xFF) == 0x78)
      // zlib stored block round-trips through a real Inflater to the raw
      // scanlines (proof the synthesized PNG is a decodable image stream)
      val inf = new java.util.zip.Inflater()
      inf.setInput(bytes, d.payloadOff, d.payloadLen)
      val raw = new Array[Byte](MediaOps.heightOf(id) * (1 + MediaOps.widthOf(id) * 3) + 16)
      val n = inf.inflate(raw)
      inf.end()
      assert(n == MediaOps.heightOf(id) * (1 + MediaOps.widthOf(id) * 3), s"id=$id inflated $n")
      assert(raw(1) == MediaOps.payloadByteOf(id).toByte)
    }
  }

  test("REAL JPEG parser: SOF dims + entropy scan span, stuffing/restart aware") {
    (0L until 40L).foreach { id =>
      val bytes = MediaOps.synthJpeg(id)
      val d = MediaOps.decodeJpeg(bytes)
      assert(d != null, s"id=$id")
      assert(d.meta == MediaOps.MediaMeta("image", MediaOps.widthOf(id), MediaOps.heightOf(id), 0, 1))
      assert(d.payloadLen == 64 + (id % 17).toInt * 16, s"id=$id")
      assert(bytes(d.payloadOff) == MediaOps.payloadByteOf(id).toByte)
    }
    // byte stuffing: FF 00 inside the scan is data, not a marker
    val j = MediaOps.synthJpeg(3L)
    val d0 = MediaOps.decodeJpeg(j)
    val stuffed = j.take(d0.payloadOff + 4) ++ Array(0xFF.toByte, 0x00.toByte) ++
      j.drop(d0.payloadOff + 4)
    val d1 = MediaOps.decodeJpeg(stuffed)
    assert(d1 != null && d1.payloadLen == d0.payloadLen + 2)
    // restart marker FFD5 inside the scan is walked over
    val rst = j.take(d0.payloadOff + 4) ++ Array(0xFF.toByte, 0xD5.toByte) ++
      j.drop(d0.payloadOff + 4)
    val d2 = MediaOps.decodeJpeg(rst)
    assert(d2 != null && d2.payloadLen == d0.payloadLen + 2)
    // progressive SOF2 also yields dims
    val prog = j.clone()
    val sofAt = {
      var i = 2
      while (!((prog(i) & 0xFF) == 0xFF && (prog(i + 1) & 0xFF) == 0xC0)) i += 1
      i
    }
    prog(sofAt + 1) = 0xC2.toByte
    assert(MediaOps.decodeJpeg(prog) != null)
    // MULTI-SCAN (progressive) file: the payload span must end at the
    // FIRST non-stuffing/non-restart marker (here a DHT opening scan 2),
    // not run through later tables and scans to the final EOI
    val eoiAt = d0.payloadOff + d0.payloadLen // points at FF D9
    val scan2 = j.take(eoiAt) ++
      Array(0xFF.toByte, 0xC4.toByte, 0x00.toByte, 0x04.toByte, 1.toByte, 2.toByte) ++ // DHT
      Array(0xFF.toByte, 0xDA.toByte, 0x00.toByte, 0x02.toByte) ++ // SOS #2
      Array(9.toByte, 9.toByte, 9.toByte) ++ // scan-2 entropy bytes
      j.drop(eoiAt) // FF D9 EOI
    val dm = MediaOps.decodeJpeg(scan2)
    assert(dm != null)
    assert(dm.payloadOff == d0.payloadOff)
    assert(dm.payloadLen == d0.payloadLen,
      s"span ran past scan 1: ${dm.payloadLen} vs ${d0.payloadLen}")
  }

  test("REAL MP3 parser: ID3 skip, frame walk, true frame offsets") {
    (0L until 40L).foreach { id =>
      val bytes = MediaOps.synthMp3(id)
      val d = MediaOps.decodeMp3(bytes)
      assert(d != null, s"id=$id")
      assert(d.meta == MediaOps.MediaMeta("audio", 0, 0, MediaOps.mp3RateOf(id),
        MediaOps.mp3FramesOf(id)), s"id=$id")
      assert(d.frameOffsets.length == MediaOps.mp3FramesOf(id))
      // frame payloads are the constant byte; header bytes excluded
      d.frameOffsets.foreach { case (off, len) =>
        assert(bytes(off) == MediaOps.payloadByteOf(id).toByte)
        assert(len == 144 * 128000 / MediaOps.mp3RateOf(id) - 4)
      }
      // dispatch finds it by the ID3 magic
      assert(MediaOps.decodeReal(bytes) == d)
    }
    // bare stream without ID3 tag also decodes (sync-scan entry)
    val tagged = MediaOps.synthMp3(7L)
    val bare = tagged.drop(42) // 10-byte header + 32-byte tag body
    val d = MediaOps.decodeMp3(bare)
    assert(d != null && d.meta.frames == MediaOps.mp3FramesOf(7L))
    // truncated final frame: walk stops, earlier frames kept
    val cut = java.util.Arrays.copyOf(tagged, tagged.length - 10)
    val dc = MediaOps.decodeMp3(cut)
    assert(dc != null && dc.meta.frames == MediaOps.mp3FramesOf(7L) - 1)
  }

  test("REAL MP4 parser: box walk, 16.16 dims, stsz-derived frame spans") {
    (0L until 40L).foreach { id =>
      val bytes = MediaOps.synthMp4(id)
      val d = MediaOps.decodeMp4(bytes)
      assert(d != null, s"id=$id")
      assert(d.meta == MediaOps.MediaMeta("video", MediaOps.widthOf(id),
        MediaOps.heightOf(id), MediaOps.fpsOf(id), MediaOps.videoFramesOf(id)), s"id=$id")
      assert(d.frameOffsets.length == MediaOps.videoFramesOf(id))
      d.frameOffsets.foreach { case (off, len) =>
        assert(len == 32 && bytes(off) == MediaOps.payloadByteOf(id).toByte)
      }
      assert(MediaOps.decodeReal(bytes) == d)
    }
  }

  test("MP4 truncated version-1 mvhd box returns null, never throws") {
    // a v1 mvhd whose box size stops short of the 8-byte duration read —
    // the walk's size guard must reject it instead of indexing past the
    // buffer
    val out = new java.io.ByteArrayOutputStream()
    def be32(v: Int): Unit = { out.write(v >>> 24); out.write((v >>> 16) & 0xFF)
      out.write((v >>> 8) & 0xFF); out.write(v & 0xFF) }
    def cc(s: String): Unit = s.foreach(c => out.write(c & 0xFF))
    be32(16); cc("ftyp"); cc("isom"); be32(0)
    be32(44); cc("moov")
    be32(36); cc("mvhd") // v1 needs size >= 40 for the duration read
    out.write(1); out.write(0); out.write(0); out.write(0) // version 1
    be32(0); be32(0); be32(0); be32(0); be32(0); be32(0) // 24 bytes: ctime/mtime/timescale-ish
    assert(MediaOps.decodeMp4(out.toByteArray) == null) // must not throw
  }

  test("realMediaFeatures: closed-form columns over true BMP/WAV/AVI/PNG/JPEG/MP3/MP4 bytes") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").appName("graft-media-real-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
    val df = MediaOps.realMediaFeatures(spark, "/root/testdata/sf0.001").orderBy("media_id")
    df.collect().foreach { r =>
      val id = r.getLong(0)
      // format comes from the SCRAMBLED hash (decoupled from the id cycle
      // so the magic-byte dispatch is what routes each row)
      (((id * 37 + 11) % 101) % 7) match {
        case 0 | 3 | 4 => // BMP / PNG / JPEG
          assert(r.getString(1) == "image")
          assert(r.getLong(2) == MediaOps.widthOf(id).toLong)
          assert(r.getLong(3) == MediaOps.heightOf(id).toLong)
          assert(r.getLong(4) == 0L)
          assert(r.getLong(5) == 1L)
        case 1 => // WAV
          assert(r.getString(1) == "audio")
          assert(r.getLong(4) == 8000L + (id % 4) * 8000)
          assert(r.getLong(5) == 64L + (id % 17) * 16)
        case 5 => // MP3
          assert(r.getString(1) == "audio")
          assert(r.getLong(4) == MediaOps.mp3RateOf(id).toLong)
          assert(r.getLong(5) == MediaOps.mp3FramesOf(id).toLong)
        case _ => // AVI / MP4
          assert(r.getString(1) == "video")
          assert(r.getLong(2) == MediaOps.widthOf(id).toLong)
          assert(r.getLong(3) == MediaOps.heightOf(id).toLong)
          assert(r.getLong(4) == MediaOps.fpsOf(id).toLong)
          assert(r.getLong(5) == MediaOps.videoFramesOf(id).toLong)
      }
      assert(r.getLong(6) == (id % 251) / 16)
    }
    // always stop: a leaked session would be adopted by a later suite's
    // getOrCreate() without that suite's config/extensions
    } finally spark.stop()
  }
}
