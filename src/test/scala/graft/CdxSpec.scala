package graft

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets.ISO_8859_1
import java.util.zip.{CRC32, Deflater}

import graft.spark.{CdxOps, WarcOps}

import org.scalatest.funsuite.AnyFunSuite

/** gzip member walk exactness (offsets to the byte), RFC 1952 header-flag
  * variants, oversize/truncation tolerance, CDX row semantics, and the
  * random-access fetch the index exists for. */
class CdxSpec extends AnyFunSuite {

  private def gzMember(payload: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(payload); gz.finish(); gz.close()
    bos.toByteArray
  }

  /** hand-built gzip member exercising FEXTRA + FNAME + FCOMMENT + FHCRC —
    * flags GZIPOutputStream never writes but RFC 1952 allows and real
    * crawler output contains. */
  private def gzMemberWithFlags(payload: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    // FLG = FHCRC(2) | FEXTRA(4) | FNAME(8) | FCOMMENT(16) = 0x1e
    val header = Array[Int](0x1f, 0x8b, 8, 0x1e, 0, 0, 0, 0, 0, 0xff).map(_.toByte)
    bos.write(header)
    bos.write(Array[Byte](3, 0)) // FEXTRA: xlen=3 LE
    bos.write(Array[Byte](1, 2, 3))
    bos.write("name.warc".getBytes(ISO_8859_1)); bos.write(0) // FNAME
    bos.write("a comment".getBytes(ISO_8859_1)); bos.write(0) // FCOMMENT
    bos.write(Array[Byte](0x42, 0x42)) // FHCRC (walker skips, not checks)
    val d = new Deflater(Deflater.DEFAULT_COMPRESSION, true)
    d.setInput(payload); d.finish()
    val buf = new Array[Byte](8192)
    while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
    d.end()
    val crc = new CRC32(); crc.update(payload)
    def le32(v: Long): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    bos.write(le32(crc.getValue))
    bos.write(le32(payload.length.toLong & 0xffffffffL))
    bos.toByteArray
  }

  test("member walk: exact offsets, lengths tile the file, data round-trips") {
    val payloads = Seq("first record", "second, a bit longer payload",
      "", "fourth").map(_.getBytes(ISO_8859_1))
    val members = payloads.map(gzMember)
    val file = members.reduce(_ ++ _)
    val got = new CdxOps.GzipMemberWalker(new ByteArrayInputStream(file)).toVector
    assert(got.length == 4)
    var expectOff = 0L
    got.zip(members).zip(payloads).foreach { case ((m, raw), payload) =>
      assert(m.offset == expectOff)
      assert(m.length == raw.length)
      assert(java.util.Arrays.equals(m.data, payload))
      expectOff += raw.length
    }
    assert(expectOff == file.length) // spans tile the file exactly
  }

  test("header flags FEXTRA/FNAME/FCOMMENT/FHCRC parse; mixed with plain members") {
    val a = "plain member".getBytes(ISO_8859_1)
    val b = "flagged member payload".getBytes(ISO_8859_1)
    val m1 = gzMember(a)
    val m2 = gzMemberWithFlags(b)
    val file = m1 ++ m2 ++ m1
    val got = new CdxOps.GzipMemberWalker(new ByteArrayInputStream(file)).toVector
    assert(got.length == 3)
    assert(java.util.Arrays.equals(got(1).data, b))
    assert(got(1).offset == m1.length && got(1).length == m2.length)
    assert(got(2).offset == m1.length + m2.length)
  }

  test("oversize member skipped in-stream (data null), walk continues exactly") {
    val big = new Array[Byte](200 << 10) // 200 KiB inflated
    java.util.Arrays.fill(big, 'x'.toByte)
    val small = "after the big one".getBytes(ISO_8859_1)
    val file = gzMember(big) ++ gzMember(small)
    val got = new CdxOps.GzipMemberWalker(
      new ByteArrayInputStream(file), maxInflatedBytes = 64 << 10).toVector
    assert(got.length == 2)
    assert(got(0).data == null) // oversize: surfaced, not thrown
    assert(java.util.Arrays.equals(got(1).data, small))
    assert(got(1).offset == got(0).length)
  }

  test("truncated tail: complete prefix stands, no throw") {
    val m1 = gzMember("keep me".getBytes(ISO_8859_1))
    val m2 = gzMember("i get truncated".getBytes(ISO_8859_1))
    val file = (m1 ++ m2).dropRight(7) // cut inside m2's trailer
    val got = new CdxOps.GzipMemberWalker(new ByteArrayInputStream(file)).toVector
    assert(got.length == 1)
    assert(new String(got(0).data, ISO_8859_1) == "keep me")
    // garbage after a valid member also ends cleanly
    val junk = m1 ++ "not gzip at all".getBytes(ISO_8859_1)
    val got2 = new CdxOps.GzipMemberWalker(new ByteArrayInputStream(junk)).toVector
    assert(got2.length == 1)
  }

  test("cdx rows: surt/ts/mime/status/digest semantics; warcinfo members skipped") {
    val warc = WarcOps.synthWarcGz(5) // warcinfo + 3 response records
    val rows = CdxOps.cdxIterator(
      new ByteArrayInputStream(warc), "f.warc.gz").toVector
    assert(rows.length == 3) // warcinfo indexed by absence
    assert(rows(0).surt == "example,warc-5)/p0")
    assert(rows(0).ts == "20250101000000")
    assert(rows(1).ts == "20250101000001")
    assert(rows(0).url == "https://warc-5.example/p0")
    assert(rows(0).mime == "text/html")
    assert(rows(0).status == 200)
    assert(rows(0).filename == "f.warc.gz")
    assert(rows.map(_.offset) == rows.map(_.offset).sorted)
    // digest: sha1 base32 of the payload, the CC convention
    val payload = WarcOps.pageHtml(5, 0).getBytes(ISO_8859_1)
    val expect = "sha1:" + base32(java.security.MessageDigest
      .getInstance("SHA-1").digest(payload))
    assert(rows(0).digest == expect)
  }

  test("sha1-base32 empty-payload vector (the pinned CC convention)") {
    val d = java.security.MessageDigest.getInstance("SHA-1").digest(Array.empty[Byte])
    assert(base32(d) == "3I42H3S6NNFQ2MSVX7XZKYAYSCX5QBYJ")
  }

  test("random-access fetch: one middle record by (offset, length) only") {
    val warc = WarcOps.synthWarcGz(8) // warcinfo + 3 responses
    val tmp = java.io.File.createTempFile("cdx", ".warc.gz")
    tmp.deleteOnExit()
    val fw = new java.io.FileOutputStream(tmp)
    try fw.write(warc) finally fw.close()
    val rows = CdxOps.cdxIterator(
      new ByteArrayInputStream(warc), tmp.getName).toVector
    val mid = rows(1)
    val conf = new org.apache.hadoop.conf.Configuration()
    val pg = CdxOps.fetchRecord(conf, tmp.getAbsolutePath, mid.offset, mid.length)
    assert(pg.isDefined)
    assert(pg.get.uri == "https://warc-8.example/p1")
    assert(new String(pg.get.html, ISO_8859_1) == WarcOps.pageHtml(8, 1))
    // hostile spans: wrong offset / absurd length -> None, never a throw
    assert(CdxOps.fetchRecord(conf, tmp.getAbsolutePath, mid.offset + 1, mid.length).isEmpty)
    assert(CdxOps.fetchRecord(conf, tmp.getAbsolutePath, 0, Long.MaxValue).isEmpty)
  }

  test("member walk agrees with GZIPInputStream over concatenated members") {
    val warc = WarcOps.synthWarcGz(3)
    val viaMembers = new CdxOps.GzipMemberWalker(new ByteArrayInputStream(warc))
      .toVector.flatMap(m => m.data)
    val gz = new java.util.zip.GZIPInputStream(new ByteArrayInputStream(warc))
    val all = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var r = gz.read(buf)
    while (r > 0) { all.write(buf, 0, r); r = gz.read(buf) }
    assert(viaMembers == all.toByteArray.toVector)
  }

  private def base32(b: Array[Byte]): String = {
    val alpha = "ABCDEFGHIJKLMNOPQRSTUVWXYZ234567"
    val sb = new java.lang.StringBuilder((b.length * 8 + 4) / 5)
    var buf = 0L
    var bits = 0
    b.foreach { x =>
      buf = (buf << 8) | (x & 0xffL); bits += 8
      while (bits >= 5) { sb.append(alpha(((buf >> (bits - 5)) & 31).toInt)); bits -= 5 }
    }
    if (bits > 0) sb.append(alpha(((buf << (5 - bits)) & 31).toInt))
    sb.toString
  }
}
