package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.spark.WarcOps

/** WARC (ISO 28500) source parsing: real Content-Length-framed records,
  * HTTP splitting, crawl tolerance on truncation/corruption. */
class WarcOpsSpec extends AnyFunSuite {

  test("synthesized WARC round-trips: responses only, uris/dates/bodies intact") {
    (0L until 40L).foreach { id =>
      val bytes = WarcOps.synthWarc(id)
      assert(new String(bytes.take(8), "ISO-8859-1") == "WARC/1.0")
      val pages = WarcOps.parseWarc(bytes)
      assert(pages.length == WarcOps.pagesPerWarc(id), s"id=$id")
      pages.zipWithIndex.foreach { case (pg, p) =>
        assert(pg.uri == WarcOps.pageUri(id, p))
        assert(new String(pg.html, "ISO-8859-1") == WarcOps.pageHtml(id, p))
      }
    }
  }

  test("the warcinfo record is framed over, never surfaced as a page") {
    val pages = WarcOps.parseWarc(WarcOps.synthWarc(5L))
    assert(pages.forall(_.uri.startsWith("https://warc-5")))
  }

  test("Content-Length framing: an html body containing CRLFCRLF and WARC/ text stays one page") {
    // bodies are framed by length, never scanned for separators
    val body = "<p>a</p>\r\n\r\nWARC/1.0\r\n\r\n<p>b</p>"
    val http = s"HTTP/1.1 200 OK\r\n\r\n$body"
    val rec = s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: u\r\n" +
      s"Content-Length: ${http.length}\r\n\r\n$http\r\n\r\n"
    val pages = WarcOps.parseWarc(rec.getBytes("ISO-8859-1"))
    assert(pages.length == 1)
    assert(new String(pages.head.html, "ISO-8859-1") == body)
  }

  test("truncation keeps the complete prefix; garbage never throws") {
    val full = WarcOps.synthWarc(2L) // 3 response records
    val all = WarcOps.parseWarc(full)
    assert(all.length == 3)
    // cut inside the LAST record: first two survive
    val cut = java.util.Arrays.copyOf(full, full.length - 20)
    val kept = WarcOps.parseWarc(cut)
    assert(kept.length == 2, s"kept ${kept.length}")
    // random garbage / empty / null: empty result, no throw
    assert(WarcOps.parseWarc(null).isEmpty)
    assert(WarcOps.parseWarc(Array.empty[Byte]).isEmpty)
    assert(WarcOps.parseWarc("not a warc at all".getBytes).isEmpty)
    val rnd = new scala.util.Random(7)
    (0 until 200).foreach { _ =>
      val junk = new Array[Byte](rnd.nextInt(300))
      rnd.nextBytes(junk)
      WarcOps.parseWarc(junk) // never a throw
      WarcOps.parseWarc("WARC/1.0\r\n".getBytes ++ junk)
    }
    // single-byte mutations across a valid file's header region
    (0 until math.min(full.length, 120)).foreach { pos =>
      val m = full.clone()
      m(pos) = (m(pos) ^ 0x5a).toByte
      WarcOps.parseWarc(m) // any prefix outcome is legal, a throw is not
    }
  }

  test(".warc.gz: per-record gzip members round-trip; auto dispatch; corrupt gz never throws") {
    (0L until 20L).foreach { id =>
      val gz = WarcOps.synthWarcGz(id)
      assert((gz(0) & 0xFF) == 0x1F && (gz(1) & 0xFF) == 0x8B)
      val viaGz = WarcOps.parseWarcGz(gz)
      val plain = WarcOps.parseWarc(WarcOps.synthWarc(id))
      assert(viaGz.map(_.uri) == plain.map(_.uri), s"id=$id")
      assert(viaGz.zip(plain).forall { case (a, b) => a.html.sameElements(b.html) })
      // one dispatch entry serves both layouts
      assert(WarcOps.parseWarcAuto(gz).length == plain.length)
      assert(WarcOps.parseWarcAuto(WarcOps.synthWarc(id)).length == plain.length)
    }
    // corrupt gzip: empty result, no throw
    val gz = WarcOps.synthWarcGz(3L)
    val bad = gz.clone(); bad(gz.length / 2) = (bad(gz.length / 2) ^ 0x7f).toByte
    WarcOps.parseWarcGz(bad) // any prefix outcome legal, a throw is not
    assert(WarcOps.parseWarcGz("not gzip".getBytes).isEmpty)
    assert(WarcOps.parseWarcGz(null).isEmpty)
  }

  test("case-insensitive headers and tolerant separators") {
    val body = "<p>ok</p>"
    val http = s"HTTP/1.1 200 OK\r\n\r\n$body"
    val rec = s"WARC/1.0\r\nwarc-type: RESPONSE\r\nWARC-TARGET-URI: u2\r\n" +
      s"content-length: ${http.length}\r\n\r\n$http\r\n\r\n"
    // "RESPONSE" value is case-SENSITIVE per our parse (warc-type values
    // are lowercase in the wild); lowercase type parses
    val rec2 = rec.replace("RESPONSE", "response")
    val pages = WarcOps.parseWarc(rec2.getBytes("ISO-8859-1"))
    assert(pages.length == 1 && pages.head.uri == "u2")
  }

  test("HTTP Content-Type surfaces on the page (the charset transport signal)") {
    def rec(httpHeaders: String, body: Array[Byte]): Array[Byte] = {
      val head = s"HTTP/1.1 200 OK\r\n$httpHeaders\r\n".getBytes("ISO-8859-1")
      val http = head ++ body
      (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: u\r\n" +
        s"Content-Length: ${http.length}\r\n\r\n").getBytes("ISO-8859-1") ++
        http ++ "\r\n\r\n".getBytes("ISO-8859-1")
    }
    val p1 = WarcOps.parseWarc(rec(
      "Content-Type: text/html; charset=windows-1251\r\nServer: x\r\n",
      "<p>ok</p>".getBytes("ISO-8859-1"))).head
    assert(p1.contentType == "text/html; charset=windows-1251")
    // case-insensitive name, missing header -> null
    val p2 = WarcOps.parseWarc(rec("CONTENT-TYPE: text/plain\r\n",
      "x".getBytes)).head
    assert(p2.contentType == "text/plain")
    val p3 = WarcOps.parseWarc(rec("Server: y\r\n", "x".getBytes)).head
    assert(p3.contentType == null)
    // headerless response (no CRLFCRLF): whole body is the page, ct null
    val raw = ("WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 3\r\n\r\n" +
      "abc\r\n\r\n").getBytes("ISO-8859-1")
    assert(WarcOps.parseWarc(raw).head.contentType == null)
  }

  test("non-UTF-8 WARC page decodes through CharsetOps via the Content-Type") {
    val text = "<p>привет мир</p>"
    val body = text.getBytes("windows-1251")
    val head = ("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=windows-1251\r\n\r\n")
      .getBytes("ISO-8859-1")
    val http = head ++ body
    val rec = (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: u\r\n" +
      s"Content-Length: ${http.length}\r\n\r\n").getBytes("ISO-8859-1") ++
      http ++ "\r\n\r\n".getBytes("ISO-8859-1")
    val pg = WarcOps.parseWarc(rec).head
    val utf8 = graft.spark.CharsetOps.toUtf8(pg.html, pg.contentType)
    assert(new String(utf8, "UTF-8") == text)
  }

  test("headers map: lowercase names, first-wins repeats, empty without framing") {
    val body = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
      "Set-Cookie: a=1\r\nSet-Cookie: b=2\r\nX-Empty:\r\n\r\nhi"
    val b = body.getBytes("ISO-8859-1")
    val rec = (s"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: ${b.length}\r\n\r\n")
      .getBytes("ISO-8859-1") ++ b ++ "\r\n\r\n".getBytes("ISO-8859-1")
    val pg = WarcOps.parseWarc(rec).head
    assert(pg.headers("content-type") == "text/html")
    assert(pg.headers("set-cookie") == "a=1") // first occurrence wins
    assert(pg.headers("x-empty") == "")
    assert(pg.contentType == "text/html")
    // no HTTP framing → no headers map
    val raw = ("WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 2\r\n\r\nhi\r\n\r\n")
      .getBytes("ISO-8859-1")
    assert(WarcOps.parseWarc(raw).head.headers == null)
  }

  test("HTTP envelope: status code and Location surface on the page") {
    def rec(http: String): Array[Byte] = {
      val b = http.getBytes("ISO-8859-1")
      (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: u\r\n" +
        s"Content-Length: ${b.length}\r\n\r\n").getBytes("ISO-8859-1") ++
        b ++ "\r\n\r\n".getBytes("ISO-8859-1")
    }
    val ok = WarcOps.parseWarc(rec("HTTP/1.1 200 OK\r\n\r\n<p>x</p>")).head
    assert(ok.status == 200 && ok.location == null)
    val moved = WarcOps.parseWarc(rec(
      "HTTP/1.1 301 Moved Permanently\r\nLocation: https://n.ex/v\r\n\r\n")).head
    assert(moved.status == 301 && moved.location == "https://n.ex/v")
    val rel = WarcOps.parseWarc(rec(
      "HTTP/1.0 302 Found\r\nlocation: /rel\r\n\r\n")).head
    assert(rel.status == 302 && rel.location == "/rel")
    // no HTTP framing (no CRLFCRLF): whole body is the page, status -1
    val raw = ("WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 8\r\n\r\n" +
      "<p>r</p>\r\n\r\n").getBytes("ISO-8859-1")
    val rp = WarcOps.parseWarc(raw).head
    assert(rp.status == -1 && rp.location == null && new String(rp.html) == "<p>r</p>")
    // header block present but the status line is not HTTP-shaped
    val odd = WarcOps.parseWarc(rec("ICY 200 OK\r\nA: b\r\n\r\nbody")).head
    assert(odd.status == -1 && new String(odd.html) == "body")
    // malformed digits never throw
    val bad = WarcOps.parseWarc(rec("HTTP/1.1 2x0 Odd\r\n\r\nz")).head
    assert(bad.status == -1)
  }
}
