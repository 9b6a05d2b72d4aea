package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.spark.SitemapOps

/** sitemap parsing (SitemapOps): sitemaps.org protocol 0.9 — urlset /
  * sitemapindex / plain-text bodies, gzip variants (bounded inflate,
  * truncation tolerance), lenient XML handling (namespace prefixes,
  * CDATA, comments, entities, XML-declaration charsets), the protocol
  * entry cap, and the location-scope rule. */
class SitemapSpec extends AnyFunSuite {

  private def bytes(s: String): Array[Byte] = s.getBytes("UTF-8")

  private def gz(s: String): Array[Byte] = {
    val bo = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bo)
    g.write(bytes(s)); g.close()
    bo.toByteArray
  }

  test("urlset: loc/lastmod/changefreq/priority per entry") {
    val s = SitemapOps.parse(bytes(
      """<?xml version="1.0" encoding="UTF-8"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |<url><loc>https://ex.com/a</loc><lastmod>2025-01-01</lastmod>
        |<changefreq>DAILY</changefreq><priority>0.8</priority></url>
        |<url><loc>https://ex.com/b</loc></url>
        |</urlset>""".stripMargin))
    assert(s.kind == "urlset")
    assert(s.entries.length == 2)
    val a = s.entries(0)
    assert(a.loc == "https://ex.com/a" && a.lastmod == "2025-01-01" &&
      a.changefreq == "daily" && a.priority == 0.8)
    val b = s.entries(1)
    assert(b.loc == "https://ex.com/b" && b.lastmod == null &&
      b.changefreq == null && b.priority.isNaN)
  }

  test("sitemapindex: kind=index, lastmod carried") {
    val s = SitemapOps.parse(bytes(
      "<sitemapindex><sitemap><loc>https://ex.com/m1.xml</loc>" +
        "<lastmod>2024-06-01T12:00:00Z</lastmod></sitemap>" +
        "<sitemap><loc>https://ex.com/m2.xml.gz</loc></sitemap></sitemapindex>"))
    assert(s.kind == "index")
    assert(s.entries.map(_.loc).toSeq ==
      Seq("https://ex.com/m1.xml", "https://ex.com/m2.xml.gz"))
    assert(s.entries(0).lastmod == "2024-06-01T12:00:00Z")
  }

  test("gzip body round-trips; gz magic dispatch") {
    val xml = "<urlset><url><loc>https://ex.com/z</loc></url></urlset>"
    val s = SitemapOps.parse(gz(xml))
    assert(s.kind == "urlset" && s.entries.head.loc == "https://ex.com/z")
  }

  test("truncated gzip keeps the parsed prefix") {
    val xml = "<urlset>" + (1 to 50).map(i =>
      s"<url><loc>https://ex.com/p$i</loc></url>").mkString + "</urlset>"
    val full = gz(xml)
    val cut = java.util.Arrays.copyOf(full, full.length / 2)
    val s = SitemapOps.parse(cut)
    // some prefix of entries survives; never throws, never null-on-partial
    assert(s == null || (s.kind == "urlset" && s.entries.length < 50))
  }

  test("plain-text sitemap: URL lines only; junk skipped; non-sitemap text is null") {
    val s = SitemapOps.parse(bytes(
      "https://ex.com/one\nnot a url\nHTTP://EX.COM/TWO\n\n  https://ex.com/three  \n"))
    assert(s.kind == "text")
    assert(s.entries.map(_.loc).toSeq ==
      Seq("https://ex.com/one", "HTTP://EX.COM/TWO", "https://ex.com/three"))
    assert(SitemapOps.parse(bytes("just some prose\nwith lines")) == null)
  }

  test("entities, CDATA locs, namespace prefixes, comments") {
    val s = SitemapOps.parse(bytes(
      "<sm:urlset xmlns:sm=\"http://www.sitemaps.org/schemas/sitemap/0.9\">" +
        "<!-- a comment <url><loc>https://decoy/</loc></url> -->" +
        "<sm:url><sm:loc>https://ex.com/p?a=1&amp;b=2</sm:loc></sm:url>" +
        "<url><loc><![CDATA[https://ex.com/cd?x=<&>]]></loc></url>" +
        "</sm:urlset>"))
    assert(s.kind == "urlset")
    assert(s.entries.map(_.loc).toSeq ==
      Seq("https://ex.com/p?a=1&b=2", "https://ex.com/cd?x=<&>"))
  }

  test("XML-declaration encoding and UTF-16 BOM decode") {
    val latin = "<?xml version=\"1.0\" encoding=\"ISO-8859-1\"?>" +
      "<urlset><url><loc>https://ex.com/café</loc></url></urlset>"
    val s1 = SitemapOps.parse(latin.getBytes("ISO-8859-1"))
    assert(s1.entries.head.loc == "https://ex.com/café")
    val utf16 = "<urlset><url><loc>https://ex.com/u16</loc></url></urlset>"
    val withBom = Array[Byte](0xFF.toByte, 0xFE.toByte) ++ utf16.getBytes("UTF-16LE")
    val s2 = SitemapOps.parse(withBom)
    assert(s2.entries.head.loc == "https://ex.com/u16")
  }

  test("malformed input never throws: html decoy null, junk tags skipped, EOF entry kept") {
    assert(SitemapOps.parse(bytes("<html><body>hi</body></html>")) == null)
    assert(SitemapOps.parse(null) == null)
    assert(SitemapOps.parse(Array.emptyByteArray) == null)
    // unterminated final entry parses (truncation tolerance)
    val s = SitemapOps.parse(bytes(
      "<urlset><url><loc>https://ex.com/a</loc></url><url><loc>https://ex.com/b</loc>"))
    assert(s.entries.map(_.loc).toSeq == Seq("https://ex.com/a", "https://ex.com/b"))
    // entries without a valid absolute http(s) loc are skipped
    val t = SitemapOps.parse(bytes(
      "<urlset><url><loc>/relative</loc></url><url><loc>ftp://x/y</loc></url>" +
        "<url><loc>https://ok.com/</loc></url></urlset>"))
    assert(t.entries.map(_.loc).toSeq == Seq("https://ok.com/"))
    // invalid priority -> NaN, entry kept
    val p = SitemapOps.parse(bytes(
      "<urlset><url><loc>https://ex.com/a</loc><priority>high</priority></url></urlset>"))
    assert(p.entries.head.priority.isNaN)
  }

  test("protocol entry cap: 50 000") {
    val sb = new StringBuilder("<urlset>")
    (1 to 50010).foreach(i => sb.append(s"<url><loc>https://ex.com/$i</loc></url>"))
    sb.append("</urlset>")
    val s = SitemapOps.parseText(sb.toString)
    assert(s.entries.length == 50000)
  }

  test("location-scope rule: directory prefix, scheme/host/port, case") {
    import SitemapOps.inScope
    val sm = "https://Ex.com/catalog/sitemap.xml"
    assert(inScope(sm, "https://ex.com/catalog/p1")) // host case-insensitive
    assert(inScope(sm, "https://ex.com/catalog/sub/p2"))
    assert(!inScope(sm, "https://ex.com/other/p")) // outside the directory
    assert(!inScope(sm, "https://ex.com/Catalog/p")) // path case-sensitive
    assert(!inScope(sm, "http://ex.com/catalog/p")) // scheme mismatch
    assert(!inScope(sm, "https://other.com/catalog/p")) // host mismatch
    assert(!inScope(sm, "https://ex.com:8443/catalog/p")) // port mismatch
    assert(inScope("https://ex.com:443/catalog/s.xml", "https://ex.com/catalog/p")) // default port
    // root sitemap covers the whole host
    assert(inScope("https://ex.com/sitemap.xml", "https://ex.com/any/depth/p"))
    // sitemap URL with no path: normalize supplies "/"
    assert(inScope("https://ex.com", "https://ex.com/p"))
    assert(!inScope(null, "https://ex.com/p") && !inScope(sm, null))
  }
}
