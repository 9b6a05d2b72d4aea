package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.spark.FeedOps

/** feed parsing (FeedOps): RSS 2.0, RSS 1.0/RDF and Atom field mapping,
  * the Atom link-rel rule, channel vs entry titles, CDATA/entities,
  * truncation tolerance, the entry cap, and the null channels. */
class FeedSpec extends AnyFunSuite {

  private def bytes(s: String): Array[Byte] = s.getBytes("UTF-8")

  test("rss 2.0: channel title, item title/link/pubDate/guid") {
    val f = FeedOps.parse(bytes(
      """<?xml version="1.0"?><rss version="2.0"><channel>
        |<title>Chan</title><link>https://ex.com/</link>
        |<item><title>A</title><link>https://ex.com/a</link>
        |<pubDate>Mon, 01 Jan 2024 00:00:00 GMT</pubDate>
        |<guid isPermaLink="false">g-a</guid></item>
        |<item><title>B</title><link>https://ex.com/b</link></item>
        |</channel></rss>""".stripMargin))
    assert(f.kind == "rss" && f.title == "Chan")
    assert(f.entries.length == 2)
    val a = f.entries(0)
    assert(a.title == "A" && a.link == "https://ex.com/a" &&
      a.published == "Mon, 01 Jan 2024 00:00:00 GMT" && a.id == "g-a")
    val b = f.entries(1)
    assert(b.title == "B" && b.link == "https://ex.com/b" &&
      b.published == null && b.id == null)
  }

  test("channel link is not an entry link (rss)") {
    val f = FeedOps.parse(bytes(
      "<rss><channel><link>https://chan.ex/</link>" +
        "<item><title>t</title></item></channel></rss>"))
    assert(f.entries.head.link == null)
  }

  test("atom: entry link rel rule, published over updated, id") {
    val f = FeedOps.parse(bytes(
      """<feed xmlns="http://www.w3.org/2005/Atom"><title>AT</title>
        |<link href="https://ex.org/" rel="self"/>
        |<entry><title>E1</title>
        |<link rel="self" href="https://ex.org/e1.atom"/>
        |<link rel="alternate" href="https://ex.org/e1"/>
        |<id>tag:e1</id><published>2024-02-02T00:00:00Z</published>
        |<updated>2024-03-03T00:00:00Z</updated></entry>
        |<entry><title>E2</title><link href="https://ex.org/e2"/>
        |<updated>2024-04-04T00:00:00Z</updated></entry>
        |</feed>""".stripMargin))
    assert(f.kind == "atom" && f.title == "AT")
    val e1 = f.entries(0)
    assert(e1.link == "https://ex.org/e1" && e1.id == "tag:e1" &&
      e1.published == "2024-02-02T00:00:00Z")
    val e2 = f.entries(1)
    assert(e2.link == "https://ex.org/e2" && e2.published == "2024-04-04T00:00:00Z")
  }

  test("rdf (rss 1.0): items at top level, dc:date maps to published") {
    val f = FeedOps.parse(bytes(
      """<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
        | xmlns:dc="http://purl.org/dc/elements/1.1/">
        |<channel rdf:about="https://ex.net/"><title>R1</title></channel>
        |<item rdf:about="https://ex.net/x"><title>X</title>
        |<link>https://ex.net/x</link><dc:date>2024-05-05</dc:date></item>
        |</rdf:RDF>""".stripMargin))
    assert(f.kind == "rdf" && f.title == "R1")
    val x = f.entries.head
    assert(x.title == "X" && x.link == "https://ex.net/x" && x.published == "2024-05-05")
  }

  test("CDATA and entities in titles") {
    val f = FeedOps.parse(bytes(
      "<rss><channel><item><title><![CDATA[a <b> c]]></title></item>" +
        "<item><title>x &amp; y</title></item></channel></rss>"))
    assert(f.entries(0).title == "a <b> c")
    assert(f.entries(1).title == "x & y")
  }

  test("truncated feed keeps complete prefix + open entry") {
    val f = FeedOps.parse(bytes(
      "<rss><channel><item><title>done</title></item>" +
        "<item><title>partial</title><link>https://ex.com/p"))
    assert(f.entries.map(_.title).toSeq == Seq("done", "partial"))
  }

  test("non-feed bodies yield null") {
    assert(FeedOps.parse(bytes("<html><body>x</body></html>")) == null)
    assert(FeedOps.parse(bytes("just text")) == null)
    assert(FeedOps.parse(null) == null)
  }

  test("gzip feed body inflates via the shared decode") {
    val bo = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bo)
    g.write(bytes("<rss><channel><item><title>gz</title></item></channel></rss>"))
    g.close()
    val f = FeedOps.parse(bo.toByteArray)
    assert(f.kind == "rss" && f.entries.head.title == "gz")
  }

  test("entry cap bounds hostile input") {
    val many = "<rss><channel>" +
      (1 to 10500).map(i => s"<item><title>t$i</title></item>").mkString +
      "</channel></rss>"
    val f = FeedOps.parse(bytes(many))
    assert(f.entries.length == 10000)
  }

  test("empty elements never produce phantom entries") {
    val f = FeedOps.parse(bytes("<rss><channel><item></item>" +
      "<item><title></title></item><item><title>real</title></item></channel></rss>"))
    assert(f.entries.map(_.title).toSeq == Seq("real"))
  }

  test("unquoted and single-quoted atom href attrs") {
    val f = FeedOps.parse(bytes(
      "<feed><entry><title>u</title><link href=https://ex.io/u /></entry>" +
        "<entry><title>q</title><link href='https://ex.io/q'/></entry></feed>"))
    assert(f.entries(0).link == "https://ex.io/u")
    assert(f.entries(1).link == "https://ex.io/q")
  }
}
