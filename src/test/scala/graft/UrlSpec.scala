package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.query.Vis
import graft.spark.{Extractor, UrlOps}
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** URL tier (UrlOps + extract_links): RFC 3986 §5.2 reference resolution
  * validated against the RFC's own §5.4 example tables, §6.2.2-3
  * normalization, host / registrable-domain extraction, and link
  * extraction honoring `<base href>` with entity-decoded hrefs. */
class UrlSpec extends AnyFunSuite {

  // ------------------------------------------ RFC 3986 §5.4 example tables

  private val Base = "http://a/b/c/d;p?q"

  private val normalExamples = Seq(
    "g:h" -> "g:h",
    "g" -> "http://a/b/c/g",
    "./g" -> "http://a/b/c/g",
    "g/" -> "http://a/b/c/g/",
    "/g" -> "http://a/g",
    "//g" -> "http://g",
    "?y" -> "http://a/b/c/d;p?y",
    "g?y" -> "http://a/b/c/g?y",
    "#s" -> "http://a/b/c/d;p?q#s",
    "g#s" -> "http://a/b/c/g#s",
    "g?y#s" -> "http://a/b/c/g?y#s",
    ";x" -> "http://a/b/c/;x",
    "g;x" -> "http://a/b/c/g;x",
    "g;x?y#s" -> "http://a/b/c/g;x?y#s",
    "" -> "http://a/b/c/d;p?q",
    "." -> "http://a/b/c/",
    "./" -> "http://a/b/c/",
    ".." -> "http://a/b/",
    "../" -> "http://a/b/",
    "../g" -> "http://a/b/g",
    "../.." -> "http://a/",
    "../../" -> "http://a/",
    "../../g" -> "http://a/g")

  private val abnormalExamples = Seq(
    "../../../g" -> "http://a/g",
    "../../../../g" -> "http://a/g",
    "/./g" -> "http://a/g",
    "/../g" -> "http://a/g",
    "g." -> "http://a/b/c/g.",
    ".g" -> "http://a/b/c/.g",
    "g.." -> "http://a/b/c/g..",
    "..g" -> "http://a/b/c/..g",
    "./../g" -> "http://a/b/g",
    "./g/." -> "http://a/b/c/g/",
    "g/./h" -> "http://a/b/c/g/h",
    "g/../h" -> "http://a/b/c/h",
    "g;x=1/./y" -> "http://a/b/c/g;x=1/y",
    "g;x=1/../y" -> "http://a/b/c/y",
    "g?y/./x" -> "http://a/b/c/g?y/./x",
    "g?y/../x" -> "http://a/b/c/g?y/../x",
    "g#s/./x" -> "http://a/b/c/g#s/./x",
    "g#s/../x" -> "http://a/b/c/g#s/../x",
    "http:g" -> "http:g") // strict mode

  test("resolve matches every RFC 3986 §5.4.1 normal example") {
    normalExamples.foreach { case (ref, want) =>
      assert(UrlOps.resolve(Base, ref) == want, s"ref <$ref>")
    }
  }

  test("resolve matches every RFC 3986 §5.4.2 abnormal example") {
    abnormalExamples.foreach { case (ref, want) =>
      assert(UrlOps.resolve(Base, ref) == want, s"ref <$ref>")
    }
  }

  test("resolve edge contract: null / relative base / trim") {
    assert(UrlOps.resolve(null, "g") == null)
    assert(UrlOps.resolve(Base, null) == null)
    assert(UrlOps.resolve("/just/a/path", "g") == null) // base must be absolute
    assert(UrlOps.resolve(Base, "  g  ") == "http://a/b/c/g") // HTML strips ws
    // authority-less base (mailto-style): merge per §5.2.3 first branch
    assert(UrlOps.resolve("mailto:x@y", "") == "mailto:x@y")
    // a scheme-ful ref never consults the base (§5.2.2): it resolves
    // even against a garbage/relative/null base
    assert(UrlOps.resolve("not-absolute", "http://x.com/a/../b") == "http://x.com/b")
    assert(UrlOps.resolve(null, "https://x.com/y") == "https://x.com/y")
    // WHATWG pre-parse: tab/CR/LF strip ANYWHERE (hrefs wrap in source)
    assert(UrlOps.resolve(Base, "lo\nng/pa\tth") == "http://a/b/c/long/path")
    // §5.3 "//" guard: authority-less path starting "//" must not
    // re-parse as an authority
    assert(UrlOps.resolve("mailto:a/b", "..//c") == "mailto:/.//c")
  }

  // ------------------------------------------------------ §6.2 normalization

  test("normalize: case, default ports, dot segments, percent-encoding") {
    assert(UrlOps.normalize("HTTP://Ex.COM:80/a/../b%2f?x=%41") == "http://ex.com/b%2F?x=A")
    assert(UrlOps.normalize("https://EX.com:443/") == "https://ex.com/")
    assert(UrlOps.normalize("https://ex.com:8443/p") == "https://ex.com:8443/p") // non-default kept
    assert(UrlOps.normalize("http://ex.com") == "http://ex.com/") // empty path -> "/"
    assert(UrlOps.normalize("http://ex.com/p#frag") == "http://ex.com/p") // fragment dropped
    assert(UrlOps.normalize("http://u:p@Ex.com/q") == "http://u:p@ex.com/q") // userinfo kept
    assert(UrlOps.normalize("http://ex.com/%7euser") == "http://ex.com/~user") // unreserved decodes
    assert(UrlOps.normalize("http://ex.com/a%ZZb") == "http://ex.com/a%ZZb") // malformed escape passes
    assert(UrlOps.normalize("no-scheme/path") == null)
    assert(UrlOps.normalize(null) == null)
    // bracketed IPv6: ':' inside brackets is not a port separator
    assert(UrlOps.normalize("http://[2001:DB8::1]:80/x") == "http://[2001:db8::1]/x")
    // host escapes decode BEFORE case folding: one crawl identity
    assert(UrlOps.normalize("http://ex%41mple.com/") == "http://example.com/")
    assert(UrlOps.normalize("http://ex\tample.com/a\nb") == "http://example.com/ab")
  }

  test("host and registrableDomain") {
    assert(UrlOps.host("https://WWW.Example.COM:8080/p") == "www.example.com")
    assert(UrlOps.host("https://u@host.io/p") == "host.io")
    assert(UrlOps.host("https://[2001:DB8::1]/p") == "2001:db8::1")
    assert(UrlOps.host("/relative") == null)
    assert(UrlOps.host(null) == null)
    assert(UrlOps.host("https://ex%41mple.com/x") == "example.com") // canon matches normalize
    assert(UrlOps.registrableDomain("https://a.b.example.com/x") == "example.com")
    assert(UrlOps.registrableDomain("https://sub.team.co.uk/x") == "team.co.uk")
    assert(UrlOps.registrableDomain("https://example.org/") == "example.org")
    assert(UrlOps.registrableDomain("https://192.168.0.1:8080/x") == "192.168.0.1")
    assert(UrlOps.registrableDomain("https://[2001:db8::1]/x") == "2001:db8::1")
  }

  // --------------------------------------------------------- extract_links

  private def links(html: String, base: String): Seq[String] = {
    val ad = Extractor.extractLinksCodegenBinary(
      html.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      if (base == null) null else UTF8String.fromString(base))
    if (ad == null) null
    else ad.toObjectArray(StringType).map(_.asInstanceOf[UTF8String].toString).toSeq
  }

  private def anchors(html: String, base: String): Seq[(String, String)] = {
    val ad = Extractor.extractAnchorsCodegenBinary(
      if (html == null) null
      else html.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      if (base == null) null else UTF8String.fromString(base))
    if (ad == null) null
    else (0 until ad.numElements()).map { i =>
      val r = ad.getStruct(i, 2)
      (r.getUTF8String(0).toString, r.getUTF8String(1).toString)
    }
  }

  test("url_surt: the CDX canonical key") {
    assert(UrlOps.surt("https://User@WWW.Example.COM:443/A/b?b=2&a=1#f") ==
      "com,example)/a/b?a=1&b=2")
    assert(UrlOps.surt("http://example.com") == "com,example)/")
    // one leading www/www<digits> label strips; inner ones don't
    assert(UrlOps.surt("http://www2.example.com/") == "com,example)/")
    assert(UrlOps.surt("http://sub.www2.example.com/x") == "com,example,www2,sub)/x")
    // a 2-label host never strips www (it IS the host)
    assert(UrlOps.surt("http://www.com/") == "com,www)/")
    // non-default port kept before the ')'
    assert(UrlOps.surt("http://www.example.com:8080/P") == "com,example:8080)/p")
    // IP literals are not reversed
    assert(UrlOps.surt("http://192.168.0.1/a") == "192.168.0.1)/a")
    assert(UrlOps.surt("http://[2001:DB8::1]:8080/") == "[2001:db8::1]:8080)/")
    // bytewise query sort; bare keys sort with the k=v strings
    assert(UrlOps.surt("http://ex.com/p?z&a=2&a=10") == "com,ex)/p?a=10&a=2&z")
    // host-adjacency property: same host, subdomain, same domain share prefixes
    assert(UrlOps.surt("https://a.ex.com/1").startsWith("com,ex,a)"))
    assert(UrlOps.surt("https://b.ex.com/1").startsWith("com,ex,"))
    // relative / unparseable -> null
    assert(UrlOps.surt("www.ex.com/p") == null)
    assert(UrlOps.surt(null) == null)
  }

  test("extract_anchors: href like extract_links plus the anchor text") {
    val html = """<a href="../up.html">up &amp; away</a>
                 |<a href="sub/x.html"> go <b>now</b> </a>
                 |<a href="mailto:a@b.c">mail me</a>
                 |<a href="/r">last</a>""".stripMargin
    assert(anchors(html, "https://EX.com/dir/page.html") == Seq(
      ("https://ex.com/up.html", "up & away"),
      ("https://ex.com/dir/sub/x.html", " go now "),
      ("mailto:a@b.c", "mail me"),
      ("https://ex.com/r", "last")))
    assert(anchors("<p>no links</p>", "https://ex.com/") == Seq.empty)
    assert(anchors(null, "https://ex.com/") == null)
  }

  test("extract_links resolves + normalizes in document order") {
    val html = """<p><a href="../up.html">u</a><a href="sub/x.html">s</a>
                 |<a href="//other.org/p">o</a><a href="?x=1">q</a></p>""".stripMargin
    assert(links(html, "https://EX.Example.COM/dir/page.html") == Seq(
      "https://ex.example.com/up.html",
      "https://ex.example.com/dir/sub/x.html",
      "https://other.org/p",
      "https://ex.example.com/dir/page.html?x=1"))
  }

  test("extract_links honors the first <base href> (document-base rule)") {
    val html = """<head><base href="https://cdn.net/assets/"><base href="https://ignored.net/"></head>
                 |<body><a href="img/i.png">i</a><a href="/root.css">r</a></body>""".stripMargin
    assert(links(html, "https://ex.com/dir/page.html") == Seq(
      "https://cdn.net/assets/img/i.png",
      "https://cdn.net/root.css"))
    // relative base href resolves against the page URL first
    val html2 = """<base href="sub/"><a href="x">x</a>"""
    assert(links(html2, "https://ex.com/dir/page.html") == Seq(
      "https://ex.com/dir/sub/x"))
  }

  test("extract_links decodes entities in hrefs without touching attr()") {
    val html = """<a href="/s?a=1&amp;b=2">x</a>"""
    assert(links(html, "https://ex.com/") == Seq("https://ex.com/s?a=1&b=2"))
    // attr() itself stays raw-source (reference parity)
    val root = Vis.loadOrThrow(html)
    assert(root.find("a").attr("href").get.value == "/s?a=1&amp;b=2")
  }

  test("extract_links tolerance: fragments fold, garbage skips, null base") {
    val html = """<a href="#top">t</a><a href="mailto:a@b.c">m</a><a href="x">x</a>"""
    assert(links(html, "https://ex.com/p") == Seq(
      "https://ex.com/p", "mailto:a@b.c", "https://ex.com/x"))
    assert(links(html, null) == null)
    // relative base URL: relative hrefs drop, but scheme-ful hrefs are
    // self-sufficient and survive (the link graph keeps absolute links
    // even when the record's own URL is garbage)
    assert(links("""<a href="x">x</a>""", "not-absolute") == Seq())
    assert(links("""<a href="x">x</a><a href="https://x.com/y">y</a>""",
      "not-absolute") == Seq("https://x.com/y"))
  }

  private def canon(html: String, base: String): String = {
    val r = Extractor.extractCanonicalCodegenBinary(
      html.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      if (base == null) null else UTF8String.fromString(base))
    if (r == null) null else r.toString
  }

  private def refresh(html: String, base: String): String = {
    val r = Extractor.extractRefreshCodegenBinary(
      html.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      if (base == null) null else UTF8String.fromString(base))
    if (r == null) null else r.toString
  }

  test("extract_canonical: rel token list, base tag, first wins, decoys") {
    val B = "https://m.ex.com/p.html"
    assert(canon("""<link rel="canonical" href="/c/1">""", B) == "https://m.ex.com/c/1")
    // rel is a case-insensitive token LIST
    assert(canon("""<link rel="alternate Canonical" href="x">""", B) == "https://m.ex.com/x")
    // first canonical wins; stylesheet decoy ignored
    assert(canon("""<link rel="stylesheet" href="/s.css">""" +
      """<link rel="canonical" href="/a"><link rel="canonical" href="/b">""", B) ==
      "https://m.ex.com/a")
    // base tag applies
    assert(canon("""<base href="https://b.org/d/"><link rel="canonical" href="x">""", B) ==
      "https://b.org/d/x")
    assert(canon("""<p>no links</p>""", B) == null)
    assert(canon("""<link rel="canonical" href="/c">""", null) == null)
  }

  test("extract_refresh: WHATWG content grammar variants") {
    val B = "https://m.ex.com/p.html"
    assert(refresh("""<meta http-equiv="Refresh" content="5; URL='/next/1'">""", B) ==
      "https://m.ex.com/next/1")
    assert(refresh("""<meta http-equiv="refresh" content="0;url=/n">""", B) ==
      "https://m.ex.com/n")
    assert(refresh("""<meta http-equiv="refresh" content="2 , url = /spaced">""", B) ==
      "https://m.ex.com/spaced")
    // bare target without url= prefix
    assert(refresh("""<meta http-equiv="refresh" content="3; /bare">""", B) ==
      "https://m.ex.com/bare")
    // delay-only refresh carries no redirect edge
    assert(refresh("""<meta http-equiv="refresh" content="30">""", B) == null)
    // plain whitespace is a valid separator after the delay (WHATWG)
    assert(refresh("""<meta http-equiv="refresh" content="0 url=/ws">""", B) ==
      "https://m.ex.com/ws")
    // quoted target truncates at its CLOSE quote
    assert(refresh("""<meta http-equiv="refresh" content="0; url='/a'x">""", B) ==
      "https://m.ex.com/a")
    // no delay digits = invalid declaration, not a redirect
    assert(refresh("""<meta http-equiv="refresh" content=";url=/x">""", B) == null)
    // entity-encoded rel/http-equiv values decode before matching
    assert(canon("""<link rel="canonical&#32;alternate" href="/ec">""", B) ==
      "https://m.ex.com/ec")
    // content-type decoy ignored
    assert(refresh("""<meta http-equiv="content-type" content="text/html">""", B) == null)
    assert(refresh("""<p>none</p>""", B) == null)
  }

}
