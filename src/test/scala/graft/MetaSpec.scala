package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.spark.{Extractor, MetaOps}

/** page-metadata extraction (MetaOps): title collapse rule, meta
  * descriptor matching (name/property, case-insensitivity, first-wins,
  * entity decode), document language, JSON-LD type-essence matching,
  * and the null channels. */
class MetaSpec extends AnyFunSuite {

  private def parsed(html: String): MetaOps.Parsed =
    MetaOps.extract(Extractor.parseBytes(html.getBytes("UTF-8")))

  test("title: first wins, entity-decoded, whitespace-collapsed") {
    val p = parsed("<html><head><title>  A &amp;\n\t B  </title>" +
      "<title>second</title></head><body><title>third</title></body></html>")
    assert(p.meta.title == "A & B")
  }

  test("title is RCDATA: markup stays literal text") {
    val p = parsed("<title>Hello <b>wor</b>ld</title>")
    assert(p.meta.title == "Hello <b>wor</b>ld")
  }

  test("title absent vs empty") {
    assert(parsed("<p>no title</p>").meta.title == null)
    assert(parsed("<title>   </title>").meta.title == "")
  }

  test("meta descriptors: case-insensitive names, first occurrence wins") {
    val p = parsed(
      "<META NAME=\"Description\" CONTENT=\"first desc\">" +
        "<meta name=\"description\" content=\"second desc\">" +
        "<meta name=\"KEYWORDS\" content=\" a, b \">")
    assert(p.meta.description == "first desc")
    assert(p.meta.keywords == "a, b")
  }

  test("og: property or name attribute both match; twitter card") {
    val p = parsed(
      "<meta property=\"og:title\" content=\"OG T\">" +
        "<meta name=\"og:image\" content=\"https://i.ex/x.png\">" +
        "<meta property=\"OG:TYPE\" content=\"article\">" +
        "<meta name=\"twitter:card\" content=\"summary\">")
    assert(p.meta.ogTitle == "OG T")
    assert(p.meta.ogImage == "https://i.ex/x.png")
    assert(p.meta.ogType == "article")
    assert(p.meta.twitterCard == "summary")
  }

  test("content entity-decoded + trimmed, internal whitespace kept") {
    val p = parsed("<meta name=\"description\" content=\" a &lt;b&gt;  c \">")
    assert(p.meta.description == "a <b>  c")
  }

  test("empty content is absent, not empty string") {
    val p = parsed("<meta name=\"description\" content=\"\">" +
      "<meta name=\"description\" content=\"later\">")
    assert(p.meta.description == "later")
  }

  test("lang from the html element, trimmed") {
    assert(parsed("<html lang=\" en-US \"><body>x</body></html>").meta.lang == "en-US")
    assert(parsed("<html><body>x</body></html>").meta.lang == null)
  }

  test("json-ld: essence match, parameters and case ignored, doc order") {
    val p = parsed(
      "<script type=\"application/ld+json\">{\"@type\":\"A\"}</script>" +
        "<script type=\" Application/LD+JSON ; charset=utf-8\"> {\"@type\":\"B\"} </script>" +
        "<script type=\"text/javascript\">var x=1;</script>" +
        "<script>plain</script>")
    assert(p.jsonLd.toSeq == Seq("{\"@type\":\"A\"}", "{\"@type\":\"B\"}"))
  }

  test("json-ld payload is raw script text (no entity decode)") {
    val p = parsed("<script type=\"application/ld+json\">{\"a\":\"x&amp;y\"}</script>")
    assert(p.jsonLd.head == "{\"a\":\"x&amp;y\"}")
  }

  test("codegen null channels") {
    assert(MetaOps.titleCodegenBinary(null) == null)
    assert(MetaOps.metaCodegenBinary(null) == null)
    assert(MetaOps.jsonLdCodegenBinary(null) == null)
    // no metadata at all: struct of nulls + empty jsonld, not null row
    val row = MetaOps.metaCodegenBinary("<p>x</p>".getBytes("UTF-8"))
    assert(row != null && (0 until 10).forall(row.isNullAt))
    assert(MetaOps.jsonLdCodegenBinary("<p>x</p>".getBytes("UTF-8")).numElements() == 0)
  }

  test("title codegen binary matches string path") {
    val h = "<title> T&eacute;st  x </title>"
    val b = MetaOps.titleCodegenBinary(h.getBytes("UTF-8"))
    val s = MetaOps.titleCodegen(org.apache.spark.unsafe.types.UTF8String.fromString(h))
    assert(b.toString == "Tést x" && s.toString == "Tést x")
  }
}
