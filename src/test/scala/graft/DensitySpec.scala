package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.spark.DensityExtract
import java.nio.charset.StandardCharsets.UTF_8

/** pins the density-extraction rules: prune set, block segmentation,
  * whitespace collapse, the >=25-char length gate, the <=1/3
  * link-density gate, document-order '\n' join. */
class DensitySpec extends AnyFunSuite {

  private def ext(html: String): String = {
    val u = DensityExtract.extractCodegenBinary(
      if (html == null) null else html.getBytes(UTF_8))
    if (u == null) null else u.toString
  }

  test("boilerplate containers pruned, long low-link blocks kept") {
    val html =
      """<html><head><title>T</title><style>p{}</style></head><body>
        |<nav><a href="/">Home</a> <a href="/a">About</a></nav>
        |<div class="menu"><a>one</a> <a>two</a> <a>three</a></div>
        |<p>This is the article body 7 with enough characters to pass.</p>
        |<p>short</p>
        |<div>Second content paragraph 3 also long enough to be kept.</div>
        |<footer>copyright 2025</footer>
        |</body></html>""".stripMargin
    assert(ext(html) ==
      "This is the article body 7 with enough characters to pass.\n" +
        "Second content paragraph 3 also long enough to be kept.")
  }

  test("link density gate: anchors above 1/3 of a long block drop it") {
    val linky = "<p><a>Click here to read more about our related offers today</a> now</p>"
    assert(ext(linky) == "") // 54 of 58 chars are anchor text
    val light = "<p><a>Read these</a> carefully before you begin today ok</p>"
    assert(ext(light) == "Read these carefully before you begin today ok") // 10/46
  }

  test("inline markup never splits a block; entities decode; whitespace collapses") {
    val html = "<p>alpha &amp; <b>beta</b>\n\t gamma delta epsilon zeta eta</p>"
    assert(ext(html) == "alpha & beta gamma delta epsilon zeta eta")
  }

  test("block boundaries split sibling and nested blocks") {
    val html = "<div>wrapper text that is long enough to stand alone here" +
      "<p>nested paragraph also long enough to count separately</p></div>"
    assert(ext(html) ==
      "wrapper text that is long enough to stand alone here\n" +
        "nested paragraph also long enough to count separately")
  }

  test("null in, empty page out") {
    assert(ext(null: String) == null)
    assert(DensityExtract.extractCodegenBinary(null) == null)
    assert(ext("<p>tiny</p>") == "")
    assert(ext("") == "")
  }
}
