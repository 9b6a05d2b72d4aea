package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.html.ParseOptions
import graft.query.Vis

/** Opt-in HTML5 implicit-tree mode (`ParseOptions.crawl` =
  * compat + html5Tree): implied html/head/body and the common auto-close
  * rules for real crawl pages. The DEFAULT profiles are exact reference
  * parity and must be unaffected — the full existing battery pins that;
  * this spec pins the opt-in behavior. */
class Html5TreeSpec extends AnyFunSuite {

  private def crawl(html: String) =
    Vis.loadOptions(html, ParseOptions.crawl).toOption.get
  private def compat(html: String) =
    Vis.load(html).toOption.get

  test("fragment gets implied html/head/body; body > * selectors work") {
    val root = crawl("<p>a</p><p>b</p>")
    assert(root.find("html").length == 1)
    assert(root.find("body").length == 1)
    assert(root.find("body > p").length == 2)
    assert(root.find("html > body").length == 1)
    assert(root.find("p").text() == "ab")
  }

  test("implied elements render transparently: re-render is byte-identical") {
    val pages = Seq(
      "<p>a</p><p>b</p>",
      "<title>t</title><div>x</div>",
      "<ul><li>a<li>b</ul>",
      "<table><tr><td>a<td>b<tr><td>c</table>",
      "<!DOCTYPE html><div>hi</div>",
      "<!-- c --><meta charset=\"utf-8\"><p>body",
      "<p>one<p>two<div>three</div>")
    pages.foreach { p =>
      assert(crawl(p).doc.sourceCode == p, s"render diverged for: $p")
    }
  }

  test("explicit html/head/body structure is used as-is (no doubling)") {
    val src = "<html><head><meta charset=\"utf-8\"></head><body><p>hi</p></body></html>"
    val root = crawl(src)
    assert(root.find("html").length == 1)
    assert(root.find("head").length == 1)
    assert(root.find("body").length == 1)
    assert(root.find("head > meta").length == 1)
    assert(root.find("body > p").length == 1)
    assert(root.doc.sourceCode == src)
  }

  test("head-phase metadata routes into the (implied) head; body content opens body") {
    val root = crawl("<title>t</title><meta charset=\"x\"><div>content</div><style>s</style>")
    assert(root.find("head > title").length == 1)
    assert(root.find("head > meta").length == 1)
    assert(root.find("body > div").length == 1)
    // style AFTER body content stays in body (flow content position)
    assert(root.find("body style").length == 1)
    assert(root.find("head style").length == 0)
  }

  test("li auto-close: <li> closes an open <li> (through formatting tags)") {
    val root = crawl("<ul><li>a<li>b<li>c</ul>")
    assert(root.find("ul > li").length == 3)
    assert(root.find("li li").length == 0)
    val fmt = crawl("<ul><li><b>a<li>b</ul>")
    assert(fmt.find("ul > li").length == 2)
    assert(fmt.find("li li").length == 0)
    // default compat profile keeps reference parity: naive nesting
    val nested = compat("<ul><li>a<li>b</ul>")
    assert(nested.find("li li").length == 1)
  }

  test("p auto-close: block starts and <p> close an open <p>") {
    val root = crawl("<p>one<p>two<div>three</div>")
    assert(root.find("body > p").length == 2)
    assert(root.find("p p").length == 0)
    assert(root.find("p div").length == 0)
    assert(root.find("body > div").length == 1)
    // through formatting: <p><b>x<p>y closes the outer p
    val fmt = crawl("<p><b>x<p>y")
    assert(fmt.find("p p").length == 0)
    // a non-formatting container blocks the close (approximation of scope)
    val scoped = crawl("<p><object><p>y")
    assert(scoped.find("p p").length == 1)
  }

  test("dt/dd, table rows/cells, option/optgroup auto-close") {
    val dl = crawl("<dl><dt>t<dd>d<dt>t2</dl>")
    assert(dl.find("dl > dt").length == 2)
    assert(dl.find("dl > dd").length == 1)
    assert(dl.find("dt dd, dd dt").length == 0)
    val tbl = crawl("<table><tr><td>a<td>b<tr><td>c</table>")
    assert(tbl.find("tr").length == 2)
    assert(tbl.find("td").length == 3)
    assert(tbl.find("td td").length == 0)
    assert(tbl.find("tr tr").length == 0)
    val sel = crawl("<select><option>a<option>b<optgroup label=\"g\"><option>c</select>")
    assert(sel.find("option").length == 3)
    assert(sel.find("option option").length == 0)
    assert(sel.find("optgroup > option").length == 1)
  }

  test("headings close an open heading and an open p") {
    val root = crawl("<h1>a<h2>b<p>c<h3>d")
    assert(root.find("h1 h2").length == 0)
    assert(root.find("p h3").length == 0)
    assert(root.find("body > h1, body > h2, body > h3").length == 3)
  }

  test("non-ws text at root/head level moves to body; whitespace stays put") {
    val root = crawl("<title>t</title>hello")
    assert(root.find("body").text() == "hello")
    assert(root.find("head").text() == "t")
    // content after </body> re-enters body (HTML5 after-body mode)
    val after = crawl("<html><body>a</body><div>d</div></html>")
    assert(after.find("body div").length == 1)
  }

  test("strict + html5Tree: real unclosed tags still error, implied ones never do") {
    val strictCrawl = ParseOptions(html5Tree = true,
      autoFixUnclosedTag = false, autoFixUnexpectedEndtag = true,
      autoFixUnescapedLt = true, allowSelfClosing = true)
    val err = Vis.loadOptions("<div>x", strictCrawl)
    assert(err.isLeft && err.swap.toOption.get.contains("div"))
    // fully closed content: no spurious error about the implied elements
    assert(Vis.loadOptions("<div>x</div>", strictCrawl).isRight)
  }

  test("stray close tags matching implied elements keep byte-identity") {
    // </body></html> with no explicit opens: endTag matches the implied
    // elements; their close-tag BYTES came from the source, so re-render
    // must emit them (the implied OPEN tags still render transparently)
    val src = "<div>x</div></body></html>"
    val root = crawl(src)
    assert(root.find("body > div").length == 1)
    assert(root.doc.sourceCode == src, root.doc.sourceCode)
    val src2 = "<p>a</body>"
    assert(crawl(src2).doc.sourceCode == src2)
  }

  test("li auto-close survives deep formatting nesting (scope walk not step-capped)") {
    // 9 open formatting elements between the li and the close point — the
    // old 8-step cap silently dropped the auto-close here
    val root = crawl("<ul><li><b><i><u><s><a><em><tt><font><code>x<li>y</ul>")
    assert(root.find("ul > li").length == 2)
    assert(root.find("li li").length == 0)
  }

  test("self-closed <body/> never becomes the insertion parent (content would vanish from render)") {
    // F_SELF_CLOSED renders without children: routing content into a
    // self-closed body would drop it from sourceCode while text() kept it
    val src = "<body/><div>x</div>"
    val root = crawl(src)
    assert(root.find("div").text() == "x")
    assert(root.doc.sourceCode == src, root.doc.sourceCode)
    val src2 = "<html/><p>y</p>"
    val r2 = crawl(src2)
    assert(r2.find("p").text() == "y")
    assert(r2.doc.sourceCode == src2, r2.doc.sourceCode)
  }

  test("extraction-style queries on a realistic crawl page without explicit body") {
    val page = "<!DOCTYPE html><meta charset=\"utf-8\"><title>T</title>" +
      "<nav>menu</nav><p>first<p>second<ul><li>one<li>two</ul><footer>f</footer>"
    val root = crawl(page)
    val body = root.find("body")
    assert(body.length == 1)
    root.find("nav, footer").remove()
    assert(body.find("p").length == 2)
    assert(body.text() == "firstsecondonetwo")
    assert(root.find("head > title").text() == "T")
  }

  test("content after </body> re-renders byte-identical (close tag is a RAWSPAN child)") {
    // round-5 advice: the re-entered content used to render BEFORE the
    // close tag ('<p>a</body>b' -> '<p>ab</body>')
    val cases = Seq(
      "<p>a</body>b",
      "<body>x</body>y",
      "<html><body><p>one</body><p>two</html>",
      "<p>a</body>b</body>c", // multiple stray closes, all kept in place
      "<head><title>t</title></head><p>x")
    cases.foreach { src =>
      assert(crawl(src).doc.sourceCode == src, s"render diverged for: $src")
    }
    // and the re-entered content is really IN the body
    val root = crawl("<p>a</body>b")
    assert(root.find("body").text() == "ab")
    assert(root.find("body > p").length == 1)
  }

  test("misnested formatting reconstructs: <b><i></b>text keeps text inside an i") {
    val root = crawl("<b><i></b>after")
    // adoption-agency lite: the popped <i> re-opens as an implied clone
    assert(root.find("i").length == 2)
    assert(root.find("i").length == 2)
    assert(root.find("body").text() == "after")
    // the clone carries the text; the original stays empty
    assert(root.find("b > i").text() == "")
    assert(root.find("body > i").text() == "after")
    // transparent clone render: byte identity holds
    assert(root.doc.sourceCode == "<b><i></b>after")
  }

  test("reconstructed formatting clones keep their attributes (selector-visible)") {
    val src = "<i><b class=\"x\"></i>t"
    val root = crawl(src)
    assert(root.find("b.x").length == 2)
    assert(root.find("body > b.x").text() == "t")
    assert(root.doc.sourceCode == src)
  }

  test("a mismatched close through a NON-formatting element does not reconstruct") {
    val root = crawl("<b><div></b>after")
    // div is not formatting: no clone re-opens (lite scope), no throw
    assert(root.find("b").length == 1)
    assert(root.doc != null)
  }

  test("self-closed <head/>/<body/> never claims the slot nor pops open elements") {
    // round-5 advice: h5Pre ran popToHtml before selfClosed was known
    val root = crawl("<html><head><body/><meta charset=\"u\">x")
    // the <body/> stays an ordinary leaf; meta lands in the still-open head
    assert(root.find("head > meta").length == 1)
    assert(root.find("body").length == 2) // leaf + implied body for x
    assert(root.find("html").length == 1)
    val r2 = crawl("<head/><title>t</title>")
    assert(r2.doc.sourceCode == "<head/><title>t</title>")
    assert(r2.find("head").length == 2) // the leaf + the implied head
    assert(r2.find("head > title").text() == "t")
  }
}
