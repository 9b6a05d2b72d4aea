package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.query.{Elems, Vis}

/** Inline doc-test examples from the reference (`elements.rs` rustdoc) —
  * extra behavior pinning beyond the integration suites. */
class DocExamplesSpec extends AnyFunSuite {
  def load(html: String): Elems = Vis.load(html).fold(e => fail(e), identity)

  val dlDoc = """
    <html>
      <head>
        <title>document</title>
      </head>
      <body>
        <dl>
          <dt>Title</dt>
          <dd><span>item1</span></dd>
          <dd class="item2"><span>item2</span></dd>
          <dd class="item3">item3</dd>
        </dl>
      </body>
    </html>
  """

  test("find doc example (elements.rs:1066-1096)") {
    val doc = load("""
      <html>
        <head>
          <title>document</title>
        </head>
        <body>
          <ul>
            <li>item1</li>
            <li>item2</li>
            <li>
                <ol>
                  <li>subitem1</li>
                  <li>subitem2</li>
                </ol>
            </li>
          </ul>
        </body>
      </html>
    """)
    assert(doc.find("ul").length == 1)
    assert(doc.find("ul li").length == 5)
    assert(doc.find("ul > li").length == 3)
    assert(doc.find("ul li:first-child").text() == "item1subitem1")
  }

  test("filter doc example (elements.rs:1108-1133)") {
    val doc = load("""
      <html><head><title>document</title></head>
      <body>
        <ul>
          <li>item1</li>
          <li class="item2">item2</li>
          <li>item3</li>
        </ul>
      </body></html>
    """)
    val items = doc.find("li")
    assert(items.length == 3)
    assert(items.filter("[class]").length == 1)
    assert(items.filter("[class]").text() == "item2")
    assert(items.filter("li:contains('item3')").length == 1)
    assert(items.filter("li:contains('item3')").text() == "item3")
  }

  test("is doc example (elements.rs:1957-1984)") {
    val doc = load(dlDoc)
    val items = doc.find("dl").children("")
    assert(items.is("dd"))
    assert(items.is("dt"))
    assert(items.is(".item2"))
    assert(items.is(".item3"))
    assert(items.is(":contains('item2')"))
  }

  test("last/slice/add doc examples (elements.rs:2490-2639)") {
    val doc = load(dlDoc)
    val items = doc.find("dl").children("")
    assert(items.last().isAllIn(items.eq(items.length - 1)))
    assert(items.last().is(".item3"))
    assert(items.slice(0, Int.MaxValue).length == 4)
    assert(items.slice(0, 3).length == 3)
    assert(items.slice(0, 4).length == 4)
    assert(items.slice(0, 10).length == 4)
    val dt = items.filter("dt")
    val classDd = items.filter("[class]")
    assert(dt.length == 1)
    assert(classDd.length == 2)
    assert(dt.add(classDd).length == 3)
  }

  test("render fidelity: unquoted / single-quoted / boolean attrs") {
    val html = """<input type=text data-a='x y' readonly><div CLASS="Mix">t</div>"""
    val root = load(html)
    assert(root.doc.sourceCode == html)
    assert(root.find("input").attr("data-a").exists(_.isStr("x y")))
    assert(root.find("[readonly]").length == 1)
    assert(root.find("div.Mix").length == 1) // class values are case-sensitive
    assert(root.find("div.mix").length == 0)
  }

  test("comment text() and :empty interplay") {
    val root = load("<div><!--note--></div><p>x<!--c--></p>")
    assert(root.find("div").text() == "") // comments excluded from element text
    assert(root.find("div").is(":empty"))
    assert(root.find("p").text() == "x")
  }
}
