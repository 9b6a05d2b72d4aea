package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.query.{Elems, Vis}
import graft.selector.Combinator

/** Port of reference `tests/method.rs` — every traversal method against the
  * canonical nested-div fixture. */
class MethodSpec extends AnyFunSuite {
  def load(html: String): Elems = Vis.load(html).fold(e => fail(e), identity)
  def tagName(e: Elems): String = e.doc.arena.upperName(e.ids(0))
  def isAttr(e: Elems, name: String, value: String): Boolean =
    e.attr(name).exists(v => !v.isTrue && v.value == value)

  val HTML = """
  <html>
    <head></head>
    <body>
      <div id="id">
        <div class="class">class-div</div>
        <p>
          p-tag
        </p>
      </div>
      <div id="nested">
        <div class="outer-div-1">
          <div class="inner-div-1-1">inner-div-1-1</div>
          <div class="inner-div-1-2">inner-div-<span>1</span>-<span>2</span></div>
        </div>
        <div class="outer-div-2">
          <div class="inner-div-2-1"></div>
          <div class="inner-div-2-2"></div>
        </div>
      </div>
    </body>
  </html>
"""

  test("find") { // tests/method.rs:37-101
    val root = load(HTML)
    val idEle = root.find("div#id")
    assert(idEle.length == 1)
    assert(idEle.find("> *").length == 2)
    assert(idEle.find("p").length == 1)
    assert(idEle.find("ul").length == 0)
    assert(root.find("div~#nested").length == 1)
    assert(root.find("div+#nested").length == 1)
    assert(root.find("body>#nested").length == 1)
    val innerDiv1 = root.find(".outer-div-1")
    assert(innerDiv1.find("~div > .inner-div-2-2").length == 1)
    assert(innerDiv1.find("+div > .inner-div-2-2").length == 1)
    assert(root.find("#nested").find("div + .inner-div-2-2").length == 1)
    assert(root.find("#nested").find("div ~ .inner-div-2-2").length == 1)
    val div = root.find("div")
    assert(div.find(".inner-div-2-2").length == 1)
    val firsts = div.find(":nth-child(1)")
    assert(firsts.length == 5)
    assert(firsts.eq(3).is("span"))
    val afterFirsts = div.find(":nth-child(n + 2)")
    assert(afterFirsts.length == 5)
    assert(afterFirsts.eq(0).is("p"))
    val inner22 = idEle.find("~div .outer-div-1 + div > div.inner-div-2-2")
    assert(inner22.length == 1)
    assert(inner22.hasClass("inner-div-2-2"))
    val inner22b = idEle.find("+#nested .outer-div-1 ~ .outer-div-2 > div.inner-div-2-2")
    assert(inner22b.length == 1)
    assert(inner22b.hasClass("inner-div-2-2"))
    val nested = root.find("div#id ~ div#nested")
    assert(nested.length == 1)
    val divs = nested.find("div")
    assert(divs.length == 6)
    assert(isAttr(divs.eq(1), "class", "inner-div-1-1"))
    assert(divs.find("div").length == 4)
    val outerAndInner = nested.find("[class|='outer'],[class|='inner']")
    assert(outerAndInner.length == 6)
    assert(isAttr(outerAndInner.eq(1), "class", "inner-div-1-1"))
    assert(root.find("div .inner-div-2-2").length == 1)
    assert(root.find("div+.inner-div-2-2").length == 1)
    assert(root.find("div~.inner-div-2-2").length == 1)
  }

  test("filter") { // tests/method.rs:104-121
    val root = load(HTML)
    val divs = root.find("div")
    assert(divs.filter("#id").length == 1)
    assert(divs.filter("#id > *").length == 1)
    assert(divs.filter("#nested > [class|='outer']").length == 2)
    assert(divs.filter("#nested > [class|='outer'] > [class|='inner']").length == 4)
    assert(divs.filter("div > #id").length == 0)
    assert(divs.filter("html body > #id").length == 1)
  }

  test("filter_by / filter_in / not / not_by / not_in") { // tests/method.rs:123-207
    val root = load(HTML)
    val idDivs = root.find("div[id]")
    assert(idDivs.length == 2)
    val filterId = idDivs.filterBy((index, _) => index == 0)
    assert(filterId.length == 1)
    assert(isAttr(filterId, "id", "id"))
    val filterId2 = idDivs.filterBy((_, e) => Vis.dom(root.doc, e).is("#id"))
    assert(filterId2.length == 1)
    assert(isAttr(filterId2, "id", "id"))
    val filterNested = idDivs.filterBy((_, e) =>
      Vis.dom(root.doc, e).has("[class|='outer']").length > 0)
    assert(filterNested.length == 1)
    assert(isAttr(filterNested, "id", "nested"))
    val idEle = idDivs.filter("#id")
    assert(idDivs.filterIn(idEle).length == 1)
    assert(isAttr(idDivs.filterIn(idEle), "id", "id"))
    val nestedEle = idDivs.notIn(idEle).eq(0)
    assert(idDivs.filterIn(nestedEle).length == 1)
    assert(isAttr(idDivs.filterIn(nestedEle), "id", "nested"))
    // not
    assert(idDivs.not("p").length == idDivs.length)
    assert(idEle.not("#id").length == 0)
    assert(idDivs.not("[id]").length == 0)
    val notId = idEle.notBy((_, e) =>
      root.doc.arena.attrValue(e, "id") == "id")
    assert(notId.length == 0)
    assert(idDivs.notBy((_, e) => root.doc.arena.hasAttr(e, "id")).length == 0)
    assert(idEle.notIn(idDivs).length == 0)
    assert(idDivs.notIn(idEle).filter("#id").length == 0)
  }

  test("is family") { // tests/method.rs:210-327
    val root = load(HTML)
    val idDivs = root.find("div[id]")
    val idEle = idDivs.filter("#id")
    val nested = idDivs.filter("#nested")
    assert(nested.is("#id~#nested"))
    assert(nested.is("div+#nested"))
    assert(nested.is("body > #nested"))
    assert(idEle.is("body #id"))
    assert(idDivs.is("body > #id"))
    assert(idDivs.is("div[id='id']"))
    assert(idDivs.isBy((_, e) => root.doc.arena.attrValue(e, "id") == "id"))
    assert(idEle.isBy((_, e) => root.doc.arena.hasAttr(e, "id")))
    assert(!root.find("div:not([id])").isBy((_, e) => root.doc.arena.hasAttr(e, "id")))
    assert(idEle.isIn(idDivs))
    assert(idDivs.isIn(idEle))
    assert(!idDivs.isIn(root.find("div").not("[id]")))
    assert(idEle.isAll("body #id"))
    assert(!idDivs.isAll("body > #id"))
    assert(!idDivs.isAll("div[id='id']"))
    assert(idEle.isAllBy((index, _) => index == 0))
    assert(!idDivs.isAllBy((_, e) => root.doc.arena.attrValue(e, "id") == "id"))
    assert(idDivs.isAllBy((_, e) => root.doc.arena.upperName(e) == "DIV"))
    assert(idEle.isAllIn(idDivs))
    assert(!idDivs.isAllIn(idEle))
    assert(idDivs.isAllIn(root.find("div")))
    assert(!idDivs.isAllIn(root.find("#nested, #nested div")))
  }

  test("has / has_in") { // tests/method.rs:330-368
    val root = load(HTML)
    val idDivs = root.find("div[id]")
    val idEle = idDivs.filter("#id")
    assert(idEle.has("div.class").length == 1)
    val nested = idDivs.has("[class|='outer']")
    assert(nested.length == 1)
    assert(nested.has("div.class").length == 0)
    assert(idDivs.has("[class|='inner']").length == 1)
    assert(idDivs.has("div+p").isAllIn(idEle))
    assert(idEle.hasIn(root.find("div.class")).length == 1)
    val nested2 = idDivs.hasIn(root.find("[class|='outer']"))
    assert(nested2.length == 1)
    assert(nested2.hasIn(root.find("div.class")).length == 0)
    assert(idDivs.hasIn(root.find("[class|='inner']")).length == 1)
    assert(idDivs.hasIn(root.find("div+p")).isAllIn(idEle))
  }

  test("children") { // tests/method.rs:371-396
    val root = load(HTML)
    val idEle = root.find("#id")
    assert(idEle.children("").length == 2)
    assert(idEle.children("div").length == 1)
    assert(idEle.children("~p").length == 1)
    assert(idEle.children("+p").length == 1)
    assert(idEle.children("~div").length == 0)
    val nested = root.find("#nested")
    assert(nested.children("").length == 2)
    assert(nested.children("div > div").length == 4)
  }

  test("parent / parents / parents_until") { // tests/method.rs:399-464
    val root = load(HTML)
    val idEle = root.find("#id")
    val childs = idEle.children("")
    assert(childs.parent("").length == 1)
    assert(childs.parent("#notId").length == 0)
    assert(childs.parent("#id > div").length == 1)
    assert(childs.parents("body").length == 1)
    val html2 = """
  <ul id="one" class="level-1">
    <li class="item-i">I</li>
    <li id="ii" class="item-ii">II
      <ul class="level-2">
        <li class="item-a">A</li>
        <li class="item-b">B
          <ul class="level-3">
            <li class="item-1">1</li>
            <li class="item-2">2</li>
            <li class="item-3">3</li>
          </ul>
        </li>
        <li class="item-c">C</li>
      </ul>
    </li>
    <li class="item-iii">III</li>
  </ul>
  """
    val r2 = load(html2)
    val item1 = r2.find(".item-1")
    assert(item1.parentsUntil(".level-3", "", false).length == 0)
    assert(item1.parentsUntil(".level-3", "", true).length == 1)
    val toLevel1 = item1.parentsUntil(".level-1", "", false)
    assert(toLevel1.length == 4)
    assert(toLevel1.eq(0).hasClass("item-ii"))
    assert(item1.parentsUntil(".level-1", "li", false).length == 2)
  }

  val dlTerms = """
  <dl>
    <dt id="term-1">term 1</dt>
      <dd>definition 1-a</dd>
      <dd>definition 1-b</dd>
      <dd>definition 1-c</dd>
      <dd>definition 1-d</dd>
    <dt id="term-2">term 2</dt>
      <dd>definition 2-a</dd>
      <dd>definition 2-b</dd>
      <dd>definition 2-c</dd>
    <dt id="term-3">term 3</dt>
      <dd>definition 3-a</dd>
      <dd>definition 3-b</dd>
  </dl>
  """

  test("prev / next family") { // tests/method.rs:467-591
    val root = load(dlTerms)
    val terms = root.find("[id^='term']")
    assert(terms.length == 3)
    assert(terms.prev("").length == 2)
    assert(terms.prev("dt").length == 0)
    assert(terms.next("").length == 3)
    assert(terms.next("dd").length == 3)
    assert(terms.next("dt").length == 0)
    val t2 = root.find("#term-2")
    assert(t2.nextAll("").length == 6)
    assert(t2.nextAll("dd").length == 5)
    assert(t2.nextAll("dt").length == 1)
    assert(t2.prevAll("").length == 5)
    assert(t2.prevAll("dd").length == 4)
    assert(t2.prevAll("dt").length == 1)
  }

  test("prev_until / next_until") { // tests/method.rs:594-662
    val root = load(dlTerms)
    val t2 = root.find("#term-2")
    val before = t2.prevUntil("dt", "", false)
    assert(before.length == 4)
    assert(before.eq(0).text() == "definition 1-a")
    assert(t2.prevUntil("dt", "", true).length == 5)
    val t3 = root.find("#term-3")
    assert(t3.prevUntil("#term-1", ":contains('1')", true).length == 5)
    assert(t2.nextUntil(":dt", "", false).length == 0)
    assert(t2.nextUntil("dt", "", false).length == 3)
    assert(t2.nextUntil("dt", "", true).length == 4)
    val t1 = root.find("#term-1")
    assert(t1.nextUntil("#term-3", ":contains('2')", false).length == 4)
    assert(t1.nextUntil("#term-3", ":gt('2')", false).length == 0)
  }

  test("closest") { // tests/method.rs:665-718
    val r1 = load("""
  <ul id="one" class="level-1">
    <li class="item-i">I</li>
    <li id="ii" class="item-ii">II
      <ul class="level-2">
        <li class="item-a">A</li>
        <li class="item-b">B
          <ul class="level-3">
            <li class="item-1">1</li>
          </ul>
        </li>
        <li class="item-c">C</li>
      </ul>
    </li>
    <li class="item-iii">III</li>
  </ul>
  """)
    assert(isAttr(r1.find("li.item-a").closest("ul"), "class", "level-2"))
    assert(isAttr(r1.find("li.item-a").closest("li"), "class", "item-a"))
    val r2 = load("""
	    <div class="closest">
	      <p>
	        <a class="closest">aaa</a>
          <b class="closest">bbb</b>
          <c>ccc</c>
	      </p>
	      <a>top-aaaa</a>
	    </div>
	""")
    val abc = r2.find("a,b,c")
    assert(abc.length == 4)
    assert(abc.closest(":first").length == 0)
    assert(abc.closest("").length == 0)
    val closest = abc.closest(".closest")
    assert(closest.length == 3)
    assert(tagName(closest.eq(0)) == "DIV")
  }

  test("siblings") { // tests/method.rs:721-760
    val root = load(HTML)
    val divs = root.find("div")
    assert(divs.length == 9)
    assert(divs.siblings("div").length == 8)
    val r2 = load("""
	    <div class="closest">
	      <p><a class="closest">aaa</a><b class="closest">bbb</b><c>ccc</c></p>
	      <a>top-aaaa</a>
	    </div>
	""")
    val abc = r2.find("a,b,c")
    assert(abc.filter("c").siblings("").length == 2)
    assert(abc.filter("a").siblings("").length == 3)
    val sibs = abc.siblings("")
    assert(sibs.length == 4)
    assert(tagName(sibs.eq(0)) == "P")
    assert(abc.siblings(":nono").length == 0)
    val sibs2 = abc.siblings(".closest")
    assert(sibs2.length == 2)
    assert(tagName(sibs2.eq(0)) == "A")
    val big = load("<ul>" + "<li></li>" * 3000 + "</ul>")
    val nth2n = big.find("ul").find(":nth-child(2n)")
    assert(nth2n.siblings("").length == 3000)
  }

  test("text of nested") { // tests/method.rs:763-777
    val root = load(HTML)
    assert(root.find("div.inner-div-1-1").text() == "inner-div-1-1")
    val inner12 = root.find("div.inner-div-1-2")
    assert(inner12.children("").length > 0)
    assert(inner12.text() == "inner-div-1-2")
  }

  test("eq / slice / add") { // tests/method.rs:780-882
    val root = load(dlTerms)
    val terms = root.find("[id^='term']")
    assert(terms.length == 3)
    val t1 = terms.eq(0)
    assert(t1.length == 1)
    assert(t1.is("#term-1"))
    assert(t1.isIn(terms.first()))
    assert(terms.eq(2).is("#term-3"))
    assert(terms.eq(2).isIn(terms.last()))
    assert(terms.eq(3).isEmpty)
    assert(terms.slice(1, Int.MaxValue).length == 2)
    assert(terms.slice(1, 5).length == 2)
    assert(terms.slice(0, 3).length == 3)
    assert(terms.slice(0, 5).length == 3)
    assert(terms.slice(3, Int.MaxValue).length == 0)
    val dl = root.find("dl")
    val dt = dl.children("dt")
    val dd = dl.children("dd")
    val dlChilds = dt.add(dd)
    assert(dl.children("").length == dlChilds.length)
    assert(dlChilds.eq(0).is("dt") && dlChilds.eq(0).attr("id").exists(_.isStr("term-1")))
    assert(dlChilds.eq(1).is("dd") && dlChilds.eq(1).text().contains("1-a"))
    assert(dlChilds.last().is("dd") && dlChilds.last().text().contains("3-b"))
    val again = dlChilds.add(new Elems(root.doc, Array.emptyIntArray))
    assert(again.length == dlChilds.length)
  }

  test("root-level traversal") { // tests/method.rs:885-908
    val root = load(dlTerms)
    assert(root.prevAll("").length == 0)
    assert(root.nextAll("").length == 0)
    assert(root.parent("").length == 0)
  }

  test("contains relationships") { // tests/method.rs:911-946
    val root = load(dlTerms)
    val dl = root.find("dl")
    val childs = dl.children("")
    assert(dl.containsEle(childs.ids(0), Combinator.Children))
    assert(dl.containsEle(childs.ids(0), Combinator.ChildrenAll))
    assert(childs.eq(0).containsEle(childs.ids(1), Combinator.Next))
    assert(childs.eq(0).containsEle(childs.ids(0), Combinator.Chain))
    assert(childs.eq(0).containsEle(childs.ids(2), Combinator.NextAll))
    assert(!childs.eq(0).containsEle(childs.ids(2), Combinator.Next))
  }

  test("duplicate ids: #id is the document's first element in EVERY context") {
    // reference id.rs:8-52: #id always resolves through get_element_by_id
    // (first in doc order) — find, comma groups, filter/is, fused walks
    val root = load("""<div id="x" class="a">first</div><span id="x" class="b">second</span><nav>n</nav>""")
    assert(root.find("#x").length == 1)
    assert(root.find("#x").attr("class").map(_.toString) == Some("a"))
    // comma group (the fused multi-group walk must agree)
    val grouped = root.find("#x, nav")
    assert(grouped.length == 2, s"got ${grouped.length}")
    assert(grouped.eq(0).attr("class").map(_.toString) == Some("a"))
    // filter/is semantics: only the document-first #x element IS #x
    val both = root.find("div, span")
    assert(both.filter("#x").length == 1)
    assert(both.filter("#x").attr("class").map(_.toString) == Some("a"))
    assert(root.find("span.b").is("#x") == false)
    assert(root.find("div.a").is("#x"))
  }

  test("content tag: appended text children survive render, not just text()") {
    // reference tests/insertion.rs:124-131 pins text() == "abcd" after
    // appending text nodes into a content tag; render must AGREE with
    // text() or the appended content silently vanishes from
    // html()/outerHtml()/sourceCode on re-render
    val root = load("<title>ab</title>")
    val title = root.find("title")
    val content = load("<span>x</span>cd") // only the text node may enter
    content.appendTo(title)
    assert(title.text() == "abcd", s"text: ${title.text()}")
    assert(title.outerHtml() == "<title>abcd</title>", s"render: ${title.outerHtml()}")
    assert(title.html() == "abcd", s"inner: ${title.html()}")
  }

  test("until family: sibling-run start dedup and parentsUntil sort (reference elements.rs:1367,1479,1673)") {
    val root = load("<dl><dt>t</dt><dd>1</dd><dd>2</dd><dd>3</dd></dl>")
    // prev_until dedups starts to the LAST of each sibling run
    val prevs = root.find("dd").prevUntil("dt", "", false)
    assert(prevs.length == 2, s"prevUntil length ${prevs.length}")
    // next_until dedups starts to the FIRST of each sibling run
    val nexts = root.find("dd").nextUntil("xx", "", false)
    assert(nexts.length == 2, s"nextUntil length ${nexts.length}")
    // parents_until of a multi-element set: shared ancestors appear ONCE,
    // in document order
    val r2 = load("<body><div><p>a</p><p>b</p></div></body>")
    val ps = r2.find("p").parentsUntil("body", "", false)
    assert(ps.length == 1, s"parentsUntil length ${ps.length}")
    assert(ps.eq(0).text() == "ab")
  }

  test("class methods: reference write conditions (elements.rs:3328-3523)") {
    val root = load("""<div><span>x</span><b class="a  b">y</b></div>""")
    val span = root.find("span")
    // removeClass never creates the attr; unchanged values are untouched
    span.removeClass("foo")
    assert(span.outerHtml() == "<span>x</span>", span.outerHtml())
    val b = root.find("b")
    b.removeClass("zz") // nothing removed -> no write, whitespace kept
    assert(b.outerHtml() == """<b class="a  b">y</b>""", b.outerHtml())
    b.removeClass("a")
    assert(b.attr("class").map(_.toString) == Some("b"))
    // add DOES create the attr — with the RAW untrimmed input (reference
    // add_class passes class_name through, elements.rs:3399); toggle
    // creates it with the trimmed name (toggle_class trims first)
    span.addClass("  c d ")
    assert(span.attr("class").map(_.toString) == Some("  c d "))
    val span2 = load("""<i>z</i>""").find("i")
    span2.toggleClass("  c d ")
    assert(span2.attr("class").map(_.toString) == Some("c d"))
    // hasClass with an empty name is false, never vacuously true
    assert(!b.hasClass(""))
    assert(!b.hasClass("   "))
    assert(b.hasClass("b"))
  }

  test("parent() on a NESTED set dedups non-consecutive same-parent members (reference parents_indexs)") {
    // set [a, i, b]: a,b children of p, i child of a — the reference's
    // unique_sibling keeps one member per DISTINCT parent via a global
    // set, so parent() yields [p, a], never [p, a, p]
    val root = load("""<p id="P"><a>1<i>x</i></a><b>2</b></p>""")
    val set = root.find("a, i, b")
    assert(set.length == 3)
    val parents = set.parent("")
    assert(parents.length == 2, s"got ${parents.length}")
    val names = parents.map((_, e) => parents.doc.arena.lowerName(e))
    assert(names == Seq("p", "a"), names.toString)
    // siblings/nextAll on the same shape stay duplicate-free
    assert(set.nextAll("").length == 1) // only b's run yields nothing; a's yields b... the b member is last
  }

  test("removing the cached id holder: #id finds the live duplicate, getElementById never returns a detached node") {
    val root = load("""<div id="x">first</div><p id="x">second</p>""")
    assert(root.find("#x").text() == "first") // first-registered wins
    root.find("div").remove()
    // the cache rebuilds from the live tree: the duplicate is now the holder
    assert(root.find("#x").text() == "second")
    assert(root.doc.getElementById("x").text() == "second")
    root.find("p").remove()
    assert(root.find("#x").length == 0)
    assert(root.doc.getElementById("x").isEmpty)
  }

  test("non-ASCII attr-key/class selectors match (UTF-8 span compare)") {
    // tag-open needs ASCII alpha (HTML5 + reference tokenizer), but attr
    // KEYS and class names carry non-ASCII on real pages — the byte-len
    // vs char-len span compare could never match them before
    val root = load("""<div data-名前="v" class="クラス">d</div><p class="x">e</p>""")
    assert(root.find("[data-名前]").length == 1)
    assert(root.find("[data-名前='v']").length == 1)
    assert(root.find("[data-名前]").text() == "d")
    assert(root.find(".クラス").length == 1)
    assert(root.find("div").attr("data-名前").map(_.toString) == Some("v"))
  }

  test("multi-target insert: LAST target owns the moved nodes (reference insert: targets forward)") {
    val root = load("""<div id="d1"></div><div id="d2"></div><p>m</p>""")
    root.find("p").appendTo(root.find("div"))
    assert(root.find("#d1 p").length == 0, root.find("#d1").html())
    assert(root.find("#d2 p").length == 1, root.find("#d2").html())
    assert(root.find("#d2").text() == "m")
  }

  test("replaceWith multi-element set: the rebind chain keeps only the first dest (reference replace_with)") {
    val root = load("""<ul><li id="x">x</li></ul><em>1</em><strong>2</strong>""")
    val dest = root.find("em, strong")
    root.find("#x").replaceWith(dest)
    // x replaced by strong (dest reversed), strong then replaced by em:
    // only em survives inside the ul
    assert(root.find("ul").html() == "<em>1</em>", root.find("ul").html())
    assert(root.find("strong").length == 0) // detached by the chain
  }

  test("nth argument overflow is an invalid selector, not a silent wrap") {
    val root = load("<ul><li>1</li><li>2</li></ul>")
    // 2^64+1 would wrap a Long accumulator to 1
    assert(root.find("li:nth-child(18446744073709551617)").length == 0)
    assert(root.find("li:nth-child(99999999999n+3)").length == 0)
    assert(root.find("li:nth-child(1)").length == 1) // sane args still work
  }
}
