package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.query.{Elems, Vis}

/** Port of reference `tests/selector.rs` — every selector kind including the
  * attribute-operator and empty-value edge cases. */
class SelectorSpec extends AnyFunSuite {
  def load(html: String): Elems = Vis.load(html).fold(e => fail(e), identity)
  def tagName(e: Elems): String = e.doc.arena.upperName(e.ids(0))

  test("attribute selectors") { // tests/selector.rs:7-63
    val html = """
  <nav id="lang">
    <a href="#" lang="en">en</a>
    <a href="#" lang="en-UK">en-UK</a>
    <a href="#" lang="english">english</a>
    <a href="#" lang="uk en">uk-en</a>
  </nav>
  """
    val root = load(html)
    val lang = root.find("#lang")
    val links = lang.children("")
    assert(links.filter("[lang='en']").length == 1)
    assert(links.filter("[lang^='en']").length == 3)
    assert(links.filter("[lang$='en']").length == 2)
    assert(links.filter("[lang*='en']").length == 4)
    assert(links.filter("[lang|= en]").length == 2)
    assert(links.filter("[lang!=en]").length == 3)
    assert(links.filter("[lang~='en']").length == 2)
    // special cases: boolean + empty-valued attributes
    val html2 = """
  <nav id="lang">
    <a href="#" lang>boolean lang</a>
    <a href="#" lang="">empty lang</a>
  </nav>
  """
    val root2 = load(html2)
    val lang2 = root2.find("#lang")
    assert(lang2.find("a[lang^='']").length == 0)
    assert(lang2.find("a[lang$='']").length == 0)
    assert(lang2.find("a[lang*='']").length == 0)
    assert(lang2.find("a[lang~='']").length == 0)
    assert(lang2.find("a[lang^='a']").length == 0)
    assert(lang2.find("a[lang$='b']").length == 0)
    assert(lang2.find("a[lang*='c']").length == 0)
    assert(lang2.find("a[lang~='d']").length == 0)
    assert(lang2.find("a[lang!='']").length == 0)
    assert(lang2.find("a[lang!='anything']").length == 2)
    assert(lang2.find("a[lang='']").length == 2)
    assert(lang2.find("a[lang]").length == 2)
    assert(lang2.find("a[lang|='']").length == 2)
  }

  test("id selector") { // tests/selector.rs:65-89
    val html = """
  <nav id="lang">
    <a id="link"></a>
  </nav>
  """
    val root = load(html)
    assert(root.find("#lang").length == 1)
    val link = root.find("#link")
    assert(link.length == 1)
    assert(link.filter("#lang #link").length == 1)
    assert(root.find("#lang #link").length == 1)
    assert(root.find("nav #link").length == 1)
    assert(root.find("#none #link").length == 0)
  }

  test("class selector") { // tests/selector.rs:91-108
    val html = """
  <nav id="lang">
    <a class="en link"></a>
    <a class="en-US link"></a>
    <span class="en"></span>
    <em class>no class selector</em>
  </nav>
  """
    val root = load(html)
    val lang = root.find("#lang")
    assert(lang.find(".link").length == 2)
    assert(lang.find(".en").length == 2)
    assert(lang.find(".en.link").length == 1)
    assert(lang.find("a.link[class|='en']").length == 1)
  }

  test("tagname selector, case-insensitive + namespace") { // tests/selector.rs:110-128
    val root = load("\n    <Div></div>\n  ")
    val div = root.find("div")
    assert(div.length == 1)
    assert(tagName(div) == "DIV")
    val root2 = load("\n    <Form:Item></Form:Item>\n  ")
    val item = root2.find("FORM\\:ITEM")
    assert(item.length == 1)
    assert(tagName(item) == "FORM:ITEM")
  }

  test(":checked") { // tests/selector.rs:131-227
    val r1 = load("""<select><option value="1"></option><option value="2"></option><option value="3"></option></select>""")
    val options = r1.find("select").find("option")
    assert(options.length == 3)
    assert(options.filter(":checked").length == 1)
    assert(options.filter(":checked").valString() == "1")
    assert(r1.find("select > option:checked").valString() == "1")
    assert(r1.find("select").find(":checked").valString() == "1")
    val r2 = load("""<select><optgroup><option value="1"></option><option value="2"></option><option value="3"></option></optgroup></select>""")
    assert(r2.find("select").find("option").filter(":checked").length == 0)
    val r3 = load("""<select><option value="1"></option><option value="2"></option><option value="3" selected="selected"></option></select>""")
    assert(r3.find("select").find("option").filter(":checked").valString() == "3")
    val r4 = load("""<select><option value="0"></option><optgroup><option value="1"></option><option value="2"></option><option value="3"></option></optgroup></select>""")
    val opts4 = r4.find("select").find("option")
    assert(opts4.length == 4)
    assert(opts4.filter(":checked").valString() == "0")
    val r5 = load("""<select><option value="0"></option><optgroup><option value="1"></option><option value="2"></option><option value="3" selected="selected"></option></optgroup></select>""")
    assert(r5.find("select").find("option").filter(":checked").valString() == "3")
    val r6 = load("""<select multiple><option value="1"></option><option value="2"></option><option value="3"></option></select>""")
    assert(r6.find("select").find("option").filter(":checked").length == 0)
    val r7 = load("""<select multiple><option value="1"></option><option value="2" selected="selected"></option><option value="3" selected="selected"></option></select>""")
    val sel7 = r7.find("select").find("option").filter(":checked")
    assert(sel7.length == 2)
    assert(sel7.map((_, e) => new Elems(r7.doc, Array(e)).valString()).mkString(",") == "2,3")
    val r8 = load("""<input type="radio" name="radioinput" value="1" /><input type="radio" name="radioinput" value="2" /><input type="radio" name="radioinput" value="3" checked="checked" />""")
    val radios = r8.find("input[name='radioinput']")
    assert(radios.length == 3)
    assert(radios.filter(":checked").valString() == "3")
    val r9 = load("""<input type="checkbox" name="chkbox" value="1" /><input type="checkbox" name="chkbox" value="2" checked="checked" /><input type="checkbox" name="chkbox" value="3" checked="checked" />""")
    val chk = r9.find("input[name='chkbox']").filter(":checked")
    assert(chk.length == 2)
    assert(chk.map((_, e) => new Elems(r9.doc, Array(e)).valString()).mkString(",") == "2,3")
  }

  test(":header and :not") { // tests/selector.rs:229-238
    val root = load("<h1></h1><div></div>")
    assert(root.find(":header").length == 1)
    assert(root.find(":not(:header)").length == 1)
  }

  test(":root") { // tests/selector.rs:240-258
    val root = load("<h1>abc</h1><div></div>")
    assert(root.find(":root").length == 0)
    val root2 = load("""<!doctype html><html><head></head><body><div id="nav"></div></body></html>""")
    val htmlEle = root2.find(":root")
    assert(htmlEle.length == 1)
    assert(tagName(htmlEle) == "HTML")
    assert(root2.find("html:root").length == 1)
  }

  test(":empty") { // tests/selector.rs:260-268
    val root = load("""<h1>abc</h1><div></div><p><!--comment--></p><b> </b>""")
    assert(root.find(":empty").length == 2)
  }

  test(":contains") { // tests/selector.rs:270-316
    val root = load("""<h1>abc</h1><div>a&amp;</div>""")
    assert(root.find(":contains('a')").length == 2)
    assert(root.find(":contains('b')").length == 1)
    assert(root.find(":contains(\"&\")").length == 1)
    val root2 = load("""
  <div id="content">
    <p>Visdom</p>
    <p>
      Vis<span>dom</span>!
    </p>
    <p>
      Vis&nbsp;<span>dom</span>!
    </p>
  </div>
  """)
    val content = root2.find("#content")
    assert(content.find("p:contains('Visdom')").length == 2)
    assert(content.find("p:contains(\"Vis dom\")").length == 0)
    assert(content.find("p:contains(Visdom)").length == 2)
    assert(content.find("p:contains()").length == content.find("p").length)
    val root3 = load("""
    <div>
      <p>Visdom is awesome</p>
      <p>Visdom 很好用</p>
    </div>
  """)
    assert(root3.find("p:contains('好用')").length == 1)
  }

  test(":only-child") { // tests/selector.rs:319-349
    val html = """
    <!doctype html>
    <html lang="en">
      <head><meta charset="utf-8"><title>:only-child</title></head>
    <body>
      <ul class="list1">
        <li>list1-item1</li>
      </ul>
      <ul class="list2">
        <li>list2-item1</li>
        <li>list2-item2</li>
      </ul>
      <ul class="list3">
        lists-text!
        <li>list3-item1</li>
      </ul>
    </body>
    </html>
  """
    val root = load(html)
    val onlyChild = root.find("li:only-child")
    assert(onlyChild.length == 2)
    assert(onlyChild.eq(0).parent("").is(".list1"))
    assert(onlyChild.eq(1).parent("").is(".list3"))
  }

  val ul9 = """
  <!doctype html>
  <html lang="en">
    <head><meta charset="utf-8"><title>t</title></head>
  <body>
    <ul>
      <li>item1</li>
      <li>item2</li>
      <li>item3</li>
      <li>item4</li>
      <li>item5</li>
      <li>item6</li>
      <li>item7</li>
      <li>item8</li>
      <li>item9</li>
    </ul>
  </body>
  </html>
"""

  test(":first-child / :last-child") { // tests/selector.rs:352-459
    val root = load(ul9)
    val firstChild = root.find("li:first-child")
    assert(firstChild.length == 1)
    assert(firstChild.text() == "item1")
    assert(firstChild.prevAll(":first-child").length == 0)
    assert(firstChild.nextAll(":first-child").length == 0)
    val lastChild = root.find("li:last-child")
    assert(lastChild.length == 1)
    assert(lastChild.text() == "item9")
    assert(lastChild.prevAll(":last-child").length == 0)
    assert(lastChild.nextAll(":last-child").length == 0)
    // nested
    val nested = load("""<!doctype html>
  <html lang="en">
    <head><meta charset="utf-8"><title>t</title></head>
  <body>
    <ul class="list">
      <li name="item-1">
        <ul>
          <li name="item-1-sub-item-1">sub-item-1</li>
          <li name="item-1-sub-item-2">sub-item-2</li>
        </ul>
      </li>
      <li name="item-2">
        <ul>
          <li name="item-2-sub-item-1">sub-item-1</li>
          <li name="item-2-sub-item-2">sub-item-2</li>
        </ul>
      </li>
    </ul>
  </body>
  </html>""")
    val items = nested.find("ul.list").find("li:first-child")
    assert(items.length == 3)
    assert(items.eq(0).attr("name").exists(_.isStr("item-1")))
    assert(items.eq(1).attr("name").exists(_.isStr("item-1-sub-item-1")))
    assert(items.eq(2).attr("name").exists(_.isStr("item-2-sub-item-1")))
  }

  test(":nth-child") { // tests/selector.rs:462-531
    val root = load(ul9)
    val ul = root.find("ul")
    assert(ul.find(":nth-child(0)").length == 0)
    val m2n3 = ul.find(":nth-child(-2n + 3)")
    assert(m2n3.length == 2)
    assert(m2n3.text() == "item1item3")
    assert(ul.find(":nth-child(1)").text() == "item1")
    assert(ul.children(":nth-child(10)").length == 0)
    val odd = ul.find(":nth-child(odd)")
    assert(odd.length == 5)
    assert(odd.text() == "item1item3item5item7item9")
    val even = ul.find(":nth-child( even )")
    assert(even.length == 4)
    assert(even.text() == "item2item4item6item8")
    val c3n = ul.find(":nth-child(3n)")
    assert(c3n.length == 3)
    assert(c3n.text() == "item3item6item9")
    val group = ul.find(":nth-child(2n),:nth-child(10),:nth-child(1),:nth-child(n+8)")
    assert(group.length == 6)
    val c3n2n = c3n.filter(":nth-child(2n)")
    assert(c3n2n.length == 1)
    assert(c3n2n.text() == "item6")
    // big group union
    val big = load("<ul>" + "<li></li>" * 3000 + "</ul>")
    val bul = big.find("ul")
    assert(bul.find(":nth-child(6n),:nth-child(3n),:nth-child(2n)").length ==
      bul.find(":nth-child(2n),:nth-child(3n)").length)
  }

  test(":nth-last-child") { // tests/selector.rs:534-576
    val root = load(ul9)
    val ul = root.find("ul")
    val last1 = ul.children(":nth-last-child(1)")
    assert(last1.length == 1)
    assert(last1.text() == "item9")
    val lastOdd = ul.find(":nth-last-child(odd)")
    assert(lastOdd.length == 5)
    assert(lastOdd.text() == "item1item3item5item7item9")
    val last3n = ul.find(":nth-last-child(3n)")
    assert(last3n.length == 3)
    assert(last3n.text() == "item1item4item7")
    val last3n2n = last3n.filter(":nth-last-child(2n)")
    assert(last3n2n.length == 1)
    assert(last3n2n.text() == "item4")
  }

  val dl7 = """
    <!doctype html>
    <html lang="en">
      <head><meta charset="utf-8"><title>t</title></head>
    <body>
      <dl>
        <dt>dt1</dt>
          <dd>dd1</dd>
          <dd>dd2</dd>
          <dd>dd3</dd>
        <dt>dt2</dt>
          <dd>dd4</dd>
        <dt>dt3</dt>
          <dd>dd5</dd>
          <dd>dd6</dd>
      </dl>
    </body>
    </html>
  """

  test(":only-of-type") { // tests/selector.rs:579-605
    val root = load("""
    <!doctype html>
    <html lang="en">
      <head><meta charset="utf-8"><title>t</title></head>
    <body>
      <div id="content">
        <strong>only strong</strong>
        This is <span>span1</span>, this is a <b>only b</b>, this is another <span>span2</span>
      </div>
    </body>
    </html>
  """)
    val content = root.find("#content")
    val only = content.find(":only-of-type")
    assert(only.length == 2)
    assert(only.text() == "only strongonly b")
    val prevs = content.find("b").prevAll(":only-of-type")
    assert(prevs.length == 1)
    assert(prevs.text() == "only strong")
  }

  test(":first-of-type / :last-of-type") { // tests/selector.rs:608-688
    val root = load(dl7)
    val dl = root.find("dl")
    val first = dl.find(":first-of-type")
    assert(first.length == 2)
    assert(first.text() == "dt1dd1")
    assert(first.prevAll(":first-of-type").text() == "dt1")
    assert(first.nextAll(":first-of-type").text() == "dd1")
    val lastT = dl.find(":last-of-type")
    assert(lastT.length == 2)
    assert(lastT.text() == "dt3dd6")
    assert(lastT.prevAll(":last-of-type").text() == "dt3")
    assert(lastT.nextAll(":last-of-type").text() == "dd6")
  }

  test(":nth-of-type") { // tests/selector.rs:691-739
    val root = load(dl7)
    val dl = root.find("dl")
    assert(dl.children(":nth-of-type(0)").length == 0)
    val t1 = dl.find(":nth-of-type(1)")
    assert(t1.length == 2)
    assert(t1.text() == "dt1dd1")
    val odd = dl.find(":nth-of-type(odd)")
    assert(odd.length == 5)
    assert(odd.text() == "dt1dd1dd3dt3dd5")
    val t3n = dl.find(":nth-of-type(3n)")
    assert(t3n.length == 3)
    assert(t3n.text() == "dd3dt3dd6")
    val t3n2n = t3n.filter(":nth-of-type(2n)")
    assert(t3n2n.length == 1)
    assert(t3n2n.text() == "dd6")
    val prevs = t3n2n.prevAll(":nth-of-type(3n)")
    assert(prevs.length == 2)
    assert(prevs.text() == "dd3dt3")
  }

  test(":nth-last-of-type") { // tests/selector.rs:742-792
    val root = load(dl7)
    val dl = root.find("dl")
    val l1 = dl.find(":nth-last-of-type(1)")
    assert(l1.length == 2)
    assert(l1.text() == "dt3dd6")
    val lodd = dl.find(":nth-last-of-type(odd)")
    assert(lodd.length == 5)
    assert(lodd.text() == "dt1dd2dd4dt3dd6")
    val l3n = dl.find(":nth-last-of-type(3n)")
    assert(l3n.length == 3)
    assert(l3n.text() == "dt1dd1dd4")
    val l3n2n = l3n.filter(":nth-last-of-type(2n)")
    assert(l3n2n.length == 1)
    assert(l3n2n.text() == "dd1")
    assert(l3n2n.prevAll(":nth-last-of-type(3n)").text() == "dt1")
    assert(l3n2n.nextAll(":nth-last-of-type(3n)").text() == "dd4")
  }

  test(":not") { // tests/selector.rs:795-834
    val root = load(dl7)
    val dl = root.find("dl")
    assert(dl.children(":not(dt)").length == 6)
    assert(dl.children(":not(dt,dd)").length == 0)
    assert(dl.children(":not(dt,:not(dt))").length == 0)
    val notFirst = dl.children(":not(dt:nth-child(-n + 1))")
    assert(notFirst.length == 8)
    assert(notFirst.eq(0).text() == "dd1")
  }

  test(":has") { // tests/selector.rs:837-870
    val root = load("""
  <!doctype html>
  <html>
    <body>
      <div id="container">
        <div class="outer"><p>1</p></div>
        <div class="outer">2</div>
        <div class="outer">3</div>
        <div class="outer"><div><p>4</p></div></div>
      </div>
    </body>
  </html>
  """)
    val container = root.find("#container")
    assert(container.length == 1)
    val noHasP = container.children("div:not(:has(p))")
    assert(noHasP.length == 2)
    assert(noHasP.text() == "23")
    val divs = container.children("div")
    val hasP = divs.has("p")
    assert(hasP.length == 2)
    assert(hasP.text() == "14")
    assert(divs.not(":has(p)").text() == "23")
  }

  test("invalid selectors yield empty results") { // tests/selector.rs:872-897
    val root = load("<b>anything</b>")
    assert(root.find(">,").isEmpty)
    assert(root.find(",b").isEmpty)
    assert(root.find("b,").isEmpty)
    assert(root.find(":not(:not(:a)").isEmpty)
    assert(root.find("a:all-childs").isEmpty)
  }

  test("backslash escapes in quoted values are KEPT in the captured value") {
    // mesdoc's capture regex `'((?:\\?+.)*?)'` retains the backslash
    // (reference selector/pattern.rs:352-370, rules/attr.rs:11): the
    // selector value `a\'b` compares literally — backslash included.
    val html = """<div data-x="a\'b">q1</div><div data-x="a'b">q2</div>"""
    val root = load(html)
    assert(root.find("""[data-x='a\'b']""").text() == "q1")
    // :contains with an escaped quote: matches the literal backslash text
    val html2 = """<p>say a\'b here</p><p>say a'b here</p>"""
    val root2 = load(html2)
    assert(root2.find(""":contains('a\'b')""").length == 1)
    // identity escapes still DROP the backslash (reference pattern.rs:98-120)
    val root3 = load("""<form:item>x</form:item>""")
    assert(root3.find("""form\:item""").length == 1)
  }
}
