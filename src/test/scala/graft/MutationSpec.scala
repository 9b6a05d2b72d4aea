package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.query.{Elems, Vis}

/** Port of reference `tests/insertion.rs` + `tests/mutation.rs` — insert
  * positions, node-move semantics, allow_insert filtering, guards,
  * remove/empty/replace/clone isolation. */
class MutationSpec extends AnyFunSuite {
  def load(html: String): Elems = Vis.load(html).fold(e => fail(e), identity)
  def idx(e: Elems): Int = e.doc.arena.nodeIdx(e.ids(0))

  test("append child") { // tests/insertion.rs:8-27
    val root = load("""<div class="parent"><div class="first-child"></div></div>""")
    val parent = root.children(".parent")
    val firstChild = parent.children(".first-child")
    val newChilds = load("""<div class="second-child"></div><div class="third-child"></div>""")
    assert(idx(firstChild) == 0)
    parent.append(newChilds)
    assert(idx(firstChild) == 0)
    val lastChild = parent.children("").last()
    assert(idx(lastChild) == 2)
    // empty append
    val empty = load("")
    empty.appendTo(parent)
    assert(idx(parent.children("").last()) == 2)
  }

  test("prepend child") { // tests/insertion.rs:29-44
    val root = load("""<div class="parent"><div class="third-child"></div></div>""")
    val parent = root.children(".parent")
    val lastChild = parent.children(".third-child")
    val newChilds = load("""<div class="first-child"></div><div class="second-child"></div>""")
    assert(idx(lastChild) == 0)
    newChilds.prependTo(parent)
    assert(idx(lastChild) == 2)
    assert(idx(parent.children("").eq(0)) == 0)
  }

  test("insert before") { // tests/insertion.rs:47-69
    val root = load("""<div class="parent"><div class="third-child"></div></div>""")
    val parent = root.children(".parent")
    val thirdChild = parent.children(".third-child")
    val inserted = load("""<div class="first-child"></div><div class="second-child"></div>""")
    val insertedChilds = inserted.children("")
    assert(idx(thirdChild) == 0)
    val secondChild = insertedChilds.filter(".second-child")
    secondChild.insertBefore(thirdChild)
    assert(idx(thirdChild) == 1)
    assert(idx(secondChild) == 0)
    assert(inserted.children("").length == 1)
    val firstChild = insertedChilds.filter(".first-child")
    firstChild.insertBefore(secondChild)
    assert(idx(thirdChild) == 2)
    assert(idx(secondChild) == 1)
    assert(idx(firstChild) == 0)
    assert(inserted.children("").length == 0)
  }

  test("insert after") { // tests/insertion.rs:71-94
    val root = load("""<div class="parent"><div class="first-child"></div></div>""")
    val parent = root.children(".parent")
    val firstChild = parent.children(".first-child")
    val inserted = load("""<div class="second-child"></div><div class="third-child"></div>""")
    val insertedChilds = inserted.children("")
    assert(idx(firstChild) == 0)
    val secondChild = insertedChilds.filter(".second-child")
    secondChild.insertAfter(firstChild)
    assert(idx(firstChild) == 0)
    assert(idx(secondChild) == 1)
    assert(inserted.children("").length == 1)
    val thirdChild = insertedChilds.filter(".third-child")
    thirdChild.insertAfter(secondChild)
    assert(idx(thirdChild) == 2)
    assert(idx(secondChild) == 1)
    assert(idx(firstChild) == 0)
    assert(inserted.children("").length == 0)
  }

  test("empty") { // tests/insertion.rs:96-107
    val root = load("""<div id="content">This is a <strong>test</strong>!</div>""")
    val content = root.find("#content")
    assert(content.length == 1)
    assert(content.children("strong").length == 1)
    content.empty()
    assert(content.children("strong").length == 0)
    assert(content.html() == "")
  }

  test("allow_insert filtering") { // tests/insertion.rs:109-142
    // void tags accept nothing
    val root = load("""<div id="content"><img src="picture.jpg" /></div>""")
    val img = root.find("img")
    img.setHtml("<div class='test'></div>")
    assert(img.html() == "")
    val childs = load("abc<span>def</span><!--ghi-->")
    childs.appendTo(img)
    assert(img.html() == "")
    // title: set_html raw; append keeps only text nodes
    val r2 = load("<title></title>")
    val title = r2.find("title")
    title.setHtml("ab<span></span>cd")
    assert(title.text() == "ab<span></span>cd")
    title.empty()
    val content2 = load("ab<span></span>cd")
    content2.appendTo(title)
    assert(title.text() == "abcd")
    // inserting an ancestor into its descendant is a no-op
    val r3 = load("""<div id="wrapper"><div id="inner"></div></div>""")
    val wrapper = r3.find("#wrapper")
    val inner = wrapper.find("#inner")
    wrapper.appendTo(inner)
    assert(wrapper.find("#inner").length == 1)
  }

  test("illegal inserts report to the error channel") { // tests/insertion.rs:145-212
    var errors = List.empty[String]
    val html = """
  <!doctype html>
  <html>
    <head></head>
    <body>
      <div id="main">
        <div id="container"></div>
      </div>
    </body>
  </html>"""
    val root = Vis.loadCatch(html, e => errors ::= e)
    val main = root.find("#main")
    main.append(root) // append a document
    assert(errors.nonEmpty)
    errors = Nil
    val stillMain = root.find("#main")
    main.append(stillMain) // append itself
    assert(errors.nonEmpty)
    errors = Nil
    val child = root.find("#container")
    val parent = root.find("#main")
    child.append(parent) // append own ancestor
    assert(errors.nonEmpty)
  }

  test("remove child reindexes siblings") { // tests/mutation.rs:8-42
    val HTML = """<div><p></p><ul></ul><ol></ol></div>"""
    locally {
      val root = load(HTML)
      val div = root.children("div")
      val p = div.children("p"); val ul = div.children("ul"); val ol = div.children("ol")
      assert(idx(p) == 0 && idx(ul) == 1 && idx(ol) == 2)
      p.remove()
      assert(idx(ul) == 0 && idx(ol) == 1)
    }
    locally {
      val root = load(HTML)
      val div = root.children("div")
      val p = div.children("p"); val ul = div.children("ul"); val ol = div.children("ol")
      ul.remove()
      assert(idx(p) == 0 && idx(ol) == 1)
    }
    locally {
      val root = load(HTML)
      val div = root.children("div")
      val p = div.children("p"); val ul = div.children("ul"); val ol = div.children("ol")
      ol.remove()
      assert(idx(p) == 0 && idx(ul) == 1)
    }
  }

  test("remove") { // tests/mutation.rs:57-67
    val root = load("""<div id="content">This is a <strong>test</strong>!</div>""")
    val content = root.find("#content")
    assert(content.find("strong").length == 1)
    content.find("strong").remove()
    assert(content.find("strong").length == 0)
    assert(content.text() == "This is a !")
  }

  test("insert with remove") { // tests/mutation.rs:69-96
    val html = """
  <div>
      <img src="a.png" />
      <img src="b.jpg" />
      <img src="c.webp" />
  </div>
  """
    val frag = load(html)
    val rootDiv = frag.children("div")
    val imgs = rootDiv.find("img[src]")
    imgs.forEach { (_, ele) =>
      val src = frag.doc.arena.attrValue(ele, "src")
      if (src != null && src.endsWith(".png")) {
        val img = Vis.dom(frag.doc, ele)
        val svg = load("<svg></svg>")
        svg.insertBefore(img)
        img.remove()
      }
      true
    }
    assert(rootDiv.find("img[src]").length == 2)
    assert(rootDiv.find("svg").length == 1)
  }

  test("replace_with") { // tests/mutation.rs:98-124
    val html = """
  <div>
      <img src="a.png" />
      <img src="b.jpg" />
      <img src="c.webp" />
  </div>
  """
    val frag = load(html)
    val rootDiv = frag.children("div")
    val imgs = rootDiv.find("img[src]")
    imgs.forEach { (_, ele) =>
      val src = frag.doc.arena.attrValue(ele, "src")
      if (src != null && src.endsWith(".png")) {
        val img = Vis.dom(frag.doc, ele)
        val svg = load("<svg></svg>")
        img.replaceWith(svg)
      }
      true
    }
    assert(rootDiv.find("img[src]").length == 2)
    assert(rootDiv.find("svg").length == 1)
  }

  test("deep clone isolation") { // tests/mutation.rs:126-160
    val menuHtml = """<menu class="menu">
  <h3>Title</h3>
  <ul class="list">
    <li class="item-1">item1</li>
    <li class="item-2">item2</li>
  </ul>
  </menu>"""
    val html = s"\n  <h2>logo</h2>\n  $menuHtml\n  "
    val frag = load(html)
    val menu = frag.find(">.menu")
    val cloneMenu = menu.deepClone()
    val cloneH3 = cloneMenu.find(">h3")
    cloneH3.setText("h3")
    assert(menu.outerHtml() == menuHtml)
    assert(cloneH3.text() == "h3")
    val cloneItem1 = cloneMenu.find(".item-1")
    cloneItem1.addClass("item")
    assert(menu.outerHtml() == menuHtml)
    assert(cloneItem1.hasClass("item"))
    cloneItem1.removeClass("item-1").addClass("item-3")
    cloneItem1.appendTo(menu.find("ul.list"))
    assert(menu.find(".list > li").length == 3)
    assert(menu.find(".list > li").eq(2).hasClass("item-3"))
    assert(cloneMenu.find(".list > li").length == 1)
    assert(cloneMenu.find(".list > li").first().text() == "item2")
  }
}
