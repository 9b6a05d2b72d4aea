package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.query.{Elems, Vis}

/** Port of reference `tests/attr.rs` — attribute case-insensitivity, boolean
  * attrs, quote escaping, class ops. */
class AttrSpec extends AnyFunSuite {
  def load(html: String): Elems = Vis.load(html).fold(e => fail(e), identity)

  test("normal attributes") { // tests/attr.rs:7-71
    val ATTR = "contenteditable"
    val html = """<div class='first' contenteditable><input type="text" type="file" /></div><div class='test-attrs' draggable data-type='link' name='cool' data-type='override'></div>"""
    val root = load(html)
    val div = root.children("div.first")
    assert(div.hasAttr(ATTR))
    assert(!div.hasAttr("content"))
    val value = div.attr(ATTR)
    assert(value.isDefined && value.get.isTrue)
    assert(root.find("p").attr(ATTR).isEmpty)
    div.removeAttr(ATTR)
    assert(div.attr(ATTR).isEmpty)
    div.setAttr(ATTR, None)
    val v2 = div.attr(ATTR)
    assert(v2.isDefined)
    assert(v2.get.isTrue)
    assert(v2.get.isStr(""))
    assert(v2.get.toString == "")
    assert(v2.get.toList.isEmpty)
    // first appeared duplicate attribute wins
    val input = div.children("input")
    val tv = input.attr("type")
    assert(tv.isDefined)
    assert(tv.get.isStr("text"))
    assert(tv.get.toString == "text")
    assert(tv.get.toList == Seq("text"))
    input.setAttr("type", Some("file"))
    assert(input.attr("type").get.isStr("file"))
    // attributes: duplicates dropped at parse; lowercase names
    val attrsDiv = root.children("div.test-attrs")
    val e = attrsDiv.ids(0)
    val a = root.doc.arena
    val attrs = {
      val out = scala.collection.mutable.ArrayBuffer[(String, Boolean, String)]()
      var idx = a.attrHead(e)
      while (idx >= 0) {
        if (!a.aRemoved(idx)) {
          val key = a.str(a.aKeyOff(idx), a.aKeyLen(idx)).toLowerCase
          if (a.aValOff(idx) < 0) out += ((key, true, ""))
          else out += ((key, false, a.str(a.aValOff(idx), a.aValLen(idx))))
        }
        idx = a.aNext(idx)
      }
      out
    }
    assert(attrs.length == 4)
    assert(attrs(0) == (("class", false, "test-attrs")))
    assert(attrs(1) == (("draggable", true, "")))
    assert(attrs(2) == (("data-type", false, "link")))
    assert(attrs(3) == (("name", false, "cool")))
    // case-insensitive names (issue #2)
    val r2 = load("""<input type="text" READONly /></div>""")
    val input2 = r2.children("[readOnly]")
    assert(input2.length == 1)
    val title = "this's a title"
    input2.setAttr("title", Some(title))
    assert(input2.attr("title").get.toString == title)
    val title2 = "\"this's a\" title"
    input2.setAttr("title", Some(title2))
    assert(input2.attr("title").get.toString == title2.replace("'", "&apos;"))
  }

  test("class attribute ops") { // tests/attr.rs:74-115
    val root = load("""<div class="first"></div>""")
    val div = root.children("div")
    assert(div.attr("class").exists(_.isStr("first")))
    div.removeClass("first")
    assert(div.attr("class").exists(_.isStr("")))
    div.addClass("first  second")
    val v = div.attr("class").get
    assert(v.toList.contains("first"))
    assert(v.toList.contains("second"))
    assert(v.isStr("first second"))
    div.toggleClass("first third")
    assert(!div.hasClass("first"))
    assert(div.hasClass("second"))
    assert(div.hasClass("third"))
    assert(div.attr("class").get.isStr("second third"))
    div.removeAttr("class")
    assert(!div.hasAttr("class"))
    div.addClass("first")
    assert(div.hasClass("first"))
    div.removeAttr("class")
    div.toggleClass("first second")
    assert(div.hasClass("first"))
    assert(div.hasClass("second"))
  }
}
