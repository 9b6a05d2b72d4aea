package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.query.{Elems, Vis}

/** Port of reference `tests/content.rs` — val()/text()/html() semantics,
  * entity encode round-trips, content-tag behavior, texts() depth/filters. */
class ContentSpec extends AnyFunSuite {
  def load(html: String): Elems = Vis.load(html).fold(e => fail(e), identity)

  test("val()") { // tests/content.rs:8-152
    val html = """
  <input type="text" value="textinput" />
  <input type="radio" name="radioinput" value="radio1" />
  <input type="radio" name="radioinput" value="radio2" checked="checked" />
  <input type="radio" name="radioinput" value="radio3" />
  <input type="checkbox" name="checkboxinput" value="checkbox1" />
  <input type="checkbox" name="checkboxinput" value="checkbox2" checked="checked" />
  <input type="checkbox" name="checkboxinput" value="checkbox3" checked="checked" />
  <p value="abc"></p>
  <input type="text" name="novalue" />
  """
    val root = load(html)
    val inputs = root.children("input")
    assert(inputs.valString() == "textinput")
    assert(inputs.filter("[type='radio']").length == 3)
    assert(inputs.filter("[type='radio']:checked").length == 1)
    assert(inputs.filter("[type='radio']:checked").valString() == "radio2")
    assert(inputs.filter("[name='radioinput']").eq(0).valString() == "radio1")
    assert(inputs.filter("[type='checkbox']").length == 3)
    assert(inputs.filter("[type='checkbox']:checked").length == 2)
    assert(inputs.filter("[type='checkbox']:checked").valString() == "checkbox2")
    assert(root.find("p").length == 1)
    assert(root.find("p").valString() == "")
    assert(root.find("div").valString() == "")
    assert(root.find("input[name='novalue']").length == 1)
    assert(root.find("input[name='novalue']").valString() == "")
    // textarea: raw content
    val textareaContent = """<div>This is the content in textarea</div>"""
    val r2 = load(s"<textarea>$textareaContent</textarea>")
    assert(r2.children("textarea").valString() == textareaContent)
    // select without selected option: first direct option is default
    val r3 = load("""
  <select>
    <option value="1">1</option>
    <option value="2">2</option>
    <option value="3">3</option>
  </select>
  """)
    assert(r3.children("select").find("option:checked").length == 1)
    assert(r3.children("select").find("option:checked").valString() == "1")
    assert(r3.children("select").valString() == "1")
    // optgroup-only: no default
    val r4 = load("""
  <select>
    <optgroup>
      <option value="1">1</option>
      <option value="2">2</option>
      <option value="3">3</option>
    </optgroup>
  </select>
  """)
    assert(r4.children("select").find("option:checked").length == 0)
    assert(r4.children("select").valString() == "")
    // selected option
    val r5 = load("""
  <select>
    <option value="1">1</option>
    <option value="2" selected="selected">2</option>
    <option value="3">3</option>
  </select>
  """)
    assert(r5.children("select").find("option:checked").length == 1)
    assert(r5.children("select").valString() == "2")
    // selected in optgroup
    val r6 = load("""
  <select>
    <optgroup>
      <option value="1">1</option>
      <option value="2" selected="selected">2</option>
      <option value="3">3</option>
    </optgroup>
  </select>
  """)
    assert(r6.children("select").find("option:checked").length == 1)
    assert(r6.children("select").valString() == "2")
    // multiple select: no default
    val r7 = load("""
  <select multiple>
    <option value="1">1</option>
    <option value="2">2</option>
    <option value="3">3</option>
  </select>
  """)
    assert(r7.children("select").find("option:checked").length == 0)
    assert(r7.children("select").valString() == "")
    val r8 = load("""
  <select multiple>
    <optgroup>
      <option value="1">1</option>
      <option value="2">2</option>
      <option value="3">3</option>
    </optgroup>
  </select>
  """)
    assert(r8.children("select").find("option:checked").length == 0)
    assert(r8.children("select").valString() == "")
    // multiple with selections across optgroups
    val r9 = load("""
  <select multiple>
    <optgroup>
      <option value="1">1</option>
      <option value="2" selected>2</option>
      <option value="3" selected>3</option>
    </optgroup>
    <optgroup>
      <option value="4">4</option>
      <option value="5" selected>5</option>
      <option value="6">6</option>
    </optgroup>
    <option value="7" selected>7</option>
  </select>
  """)
    assert(r9.children("select").find("option:checked").length == 4)
    assert(r9.children("select").valString() == "2,3,5,7")
    assert(r9.children("select").valList().mkString == "2357")
  }

  test("set_html") { // tests/content.rs:155-180
    val root = load("""<div class="parent"></div>""")
    val parent = root.children(".parent")
    val setted = "This is a <strong>test</strong>!"
    val onlyText = "This is a test!"
    parent.setHtml(setted)
    assert(parent.text() == onlyText)
    assert(parent.children("strong").length == 1)
    assert(parent.html() == setted)
    parent.setHtml("")
    assert(parent.html().isEmpty)
    // pre tag
    val root2 = load("""<pre class="parent"></pre>""")
    val p2 = root2.children(".parent")
    p2.setHtml(setted)
    assert(p2.html() == setted)
    assert(p2.text() == onlyText)
    assert(p2.children("strong").length == 1)
    p2.setHtml("")
    assert(p2.html().isEmpty)
  }

  test("text-node set_html") { // tests/content.rs:183-209
    val text = "This is a test!"
    val root = load(s"""<div class="parent">$text</div>""")
    val parent = root.children(".parent")
    val texts = parent.texts(1)
    assert(texts.length == 1)
    texts.forEach { (_, node) =>
      assert(node.text() == text)
      node.setHtml("This is a <strong>test</strong>!")
      true
    }
    assert(parent.text() == text)
    assert(parent.children("strong").length == 1)
    assert(parent.children("strong").text() == "test")
    // self-closing tag with '='-leading attr key
    val root2 = load("<div></div>")
    val div = root2.find("div")
    assert(div.length == 1)
    assert(div.text() == "")
    div.setHtml("<b =123/>")
    assert(div.children("b").length == 1)
    assert(div.children("b").attr("=123").isDefined)
  }

  test("set_text") { // tests/content.rs:212-257
    val root = load("""<div class="parent"></div>""")
    val parent = root.children(".parent")
    val setted = "This is a <strong>test</strong>!"
    val encodedSetted = "This is a &lt;strong&gt;test&lt;/strong&gt;!"
    parent.setText(setted)
    assert(parent.text() == setted)
    assert(parent.children("strong").length == 0)
    assert(parent.html() == encodedSetted)
    parent.setText("")
    assert(parent.text().isEmpty)
    // pre tag
    val root2 = load("""<pre class="parent"></pre>""")
    val p2 = root2.children(".parent")
    p2.setText(setted)
    assert(p2.html() == encodedSetted)
    assert(p2.text() == setted)
    assert(p2.children("strong").length == 0)
    p2.setText("")
    assert(p2.text().isEmpty)
    // script tag: raw
    val innerScript = "var a = 1;"
    val r3 = load(s"<script>$innerScript</script>")
    val script = r3.find("script")
    assert(script.length == 1)
    assert(script.text() == innerScript)
    script.setText("var b = 2;")
    assert(script.text() == "var b = 2;")
    // style
    val r4 = load("<style></style>")
    val style = r4.find("style")
    assert(style.length == 1)
    assert(style.text() == "")
    val innerStyle = "body{background:blue;}"
    style.setHtml(innerStyle)
    assert(style.text() == innerStyle)
    assert(style.html() == innerStyle)
  }

  test("inner/outer html") { // tests/content.rs:263-310
    val innerHtml = "abc<span>def</span>ghj"
    val root = load(s"<div>$innerHtml</div>")
    assert(root.find("div").html() == innerHtml)
    assert(root.find("p").html() == "")
    val r2 = load(s"<div>$innerHtml</div><div>$innerHtml</div>")
    assert(r2.find("div").eq(0).htmls() == innerHtml)
    assert(r2.find("div").htmls() == innerHtml + innerHtml)
    assert(r2.find("p").htmls() == "")
    val code = s"<div>$innerHtml</div>"
    val r3 = load(code)
    assert(r3.find("div").outerHtml() == code)
    assert(r3.find("p").outerHtml() == "")
    val r4 = load(code + code)
    assert(r4.find("div").eq(0).outerHtmls() == code)
    assert(r4.find("div").outerHtmls() == code + code)
    assert(r4.find("p").outerHtmls() == "")
  }

  test("texts() depth and filters") { // tests/content.rs:313-380
    val html = """
    <div id="content">FIRST-ABC<div>SECOND-ABC<style>.a{{color:red}}</style>SECOND-DEF</div><script>var a = 1;</script>FIRST-DEF</div>
  """
    val root = load(html)
    val content = root.find("#content")
    assert(content.texts(0).length == 6)
    assert(content.texts(1).length == 3)
    def notElement(doc: graft.query.VDoc)(depth: Int, id: Int): Boolean =
      doc.arena.kind(id) != doc.arena.ELEM
    assert(content.textsBy(0, notElement(root.doc)).length == 4)
    assert(content.textsBy(1, notElement(root.doc)).length == 2)
    // content tag itself as a text node
    val r2 = load("<script>var a = 1;</script>")
    val script = r2.find("script")
    val texts = script.texts(0)
    assert(texts.length == 1)
    texts.forEach { (_, node) => assert(node.text() == "var a = 1;"); true }
    assert(script.textsBy(0, notElement(r2.doc)).length == 0)
    // svg + rec handle
    val r3 = load("""<div id="text">abc<script>var a = 1;</script><svg xmlns="http://www.w3.org/2000/svg" version="1.1"><text x="0" y="15" fill="red" transform="rotate(30 20,40)">I love SVG</text></svg></div>""")
    val textDiv = r3.find("#text")
    assert(textDiv.texts(0).length == 3)
    assert(textDiv.textsBy(0, notElement(r3.doc)).length == 2)
    assert(textDiv.textsByRec(0, notElement(r3.doc),
      ele => r3.doc.arena.upperName(ele) != "SVG").length == 1)
  }
}
