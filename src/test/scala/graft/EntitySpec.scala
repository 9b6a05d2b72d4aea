package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.dom.Entities
import graft.query.Vis

/** HTML5 named-entity table checks: known codepoints per family, WHATWG
  * remaps, and a full-table sweep through the real parse -> text() path. */
class EntitySpec extends AnyFunSuite {

  private def dec(s: String): String = Entities.decode(s)

  test("table carries the full HTML5 surface (size + family spot checks)") {
    assert(Entities.namedCount >= 1200, s"table has ${Entities.namedCount} names")
    val expect = Map(
      // typographic (ubiquitous in crawls — round-1 gap)
      "hellip" -> "…", "ndash" -> "–", "rsquo" -> "’",
      "ldquo" -> "“", "mldr" -> "…", "hyphen" -> "‐",
      // ASCII names
      "excl" -> "!", "commat" -> "@", "lpar" -> "(", "sol" -> "/",
      "bsol" -> "\\", "Hat" -> "^", "lowbar" -> "_", "vert" -> "|",
      // legacy uppercase
      "AMP" -> "&", "COPY" -> "©",
      // Latin Extended-A
      "Amacr" -> "Ā", "lstrok" -> "ł", "eng" -> "ŋ",
      "Zcaron" -> "Ž", "ijlig" -> "ĳ",
      // Greek variants
      "epsiv" -> "ϵ", "phiv" -> "ϕ", "varkappa" -> "ϰ",
      "digamma" -> "ϝ", "ohm" -> "Ω",
      // Cyrillic
      "Acy" -> "А", "zhcy" -> "ж", "SHCHcy" -> "Щ",
      "yacy" -> "я", "iocy" -> "ё", "DZcy" -> "Џ",
      // math alphanumerics incl. letterlike exceptions
      "Copf" -> "ℂ", "Ropf" -> "ℝ", "Aopf" -> "𝔸",
      "zopf" -> "𝕫", "Bscr" -> "ℬ", "escr" -> "ℯ",
      "Hfr" -> "ℌ", "afr" -> "𝔞",
      // box drawing (case = double axis)
      "boxh" -> "─", "boxDR" -> "╔", "boxdR" -> "╒",
      "boxVH" -> "╬", "boxHu" -> "╧",
      // arrows
      "mapsto" -> "↦", "hookleftarrow" -> "↩",
      "nleftarrow" -> "↚", "rightleftharpoons" -> "⇌",
      "xrArr" -> "⟹", "Implies" -> "⇒",
      // operators / relations
      "nexist" -> "∄", "setminus" -> "∖", "therefore" -> "∴",
      "nsim" -> "≁", "doteq" -> "≐", "ll" -> "≪",
      "preccurlyeq" -> "≼", "sqsubseteq" -> "⊑",
      "boxtimes" -> "⊠", "vdash" -> "⊢", "bigwedge" -> "⋀",
      "bowtie" -> "⋈", "lessdot" -> "⋖",
      // fractions / shapes / misc
      "frac13" -> "⅓", "frac78" -> "⅞", "bigstar" -> "★",
      "checkmark" -> "✓", "filig" -> "ﬁ", "numero" -> "№",
      // WHATWG remaps vs HTML4
      "lang" -> "⟨", "rang" -> "⟩", "angst" -> "Å")
    expect.foreach { case (n, v) =>
      assert(dec(s"&$n;") == v, s"&$n; decoded to ${dec(s"&$n;")}")
    }
  }

  test("full-table sweep: every name decodes through parse -> text()") {
    val names = Entities.namedNames.toSeq.sorted
    names.grouped(100).foreach { group =>
      val html = "<p>" + group.map(n => s"&$n;").mkString("|") + "</p>"
      val root = Vis.load(html).fold(e => fail(e), identity)
      val got = root.find("p").text()
      val want = group.map(n => Entities.namedValue(n)).mkString("|")
      assert(got == want, s"sweep group starting ${group.head}")
    }
  }

  test("unknown and unterminated names stay verbatim") {
    assert(dec("&notaname;") == "&notaname;")
    assert(dec("&hellip") == "&hellip") // no terminating ';'
    assert(dec("a && b") == "a && b")
    assert(dec("&#x;") == "&#x;")
  }

  test("COMPLETE and CORRECT vs the checked-in WHATWG table (independent pin)") {
    // src/test/resources/whatwg_entities.tsv is generated from the
    // published WHATWG HTML5 named-character-reference list — an
    // implementation-independent fixture, so a wrong codepoint in the Scala
    // table cannot self-certify (the q_entities oracle literal is generated
    // from this same decode table; this test is the external anchor).
    val in = getClass.getResourceAsStream("/whatwg_entities.tsv")
    val lines = scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filterNot(_.startsWith("#")).toVector
    assert(lines.size == 2125)
    var checked = 0
    lines.foreach { line =>
      val Array(name, hexes) = line.split('\t')
      val want = hexes.split(',').map(h => Integer.parseInt(h, 16))
        .foldLeft(new java.lang.StringBuilder)((sb, cp) => sb.appendCodePoint(cp))
        .toString
      assert(Entities.namedValue(name) == want,
        s"&$name; decodes to ${Option(Entities.namedValue(name))}, WHATWG says $want")
      checked += 1
    }
    assert(checked == 2125)
    // and nothing beyond the spec: no invented names decode
    assert(Entities.namedCount == 2125)
  }

  test("multi-codepoint sequences decode through the full parse path") {
    assert(dec("&nLt;") == "≪⃒")
    assert(dec("&nGt;") == "≫⃒")
    assert(dec("&fjlig;") == "fj")
    assert(dec("&NotEqualTilde;") == "≂̸")
    assert(dec("&bne;") == "=⃥")
    assert(dec("&caps;") == "∩︀")
    assert(dec("&varsubsetneqq;") == "⫋︀")
    assert(dec("&ThickSpace;") == "  ")
    assert(dec("&NotSubset;") == "⊂⃒")
  }
}
