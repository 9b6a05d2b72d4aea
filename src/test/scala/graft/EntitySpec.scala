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
}
