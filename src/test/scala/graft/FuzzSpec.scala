package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.html.{ParseOptions, Parser}
import graft.dom.Arena
import graft.query.Vis
import graft.selector.Selector
import graft.spark.Extractor

/** Fuzz hardening: at corpus scale the engine sees arbitrary bytes. The
  * lenient profile must never throw, renders must be stable, and garbage
  * selectors must come back as Left (error channel), never exceptions. */
class FuzzSpec extends AnyFunSuite {
  private val rnd = new scala.util.Random(1234)

  test("lenient parse never throws on random char soup") {
    val alphabet = "<>/=\"' abc&;#!-[]()x\t\né你"
    for (_ <- 1 to 3000) {
      val s = (0 until rnd.nextInt(120)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      val arena = new Arena(64)
      Parser.parseInto(arena, s, ParseOptions.compat) match {
        case Some(e) => fail(s"lenient parse errored on ${s.take(80)}: ${e.message}")
        case None =>
          // render + text must not throw either
          arena.sourceCode()
          arena.text(0)
      }
    }
  }

  test("lenient parse never throws on random bytes (UTF-8 path)") {
    for (_ <- 1 to 2000) {
      val bytes = new Array[Byte](rnd.nextInt(200))
      rnd.nextBytes(bytes)
      val out = Extractor.extractMain(bytes, Extractor.Recipe.default)
      assert(out != null) // lenient profile always recovers
      assert(Extractor.extractMainCodegen(bytes) != null)
    }
  }

  test("parse(render(parse(x))) is a fixpoint on char soup") {
    val alphabet = "<>/= \"'abc&;x-"
    for (_ <- 1 to 1500) {
      val s = (0 until rnd.nextInt(80)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      val r1 = Vis.load(s).toOption.get.doc.sourceCode
      val r2 = Vis.load(r1).toOption.get.doc.sourceCode
      assert(r1 == r2, s"not a fixpoint for input: ${s.take(80)}")
    }
  }

  test("byte tokenizer (SWAR scan) == char tokenizer on ASCII soup") {
    // differential: parseIntoUtf8 (SWAR 8-byte '<' scan, fused allocChild)
    // must build the identical tree as the UTF-16 parse for every input —
    // pinned via byte-identical render and text
    val alphabet = "<>/=\"' abc&;#!-x"
    for (_ <- 1 to 2000) {
      val s = (0 until rnd.nextInt(150)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      val a1 = new Arena(64)
      val a2 = new Arena(64)
      assert(Parser.parseInto(a1, s, ParseOptions.compat).isEmpty)
      assert(Parser.parseIntoUtf8(a2,
        s.getBytes(java.nio.charset.StandardCharsets.UTF_8), ParseOptions.compat).isEmpty)
      assert(a1.sourceCode() == a2.sourceCode(), s"render diverged on: ${s.take(100)}")
      assert(a1.text(0) == a2.text(0), s"text diverged on: ${s.take(100)}")
    }
  }

  test("SWAR scan boundary cases: '<' at every offset mod 8, at EOF, none at all") {
    // place a tag start at every alignment relative to the 8-byte words
    for (pad <- 0 until 24) {
      val s = ("x" * pad) + "<b>y</b>" + ("z" * ((24 - pad) % 9))
      val root = Vis.loadOrThrow(s)
      assert(root.find("b").text() == "y", s"pad=$pad")
    }
    // '<' as the very last byte (tail loop, classify sees EOF)
    assert(Vis.loadOrThrow("abc<").doc.sourceCode == "abc<")
    // no '<' anywhere: one text node spanning the buffer
    val plain = "q" * 1000
    assert(Vis.loadOrThrow(plain).doc.sourceCode == plain)
    // content tag close straddling word boundaries
    for (pad <- 0 until 16) {
      val s = ("p" * pad) + "<script>a<b()" + ("c" * pad) + "</script>tail"
      val root = Vis.loadOrThrow(s)
      assert(root.find("script").length == 1, s"pad=$pad")
      assert(root.doc.sourceCode.endsWith("</script>tail"), s"pad=$pad")
    }
  }

  test("PDF extractor never throws on random bytes / random %PDF-prefixed soup") {
    for (_ <- 1 to 1000) {
      val bytes = new Array[Byte](rnd.nextInt(400))
      rnd.nextBytes(bytes)
      graft.spark.PdfOps.extractPdfText(bytes) // null or text, never a throw
      graft.spark.PdfOps.pageCount(bytes)
      // force the tolerant parse path: a valid header + random guts,
      // sometimes with stream/endstream markers spliced in
      val soup = "%PDF-1.4\n".getBytes ++ bytes ++
        (if (rnd.nextBoolean()) "stream\n".getBytes ++ bytes ++ "endstream".getBytes
         else Array.empty[Byte])
      assert(graft.spark.PdfOps.extractPdfText(soup) != null || true) // no throw
      graft.spark.PdfOps.pageCount(soup)
    }
  }

  test("PDF structured tier never throws on corrupted modern PDFs (xref stream / ObjStm)") {
    // take real xref-stream/ObjStm PDFs and flip bits / truncate: the
    // structured path must degrade to fallback or null, never throw
    for (trial <- 1 to 400) {
      val id = 2L + 4 * rnd.nextInt(20) + (if (rnd.nextBoolean()) 1 else 0) // v2 or v3
      val pdf = graft.spark.PdfOps.synthPdf(id)
      val mutated = pdf.clone()
      rnd.nextInt(3) match {
        case 0 => // bit flips anywhere (xref widths, ObjStm header, predictor rows)
          for (_ <- 0 to rnd.nextInt(8))
            mutated(rnd.nextInt(mutated.length)) = (rnd.nextInt(256) - 128).toByte
        case 1 => // truncate (half-written crawl fetch)
          val cut = 8 + rnd.nextInt(mutated.length - 8)
          val t = java.util.Arrays.copyOf(mutated, cut)
          graft.spark.PdfOps.extractPdfText(t)
          graft.spark.PdfOps.pageCount(t)
        case _ => // splice garbage into the startxref offset digits
          val sx = new String(mutated, "ISO-8859-1").lastIndexOf("startxref")
          if (sx >= 0 && sx + 12 < mutated.length)
            mutated(sx + 10 + rnd.nextInt(2)) = ('0' + rnd.nextInt(10)).toByte
      }
      graft.spark.PdfOps.extractPdfText(mutated) // never a throw
      graft.spark.PdfOps.pageCount(mutated)
    }
  }

  test("garbage selectors return Left, never throw") {
    val alphabet = ":()[]>+~,.#*=^$|!'\" abz-0"
    for (_ <- 1 to 3000) {
      val s = (0 until rnd.nextInt(30)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      Selector.parse(s) // must not throw; Either is the contract
      Selector.parse(s, useLookup = false)
    }
  }

  test("engine methods on fuzz docs never throw") {
    val alphabet = "<>/=\"' abc&;x"
    val sels = Seq("div", ".a", "#b", "[x]", ":nth-child(2n+1)", "a > b + c ~ d",
      ":not(a)", ":has(b)", ":contains('x')", "*")
    for (_ <- 1 to 300) {
      val s = (0 until rnd.nextInt(100)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      val root = Vis.loadCatch(s, _ => ())
      sels.foreach { sel =>
        val found = root.find(sel)
        found.text(); found.html(); found.outerHtmls()
        found.parent(""); found.children(""); found.siblings("")
        found.nextAll(""); found.prevAll(""); found.closest("div")
        found.texts(0)
      }
    }
  }
}
