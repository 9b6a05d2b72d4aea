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
