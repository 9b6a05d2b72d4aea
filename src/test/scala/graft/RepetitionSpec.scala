package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.spark.Repetition

/** pins [[graft.spark.Repetition]]'s exact definitions with hand-computed
  * fixtures (the same closed forms the q_repetition DuckDB oracle uses). */
class RepetitionSpec extends AnyFunSuite {

  private def sig(text: String): Array[Double] = Repetition.signals(text)

  test("dup line/para fractions and top bigram on a planted document") {
    // lines: beta,beta,alpha 4,gamma 1,beta,gamma 1,beta (empties excluded)
    val text = "beta\nbeta\nalpha 4\n\ngamma 1\nbeta\n\ngamma 1\nbeta"
    val v = sig(text)
    assert(v(0) == 4.0 / 7)   // 7 lines, 3 distinct
    assert(v(1) == 19.0 / 37) // repeat-occurrence chars 4+4+7+4 over 37
    assert(v(2) == 1.0 / 3)   // 3 paragraphs, p2 == p3
    assert(v(3) == 12.0 / 41) // p3's 12 chars over 17+12+12
    // bigram tie (gamma,1) vs (1,beta) both x2 -> earliest first occurrence
    assert(v(4) == 12.0 / 34) // (5+1)*2 over total word chars 34
  }

  test("no repetition -> zero dup fractions") {
    val v = sig("one two\nthree four")
    assert(v(0) == 0.0 && v(1) == 0.0 && v(2) == 0.0 && v(3) == 0.0)
    // 3 distinct bigrams, all x1 -> earliest: (one,two), (3+3)*1/15
    assert(v(4) == 6.0 / 15)
  }

  test("single repeated pair dominates the bigram signal") {
    val v = sig("a b a b a")
    assert(v(4) == 4.0 / 5) // (a b) x2 covers words 0-3, 4 of 5 word chars
  }

  test("overlapping occurrences count coverage once (union, never > 1)") {
    // (hh,hh) x2 at j=0,1 overlap on word 1 -> covers words 0,1,2 = 6 of 7
    assert(sig("hh hh hh x")(4) == 6.0 / 7)
    assert(sig("hh hh hh")(4) == 1.0)
  }

  test("degenerate inputs") {
    assert(sig(null) == null)
    val empty = sig("")
    assert(empty.forall(_ == 0.0))
    val oneWord = sig("hello")
    assert(oneWord(4) == 0.0) // < 2 words
    // whitespace-only: no lines with content? "  " is a non-empty line
    val ws = sig("  \n  ")
    assert(ws(0) == 0.5) // two identical "  " lines
    assert(ws(4) == 0.0) // no words
  }

  test("paragraph chars include internal newlines") {
    // p1 = "x\ny" (3 chars incl newline), p2 = "x\ny" -> dup chars 3/6
    val v = sig("x\ny\n\nx\ny")
    assert(v(2) == 0.5 && v(3) == 0.5)
  }
}
