package graft

import graft.spark.GopherFilter

import org.scalatest.funsuite.AnyFunSuite

/** Gopher rule-set boundaries (Rae et al. 2021 A1.1) — every threshold is
  * tested AT the boundary from both sides, plus the counting edge cases
  * the oracle recomputes (greedy `...`, distinct stop words, unicode
  * bullets, punct-trimmed stopword matching). */
class GopherSpec extends AnyFunSuite {

  private def sig(text: String) = GopherFilter.signals(text)
  private def wc(t: String) = sig(t)(0).asInstanceOf[Long]
  private def mwl(t: String) = sig(t)(1).asInstanceOf[Double]
  private def swr(t: String) = sig(t)(2).asInstanceOf[Double]
  private def bullets(t: String) = sig(t)(3).asInstanceOf[Double]
  private def ellipsis(t: String) = sig(t)(4).asInstanceOf[Double]
  private def alpha(t: String) = sig(t)(5).asInstanceOf[Double]
  private def hits(t: String) = sig(t)(6).asInstanceOf[Long]
  private def passes(t: String) = sig(t)(7).asInstanceOf[Boolean]

  /** a baseline passing document: 50 4-char alpha words + 2 stop words. */
  private def passing(extraWords: Int = 0): String =
    "the of " + ("word " * (48 + extraWords)).trim

  test("baseline passes; null in -> null out; empty -> zeros, fail") {
    assert(passes(passing()))
    assert(GopherFilter.signals(null) == null)
    val e = sig("")
    assert(e(0) == 0L && e(1) == 0.0 && e(7) == false)
    assert(sig("   \n\t \n")(0) == 0L)
  }

  test("word count boundary: 50 passes, 49 fails; 100000 passes, 100001 fails") {
    assert(wc(passing()) == 50L)
    assert(passes(passing()))
    assert(!passes("the of " + ("word " * 47).trim)) // 49 words
    val big = "the of " + ("word " * 99998).trim // exactly 100000
    assert(wc(big) == 100000L && passes(big))
    assert(!passes(big + " more"))
  }

  test("mean word length boundaries 3.0 and 10.0 inclusive") {
    // stops sum 5; 47x"and" + one 4-char word -> 150 chars / 50 words = 3.0
    val m3 = "the of " + ("and " * 47).trim + " word"
    assert(wc(m3) == 50L && mwl(m3) == 3.0 && passes(m3))
    // mean 10.0: stops (3+2) + 48 words summing to 495 -> 500/50 = 10.0
    val m10 = "the of " + ("abcdefghij " * 47).trim + " abcdefghijklmnopqrstuvwxy"
    assert(wc(m10) == 50L && mwl(m10) == 10.0 && passes(m10))
    assert(!passes("the of " + ("ab " * 48).trim)) // mean < 3
    assert(!passes("the of " + ("abcdefghijklmno " * 48).trim)) // mean > 10
  }

  test("symbol ratio: greedy non-overlapping '...', '#', unicode ellipsis; < 0.1 strict") {
    assert(swr("a b ....") == 1.0 / 3) // "...." -> one triple
    assert(swr("a ......") == 2.0 / 2) // six dots -> two triples
    assert(swr("x # …") == 2.0 / 3)
    // exactly 0.1 fails (strict <): 50 words, 5 hashes appended to words
    val at = "the of " + ("word " * 43).trim + " " + ("w# " * 5).trim
    assert(wc(at) == 50L && swr(at) == 0.1 && !passes(at))
    val under = "the of " + ("word " * 44).trim + " " + ("w# " * 4).trim
    assert(swr(under) < 0.1 && passes(under))
  }

  test("bullet lines: unicode bullets, leading tabs; <= 0.9 inclusive") {
    assert(bullets("• a\n‣ b\n▪ c\n- d\n* e\nplain") == 5.0 / 6)
    assert(bullets("\t - indented bullet\nplain") == 0.5)
    assert(bullets("") == 0.0)
    // 10 lines, 9 bullets = 0.9 exactly -> still passes the bullet rule
    val nine = (1 to 9).map(i => s"- item $i word word").mkString("\n")
    val t = passing() + "\n" + nine
    assert(bullets(t) == 0.9 && passes(t))
    val ten = t + "\n- one more bullet"
    assert(bullets(ten) > 0.9 && !passes(ten))
  }

  test("ellipsis lines: '...' and '…' ends, trailing whitespace ignored; <= 0.3") {
    assert(ellipsis("truncated...\nalso… \nplain") == 2.0 / 3)
    assert(ellipsis("dots .. only\nplain") == 0.0)
    // 10 lines, 3 ellipsis = 0.3 exactly -> passes
    val t = passing() + "\n" + "more words here...\nkeeps going on...\nstill more..." +
      "\nplain one\nplain two\nplain three\nplain four\nplain five\nplain six"
    assert(ellipsis(t) == 0.3 && passes(t))
  }

  test("alpha word fraction >= 0.8; digits-only words do not count") {
    assert(alpha("abc 123 x9 --- d") == 3.0 / 5)
    // 50 words, 10 digit words -> 0.8 exactly -> passes
    val t = "the of " + ("word " * 38).trim + " " + ("42 " * 10).trim
    assert(wc(t) == 50L && alpha(t) == 0.8 && passes(t))
    val u = "the of " + ("word " * 37).trim + " " + ("42 " * 11).trim
    assert(!passes(u))
  }

  test("stop words: distinct, case-folded, punct-trimmed; >= 2") {
    assert(hits("The THE the, (the)") == 1L) // distinct
    assert(hits("that... with!") == 2L)
    assert(hits("them those other") == 0L) // substrings don't hit
    assert(hits("the be to of and that have with") == 8L)
    val one = "the " + ("word " * 49).trim
    assert(hits(one) == 1L && !passes(one))
  }

  test("whole-word stopword matching survives hyphens and digits") {
    assert(hits("3the2") == 0L) // trim only strips non-alnum: '3the2' stays
    assert(hits("-the-") == 1L)
  }
}
