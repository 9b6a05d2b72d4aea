package graft

import graft.spark.{GopherFilter, Repetition, TextNorm, TextOps, UrlOps}

import org.scalatest.funsuite.AnyFunSuite

/** adversarial no-throw + invariant sweep over the round-6 scalar fns:
  * whatever bytes the crawl feeds them, they must return (never throw),
  * fractions must stay in [0,1], and the normalizers must be idempotent.
  * Inputs are generated deterministically (mixed scripts, controls,
  * surrogate halves, pathological separators/digit runs). */
class RoundSixFuzzSpec extends AnyFunSuite {

  private def mix(x: Long): Long = {
    var h = x * 0x9e3779b97f4a7c15L
    h ^= h >>> 32; h *= 0xbf58476d1ce4e5b9L; h ^= h >>> 29
    h
  }

  /** deterministic adversarial string #i. */
  private def gen(i: Int): String = {
    val r = mix(i.toLong)
    val len = ((r >>> 8) % 300).toInt + (i % 3)
    val sb = new java.lang.StringBuilder(len)
    var k = 0
    while (k < len) {
      val v = mix(r + k)
      (math.floorMod(v, 12L).toInt: @unchecked) match {
        case 0 => sb.append(('a' + math.floorMod(v >> 8, 26L).toInt).toChar)
        case 1 => sb.append(('0' + math.floorMod(v >> 8, 10L).toInt).toChar)
        case 2 => sb.append(Array(' ', '\t', '\n', '-', '.', '#')(math.floorMod(v >> 8, 6L).toInt))
        case 3 => sb.append(Array('•', '…', '€', '™', 'Ã', '©', 'Â')(math.floorMod(v >> 8, 7L).toInt))
        case 4 => sb.append((0x80 + math.floorMod(v >> 8, 0x80L).toInt).toChar) // C1/Latin-1
        case 5 => sb.append((0x4E00 + math.floorMod(v >> 8, 0x100L).toInt).toChar) // CJK
        case 6 => sb.append((math.floorMod(v >> 8, 0x20L)).toInt.toChar) // C0 controls
        case 7 => sb.append((0xD800 + math.floorMod(v >> 8, 0x800L).toInt).toChar) // lone surrogate
        case 8 => sb.append("\n\n")
        case 9 => sb.append("...")
        case 10 =>
          val words = Seq("the", "of", "4111111111111111", "a@b.io",
            "10.0.0.1", "+1 (555) 123-4567")
          sb.append(words(math.floorMod(v >> 8, 6L).toInt)).append(' ')
        case 11 => sb.append((0xFF00 + math.floorMod(v >> 8, 0xF0L).toInt).toChar) // fullwidth
      }
      k += 1
    }
    sb.toString
  }

  private val N = 600

  test("gopher_quality: never throws; fractions in [0,1]; counts sane") {
    (0 until N).foreach { i =>
      val s = gen(i)
      val v = GopherFilter.signals(s)
      assert(v != null)
      val wc = v(0).asInstanceOf[Long]
      assert(wc >= 0)
      Seq(3, 4, 5).foreach { j =>
        val f = v(j).asInstanceOf[Double]
        assert(f >= 0.0 && f <= 1.0, s"field $j out of range on #$i")
      }
      assert(v(2).asInstanceOf[Double] >= 0.0) // symbol ratio unbounded above
      val hits = v(6).asInstanceOf[Long]
      assert(hits >= 0 && hits <= 8)
    }
  }

  test("repetition_signals: never throws; all five fractions in [0,1]") {
    (0 until N).foreach { i =>
      val v = Repetition.signals(gen(i))
      assert(v != null)
      v.foreach(f => assert(f >= 0.0 && f <= 1.0, s"out of range on #$i"))
    }
  }

  test("fix_text: never throws; idempotent on every input") {
    (0 until N).foreach { i =>
      val once = TextNorm.fixText(gen(i))
      assert(once != null)
      assert(TextNorm.fixText(once) == once, s"not idempotent on #$i")
    }
  }

  test("scrub_pii + scrub_cards: never throw; idempotent; no digits leak into tokens") {
    (0 until N).foreach { i =>
      val s = gen(i)
      val out = TextNorm.scrubPii(TextNorm.scrubCards(s))
      assert(out != null)
      assert(TextNorm.scrubPii(TextNorm.scrubCards(out)) == out, s"not idempotent on #$i")
    }
  }

  test("url_surt: never throws; null or shaped like host-key)/path") {
    (0 until N).foreach { i =>
      val u = "https://" + gen(i).replace('\n', 'x') // scheme-ish, hostile tail
      val out = UrlOps.surt(u)
      assert(out == null || out.contains(")"), s"malformed surt on #$i")
    }
    // plain garbage and relative refs are null, never a throw
    (0 until 100).foreach(i => UrlOps.surt(gen(i)))
  }

  test("gram hashes / winnowing / simhash: never throw on hostile text") {
    (0 until N).foreach { i =>
      val s = gen(i)
      TextOps.shingleHashes(s, 3)
      TextOps.simHash(s)
      TextOps.winnowSet(s)
      TextOps.langId(s)
    }
  }
}
