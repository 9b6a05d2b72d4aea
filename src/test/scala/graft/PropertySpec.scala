package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.query.{Engine, Vis}
import graft.dom.Entities

/** Property-style tests (seeded exhaustive/random sweeps): An+B
  * allowed-index math against brute force (reference pattern.rs:482-513
  * generalized), parse→render→parse idempotence, entity round trips,
  * template extraction byte-identity. */
class PropertySpec extends AnyFunSuite {
  private val rnd = new scala.util.Random(42)

  test("nth allowed-indexes == brute force enumeration") {
    for {
      n <- -6L to 6L
      idx <- -10L to 15L
      total <- 0 to 40 by 3
    } {
      val got = Engine.allowedIndexes(hasN = true, n, idx, total).toSet
      val expect = (1 to total).filter { p =>
        if (n == 0) p.toLong == idx
        else {
          val diff = p - idx
          diff % n == 0 && diff / n >= 0
        }
      }.map(_ - 1).toSet
      assert(got == expect, s"n=$n idx=$idx total=$total")
    }
  }

  test("constant-index nth") {
    for (idx <- -5L to 20L; total <- 0 to 15) {
      val got = Engine.allowedIndexes(hasN = false, 0, idx, total).toSet
      val expect = if (idx >= 1 && idx <= total) Set((idx - 1).toInt) else Set.empty[Int]
      assert(got == expect)
    }
  }

  test("entity decode(encodeSpecial(x)) == x") {
    def randStr(): String =
      (0 until rnd.nextInt(60)).map(_ => (32 + rnd.nextInt(95)).toChar).mkString
    for (_ <- 1 to 500) {
      val s = randStr()
      assert(Entities.decode(Entities.encodeSpecial(s)) == s)
    }
    assert(Entities.decode(Entities.encodeSpecial("好用 <&> 'x' \"y\"")) == "好用 <&> 'x' \"y\"")
    assert(Entities.decode("&#x4F60;&#22909;&nbsp;&amp;amp;") == "你好 &amp;")
  }

  test("parse -> render(source_code) is byte-identical for generated trees") {
    val tags = Array("div", "span", "p", "li", "section")
    def genHtml(depth: Int): String =
      if (depth == 0) rnd.alphanumeric.take(rnd.nextInt(8)).mkString
      else {
        val t = tags(rnd.nextInt(tags.length))
        val cls = rnd.alphanumeric.take(5).mkString
        val kids = (0 until rnd.nextInt(4)).map(_ => genHtml(depth - 1)).mkString
        s"""<$t class="$cls">$kids</$t>"""
      }
    for (_ <- 1 to 200) {
      val html = (0 until 3).map(_ => genHtml(3)).mkString
      val root = Vis.load(html).toOption.get
      assert(root.doc.sourceCode == html)
      val again = Vis.load(root.doc.sourceCode).toOption.get
      assert(again.doc.sourceCode == html)
    }
  }

  test("extraction is byte-identical across all page templates") {
    import graft.spark.{Extractor, PagesGen}
    for (id <- 0L until 64L) {
      val text = (0 until rnd.nextInt(50)).map(_ => (32 + rnd.nextInt(95)).toChar).mkString
      val html = PagesGen.htmlOf(id, text, "en")
      val got = Extractor.extractMain(html, Extractor.Recipe.default)
      assert(got == text, s"template=${id % 4} text=${text.take(40)}")
      // and via the UTF-8 byte path
      val got2 = Extractor.extractMain(
        html.getBytes(java.nio.charset.StandardCharsets.UTF_8), Extractor.Recipe.default)
      assert(got2 == text)
    }
    // multi-byte payloads through the byte path
    val zh = "好用，这是一段中文正文 — with mixed ascii"
    for (id <- 0L until 4L) {
      val html = PagesGen.htmlOf(id, zh, "zh")
      assert(Extractor.extractMain(
        html.getBytes(java.nio.charset.StandardCharsets.UTF_8), Extractor.Recipe.default) == zh)
    }
  }

  test("dense bench pages extract byte-identically") {
    import graft.spark.{Extractor, PagesGen}
    for (id <- 0L until 16L) {
      val text = (0 until rnd.nextInt(80)).map(_ => (32 + rnd.nextInt(95)).toChar).mkString
      val html = PagesGen.htmlOfDense(id, text, "en", 5)
      val bytes = html.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      assert(Extractor.extractMain(bytes, Extractor.Recipe.default) == text, s"template=${id % 4}")
      assert(Extractor.extractMainCodegen(bytes).toString == text)
    }
  }

  test("crawler-bomb nesting does not overflow extraction") {
    import graft.spark.Extractor
    val bomb = ("<div>" * 100000) + "deep" + ("</div>" * 100000)
    val html = s"<html><body><main>ok</main>$bomb</body></html>"
    val out = Extractor.extractMain(
      html.getBytes(java.nio.charset.StandardCharsets.UTF_8), Extractor.Recipe.default)
    assert(out == "ok")
    val viaCodegen = Extractor.extractMainCodegen(
      html.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    assert(viaCodegen != null && viaCodegen.toString == "ok")
  }

  test("UTF-8 fast path == String path (textContentUtf8 lockstep)") {
    import graft.spark.{Extractor, PagesGen}
    val payloads = Seq(
      "plain words here",
      "entities &amp; &lt;tags&gt; &#x4F60;&#22909; &nbsp;done",
      "好用，这是一段中文 mixed with ascii and 😀 emoji",
      "quotes 'single' and \"double\" plus <angle>",
      "")
    for ((p, i) <- payloads.zipWithIndex; id <- 0L until 4L) {
      val html = PagesGen.htmlOf(id + i, p, "en")
      val bytes = html.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val viaString = Extractor.extractMain(bytes, Extractor.Recipe.default)
      val viaUtf8 = Extractor.extractMainCodegen(bytes)
      assert(viaUtf8 != null && viaUtf8.toString == viaString)
    }
  }

  test("sortAndUnique: shuffled/duplicated sets come back doc-ordered and unique (both sort paths)") {
    // one wide+deep doc so node count comfortably exceeds the 64-element
    // insertion-sort threshold — exercises the TimSort fallback
    val html = "<div>" + (1 to 40).map(i =>
      s"<section><p>a$i</p><p>b$i<span>s$i</span></p><p>c$i</p></section>").mkString + "</div>"
    val root = Vis.loadOrThrow(html)
    val doc = root.doc
    val a = doc.arena
    val all = scala.collection.mutable.ArrayBuffer.empty[Int]
    def walk(n: Int): Unit = {
      var c = a.firstChild(n)
      while (c >= 0) { if (a.kind(c) == a.ELEM) { all += c; walk(c) }; c = a.nextSib(c) }
    }
    walk(0)
    assert(all.length > 64)
    val expected = all.toVector // the walk IS document order
    for (trial <- 1 to 30) {
      val n = 1 + rnd.nextInt(all.length)
      val picked = rnd.shuffle(all.toVector).take(n)
      val withDups = picked ++ picked.take(rnd.nextInt(n))
      val shuffled = rnd.shuffle(withDups)
      val out = Engine.sortAndUnique(a, scala.collection.mutable.ArrayBuffer(shuffled: _*))
      val want = expected.filter(picked.contains)
      assert(out.toVector == want, s"trial $trial n=$n")
    }
    // small-set insertion path too
    for (_ <- 1 to 50) {
      val picked = rnd.shuffle(all.toVector).take(1 + rnd.nextInt(10))
      val out = Engine.sortAndUnique(a, scala.collection.mutable.ArrayBuffer(rnd.shuffle(picked): _*))
      assert(out.toVector == expected.filter(picked.contains))
    }
  }

  test("crawl-mode render fixed point: render(parse(render(parse(x)))) == render(parse(x))") {
    // byte-identity to the INPUT can legitimately diverge under the
    // implicit-tree mode (after-body re-entry, unmatched closes), but the
    // rendered form must be a FIXED POINT: one more parse+render cycle
    // changes nothing — the invariant a store-and-reprocess pipeline needs
    val alphabet = "<>/= \"'abpdivulschrtml!-&;0"
    for (trial <- 1 to 400) {
      val soup = (0 until rnd.nextInt(120)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      val r1 = Vis.loadOptionsCatch(soup, graft.html.ParseOptions.crawl, _ => ()).doc.sourceCode
      val r2 = Vis.loadOptionsCatch(r1, graft.html.ParseOptions.crawl, _ => ()).doc.sourceCode
      assert(r2 == r1, s"trial $trial: not a fixed point for soup '$soup'")
    }
    // structured crawl-ish fragments hit the implied-element machinery
    val frags = Seq("<li>a<li>b", "<p>x<div>y", "<td>c<td>d", "<title>t</title>text",
      "<meta x=1><p>z</body>tail", "</body></html>", "<b><i>deep<p>q<p>r")
    frags.foreach { f =>
      val r1 = Vis.loadOptionsCatch(f, graft.html.ParseOptions.crawl, _ => ()).doc.sourceCode
      val r2 = Vis.loadOptionsCatch(r1, graft.html.ParseOptions.crawl, _ => ()).doc.sourceCode
      assert(r2 == r1, s"fragment '$f'")
    }
  }

  test("crawl-mode engine methods on fuzz docs never throw") {
    val alphabet = "<>/=\"' abc&;x"
    val sels = Seq("body > *", "html head title", "li", "p", "ul > li", "*")
    for (_ <- 1 to 200) {
      val s = (0 until rnd.nextInt(100)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      val root = Vis.loadOptionsCatch(s, graft.html.ParseOptions.crawl, _ => ())
      sels.foreach { sel =>
        val found = root.find(sel)
        found.text(); found.outerHtmls(); found.parent(""); found.siblings("")
      }
    }
  }

  test("textops invariants: jaccard bounds/symmetry, simhash order-invariance, band whitespace-invariance") {
    import graft.spark.TextOps
    val rnd = new scala.util.Random(42)
    (0 until 200).foreach { _ =>
      val n = 1 + rnd.nextInt(30)
      val toksA = Seq.fill(n)("t" + rnd.nextInt(40))
      val toksB = Seq.fill(1 + rnd.nextInt(30))("t" + rnd.nextInt(40))
      val a = toksA.mkString(" ")
      val b = toksB.mkString(" ")
      val j = TextOps.jaccard(a, b, 3)
      assert(j >= 0.0 && j <= 1.0)
      assert(j == TextOps.jaccard(b, a, 3)) // symmetric
      assert(TextOps.jaccard(a, a, 3) == 1.0)
      // simhash is a token-bag signature: order does not matter
      val shuffled = rnd.shuffle(toksA).mkString(" ")
      assert(TextOps.simHash(a) == TextOps.simHash(shuffled))
      // band keys are whitespace-run-invariant
      val ka = TextOps.minHashBandKeys(a, 3, 16, 4)
      val kw = TextOps.minHashBandKeys(toksA.mkString("\t \t"), 3, 16, 4)
      if (ka == null) assert(kw == null) else assert(ka.sameElements(kw))
      // langId is total over arbitrary token soup
      assert(Set("en", "de", "es", "fr", "zh", "und").contains(TextOps.langId(a)))
    }
  }
}
