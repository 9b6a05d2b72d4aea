package graft

import graft.query.{Elems, Vis}

/** Micro-benchmark mirroring the reference's published per-operation table
  * (reference `performance/README.md:9-58`, fixtures generated in code just
  * like `performance/rust/src/main.rs:41-60`): 200-run averages over the
  * same fixture shapes, so BASELINE.md's visdom column is directly
  * comparable. Single-threaded, steady state. */
object MicroBench {
  private def avgMs(runs: Int)(f: => Unit): Double = {
    // steady-state warmup: micro ops run billions of times at corpus scale,
    // so measure C2-compiled code — warm up to 5000 iterations within a 2s
    // budget (the round-1 runs/4 warmup recorded interpreter time for the
    // sub-50µs ops)
    val deadline = System.nanoTime() + 2000000000L
    var i = 0
    while (i < 5000 && (i < runs / 4 || System.nanoTime() < deadline)) { f; i += 1 }
    val t0 = System.nanoTime()
    i = 0
    while (i < runs) { f; i += 1 }
    (System.nanoTime() - t0) / 1e6 / runs
  }

  def main(args: Array[String]): Unit = {
    val R = 200
    // ~370k-char page (reference: load 370k chars in 3.42ms)
    val bigPage = graft.spark.PagesGen.htmlOfDense(0, "x" * 1000, "en", 340)
    println(f"fixture big-page chars=${bigPage.length}")
    val loadMs = avgMs(R)(Vis.load(bigPage))
    println(f"load big page: $loadMs%.3f ms (${bigPage.length / loadMs / 1e3}%.0f MB/s single-core)")

    val ul = "<ul>" + "<li></li>" * 3000 + "<li id='target' class='target'></li></ul>"
    val ulRoot = Vis.load(ul).toOption.get
    def bench(name: String, refMs: Double)(f: => Elems): Unit = {
      var last: Elems = null
      val ms = avgMs(R) { last = f }
      println(f"$name%-42s ${ms}%8.4f ms  (visdom $refMs%6.3f ms)  found=${last.length}")
    }
    bench("find #target (id, 3001 li)", 0.006)(ulRoot.find("#target"))
    bench("find .target (class)", 0.046)(ulRoot.find(".target"))

    val dl = "<dl>" + "<dt></dt><dd contenteditable></dd>" * 1500 + "</dl>"
    val dlRoot = Vis.load(dl).toOption.get
    bench("find dt (name, dl x1500)", 0.436)(dlRoot.find("dt"))
    bench("find [contenteditable]", 0.434)(dlRoot.find("[contenteditable]"))
    val dts = dlRoot.find("dt")
    bench("prev('dd')", 0.406)(dts.prev("dd"))
    bench("next('dd')", 0.411)(dts.next("dd"))
    bench("prevAll('dd')", 1.046)(dts.prevAll("dd"))
    bench("nextAll('dd')", 1.075)(dts.nextAll("dd"))

    val ul2 = "<ul>" + "<li></li><li>a</li>" * 1500 + "</ul>"
    val ul2Root = Vis.load(ul2).toOption.get
    val ul2El = ul2Root.find("ul")
    bench("children(':empty')", 0.504)(ul2El.children(":empty"))
    bench("children(\":contains('a')\")", 1.074)(ul2El.children(":contains('a')"))

    val ul3 = "<ul>" + "<li></li>" * 3000 + "</ul>"
    val ul3El = Vis.load(ul3).toOption.get.find("ul")
    bench("children(':first-child')", 0.026)(ul3El.children(":first-child"))
    bench("children(':last-child')", 0.026)(ul3El.children(":last-child"))
    val dlEl = dlRoot.find("dl")
    bench("children(':first-of-type')", 0.690)(dlEl.children(":first-of-type"))
    bench("children(':last-of-type')", 0.620)(dlEl.children(":last-of-type"))
    bench("children(':nth-child(2n),(3n),(5n)')", 4.308)(
      ul3El.children(":nth-child(2n),:nth-child(3n),:nth-child(5n)"))
    bench("children(':nth-child(10)')", 0.031)(ul3El.children(":nth-child(10)"))
    bench("children(':nth-child(2n + 5)')", 0.598)(ul3El.children(":nth-child(2n + 5)"))
    bench("children(':nth-last-child(2n),(3n),(5n)')", 4.237)(
      ul3El.children(":nth-last-child(2n),:nth-last-child(3n),:nth-last-child(5n)"))
    bench("children(':nth-of-type(2n),(3n)')", 4.873)(
      dlEl.children(":nth-of-type(2n),:nth-of-type(3n)"))
    bench("children(':nth-of-type(10)')", 0.681)(dlEl.children(":nth-of-type(10)"))
    bench("children(':nth-of-type(2n+5)')", 1.714)(dlEl.children(":nth-of-type(2n+5)"))
    bench("children(':nth-last-of-type(2n),(3n)')", 4.704)(
      dlEl.children(":nth-last-of-type(2n),:nth-last-of-type(3n)"))
  }
}
