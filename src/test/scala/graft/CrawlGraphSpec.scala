package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.spark.CrawlGraphOps

/** [[graft.spark.CrawlGraphOps]]: redirect-edge extraction from the WARC
  * page surface and bounded-hop chain resolution (terminals, exact-cap
  * chains, cycles, convergence, duplicate-successor determinism). */
class CrawlGraphSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    // a leaked session from an earlier suite in the shared forked JVM
    // would be adopted by getOrCreate() with THAT suite's config --
    // never this one's extensions; always start fresh
    SparkSession.getActiveSession.foreach(_.stop())
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("crawlgraph-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.spark.GraftSparkExtensions")
      .getOrCreate()
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def edges(pairs: (String, String)*) = {
    val s = spark; import s.implicits._
    pairs.toDF("src", "dst")
  }

  private def resolved(df: org.apache.spark.sql.DataFrame, maxHops: Int) =
    CrawlGraphOps.resolveRedirects(df, maxHops).collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getInt(2), r.getString(3))))
      .toMap

  test("chains resolve to the terminal with exact hop counts") {
    val m = resolved(edges("a" -> "b", "b" -> "c", "c" -> "d"), 8)
    assert(m("a") == (("d", 3, "final")))
    assert(m("b") == (("d", 2, "final")))
    assert(m("c") == (("d", 1, "final")))
  }

  test("a chain of exactly maxHops is final, one longer is capped") {
    val e = edges("a" -> "b", "b" -> "c", "c" -> "d", "d" -> "e")
    val m4 = resolved(e, 4)
    assert(m4("a") == (("e", 4, "final")))
    val m3 = resolved(e, 3)
    assert(m3("a") == (("d", 3, "capped")))
    assert(m3("b") == (("e", 3, "final")))
  }

  test("cycles and self-loops exhaust the budget and classify capped") {
    val m = resolved(edges("a" -> "b", "b" -> "a", "s" -> "s"), 4)
    assert(m("a") == (("a", 4, "capped"))) // even budget lands back home
    assert(m("s") == (("s", 4, "capped")))
  }

  test("convergent chains and duplicate successors are deterministic") {
    // two entry points converge on t; x has two recorded successors —
    // min(dst) wins so the result never depends on row order
    val m = resolved(edges("p" -> "t", "q" -> "t", "x" -> "b", "x" -> "a"), 4)
    assert(m("p") == (("t", 1, "final")) && m("q") == (("t", 1, "final")))
    assert(m("x") == (("a", 1, "final")))
  }

  test("maxHops=1 degenerates to one-step classification") {
    val m = resolved(edges("a" -> "b", "b" -> "c"), 1)
    assert(m("a") == (("b", 1, "capped")))
    assert(m("b") == (("c", 1, "final")))
  }

  test("redirectEdges: 3xx+Location rows only, resolved and normalized") {
    val s = spark; import s.implicits._
    val pages = Seq(
      // relative Location resolves against the record URI
      ("https://A.ex/a/page", Integer.valueOf(301), "../next"),
      // absolute Location, un-normalized spelling collapses
      ("https://b.ex/", Integer.valueOf(302), "HTTPS://B.EX:443/%7eu"),
      // non-redirect statuses and missing Location drop out
      ("https://c.ex/", Integer.valueOf(200), "/ignored"),
      ("https://d.ex/", Integer.valueOf(301), null),
      ("https://e.ex/", null, "/ignored")
    ).toDF("uri", "http_status", "redirect")
    val got = CrawlGraphOps.redirectEdges(pages).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map(
      "https://a.ex/a/page" -> "https://a.ex/next",
      "https://b.ex/" -> "https://b.ex/~u"))
  }

  test("connected components: stars, chains, cycles, bridges, min labels") {
    val s = spark; import s.implicits._
    val edges = Seq(
      (10L, 11L), (10L, 12L), (10L, 13L),           // star, comp 10
      (20L, 21L), (21L, 22L), (22L, 23L),           // chain, comp 20
      (30L, 31L), (31L, 32L), (32L, 30L),           // cycle, comp 30
      (13L, 20L),                                   // bridge star→chain: one comp 10
      (40L, 40L)                                    // self-loop singleton
    ).toDF("a", "b")
    val got = CrawlGraphOps.connectedComponents(edges, maxIters = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((10L to 13L).forall(got(_) == 10L))
    assert((20L to 23L).forall(got(_) == 10L)) // bridged into the star
    assert((30L to 32L).forall(got(_) == 30L))
    assert(got(40L) == 40L)
    assert(got.size == 12) // one row per distinct node in the edge set
  }

  test("connected components: label propagation is exact at ecc, not before") {
    val s = spark; import s.implicits._
    // a 5-edge path: node 5 is 5 hops from min node 0
    val path = (0L until 5L).map(i => (i, i + 1)).toDF("a", "b")
    val exact = CrawlGraphOps.connectedComponents(path, maxIters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L to 5L).forall(exact(_) == 0L))
    val early = CrawlGraphOps.connectedComponents(path, maxIters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(early(5L) == 2L) // documented contract: iters < ecc under-merges
  }

  test("url_path: robots match-target form") {
    import graft.spark.UrlOps
    assert(UrlOps.path("https://a.ex/p/q?x=1#frag") == "/p/q?x=1")
    assert(UrlOps.path("https://a.ex") == "/")
    assert(UrlOps.path("https://a.ex?q=2") == "/?q=2")
    assert(UrlOps.path("/relative/only") == null)
    assert(UrlOps.path(null) == null)
  }

  test("frontier: seen anti-join, robots gate, missing-robots default, cap") {
    val s = spark; import s.implicits._
    val pages = Seq(
      // a.ex has robots disallowing /private/; b.ex has NO robots.txt
      ("""<a href="/keep/1">k</a><a href="/private/1">p</a>
         |<a href="https://b.ex/n1">x</a><a href="/seen">s</a>""".stripMargin
        .getBytes("UTF-8"), "https://a.ex/page"),
      // duplicate link across pages dedups; b.ex link count exceeds cap=2
      ("""<a href="https://b.ex/n1">x</a><a href="https://b.ex/n2">y</a>
         |<a href="https://b.ex/n3">z</a>""".stripMargin
        .getBytes("UTF-8"), "https://b.ex/page")
    ).toDF("html", "page_url")
    val robots = Seq(("a.ex", "User-agent: *\nDisallow: /private/"))
      .toDF("host", "robots_txt")
    val seen = Seq("https://a.ex/seen").toDF("url")
    val got = graft.spark.CrawlGraphOps
      .frontier(pages, robots, "graftbot", seen, maxPerHost = 2)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(
      ("a.ex", "https://a.ex/keep/1"),   // allowed
      ("b.ex", "https://b.ex/n1"),       // no robots.txt → allowed; dedup'd
      ("b.ex", "https://b.ex/n2")))      // cap=2 drops n3; /private/ gated
  }

  test("the WARC HTTP envelope feeds the graph end-to-end") {
    val s = spark; import s.implicits._
    // synthWarcHttp id%4==1 → 301 absolute, id%4==2 → 302 relative
    val pages = Seq(1L, 2L).toDF("id").as[Long].map { id =>
      val pg = graft.spark.WarcOps.parseWarc(graft.spark.WarcOps.synthWarcHttp(id)).head
      (pg.uri, if (pg.status < 0) null else Integer.valueOf(pg.status), pg.location)
    }.toDF("uri", "http_status", "redirect")
    val m = resolved(CrawlGraphOps.redirectEdges(pages), 4)
    assert(m("https://h1.ex/old") == (("https://moved-1.ex/new", 1, "final")))
    assert(m("https://h2.ex/tmp") == (("https://h2.ex/next/2", 1, "final")))
  }

  test("snapshotDiff: all four statuses; multi-capture collapses to latest") {
    val s = spark
    import s.implicits._
    val prev = Seq(
      ("a)/", 10L, "d1"), ("a)/", 20L, "d2"), // two captures: ts 20 wins
      ("b)/", 11L, "same"),
      ("c)/", 12L, "before")).toDF("surt", "ts", "digest")
    val curr = Seq(
      ("a)/", 30L, "d2"), // equals prev's LATEST -> revisit (not d1!)
      ("b)/", 31L, "same"),
      ("d)/", 32L, "fresh")).toDF("surt", "ts", "digest")
    val got = CrawlGraphOps.snapshotDiff(prev, curr).collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got("a)/") == (("revisit", 20L, 30L, 20L)))
    assert(got("b)/") == (("revisit", 11L, 31L, 11L)))
    assert(got("c)/") == (("gone", 12L, -1L, -1L)))
    assert(got("d)/") == (("new", -1L, 32L, -1L)))
    // changed: same surt, different latest digest
    val got2 = CrawlGraphOps.snapshotDiff(
      Seq(("e)/", 1L, "x")).toDF("surt", "ts", "digest"),
      Seq(("e)/", 2L, "y")).toDF("surt", "ts", "digest")).collect().head
    assert(got2.getString(1) == "changed" && got2.getLong(4) == -1L)
  }

  test("pageRank: cycle fixed point, dangling mass conserved, duplicate edges collapse") {
    val s = spark
    import s.implicits._
    // 2-cycle: exact fixed point 0.5/0.5 at any iteration count
    val cyc = CrawlGraphOps.pageRank(
      Seq(("a", "b"), ("b", "a"), ("a", "b")).toDF("src", "dst"), iters = 5)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(cyc("a") - 0.5) < 1e-12 && math.abs(cyc("b") - 0.5) < 1e-12)
    // star into a dangling sink: one hand-computed iteration
    val star = CrawlGraphOps.pageRank(
      Seq(("a", "b"), ("c", "b")).toDF("src", "dst"), iters = 1)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(star("b") - (0.05 + 0.85 * (2.0 / 3 + 1.0 / 9))) < 1e-12)
    assert(math.abs(star("a") - (0.05 + 0.85 * (1.0 / 9))) < 1e-12)
    assert(math.abs(star.values.sum - 1.0) < 1e-12) // mass conserved
    // mass stays conserved over many rounds
    val deep = CrawlGraphOps.pageRank(
      Seq(("a", "b"), ("c", "b"), ("b", "c")).toDF("src", "dst"), iters = 12)
      .collect().map(_.getDouble(1)).sum
    assert(math.abs(deep - 1.0) < 1e-10)
  }

  test("domainBlocked: exact, subdomain, longest entry wins, clean passes") {
    val s = spark
    import s.implicits._
    val urls = Seq(
      "https://ads.tracker.example/x",
      "https://deep.sub.ads.tracker.example/y",
      "https://tracker.example/z",
      "https://nottracker.example/w", // suffix of the LABELS, not a label match
      "https://clean.org/ok").toDF("url")
    val block = Seq("ads.tracker.example", "tracker.example").toDF("domain")
    val got = CrawlGraphOps.domainBlocked(urls, block).collect()
      .map(r => r.getString(0) -> ((r.getBoolean(1), Option(r.getString(2))))).toMap
    assert(got("https://ads.tracker.example/x") == ((true, Some("ads.tracker.example"))))
    assert(got("https://deep.sub.ads.tracker.example/y") == ((true, Some("ads.tracker.example"))))
    assert(got("https://tracker.example/z") == ((true, Some("tracker.example"))))
    assert(got("https://nottracker.example/w") == ((false, None)))
    assert(got("https://clean.org/ok") == ((false, None)))
  }
}
