package graft.spark

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Crawl-graph operators over the HTTP redirect edges [[WarcOps]] surfaces
  * (`http_status` + `redirect`): build the edge set from a page table and
  * resolve every chain to its final URL with a bounded hop budget — the
  * canonicalization step a crawl frontier and a dedup cluster key both
  * need (a page fetched via 3 different entry URLs is one document once
  * chains collapse).
  *
  * Scale shape (10^12 pages): the edge table is only the 3xx rows — a few
  * percent of the crawl — and is persisted ONCE and re-scanned by every
  * hop join. The frontier SHRINKS monotonically (a row leaves the loop
  * the first time its cursor has no outgoing edge), and real-web chains
  * are overwhelmingly 1-2 hops, so joins 3+ run on slivers that AQE
  * re-plans as broadcasts at runtime. The hop cap is a semantic, not a
  * compromise: crawlers and browsers both bound redirect chains (curl 50,
  * Chrome 20, polite crawlers 5-8) — anything longer is a trap.
  */
object CrawlGraphOps extends Serializable {

  /** `(src, dst)` redirect edges from a WARC page table (the
    * [[WarcOps.readWarcFiles]] schema): rows whose status is a genuine
    * redirect (301/302/303/307/308) with a `Location`, the destination
    * resolved against the record URI (RFC 3986 — Location is commonly
    * relative in the wild) and both endpoints normalized so chain links
    * match across escape/case/default-port spellings. */
  def redirectEdges(pages: DataFrame, uriCol: String = "uri",
      statusCol: String = "http_status", locationCol: String = "redirect"): DataFrame =
    pages
      .where(col(statusCol).isin(301, 302, 303, 307, 308) &&
        col(locationCol).isNotNull && col(uriCol).isNotNull)
      .select(
        call_function("url_normalize", col(uriCol)).as("src"),
        call_function("url_normalize",
          call_function("url_resolve", col(uriCol), col(locationCol))).as("dst"))

  /** Resolve every redirect source in `edges (src, dst)` to its final
    * URL, following at most `maxHops` edges. Output one row per distinct
    * `src`: `(src, final_url, hops, terminal)` where `terminal` is
    * `'final'` when the chain reached a URL with no outgoing redirect
    * within the budget (including exactly AT the budget) and `'capped'`
    * when it was still redirecting after `maxHops` (cycles land here —
    * a self-redirect or A→B→A loop can never finish). Duplicate
    * successors for one `src` (double-fetch disagreement) collapse to
    * `min(dst)` so the successor function — and the whole result — is
    * deterministic.
    *
    * Execution: `maxHops` left-outer joins against the deduped,
    * persisted edge table; rows whose cursor has no successor exit into
    * the result at their hop count, the rest advance. The entire loop is
    * ONE declarative DAG (no per-hop action), so Catalyst sees every
    * join and AQE sizes each one from runtime statistics as the frontier
    * shrinks. The returned frame references the persisted edge snapshot;
    * at crawl scale follow with a write, then the cache ages out. */
  def resolveRedirects(edges: DataFrame, maxHops: Int = 8,
      driverEdgeBudget: Int = DriverGraphEdgeBudget): DataFrame = {
    require(maxHops >= 1 && maxHops <= 64, s"maxHops out of range: $maxHops")
    val eAgg = edges.select(col("src"), col("dst"))
      .groupBy("src").agg(min("dst").as("dst"))
    // small-graph driver escape (the pageRank pattern, guide §1.2): the
    // deduped successor table one-job-collects when it fits the budget,
    // and the hop walk runs in memory — the distributed loop's per-hop
    // joins are pure scheduling overhead at that size. Exact by
    // construction: same min-successor collapse (typed orderings match
    // Spark's min), same hop budget, same final/capped classification.
    if (driverEdgeBudget > 0 && atomicKeys(eAgg.schema)) {
      val head = eAgg.limit(driverEdgeBudget + 1).collect()
      if (head.length <= driverEdgeBudget)
        return resolveRedirectsLocal(edges.sparkSession, eAgg.schema, head, maxHops)
    }
    val e = eAgg.persist(StorageLevel.MEMORY_AND_DISK)
    var active = e.select(col("src"), col("dst").as("cur"), lit(1).as("hops"))
    val done = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    for (h <- 1 until maxHops) {
      val step = active.alias(s"a$h")
        .join(e.alias(s"n$h"), col(s"a$h.cur") === col(s"n$h.src"), "left_outer")
      done += step.where(col(s"n$h.dst").isNull).select(
        col(s"a$h.src").as("src"), col(s"a$h.cur").as("final_url"),
        col(s"a$h.hops").as("hops"), lit("final").as("terminal"))
      active = step.where(col(s"n$h.dst").isNotNull).select(
        col(s"a$h.src").as("src"), col(s"n$h.dst").as("cur"),
        (col(s"a$h.hops") + 1).as("hops"))
    }
    // the cap frontier took maxHops hops: terminal iff the cursor has no
    // outgoing edge (a chain of exactly maxHops is 'final', not 'capped')
    val cap = active.alias("ac")
      .join(e.alias("nc"), col("ac.cur") === col("nc.src"), "left_outer")
      .select(col("ac.src").as("src"), col("ac.cur").as("final_url"),
        col("ac.hops").as("hops"),
        when(col("nc.dst").isNull, lit("final")).otherwise(lit("capped"))
          .as("terminal"))
    done.foldLeft(cap)(_ unionByName _)
  }

  /** shared edge-count ceiling for the iterative operators' in-memory
    * fast paths (64k edges ≈ a few MB of driver state — far under the
    * driver envelope contaminationCheck's gram broadcast already
    * accepts). */
  final val DriverGraphEdgeBudget: Int = 1 << 16

  /** both key columns are plain atomic types (driver fast paths rely on
    * JVM equality/hashing of collected values; struct/array/map keys stay
    * on the distributed path). */
  private def atomicKeys(schema: org.apache.spark.sql.types.StructType): Boolean = {
    import org.apache.spark.sql.types._
    schema.fields.take(2).forall(_.dataType match {
      case StringType | LongType | IntegerType | ShortType | ByteType |
           BooleanType | DoubleType | FloatType | DateType | TimestampType => true
      case _: DecimalType => true
      case _ => false
    })
  }

  /** min-ordering matching Spark's `min` for the label types the driver
    * fast paths accept: UTF8 binary for strings, natural for integrals.
    * None = unsupported type, caller falls back to the distributed loop. */
  private def minOrdering(dt: org.apache.spark.sql.types.DataType): Option[Ordering[Any]] = {
    import org.apache.spark.sql.types._
    dt match {
      case StringType => Some(new Ordering[Any] {
        def compare(x: Any, y: Any): Int = {
          val a = x.asInstanceOf[String].getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val b = y.asInstanceOf[String].getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val n = math.min(a.length, b.length)
          var i = 0
          while (i < n) {
            val d = (a(i) & 0xff) - (b(i) & 0xff)
            if (d != 0) return d
            i += 1
          }
          a.length - b.length
        }
      })
      case LongType => Some(Ordering.Long.asInstanceOf[Ordering[Any]].on(identity))
      case IntegerType => Some(Ordering.Int.asInstanceOf[Ordering[Any]].on(identity))
      case ShortType => Some(Ordering.Short.asInstanceOf[Ordering[Any]].on(identity))
      case ByteType => Some(Ordering.Byte.asInstanceOf[Ordering[Any]].on(identity))
      case _ => None
    }
  }

  /** in-memory hop walk behind [[resolveRedirects]]'s driver escape: the
    * collected successor table (already min-collapsed by the aggregate)
    * walks each chain up to `maxHops`. */
  private def resolveRedirectsLocal(spark: org.apache.spark.sql.SparkSession,
      eSchema: org.apache.spark.sql.types.StructType,
      rows: Array[org.apache.spark.sql.Row], maxHops: Int): DataFrame = {
    import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
    val schema = StructType(Seq(
      StructField("src", eSchema(0).dataType, nullable = true),
      StructField("final_url", eSchema(1).dataType, nullable = true),
      StructField("hops", IntegerType, nullable = false),
      StructField("terminal", StringType, nullable = false)))
    val succ = new java.util.HashMap[Any, Any](rows.length * 2)
    rows.foreach(r => succ.put(r.get(0), r.get(1)))
    val out = new java.util.ArrayList[org.apache.spark.sql.Row](rows.length)
    rows.foreach { r =>
      var cur = r.get(1)
      var hops = 1
      while (hops < maxHops && succ.containsKey(cur)) { cur = succ.get(cur); hops += 1 }
      val terminal = if (succ.containsKey(cur)) "capped" else "final"
      out.add(org.apache.spark.sql.Row(r.get(0), cur, hops, terminal))
    }
    spark.createDataFrame(out, schema)
  }

  /** in-memory min-label propagation behind [[connectedComponents]]'s
    * driver escape — the SAME round-truncated semantics (labels after
    * min(maxIters, fixpoint) rounds; stopping at the fixpoint is
    * output-identical to running the remaining no-op rounds). */
  private def connectedComponentsLocal(spark: org.apache.spark.sql.SparkSession,
      nodeType: org.apache.spark.sql.types.DataType, ord: Ordering[Any],
      rows: Array[org.apache.spark.sql.Row], maxIters: Int): DataFrame = {
    import org.apache.spark.sql.types.{StructField, StructType}
    val schema = StructType(Seq(
      StructField("node", nodeType, nullable = true),
      StructField("comp", nodeType, nullable = true)))
    val idx = new java.util.LinkedHashMap[Any, Integer]()
    def id(v: Any): Int = {
      var i = idx.get(v)
      if (i == null) { i = Integer.valueOf(idx.size); idx.put(v, i) }
      i.intValue()
    }
    val m = rows.length
    val ea = new Array[Int](2 * m)
    val eb = new Array[Int](2 * m)
    var k = 0
    while (k < m) {
      val a = id(rows(k).get(0)); val b = id(rows(k).get(1))
      ea(2 * k) = a; eb(2 * k) = b
      ea(2 * k + 1) = b; eb(2 * k + 1) = a
      k += 1
    }
    val n = idx.size
    val nodeOf = new Array[Any](n)
    idx.forEach((v, i) => nodeOf(i.intValue()) = v)
    var labels = Array.tabulate(n)(i => nodeOf(i))
    var it = 0
    var changed = true
    while (it < maxIters && changed) {
      changed = false
      val next = labels.clone()
      var j = 0
      while (j < 2 * m) {
        val lb = labels(eb(j))
        if (ord.compare(lb, next(ea(j))) < 0) { next(ea(j)) = lb; changed = true }
        j += 1
      }
      labels = next
      it += 1
    }
    val out = new java.util.ArrayList[org.apache.spark.sql.Row](n)
    var i = 0
    while (i < n) { out.add(org.apache.spark.sql.Row(nodeOf(i), labels(i))); i += 1 }
    spark.createDataFrame(out, schema)
  }

  /** Connected components over an undirected edge set `(a, b)` — the
    * dedup-cluster primitive: pages linked by redirect chains, canonical
    * declarations, or near-dup verdicts form one cluster, labeled by its
    * minimum member (deterministic, join-able back to any table). Output
    * one row per node appearing in `edges`: `(node, comp)`.
    *
    * Algorithm: min-label propagation. Round 7 shape: the symmetric edge
    * set gains a SELF-LOOP per node, so each round's new label is simply
    * `min over (self ∪ neighbors)` — ONE join + ONE agg per round, and the
    * previous labels are referenced exactly ONCE. That makes plan growth
    * LINEAR in rounds, so the whole loop stays a single declarative DAG
    * executed by ONE action (the round-6 version read labels twice per
    * round — neighbor min + `least(own, nmin)` self-join — whose 2^iters
    * subtree doubling forced an eager localCheckpoint and a full Spark
    * job EVERY round: 48 jobs for the 8-round gate row, measured 2.6 s of
    * pure scheduling at sf0.1). Exact when `maxIters` ≥ the maximum
    * distance from any node to its component's minimum; crawl dedup
    * clusters are star-shaped (a canonical target and its variants), so
    * the default 8 has wide margin. For adversarial long-chain graphs
    * swap in the alternating large-star/small-star rounds (Kiveris et
    * al., O(log n) rounds) behind this same signature — label propagation
    * is the right trade for cluster shapes this engine actually produces.
    * The self-looped edge set is persisted once and re-scanned by every
    * round (Spark additionally reuses its exchange across rounds); past 8
    * un-checkpointed rounds the plan is truncated to keep optimizer time
    * bounded at high `maxIters`. */
  def connectedComponents(edges: DataFrame, maxIters: Int = 8,
      driverEdgeBudget: Int = DriverGraphEdgeBudget): DataFrame = {
    require(maxIters >= 1 && maxIters <= 64, s"maxIters out of range: $maxIters")
    // small-graph driver escape (the pageRank pattern): the distinct edge
    // set one-job-collects under the budget and the SAME round-truncated
    // min-label propagation runs in memory; typed orderings match Spark's
    // min (UTF8 binary for strings). Oversize graphs take the distributed
    // loop below.
    val eDistinct = edges.select(col("a"), col("b")).distinct()
    if (driverEdgeBudget > 0 &&
        eDistinct.schema(0).dataType == eDistinct.schema(1).dataType) {
      minOrdering(eDistinct.schema(0).dataType) match {
        case Some(ord) =>
          val head = eDistinct.limit(driverEdgeBudget + 1).collect()
          if (head.length <= driverEdgeBudget)
            return connectedComponentsLocal(edges.sparkSession,
              eDistinct.schema(0).dataType, ord, head, maxIters)
        case None => ()
      }
    }
    // persist the RAW symmetric set: the input edge expressions (e.g.
    // q_dup_clusters' extract_canonical parse) are computed once, not once
    // per derived branch
    val sym = edges.select(col("a"), col("b"))
      .unionByName(edges.select(col("b").as("a"), col("a").as("b")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // one row per node (a ∪ b — sym is symmetric, so distinct over `a`
    // covers both) becomes the self-loop table
    val loops = sym.select(col("a")).distinct()
    val nbrs = sym.unionByName(loops.select(col("a"), col("a").as("b")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // round 1 folds into a plain aggregate: initial labels are the node
    // ids themselves, so min over (self ∪ neighbors) is just min(b)
    var labels = nbrs.groupBy(col("a").as("node")).agg(min(col("b")).as("comp"))
    for (i <- 2 to maxIters) {
      // min over neighbors INCLUDING self (the self-loop) — exactly
      // least(own, neighbor-min) of the two-join formulation
      labels = nbrs.alias(s"e$i")
        .join(labels.alias(s"l$i"), col(s"e$i.b") === col(s"l$i.node"))
        .groupBy(col(s"e$i.a").as("node"))
        .agg(min(col(s"l$i.comp")).as("comp"))
      if (i % 8 == 0 && i < maxIters) labels = labels.localCheckpoint(true)
    }
    // materialize the (node, comp) result — small by construction — so the
    // edge caches can be released before returning
    val out = labels.localCheckpoint(true)
    sym.unpersist(false)
    nbrs.unpersist(false)
    out
  }

  /** PageRank over the crawl link graph — the host/page authority score
    * that feeds crawl prioritization and quality weighting. Standard
    * power iteration with damping and dangling-mass redistribution:
    *
    *   pr'(v) = (1-d)/N + d·( Σ_{(u,v)∈E} pr(u)/outdeg(u) + D/N )
    *
    * where D = Σ pr(u) over dangling nodes (no outlinks). Duplicate
    * edges collapse first (one vote per distinct link, the convention).
    * Output: `(node, pr)` for every node in the edge set; Σ pr = 1 at
    * every iteration (the dangling term keeps the distribution proper).
    *
    * Scale shape: each iteration is one join + one agg keyed by node —
    * per-round `localCheckpoint` (the [[connectedComponents]] lineage
    * discipline) keeps round cost constant; the single driver scalar per
    * round is the dangling mass. Fixed `iters` (default 8) rather than a
    * convergence test: deterministic cost AND a deterministic oracle. */
  def pageRank(edges: DataFrame, iters: Int = 8, damping: Double = 0.85,
      driverEdgeBudget: Int = PageRankDriverEdgeBudget): DataFrame = {
    require(iters >= 1 && iters <= 64, s"iters out of range: $iters")
    val e = edges.select(col("src"), col("dst")).distinct()
    // Small-graph driver escape (guide §1.2 — choose the algorithm before
    // tuning it): the distributed rounds cost one Spark action each, which
    // is pure scheduling overhead when the deduped edge set is tiny (the
    // r6 bench row spent 86 jobs / ~6 s iterating a 10-node graph). Collect
    // at most budget+1 edges in one job; a complete result means the whole
    // distinct edge set is on the driver and the classic in-memory power
    // iteration reproduces the same per-round arithmetic (same formula,
    // same counts; float summation order differs by ulps exactly as any
    // re-partitioning of the distributed sum does). Over-budget graphs —
    // the 100-TB case — take the distributed loop below, itself improved
    // this round (precomputed dangling set, in-DAG dangling scalar).
    if (driverEdgeBudget > 0 && e.schema(0).dataType == e.schema(1).dataType) {
      val head = e.limit(driverEdgeBudget + 1).collect()
      if (head.length <= driverEdgeBudget)
        return pageRankLocal(edges.sparkSession, e.schema(0).dataType, head, iters, damping)
    }
    val eP = e.persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = eP.select(col("src").as("node"))
      .unionByName(eP.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint(true)
    val n = nodes.count().toDouble
    val deg = eP.groupBy(col("src").as("node")).agg(count(lit(1)).as("outdeg"))
      .localCheckpoint(true)
    // the dangling node SET is static across rounds — only its pr mass
    // changes (r6 recomputed the set via a pr⋈deg null-filter every round)
    val dangNodes = nodes.join(deg, Seq("node"), "left_anti").localCheckpoint(true)
    var pr = nodes.select(col("node"), lit(1.0 / n).as("pr")).localCheckpoint(true)
    for (_ <- 1 to iters) {
      // the dangling mass stays IN the DAG as a 1-row aggregate crossJoin
      // (r6 collected it to the driver — a second full action per round)
      val dang = pr.join(dangNodes, Seq("node"), "left_semi")
        .agg(coalesce(sum(col("pr")), lit(0.0)).as("dang"))
      val contribs = eP
        .join(pr.withColumnRenamed("node", "src"), "src")
        .join(deg.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(col("pr") / col("outdeg")).as("c"))
      pr = nodes.join(contribs, Seq("node"), "left")
        .crossJoin(dang)
        .select(col("node"),
          (lit((1 - damping) / n) + lit(damping) *
            (coalesce(col("c"), lit(0.0)) + col("dang") / n)).as("pr"))
        // pr is referenced twice next round (dangling agg + contribs), so
        // the per-round checkpoint remains the lineage discipline — but a
        // round is now ONE action, not two
        .localCheckpoint(true)
    }
    eP.unpersist(false)
    pr
  }

  /** edge-count ceiling for [[pageRank]]'s in-memory fast path (64k edges
    * ≈ a few MB of driver state — far under any broadcast-sized budget
    * this repo already accepts, e.g. contaminationCheck's gram table). */
  final val PageRankDriverEdgeBudget: Int = 1 << 16

  /** classic in-memory power iteration over a collected distinct edge set
    * — identical per-round formula to the distributed loop:
    * pr'(v) = (1-d)/N + d·(Σ pr(u)/outdeg(u) + D/N). */
  private def pageRankLocal(spark: org.apache.spark.sql.SparkSession,
      nodeType: org.apache.spark.sql.types.DataType,
      rows: Array[org.apache.spark.sql.Row], iters: Int, damping: Double): DataFrame = {
    import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
    val schema = StructType(Seq(
      StructField("node", nodeType, nullable = true),
      StructField("pr", DoubleType, nullable = false)))
    val idx = new java.util.LinkedHashMap[Any, Integer]()
    def id(v: Any): Int = {
      var i = idx.get(v)
      if (i == null) { i = Integer.valueOf(idx.size); idx.put(v, i) }
      i.intValue()
    }
    val m = rows.length
    val srcs = new Array[Int](m)
    val dsts = new Array[Int](m)
    var k = 0
    while (k < m) { srcs(k) = id(rows(k).get(0)); dsts(k) = id(rows(k).get(1)); k += 1 }
    val n = idx.size
    if (n == 0)
      return spark.createDataFrame(java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema)
    val outdeg = new Array[Int](n)
    k = 0
    while (k < m) { outdeg(srcs(k)) += 1; k += 1 }
    var pr = Array.fill(n)(1.0 / n)
    var it = 0
    while (it < iters) {
      var dang = 0.0
      var v = 0
      while (v < n) { if (outdeg(v) == 0) dang += pr(v); v += 1 }
      val next = Array.fill(n)((1 - damping) / n + damping * (dang / n))
      k = 0
      while (k < m) { next(dsts(k)) += damping * (pr(srcs(k)) / outdeg(srcs(k))); k += 1 }
      pr = next
      it += 1
    }
    val out = new java.util.ArrayList[org.apache.spark.sql.Row](n)
    idx.forEach((node, i) => { out.add(org.apache.spark.sql.Row(node, pr(i.intValue()))); () })
    spark.createDataFrame(out, schema)
  }

  /** Domain-blocklist filter (the UT1-style category-list gate every
    * crawl pipeline runs before fetch or before training-set admission):
    * a url is blocked when its host EQUALS a listed domain or is a
    * SUBDOMAIN of one. The match explodes the host's label suffixes
    * (a host has ≤ ~10: `a.b.example.com` → `a.b.example.com`,
    * `b.example.com`, `example.com`, `com`) and equi-joins the
    * blocklist on the suffix — no per-row regex, no driver-side set;
    * Catalyst broadcasts the list when it is small (the usual ~1M-entry
    * case) and shuffles when it is not. Needs [[GraftSparkExtensions]]
    * (url_host). Output: one row per input row —
    * `(url, blocked, matched_domain)` with the LONGEST (most specific)
    * matching entry, null when clean. */
  def domainBlocked(urls: DataFrame, blocklist: DataFrame): DataFrame = {
    val hosts = urls.select(col("url"),
      call_function("url_host", col("url")).as("host"))
    val suffixes = hosts
      .select(col("url"), col("host"), split(col("host"), "\\.").as("ls"))
      .select(col("url"), col("host"), posexplode(col("ls")).as(Seq("i", "l")),
        col("ls"))
      .select(col("url"),
        array_join(slice(col("ls"), col("i") + 1, size(col("ls"))), ".").as("suffix"))
    val matched = suffixes
      .join(blocklist.select(col("domain").as("suffix")), Seq("suffix"))
      .groupBy("url")
      .agg(max(struct(length(col("suffix")).as("n"), col("suffix").as("s"))).as("m"))
      .select(col("url"), col("m.s").as("matched_domain"))
    urls.select(col("url"))
      .join(matched, Seq("url"), "left")
      .select(col("url"), col("matched_domain").isNotNull.as("blocked"),
        col("matched_domain"))
  }

  /** Cross-snapshot capture diff — the monthly-recrawl dedup decision
    * Common Crawl encodes as `revisit` records: a capture whose payload
    * digest equals the previous snapshot's capture of the same URL is not
    * stored again, it becomes a pointer (WARC-Refers-To) at the original.
    * Input: two capture indexes `(surt, ts, digest)` (CDX projections —
    * ~100-byte rows, never page bytes; at 100 TB of archive this join
    * runs over gigabytes). Multi-capture surts collapse to the LATEST
    * capture per side first (max ts; digest tie-break — deterministic).
    *
    * Output, one row per surt in either snapshot:
    * `status` ∈ `new` (absent before), `revisit` (digest equal — write
    * the pointer, skip the bytes), `changed` (refetch stored), `gone`
    * (absent now); `ts_prev`/`ts_curr` = the compared capture times (-1
    * for the absent side, keeping the gate's hash compare exact);
    * `refers_to` = the original's ts for revisits, -1 otherwise. The
    * surt key means one host's — and one domain's — churn sits in one
    * shuffle partition range, which is what makes per-domain churn
    * rollups on top of this cheap. */
  def snapshotDiff(prev: DataFrame, curr: DataFrame): DataFrame = {
    def latest(df: DataFrame, suffix: String): DataFrame =
      df.groupBy("surt")
        .agg(max(struct(col("ts"), col("digest"))).as("c"))
        .select(col("surt"), col("c.ts").as(s"ts_$suffix"),
          col("c.digest").as(s"digest_$suffix"))
    latest(prev, "prev").join(latest(curr, "curr"), Seq("surt"), "full_outer")
      .select(col("surt"),
        when(col("ts_prev").isNull, "new")
          .when(col("ts_curr").isNull, "gone")
          .when(col("digest_prev") === col("digest_curr"), "revisit")
          .otherwise("changed").as("status"),
        coalesce(col("ts_prev"), lit(-1L)).as("ts_prev"),
        coalesce(col("ts_curr"), lit(-1L)).as("ts_curr"),
        when(col("digest_prev") === col("digest_curr"), col("ts_prev"))
          .otherwise(lit(-1L)).as("refers_to"))
  }

  /** One crawl-frontier step: from fetched `pages (page_url, html)` to
    * the deduped, robots-compliant, per-host-budgeted set of URLs to
    * fetch next — the composition the individual tiers exist for:
    * `extract_links` (document-base resolution) → `url_normalize`
    * identity → anti-join against `seen (url)` → RFC 9309 gate against
    * `robots (host, robots_txt)` → per-host politeness cap. Output
    * `(host, url)`, at most `maxPerHost` rows per host (smallest URLs
    * first — deterministic, and short URLs are hubs more often).
    *
    * Robots semantics: a host absent from `robots` is allowed (no
    * robots.txt = no restrictions); a present robots.txt with a NULL
    * verdict (unresolvable path) NEVER passes — compliance is not the
    * place for silent defaults.
    *
    * Scale shape: the candidate set (links per page × pages) dominates;
    * `seen` is the second giant — at crawl scale both are laid out
    * bucketed by url so the anti-join co-locates (or a bloom pre-filter
    * cuts the shuffle; Spark's InjectRuntimeFilter inserts one when
    * stats justify it). The robots join and the politeness window BOTH
    * key on `host`, so the window reuses the join's hash partitioning —
    * one exchange, not two. `robots` (one row per host) is orders
    * smaller than the candidates; AQE broadcast-converts it when it
    * fits. */
  def frontier(pages: DataFrame, robots: DataFrame, agent: String,
      seen: DataFrame, maxPerHost: Int): DataFrame = {
    require(maxPerHost >= 1, s"maxPerHost out of range: $maxPerHost")
    val cand = pages
      .select(explode(call_function("extract_links",
        col("html"), col("page_url"))).as("url"))
      .select(call_function("url_normalize", col("url")).as("url"))
      .where(col("url").isNotNull)
      .distinct()
      .join(seen.select(call_function("url_normalize", col("url")).as("url")),
        Seq("url"), "left_anti")
      .select(call_function("url_host", col("url")).as("host"), col("url"))
      .where(col("host").isNotNull)
    val gated = cand
      .join(robots.select(col("host"), col("robots_txt")), Seq("host"), "left_outer")
      .where(call_function("robots_allowed", col("robots_txt"), lit(agent),
        call_function("url_path", col("url"))))
    // two-stage per-host top-N (guide §2.5 — a hot-host window is the one
    // skew AQE cannot split): stage 1 caps each (host, salt) slice to
    // maxPerHost under a DETERMINISTIC url-hash salt, so no single task
    // ever sorts more than ~cap × salts rows of a mega-host; stage 2 runs
    // the exact per-host window over ≤ salts × maxPerHost survivors.
    // Every true top-maxPerHost url is within its own slice's top
    // maxPerHost, so the result is unchanged.
    val salts = 64
    val pre = org.apache.spark.sql.expressions.Window
      .partitionBy("host", "salt").orderBy("url")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("host").orderBy("url")
    gated
      .withColumn("salt", pmod(xxhash64(col("url")), lit(salts.toLong)))
      .withColumn("prn", row_number().over(pre))
      .where(col("prn") <= maxPerHost)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= maxPerHost)
      .select("host", "url")
  }
}
