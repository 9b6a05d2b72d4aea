package graft.spark

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

private[spark] object VecMath {
  /** squared euclidean distance over the common prefix. */
  @inline def dist2(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0
    var d = 0
    val lim = math.min(a.length, b.length)
    while (d < lim) { val diff = a(d) - b(d); s += diff * diff; d += 1 }
    s
  }
}

/** assignment-side quantizer: how a vector picks its inverted list.
  * The PROBE side never sees this — probes work off the flat persisted
  * (centroid, radius) lists, and the exactness certificate only needs
  * "every member of list j lies within r_j of c_j", which holds no
  * matter how assignment chose the list. */
sealed trait AnnQuantizer extends Serializable {
  def cents: Array[Array[Float]]
  /** nearest list for a NORMALIZED vector. */
  def assign(nv: Array[Float]): Int
}

/** exhaustive nearest-centroid assignment (nlist <= DriverFitMaxNlist). */
final case class FlatQuantizer(cents: Array[Array[Float]]) extends AnnQuantizer {
  def assign(nv: Array[Float]): Int = TextOps.nearestCentroid(nv, cents)
}

/** two-level assignment: nearest 2 coarse cells, then the nearest fine
  * centroid within those cells' contiguous list spans — O(k1 + 2·k2)
  * distances instead of O(nlist). Approximate list CHOICE (a boundary
  * vector may land in a near-optimal list), which only widens that
  * list's radius; exactness is untouched (see trait doc). */
final case class TwoLevelQuantizer(coarse: Array[Array[Float]],
    listStart: Array[Int], listLen: Array[Int],
    cents: Array[Array[Float]]) extends AnnQuantizer {
  def assign(nv: Array[Float]): Int = {
    var b1 = -1; var b2 = -1
    var d1 = Double.MaxValue; var d2 = Double.MaxValue
    var c = 0
    while (c < coarse.length) {
      val d = VecMath.dist2(nv, coarse(c))
      if (d < d1) { d2 = d1; b2 = b1; d1 = d; b1 = c }
      else if (d < d2) { d2 = d; b2 = c }
      c += 1
    }
    var best = -1
    var bestD = Double.MaxValue
    def scanCell(cell: Int): Unit = if (cell >= 0) {
      var j = listStart(cell)
      val end = j + listLen(cell)
      while (j < end) {
        val d = VecMath.dist2(nv, cents(j))
        if (d < bestD) { bestD = d; best = j }
        j += 1
      }
    }
    scanCell(b1)
    scanCell(b2)
    best
  }
}

/** ANN primitives shared by the scan-path operators and the persisted
  * index: cosine/signature math, LSH probe sets, the IVF coarse-quantizer
  * training (kmeans++ / Lloyd) and the exactness-certificate bound. See
  * [[TextOps]]. */
private[spark] trait AnnCoreOps extends TextCoreOps {
  // ---------- ANN over embeddings ----------

  private[spark] def cosine(q: Array[Float], v: Seq[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = math.min(q.length, v.length)
    while (i < n) { dot += q(i) * v(i); na += q(i) * q(i); nb += v(i) * v(i); i += 1 }
    if (na == 0 || nb == 0) 0.0 else dot / math.sqrt(na * nb)
  }

  /** memoized hyperplane components: `r(table, p, i)` is a pure function
    * of its indices (a fixed mix64 stream), yet r6 recomputed it inside
    * every signature — planes x dim mix64 calls + divisions per sig, the
    * dominant per-row cost of every LSH path (measured ~48 us/sig at
    * dim 64 vs ~1 us with the cache; guide §1.2 step 2, per-task work).
    * One row per (table, plane), grown to the largest dim seen; the cache
    * is executor-local, deterministic, and bounded (legal (table, plane)
    * pairs are tiny, but a hostile `table` value must not leak — past the
    * cap the map clears, costing only recomputation). */
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[Long, Array[Double]]()

  private def planeRow(table: Int, p: Int, dim: Int): Array[Double] = {
    val key = (table.toLong << 32) | (p.toLong & 0xffffffffL)
    val hit = planeCache.get(key)
    if (hit != null && hit.length >= dim) return hit
    val r = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      r(i) = ((mix64((table * 131L + p) * 1315423911L + i) & 0xffff) / 32768.0) - 1.0
      i += 1
    }
    if (planeCache.size >= 1024) planeCache.clear()
    planeCache.put(key, r)
    r
  }

  /** deterministic pseudo-random hyperplane signature (`planes` sign bits)
    * for hash table `table` — independent plane sets per table. Same
    * component values and accumulation order as always (the memo only
    * lifts their generation out of the loop), so signatures — and every
    * persisted index / bucket table built from them — are bit-identical. */
  def hyperplaneSig(v: Seq[Float], planes: Int, table: Int = 0): Int = {
    var s = 0
    var p = 0
    while (p < planes) {
      val r = planeRow(table, p, v.length)
      var dot = 0.0
      var i = 0
      while (i < v.length) {
        dot += r(i) * v(i)
        i += 1
      }
      if (dot > 0) s |= (1 << p)
      p += 1
    }
    s
  }

  /** number of independent LSH tables: miss probability per true neighbor
    * decays as (1 - p_table)^L, so L=4 turns a ~0.6 per-table hit rate into
    * ~0.97+ recall while still scanning only O(L * corpus/2^planes). */
  final val LshTables = 4

  /** plane count scaling with corpus size: ~`target` vectors per bucket
    * (constant planes would brute-force a constant FRACTION of the corpus —
    * the 100-TB killer the round-1 version had). */
  def planesFor(n: Long, target: Long = 128L): Int =
    math.max(3, math.min(24, (63 - java.lang.Long.numberOfLeadingZeros(
      math.max(1L, n / math.max(1L, target)))) + 1))

  /** rank the exact top-k of a (vec_id, cosine) frame. The distributed part
    * is TakeOrdered (per-partition top-k, merged on the driver); the rank is
    * then just the sort position of the k collected rows — the previous
    * `row_number over (ORDER BY ...)` global Window recomputed that position
    * by moving the k rows through a single-partition WindowExec (and logged
    * the "No Partition Defined" warning on every gate run). k is
    * caller-bounded top-k semantics, so the driver materialization is O(k),
    * never corpus-sized. */
  private[spark] def rankTopK(spark: SparkSession, scored: DataFrame, k: Int): DataFrame = {
    import spark.implicits._
    val top = scored.orderBy(col("cosine").desc, col("vec_id"))
      .limit(k).select(col("vec_id")).as[Long].collect()
    top.toSeq.zipWithIndex.map { case (id, i) => (i + 1, id) }.toDF("rank", "vec_id")
  }

  /** brute-force cosine top-k against one query vector (labeled baseline;
    * broadcast query, TakeOrdered — no driver collect of the corpus).
    * Output is rank order only: cross-engine float comparison stays out of
    * the hash-compared columns. */
  def annTopK(spark: SparkSession, sfDir: String, queryId: Long, k: Int): DataFrame = {
    import spark.implicits._
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = emb.where(col("vec_id") === queryId)
      .select(col("embedding")).as[Seq[Float]].head().toArray
    val qb = spark.sparkContext.broadcast(q)
    val scored = emb.select(col("vec_id").as[Long], col("embedding").as[Seq[Float]])
      .map { case (id, v) => (id, cosine(qb.value, v)) }
      .toDF("vec_id", "cosine")
    rankTopK(spark, scored, k)
  }

  /** Hamming-<=radius multi-probe set for a signature — the ONE
    * multi-probe definition (indexed probes, batch probe, evals, and the
    * scan-path annLsh all share it). */
  def probeSetR(sig: Int, planes: Int, radius: Int): Set[Int] = {
    var cur = Set(sig)
    var all = cur
    var r = 0
    while (r < radius) {
      cur = cur.flatMap(s => (0 until planes).map(p => s ^ (1 << p)))
      all = all ++ cur
      r += 1
    }
    all
  }

  /** LSH-bucketed ANN scale path: `LshTables` independent random-hyperplane
    * tables, probe the query's bucket plus all Hamming-1 neighbors in EACH
    * table (union of candidates), plane count scaled to corpus size,
    * signature table persisted (one embedding map, not two). */
  def annLsh(spark: SparkSession, sfDir: String, queryId: Long, k: Int,
      planesOverride: Int = 0): DataFrame = {
    import spark.implicits._
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").as[Long], col("embedding").as[Seq[Float]])
      .persist()
    val planes = if (planesOverride > 0) planesOverride else planesFor(emb.count())
    val bucketed = emb.map { case (id, v) =>
      (id, v, (0 until LshTables).map(t => hyperplaneSig(v, planes, t)))
    }.toDF("vec_id", "embedding", "buckets")
      .persist()
    val qRow = bucketed.where(col("vec_id") === queryId)
      .select(col("embedding").as[Seq[Float]], col("buckets").as[Seq[Int]]).head()
    val qb = spark.sparkContext.broadcast(qRow._1.toArray)
    val probes: Array[Set[Int]] =
      qRow._2.toArray.map(sig => probeSetR(sig, planes, 1))
    val probesB = spark.sparkContext.broadcast(probes)
    val scored = bucketed
      .select(col("vec_id").as[Long], col("embedding").as[Seq[Float]],
        col("buckets").as[Seq[Int]])
      .flatMap { case (id, v, bs) =>
        val ps = probesB.value
        var hit = false
        var t = 0
        while (t < ps.length && !hit) { hit = ps(t).contains(bs(t)); t += 1 }
        if (hit) Iterator.single((id, cosine(qb.value, v))) else Iterator.empty
      }
      .toDF("vec_id", "cosine")
    // rankTopK collects the k rows (a local relation results), so the
    // intermediates can be unpersisted directly — no checkpoint needed
    val out = rankTopK(spark, scored, k)
    emb.unpersist(false)
    bucketed.unpersist(false)
    out
  }

  /** L2-normalize a vector (zero vectors pass through). The IVF quantizer
    * operates on the unit sphere: similarity is COSINE, and
    * euclidean-nearest on unnormalized vectors disagrees with
    * cosine-nearest whenever norms vary — a large-norm vector can be
    * euclidean-far from every cosine neighbor, putting it in the wrong
    * inverted list. Normalizing both sample and assignment makes
    * euclidean-NN equivalent to cosine-NN. */
  def l2normalize(v: Seq[Float]): Array[Float] = {
    var s = 0.0
    var i = 0
    while (i < v.length) { s += v(i).toDouble * v(i); i += 1 }
    val out = new Array[Float](v.length)
    if (s == 0) { var j = 0; while (j < v.length) { out(j) = v(j); j += 1 }; return out }
    val inv = 1.0 / math.sqrt(s)
    i = 0
    while (i < v.length) { out(i) = (v(i) * inv).toFloat; i += 1 }
    out
  }

  // ---------- IVF coarse quantizer ----------

  @inline private[spark] def dist2(a: Array[Float], b: Array[Float]): Double =
    VecMath.dist2(a, b)

  /** inverted-list count ~ sqrt(n) (the standard IVF sizing rule): list
    * count and per-list size grow TOGETHER, so probe cost scales as
    * sqrt(corpus) — the round-3 flat 1024 cap made every list grow linearly
    * with the corpus. Past [[DriverFitMaxNlist]] the quantizer trains
    * HIERARCHICALLY (driver-fit coarse cells, distributed per-cell fine
    * fits — see buildAnnIndex), so the sqrt rule holds to the 131072
    * clamp = ~1.7e10 vectors per index shard. Beyond THAT the next rungs
    * are a coarse-pruned probe-side centroid scan and a >16 MB broadcast
    * codebook — new design work, so the clamp stays explicit. */
  def nlistFor(n: Long): Int =
    math.max(8L, math.min(131072L,
      math.ceil(math.sqrt(math.max(0L, n).toDouble)).toLong)).toInt

  /** largest codebook a single driver-side kmeans++ fit handles as a
    * one-time triviality (O(64·nlist² · dim) work); above it the
    * two-level training path takes over. */
  final val DriverFitMaxNlist = 4096


  /** quantizer training-sample size: 64 samples PER CENTROID (the round-3
    * flaw: a flat 1024-vector sample under nlist up to 1024 meant one
    * sample per centroid — Lloyd could not move and the codebook was
    * effectively random). At the nlist cap this is 256k vectors * 64 dims
    * * 4 B = 64 MB driver-side — still a one-time triviality. */
  def quantizerSampleSize(n: Long, nlist: Int): Long =
    math.max(1L, math.min(n, 64L * nlist))

  /** deterministic kmeans++ seeding (D^2 weighting): each next seed is
    * drawn proportional to squared distance from the nearest already-chosen
    * seed, using a fixed mix64 counter stream — index builds must be
    * reproducible (idempotent batch maintenance re-derives identical
    * layouts). Incremental min-distance maintenance: O(sample * k * dim)
    * total. Far better-spread seeds than strided picks when the data has
    * cluster structure, which is exactly when IVF pays off. */
  def kmeansPlusPlusSeeds(sample: Array[Array[Float]], k: Int): Array[Array[Float]] = {
    val n = sample.length
    val kk = math.min(k, n)
    val seeds = new Array[Array[Float]](kk)
    // uniform deterministic first seed
    seeds(0) = sample((((mix64(0x5eed5eedL) % n) + n) % n).toInt).clone()
    if (kk == 1) return seeds
    val minD = new Array[Double](n)
    var i = 0
    while (i < n) { minD(i) = dist2(sample(i), seeds(0)); i += 1 }
    var c = 1
    while (c < kk) {
      var total = 0.0
      i = 0
      while (i < n) { total += minD(i); i += 1 }
      val pick =
        if (total <= 0.0) (((mix64(0xbadc0deL * (c + 1)) % n) + n) % n).toInt
        else {
          // deterministic uniform in [0, total): 53 mantissa bits of mix64
          val u = (mix64(0x9e3779b97f4a7c15L * (c + 1)) >>> 11) * (1.0 / (1L << 53))
          val r = u * total
          var acc = 0.0
          var at = 0
          var found = -1
          while (found < 0 && at < n) {
            acc += minD(at)
            if (acc > r) found = at
            at += 1
          }
          if (found < 0) n - 1 else found
        }
      seeds(c) = sample(pick).clone()
      i = 0
      while (i < n) {
        val d = dist2(sample(i), seeds(c))
        if (d < minD(i)) minD(i) = d
        i += 1
      }
      c += 1
    }
    seeds
  }

  /** deterministic Lloyd k-means over a driver-side sample, seeded by
    * [[kmeansPlusPlusSeeds]] (centroid model is tiny — nlist x dim floats —
    * and broadcasts; the corpus is never collected). */
  def kmeansCentroids(sample: Array[Array[Float]], nlist: Int, iters: Int = 8): Array[Array[Float]] = {
    val n = sample.length
    val k = math.min(nlist, n)
    val dim = sample.head.length
    val cents = kmeansPlusPlusSeeds(sample, k)
    var it = 0
    while (it < iters) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Int](k)
      var i = 0
      while (i < n) {
        val c = nearestCentroid(sample(i), cents)
        counts(c) += 1
        var d = 0
        while (d < dim) { sums(c)(d) += sample(i)(d); d += 1 }
        i += 1
      }
      var c = 0
      while (c < k) {
        if (counts(c) > 0) {
          var d = 0
          while (d < dim) { cents(c)(d) = (sums(c)(d) / counts(c)).toFloat; d += 1 }
        }
        c += 1
      }
      it += 1
    }
    cents
  }

  def nearestCentroid(v: Seq[Float], cents: Array[Array[Float]]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < cents.length) {
      val cc = cents(c)
      var d2 = 0.0
      var d = 0
      val lim = math.min(cc.length, v.length)
      while (d < lim) { val diff = cc(d) - v(d); d2 += diff * diff; d += 1 }
      if (d2 < bestD) { bestD = d2; best = c }
      c += 1
    }
    best
  }

  /** `nprobe` nearest centroid indexes for a query vector. Delegates to
    * [[centroidDistances]] — one distance implementation, one ordering. */
  def nearestCentroids(v: Seq[Float], cents: Array[Array[Float]], nprobe: Int): Set[Int] =
    centroidDistances(v.toArray, cents).take(nprobe).map(_._2).toSet

  /** sorted (L2 distance, list_id) of a NORMALIZED query to every centroid. */
  def centroidDistances(nv: Array[Float], cents: Array[Array[Float]]): Array[(Double, Int)] =
    cents.indices.map(c => (math.sqrt(dist2(nv, cents(c))), c)).toArray.sortBy(x => (x._1, x._2))

  /** IVF EXACTNESS CERTIFICATE (the answer to "fixed nprobe is only a
    * recall bet"): on the unit sphere cos(q,v) = 1 - ||q̂-v̂||²/2, and by the
    * triangle inequality every member v of list j satisfies
    * ||q̂-v̂|| >= d_j - r_j where d_j = ||q̂-c_j|| and r_j is the list's
    * radius (max member distance to its centroid, persisted at build).
    * So after scanning some lists and holding a k-th best cosine D_k, an
    * UNSCANNED list j can contain a better-or-tying candidate only if its
    * best possible cosine 1 - max(0, d_j - r_j)²/2 reaches D_k. This
    * returns exactly those lists; when it returns none, the current top-k
    * is provably the global top-k. Scan cost therefore ADAPTS to the
    * data: with real cluster structure the initial nprobe lists certify
    * immediately; on clusterless (near-orthogonal) corpora the certificate
    * honestly expands instead of silently returning wrong neighbors.
    * The epsilon absorbs float noise and cosine ties (ties are broken by
    * vec_id, so a tying list must be scanned, not skipped). Its size is
    * set by the FLOAT pipeline upstream: l2normalize leaves ||v̂||² off
    * unity by ~2e-7 (Float ulp accumulation), which shifts the
    * cos = 1 − d²/2 identity by up to ~4e-7 — so eps must dominate 1e-6,
    * not mere Double rounding. Near-duplicate corpora (cosine gaps below
    * Float precision — exactly the dedup workload) would otherwise let a
    * tying list be wrongly certified away. Cost of the wider margin: at
    * most the occasional extra list scanned. */
  /** the certificate's float-noise epsilon — SHARED with the radius-aware
    * initial probe choice (annIvfIndexed pre-adds with 2*CertEps so its
    * set stays a superset of what the certificate can name; widening one
    * without the other silently costs every probe a second pruned read). */
  final val CertEps = 1e-5

  def certifiedExpansion(dists: Array[(Double, Int)], radii: Array[Double],
      scanned: Set[Int], kthCosine: Double): Set[Int] = {
    val eps = CertEps
    dists.iterator.filter { case (dj, j) =>
      !scanned.contains(j) && {
        val dmin = math.max(0.0, dj - radii(j))
        1.0 - dmin * dmin / 2.0 >= kthCosine - eps
      }
    }.map(_._2).toSet
  }

  // NOTE: the round-2 self-graded recall harnesses (annLshRecall /
  // annIvfRecall, single recall>=0.9 bit) are retired: the TopKEval pair
  // below carries the same evaluation duty with a stronger, cross-engine
  // contract (exact per-query top-k vs DuckDB brute force).

}
