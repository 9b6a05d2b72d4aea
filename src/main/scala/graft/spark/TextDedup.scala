package graft.spark

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** deduplication operators over the documents / embeddings tables: exact
  * (hash-keyed), MinHash-LSH, SimHash, and embedding-cosine near-dup pairs
  * — every candidate generator is banded + bucket-capped and every pair is
  * verified exactly before it counts. See [[TextOps]]. */
private[spark] trait TextDedupOps extends TextCoreOps with AnnCoreOps {
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

  /** paragraph-level cross-document dedup — the CCNet/Dolma granularity:
    * whole-document dedup misses the boilerplate that survives extraction
    * (cookie banners, share bars, licence footers) because it is EMBEDDED
    * in otherwise-unique pages; deduplicating at the paragraph level
    * removes every repeated occurrence corpus-wide while keeping exactly
    * one (the first by `(doc_id, idx)` — deterministic under re-runs).
    *
    * Returns one row per input doc: `(doc_id, text_dedup)` — surviving
    * paragraphs in document order joined with `"\n\n"`, `""` when every
    * paragraph was a repeat. Paragraphs are `"\n\n"`-separated non-empty
    * units (the [[Repetition]] convention).
    *
    * Scale shape: the winner table is built from `(xxhash64, doc_id,
    * idx)` projections — ~24 bytes/row, never text — and the only
    * text-bearing shuffles are the hash-keyed winner join and the final
    * doc_id regroup, both uniform by construction (hash keys). A
    * same-hash/different-text collision (2^-64-scale) would drop a
    * paragraph spuriously — the accepted trade every hash-keyed dedup
    * makes; swap the join key to the paragraph itself if bytes-exact
    * semantics ever matter more than shuffle width. */
  def paragraphDedup(docs: DataFrame): DataFrame = {
    val paras = docs
      .select(col("doc_id"), posexplode(split(col("text"), "\n\n")).as(Seq("idx", "para")))
      .filter(length(col("para")) > 0)
      .withColumn("h", xxhash64(col("para")))
    val winners = paras.select(col("h"), col("doc_id"), col("idx"))
      .groupBy("h").agg(min(struct(col("doc_id"), col("idx"))).as("w"))
    val kept = paras.join(winners, "h")
      .filter(col("doc_id") === col("w.doc_id") && col("idx") === col("w.idx"))
      .groupBy("doc_id")
      .agg(array_join(transform(array_sort(collect_list(struct(col("idx"), col("para")))),
        x => x.getField("para")), "\n\n").as("text_dedup"))
    docs.select(col("doc_id"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("text_dedup"), lit("")).as("text_dedup"))
  }

  /** per-host template removal — the host-scoped sibling of
    * [[paragraphDedup]]: a paragraph repeated across MOST of a host's
    * pages is that host's template (cookie banner, subscription nag,
    * footer nav) even when it never appears anywhere else — and
    * corpus-global dedup still keeps one occurrence of it per distinct
    * wording. This pass drops every occurrence of any paragraph
    * that appears in more than `maxDocFrac` of its host's documents
    * (when the host has at least `minHostDocs` documents — below that
    * the fraction is noise), the CCNet per-shard convention.
    *
    * Input `(doc_id, host, text)`; output one row per doc:
    * `(doc_id, text_clean)` — surviving paragraphs in order, `""` when
    * the whole doc was template. DISTINCT paragraph-per-doc counting
    * (a paragraph twice in one doc counts one doc).
    *
    * Scale shape: template discovery runs over `(host, xxhash64(para))`
    * projections — never text; the only text-bearing shuffle is the
    * final doc regroup. Host skew is the natural partition skew of the
    * web (a few giant hosts): the count agg is a two-stage hash agg
    * (partial map-side), so a giant host costs one reducer ROW per
    * distinct paragraph hash, not per page. */
  def hostTemplateRemove(docs: DataFrame, maxDocFrac: Double = 0.5,
      minHostDocs: Long = 3L): DataFrame = {
    val paras = docs
      .select(col("doc_id"), col("host"),
        posexplode(split(col("text"), "\n\n")).as(Seq("idx", "para")))
      .filter(length(col("para")) > 0)
      .withColumn("h", xxhash64(col("para")))
    val hostDocs = docs.groupBy("host")
      .agg(countDistinct(col("doc_id")).as("n_docs"))
    val template = paras.select(col("host"), col("h"), col("doc_id")).distinct()
      .groupBy("host", "h").agg(count(lit(1)).as("n_with"))
      .join(hostDocs, "host")
      .filter(col("n_docs") >= minHostDocs &&
        col("n_with").cast("double") > col("n_docs").cast("double") * maxDocFrac)
      .select(col("host"), col("h"), lit(true).as("is_template"))
    val kept = paras.join(template, Seq("host", "h"), "left_anti")
      .groupBy("doc_id")
      .agg(array_join(transform(array_sort(collect_list(struct(col("idx"), col("para")))),
        x => x.getField("para")), "\n\n").as("text_clean"))
    docs.select(col("doc_id"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("text_clean"), lit("")).as("text_clean"))
  }

  /** benchmark decontamination — the n-gram overlap check (13-gram word
    * grams, the GPT-3/LLaMA convention) run before any eval-bearing
    * training set ships: a document sharing even one 13-gram with a held
    * benchmark item leaks that benchmark. Grams are built from
    * `lower(trim(text))` whitespace words joined by single spaces.
    *
    * Scale shape: the benchmark side is SMALL by definition (eval suites
    * are thousands of items), so its distinct gram hashes collect to the
    * driver, sort into one compact Long array, and broadcast — the 100-TB
    * doc side then runs one pass per row (rolling gram + binary search),
    * no explode, no join, no shuffle. `n_hits` counts contaminated gram
    * POSITIONS (a twice-occurring gram counts twice). Hash membership
    * (64-bit) stands in for string equality — the standard trade: a
    * collision can only over-flag (filtering is the safe direction),
    * and at 2^-64 per pair it never decides a corpus. */
  def contaminationCheck(spark: SparkSession, docs: DataFrame, bench: DataFrame,
      n: Int = 13): DataFrame = {
    import spark.implicits._
    val benchGrams: Array[Long] = bench.select(col("text").as[String])
      .flatMap(t => gramHashes(t, n)).distinct().collect().sorted
    require(benchGrams.length < (64 << 20),
      s"contaminationCheck: ${benchGrams.length} benchmark grams exceed the broadcast budget")
    val bc = spark.sparkContext.broadcast(benchGrams)
    docs.select(col("doc_id").as[Long], col("text").as[String])
      .map { case (id, t) =>
        val set = bc.value
        var hits = 0L
        val grams = gramHashes(t, n)
        var i = 0
        while (i < grams.length) {
          if (java.util.Arrays.binarySearch(set, grams(i)) >= 0) hits += 1
          i += 1
        }
        (id, hits, hits > 0)
      }.toDF("doc_id", "n_hits", "contaminated")
  }

  /** word n-gram hashes of `lower(trim(text))` (decontamination
    * convention); empty for sub-n docs. */
  private[spark] def gramHashes(text: String, n: Int): Array[Long] = {
    if (text == null) return Array.empty
    val toks = text.trim.toLowerCase(java.util.Locale.ROOT)
      .split("\\s+").filter(_.nonEmpty)
    if (toks.length < n) return Array.empty
    val out = new Array[Long](toks.length - n + 1)
    var i = 0
    while (i + n <= toks.length) {
      out(i) = tokenHash(toks.slice(i, i + n).mkString(" "), 0x1337c0deL)
      i += 1
    }
    out
  }

  /** the one-call corpus cleaner — the canonical training-data pipeline
    * over extracted pages `(doc_id, host, text)`, composing this
    * module's tiers in the order a real run wants them:
    *
    *  1. per-row repair: `fix_text` then `scrub_cards` then `scrub_pii`
    *     (cards before the phone regex — see [[TextNorm.scrubCards]]);
    *  2. quality gate: [[gopherQuality]]'s composed `gopher_pass`
    *     (rule signals + repetition thresholds) — failed docs DROP;
    *  3. [[hostTemplateRemove]]: host-template paragraphs drop
    *     everywhere (before global dedup, so a template's lone survivor
    *     never pollutes a surviving doc);
    *  4. [[paragraphDedup]]: corpus-wide exact paragraph dedup;
    *  5. exact doc dedup on the cleaned text — first doc_id survives;
    *     docs left textless by 3-4 drop.
    *
    * Returns `(doc_id, host, text_clean)`. Each stage is individually
    * oracle-gated (q_fix_text/q_scrub_*, q_gopher, q_host_template,
    * q_dedup_para, q_dedup_exact); the composition is spec-pinned.
    * Needs [[GraftSparkExtensions]]. */
  def cleanCorpus(docs: DataFrame): DataFrame = {
    val repaired = docs.select(col("doc_id"), col("host"),
      call_function("scrub_pii", call_function("scrub_cards",
        call_function("fix_text", col("text")))).as("text"))
    val passed = repaired
      .join(gopherQuality(repaired).select(col("doc_id"), col("gopher_pass")),
        Seq("doc_id"))
      .filter(col("gopher_pass"))
      .select(col("doc_id"), col("host"), col("text"))
    val detemplated = passed
      .join(hostTemplateRemove(passed), Seq("doc_id"))
      .select(col("doc_id"), col("host"), col("text_clean").as("text"))
    val deduped = detemplated
      .join(paragraphDedup(detemplated), Seq("doc_id"))
      .select(col("doc_id"), col("host"), col("text_dedup").as("text"))
      .filter(length(col("text")) > 0)
    // final exact doc dedup keyed on xxhash64(text) — the [[dedupExact]]
    // discipline (r6 grouped by the TEXT COLUMN and joined back on it: two
    // full-corpus exchanges sorting/comparing multi-KB text keys, in the
    // one composition a user actually calls). One 8-byte-keyed exchange;
    // min(struct(doc_id, …)) keeps the first doc per identical text.
    // Same-hash/different-text collisions (2^-64) collapse spuriously —
    // the accepted trade [[paragraphDedup]] already documents.
    deduped.groupBy(xxhash64(col("text")).as("h"))
      .agg(min(struct(col("doc_id"), col("host"), col("text"))).as("w"))
      .select(col("w.doc_id").as("doc_id"), col("w.host").as("host"),
        col("w.text").as("text_clean"))
  }

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
    // bucket-size gate as a COUNT WINDOW over the band table: one
    // (band, key) exchange shared by the filter AND both self-join sides
    // (the r6 aggregate + join-back shape paid a second exchange to
    // re-attach sizes)
    val szW = org.apache.spark.sql.expressions.Window.partitionBy("band", "key")
    val inBucket = bandRows
      .withColumn("sz", count(lit(1)).over(szW))
      .where(col("sz") >= 2 && col("sz") <= bucketCap)
      .drop("sz")
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
    // count-window bucket gate — same one-exchange shape as [[minhashPairs]]
    val szW = org.apache.spark.sql.expressions.Window.partitionBy("band", "key")
    val inBucket = sigs
      .withColumn("sz", count(lit(1)).over(szW))
      .where(col("sz") >= 2 && col("sz") <= bucketCap)
      .drop("sz")
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

  /** paragraph-granularity fuzzy dedup — [[simhashPairs]] at the
    * [[paragraphDedup]] unit: near-identical boilerplate variants
    * ("© 2024 Example Corp" vs "© 2025 Example Corp") hash apart under
    * exact paragraph dedup but land within `maxHamming` here. Paragraphs
    * are `"\n\n"` units of at least `minChars` chars (tiny paragraphs
    * carry too few shingles for a stable fingerprint — and they are
    * cheap for the exact pass to handle anyway).
    *
    * Returns near-dup PARAGRAPH pairs
    * `(left_doc, left_idx, right_doc, right_idx)`, the input to a
    * survivor rule (e.g. keep min pair lexicographically, or feed
    * [[CrawlGraphOps.connectedComponents]] for clusters).
    *
    * Unit ids pack as `doc_id << 20 | idx` through the banded SimHash
    * machinery (same buckets, caps, and exact Hamming verify as the
    * doc-level op). `doc_id` must fit 43 bits (8.8e12 docs) — a HARD
    * precondition, enforced per row (an out-of-range id raises instead of
    * silently exiting fuzzy dedup); paragraphs past 2^20 per doc are
    * TRUNCATED by filter (documented data bound, not an error). */
  def paragraphSimhashPairs(spark: SparkSession, docs: DataFrame,
      maxHamming: Int = 3, minChars: Int = 25,
      bucketCap: Long = 10000L, materialize: Boolean = true): DataFrame = {
    val idxBits = 20
    val docIdOk = col("doc_id") >= 0 && col("doc_id") < (1L << (63 - idxBits))
    val paras = docs
      .select(
        when(docIdOk, col("doc_id")).otherwise(raise_error(concat(
          lit("paragraphSimhashPairs: doc_id out of 43-bit range: "),
          col("doc_id").cast("string")))).as("doc_id"),
        posexplode(split(col("text"), "\n\n")).as(Seq("idx", "para")))
      .filter(length(col("para")) >= minChars && col("idx") < (1L << idxBits))
      .select((shiftleft(col("doc_id"), idxBits) + col("idx")).as("doc_id"),
        col("para").as("text"))
    simhashPairs(spark, paras, maxHamming, bucketCap, materialize)
      .select(shiftright(col("left_id"), idxBits).as("left_doc"),
        col("left_id").bitwiseAND(lit((1L << idxBits) - 1)).cast("int").as("left_idx"),
        shiftright(col("right_id"), idxBits).as("right_doc"),
        col("right_id").bitwiseAND(lit((1L << idxBits) - 1)).cast("int").as("right_idx"))
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
    // signatures CARRY the vector (the [[AnnIndexOps]] inline-list
    // argument: embeddings are a small fraction of corpus bytes, and
    // probe/verify locality beats the L-times storage multiplier): the
    // bucket self-join then yields both vectors directly — the r6 shape
    // paid two extra join-back exchanges against the vector table to
    // re-attach them to the candidate pairs
    val sigRows = vecs.flatMap { case (id, v) =>
      (0 until LshTables).iterator.map(t => (id, v, t, hyperplaneSig(v, planes, t)))
    }.toDF("vec_id", "embedding", "tbl", "sig")
      // persisted: the signature map otherwise re-executes for both sides
      // of the self-join — same reason minhashPairs persists its band table
      .persist()
    // count-window bucket gate — one (tbl, sig) exchange shared by the
    // filter and both self-join sides (see minhashPairs)
    val szW = Window.partitionBy("tbl", "sig")
    val inBucket = sigRows
      .withColumn("sz", count(lit(1)).over(szW))
      .where(col("sz") >= 2 && col("sz") <= bucketCap)
      .drop("sz")
    val verified = inBucket.as("a").join(inBucket.as("b"),
        col("a.tbl") === col("b.tbl") && col("a.sig") === col("b.sig") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as[Long], col("b.vec_id").as[Long],
        col("a.embedding").as[Seq[Float]], col("b.embedding").as[Seq[Float]])
      .flatMap { case (l, r, lv, rv) =>
        // a pair sharing buckets in several tables verifies once per table
        // (one cosine each — cheap); the distinct below collapses them
        if (cosine(lv.toArray, rv) >= threshold) Iterator.single((l, r)) else Iterator.empty
      }.toDF("left_id", "right_id")
      .distinct()
    if (materialize) finishUnpersist(verified, vecs, sigRows)
    else { vecs.unpersist(false); sigRows.unpersist(false); verified } // leak-free: lazy plan recomputes
  }
}
