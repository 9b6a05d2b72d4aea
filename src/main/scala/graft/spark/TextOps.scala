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
object TextOps extends TextCoreOps with TextDedupOps with AnnProbeOps

/** text-side scalar primitives + shared frame utilities: deterministic
  * hashing (shingles, MinHash band keys, SimHash, winnowing fingerprints),
  * language id, token counts, quality signals. One concern per trait —
  * [[TextOps]] is the single public facade; `private[spark]` members are
  * the cross-trait seams. */
private[spark] trait TextCoreOps extends Serializable {
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
  private[spark] def finishUnpersist(result: DataFrame, intermediates: Dataset[_]*): DataFrame = {
    val out = result.localCheckpoint(true)
    intermediates.foreach(_.unpersist(false))
    out
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

  /** Gopher-rule repetition signals per document — see [[Repetition]] for
    * the exact definitions. One codegen'd scalar per row, no shuffle.
    * Needs [[GraftSparkExtensions]] registered (like every SQL-fn-backed
    * helper here). */
  def repetitionSignals(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      call_function("repetition_signals", col("text")).as("rep"))
      .select(col("doc_id"), col("rep.*"))

  /** distributed BPE merge training (Sennrich et al. 2016 — the
    * tokenizer-training step of a data pipeline, run on the cleaned
    * corpus so the vocabulary reflects what the model will read):
    * symbols start as characters plus a `</w>` end-of-word marker; each
    * round counts adjacent symbol pairs weighted by word frequency,
    * merges the most frequent pair everywhere (ties: count desc, then
    * left asc, then right asc — fully deterministic), repeats.
    *
    * Returns the merge table `(rank, left, right, pair_count)` — the
    * artifact a BPE tokenizer is: apply the merges in rank order to
    * segment any text. Stops early when no pair reaches `minPairCount`.
    *
    * Scale shape: the corpus collapses to its WORD-FREQUENCY table in
    * one shuffle (distinct words ~ millions, not the 100-TB token
    * stream); each round is then one pair-count aggregate over that
    * small table + one map to apply the merge, with per-round
    * localCheckpoint (the same lineage-truncation discipline as
    * [[CrawlGraphOps.connectedComponents]]) and ONE driver row collected
    * per round (the argmax). numMerges rounds = 2·numMerges tiny jobs —
    * the corpus is touched once. */
  def bpeTrain(spark: SparkSession, docs: DataFrame, numMerges: Int = 10,
      minPairCount: Long = 2L, driverWordBudget: Int = BpeDriverWordBudget): DataFrame = {
    import spark.implicits._
    require(numMerges >= 1 && numMerges <= 65536, s"numMerges out of range: $numMerges")
    val wordFreq = docs
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))
    // Driver escape (round 7, the contaminationCheck broadcast-guard
    // pattern): after the one corpus shuffle the word-frequency table is
    // distinct-words-sized (~millions of rows, NOT the token stream). When
    // it fits the row+char budget, collect it once and run the classic
    // in-memory merge loop — 2 Spark jobs total instead of ~2 PER MERGE,
    // which is what makes a real 32k-merge vocabulary deliverable (the r6
    // distributed loop would have scheduled ~64k jobs of pure overhead;
    // see BpeScaleSpec for the 32k witness). Identical merge sequence by
    // construction: same pair counts (Long), same tie order (count desc,
    // then left, then right in UTF-8 binary order — Spark's string sort
    // order), same greedy re-segmentation ([[mergePair]]), same
    // minPairCount early stop. Oversize vocabularies fall through to the
    // distributed per-round loop unchanged.
    if (driverWordBudget > 0) {
      val head = wordFreq.select(col("w").as[String], col("freq").as[Long])
        .limit(driverWordBudget + 1).collect()
      if (head.length <= driverWordBudget &&
          head.iterator.map(_._1.length.toLong).sum <= BpeDriverCharBudget)
        return bpeTrainLocal(spark, head, numMerges, minPairCount)
    }
    var segs = wordFreq
      .select(col("w").as[String], col("freq").as[Long])
      .map { case (w, f) => (w.map(_.toString) :+ "</w>", f) }
      .toDF("syms", "freq")
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var done = false
    var rank = 1
    while (rank <= numMerges && !done) {
      val top = segs
        .select(col("freq"), posexplode(col("syms")).as(Seq("i", "a")), col("syms"))
        .filter(col("i") < size(col("syms")) - 1)
        .select(col("freq"), col("a"), element_at(col("syms"), col("i") + 2).as("b"))
        .groupBy("a", "b").agg(sum(col("freq")).as("c"))
        .orderBy(col("c").desc, col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty || top.head.getLong(2) < minPairCount) done = true
      else {
        val a = top.head.getString(0)
        val b = top.head.getString(1)
        merges += ((rank, a, b, top.head.getLong(2)))
        segs = segs.select(col("syms").as[Seq[String]], col("freq").as[Long])
          .map { case (syms, f) => (mergePair(syms, a, b), f) }
          .toDF("syms", "freq")
          .localCheckpoint(true)
        rank += 1
      }
    }
    merges.toSeq.toDF("rank", "left", "right", "pair_count")
  }

  /** row / char budgets for [[bpeTrain]]'s driver escape: 2M distinct
    * words of ≤ 32M total chars is a few hundred MB of driver state —
    * comfortably inside the same driver envelope contaminationCheck's
    * 64M-gram broadcast guard already accepts. */
  final val BpeDriverWordBudget: Int = 2 << 20
  final val BpeDriverCharBudget: Long = 32L << 20

  /** UTF-8 binary string order — what Spark's `orderBy(col)` on strings
    * (UTF8String) uses; java.lang.String.compareTo is UTF-16 code-unit
    * order, which disagrees for supplementary characters. */
  private def utf8Compare(x: String, y: String): Int = {
    val a = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val b = y.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    a.length - b.length
  }

  /** the in-memory merge loop behind [[bpeTrain]]'s driver escape:
    * incremental pair-count maintenance (only words containing the merged
    * pair are re-segmented — the subword-nmt shape), so 32k merges over a
    * milions-of-words table run in seconds. Semantics identical to the
    * distributed loop (see the caller comment). */
  private def bpeTrainLocal(spark: SparkSession, wordFreq: Array[(String, Long)],
      numMerges: Int, minPairCount: Long): DataFrame = {
    import spark.implicits._
    val m = wordFreq.length
    val words = new Array[Array[String]](m)
    val freqs = new Array[Long](m)
    var i = 0
    while (i < m) {
      val (w, f) = wordFreq(i)
      val syms = new Array[String](w.length + 1)
      var j = 0
      while (j < w.length) { syms(j) = String.valueOf(w.charAt(j)); j += 1 }
      syms(w.length) = "</w>"
      words(i) = syms
      freqs(i) = f
      i += 1
    }
    val pairCount = new java.util.HashMap[(String, String), java.lang.Long]()
    val pairWords = new java.util.HashMap[(String, String), java.util.HashSet[Integer]]()
    // lazy-deletion priority queue for the per-merge argmax: every count
    // change pushes a fresh entry; stale entries (count no longer current)
    // are discarded at poll time. Exact argmax in O(log Q) amortized —
    // a linear scan of the pair map per merge made 32k merges quadratic.
    val utf8Cache = new java.util.HashMap[String, Array[Byte]]()
    def u8(s: String): Array[Byte] = {
      var b = utf8Cache.get(s)
      if (b == null) { b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8); utf8Cache.put(s, b) }
      b
    }
    def byteCmp(a: Array[Byte], b: Array[Byte]): Int = {
      val n = math.min(a.length, b.length)
      var j = 0
      while (j < n) {
        val d = (a(j) & 0xff) - (b(j) & 0xff)
        if (d != 0) return d
        j += 1
      }
      a.length - b.length
    }
    final case class PEntry(count: Long, a: String, b: String)
    val pq = new java.util.PriorityQueue[PEntry](64,
      (x: PEntry, y: PEntry) => {
        if (x.count != y.count) java.lang.Long.compare(y.count, x.count)
        else {
          val dl = byteCmp(u8(x.a), u8(y.a))
          if (dl != 0) dl else byteCmp(u8(x.b), u8(y.b))
        }
      })
    def addWord(wid: Int, sign: Long): Unit = {
      val syms = words(wid)
      val f = freqs(wid) * sign
      var j = 0
      while (j + 1 < syms.length) {
        val p = (syms(j), syms(j + 1))
        val c = pairCount.get(p)
        val nc = (if (c == null) 0L else c.longValue()) + f
        if (nc == 0L) pairCount.remove(p)
        else {
          pairCount.put(p, java.lang.Long.valueOf(nc))
          pq.add(PEntry(nc, p._1, p._2))
        }
        if (sign > 0) {
          var set = pairWords.get(p)
          if (set == null) { set = new java.util.HashSet[Integer](); pairWords.put(p, set) }
          set.add(Integer.valueOf(wid))
        }
        // sign < 0: membership sets are corrected lazily — a stale id is
        // filtered at merge time (the word just no longer contains the pair)
        j += 1
      }
    }
    i = 0
    while (i < m) { addWord(i, 1L); i += 1 }

    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 1
    var done = false
    while (rank <= numMerges && !done) {
      // argmax: count desc, then left asc, then right asc (UTF-8 order);
      // poll past stale queue entries
      var best: (String, String) = null
      var bestC = 0L
      var searching = true
      while (searching) {
        val e = pq.poll()
        if (e == null) searching = false
        else {
          val cur = pairCount.get((e.a, e.b))
          if (cur != null && cur.longValue() == e.count) {
            best = (e.a, e.b); bestC = e.count; searching = false
            // the winning entry re-enters the queue only when its count
            // changes again (addWord pushes on every change)
          }
        }
      }
      if (best == null || bestC < minPairCount) done = true
      else {
        merges += ((rank, best._1, best._2, bestC))
        val members = pairWords.remove(best)
        if (members != null) {
          val mit = members.iterator()
          while (mit.hasNext) {
            val wid = mit.next().intValue()
            val old = words(wid)
            // lazily-staled membership: verify the pair is still present
            var has = false
            var j = 0
            while (!has && j + 1 < old.length) {
              has = old(j) == best._1 && old(j + 1) == best._2
              j += 1
            }
            if (has) {
              addWord(wid, -1L)
              words(wid) = mergePair(old.toSeq, best._1, best._2).toArray
              addWord(wid, 1L)
            }
          }
        }
        rank += 1
      }
    }
    merges.toSeq.toDF("rank", "left", "right", "pair_count")
  }

  /** the apply side of [[bpeTrain]]: token count per doc under a trained
    * merge table — the number an LLM-data pipeline actually bills by
    * (corpus token budget under ITS OWN tokenizer, not a whitespace
    * proxy). The merge list (rank-ordered, small by construction)
    * broadcasts; each row segments its words through the merges in rank
    * order — one pass per row, no shuffle beyond the input's own.
    * Per-word memoization inside a task amortizes Zipf repetition. */
  def bpeTokenCount(spark: SparkSession, docs: DataFrame, merges: DataFrame): DataFrame = {
    import spark.implicits._
    val rules: Array[(String, String)] = merges.orderBy("rank")
      .select(col("left").as[String], col("right").as[String]).collect()
    val bc = spark.sparkContext.broadcast(rules)
    docs.select(col("doc_id").as[Long], col("text").as[String])
      .mapPartitions { it =>
        val rs = bc.value
        val memo = new java.util.HashMap[String, Integer]()
        it.map { case (id, text) =>
          var total = 0L
          if (text != null) {
            text.trim.toLowerCase(java.util.Locale.ROOT).split("\\s+")
              .foreach { w =>
                if (w.nonEmpty) {
                  var n = memo.get(w)
                  if (n == null) {
                    var syms: Seq[String] = w.map(_.toString) :+ "</w>"
                    var i = 0
                    while (i < rs.length && syms.length > 1) {
                      syms = mergePair(syms, rs(i)._1, rs(i)._2)
                      i += 1
                    }
                    n = Integer.valueOf(syms.length)
                    if (memo.size < 100000) memo.put(w, n) // bounded cache
                  }
                  total += n.intValue()
                }
              }
          }
          (id, total)
        }
      }.toDF("doc_id", "bpe_tokens")
  }

  /** greedy left-to-right merge of adjacent (a, b) in one symbol seq —
    * overlapping runs merge non-overlapping-first, the BPE convention. */
  def mergePair(syms: Seq[String], a: String, b: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    val n = syms.length
    while (i < n) {
      if (i + 1 < n && syms(i) == a && syms(i + 1) == b) { out += (a + b); i += 2 }
      else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  /** corpus-trained bigram language-model scoring — the CCNet quality
    * dimension: a document's mean token-transition log-likelihood under a
    * model TRAINED ON THE CORPUS ITSELF separates fluent prose (common
    * transitions) from keyword stuffing and gibberish (rare ones), with
    * no external model artifact. Add-k smoothing over the corpus vocab:
    *
    *   score(doc) = mean over its bigrams of
    *     ln( (count(w1,w2) + k) / (count(w1) + k·V) )
    *
    * where V = corpus vocab size and tokens are `lower(trim(text))`
    * whitespace words. Docs with fewer than 2 tokens score 0.0.
    *
    * Scale shape: train AND score are the same relational DAG — explode
    * bigrams once, aggregate counts, join the counts back, average per
    * doc. No model ever materializes on the driver (V is the one scalar
    * collected); every shuffle is keyed by a token or token pair, the
    * natural Zipf skew of which is absorbed by partial aggregation
    * (map-side combine halves the head keys before the exchange). At
    * 100 TB you train on a sampled corpus and score the full one — pass
    * the sample as `train` (defaults to `docs` itself). */
  def bigramLmScore(docs: DataFrame, train: DataFrame = null, k: Double = 1.0): DataFrame = {
    val trainDf = if (train == null) docs else train
    def words(df: DataFrame) = df.select(col("doc_id"),
      split(lower(trim(col("text"))), "\\s+").as("ws"))
      .select(col("doc_id"), filter(col("ws"), w => length(w) > 0).as("ws"))
    def bigrams(df: DataFrame) = words(df)
      .select(col("doc_id"), posexplode(col("ws")).as(Seq("i", "w1")),
        col("ws"))
      .filter(col("i") < size(col("ws")) - 1)
      .select(col("doc_id"), col("w1"),
        element_at(col("ws"), col("i") + 2).as("w2"))
    val trainBi = bigrams(trainDf)
    val biCounts = trainBi.groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
    val uniCounts = words(trainDf)
      .select(explode(col("ws")).as("w1")).groupBy("w1")
      .agg(count(lit(1)).as("cu"))
    // vocab size stays IN the DAG as a 1-row aggregate crossJoin: the r6
    // `uniCounts.count()` was a separate driver action re-running the
    // whole tokenize+aggregate subtree before the real query even started
    // (2 passes over the corpus, 2 jobs); the shared uniCounts exchange is
    // now computed once and reused by both consumers
    val vocab = uniCounts.agg(count(lit(1)).as("v"))
    val scored = bigrams(docs)
      .join(biCounts, Seq("w1", "w2"), "left")
      .join(uniCounts, Seq("w1"), "left")
      .crossJoin(vocab)
      .select(col("doc_id"),
        log((coalesce(col("cb"), lit(0L)).cast("double") + k) /
          (coalesce(col("cu"), lit(0L)).cast("double") + lit(k) * col("v"))).as("ll"))
      .groupBy("doc_id").agg(avg(col("ll")).as("lm_score"))
    docs.select(col("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("lm_score"), lit(0.0)).as("lm_score"))
  }

  /** the full Gopher document filter: [[GopherFilter]]'s rule signals
    * composed with [[Repetition]]'s repetitiousness thresholds (the
    * paper's dup-fraction cuts: dup_line_frac ≤ 0.30,
    * dup_para_frac ≤ 0.30, dup_line_char_frac ≤ 0.20,
    * dup_para_char_frac ≤ 0.20). Two codegen'd scalars per row, no
    * shuffle — `filter(col("gopher_pass"))` is the 100-TB pre-dedup cut.
    * Needs [[GraftSparkExtensions]] registered. */
  def gopherQuality(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      call_function("gopher_quality", col("text")).as("g"),
      call_function("repetition_signals", col("text")).as("r"))
      .select(col("doc_id"), col("g.*"),
        (col("g.passes") && col("r.dup_line_frac") <= 0.30 &&
          col("r.dup_para_frac") <= 0.30 &&
          col("r.dup_line_char_frac") <= 0.20 &&
          col("r.dup_para_char_frac") <= 0.20).as("gopher_pass"))

}
