package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.query.Vis
import graft.spark.{Extractor, PagesGen, TextOps}

/** Driver contract — one `queries` entry per implemented operator area from
  * SURVEY.md §2, each with an equivalent DuckDB oracle over the same parquet
  * tables. HTML-engine queries synthesize a page per document row
  * deterministically (PagesGen-style), run the engine, and emit columns the
  * oracle can recompute with plain SQL arithmetic — so a value match proves
  * the engine end-to-end (parse → select → extract → render).
  */
object SparkEntry {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  /** Flagship: full main-content extraction over the synthesized pages
    * corpus at sf0.001 (byte-identity: extracted == oracle text column). */
  def entry(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val sfDir = "/root/testdata/sf0.001"
    PagesGen.fromDocuments(spark, sfDir)
      .map(p => (p.url, Extractor.extractMain(p.html, Extractor.Recipe.default)))
      .toDF("url", "extracted")
  }

  // m-variant helper used by the synthetic fixtures
  @inline private def rep(s: String, n: Long): String = s * n.toInt

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- 1. flagship byte-identity roundtrip (parse+strip+text+entities) ----
    "q_extract_main" -> ((s, dir) => {
      import s.implicits._
      docs(s, dir).select("doc_id", "text", "lang").as[(Long, String, String)]
        .map { case (id, text, lang) =>
          val t = if (text == null) "" else text
          val html = PagesGen.htmlOf(id, t, if (lang == null) "en" else lang)
          (id, Extractor.extractMain(html, Extractor.Recipe.default))
        }.toDF("doc_id", "extracted").orderBy("doc_id")
    }),

    // ---- 2. tag-name selector over per-row DOM ----
    "q_sel_tag_count" -> ((s, dir) => {
      import s.implicits._
      docs(s, dir).select("doc_id").as[Long].map { id =>
        val k = (id % 7) + 1
        val html = "<ul>" + rep("<li>x</li>", k) + "</ul>"
        val root = Vis.loadOrThrow(html)
        (id, root.find("li").length.toLong)
      }.toDF("doc_id", "cnt").orderBy("doc_id")
    }),

    // ---- 3. nth-child An+B + first-child ----
    "q_sel_nth" -> ((s, dir) => {
      import s.implicits._
      docs(s, dir).select("doc_id").as[Long].map { id =>
        val k = (id % 7) + 1
        val html = "<ul>" + rep("<li>x</li>", k) + "</ul>"
        val root = Vis.loadOrThrow(html)
        (id, root.find("li:nth-child(2n)").text(), root.find("li:first-child").text())
      }.toDF("doc_id", "nth_txt", "first_txt").orderBy("doc_id")
    }),

    // ---- 4. attribute operators |= ~= != ----
    "q_sel_attr" -> ((s, dir) => {
      import s.implicits._
      docs(s, dir).select("doc_id").as[Long].map { id =>
        val m = id % 3
        val lang5 = m match { case 0 => "en-x"; case 1 => "zz en"; case _ => "en" }
        val html =
          s"""<nav><a lang="en">1</a><a lang="en-UK">2</a><a lang="english">3</a>""" +
            s"""<a lang="uk en">4</a><a lang="$lang5">5</a></nav>"""
        val root = Vis.loadOrThrow(html)
        val links = root.find("nav").children("")
        (id,
          links.filter("[lang|='en']").length.toLong,
          links.filter("[lang~='en']").length.toLong,
          links.filter("[lang!='en']").length.toLong)
      }.toDF("doc_id", "c_dash", "c_word", "c_ne").orderBy("doc_id")
    }),

    // ---- 5. *-of-type family ----
    "q_sel_type" -> ((s, dir) => {
      import s.implicits._
      docs(s, dir).select("doc_id").as[Long].map { id =>
        val d = (id % 5) + 1
        val html = "<dl>" +
          (1L to d).map(i => s"<dt>t$i</dt><dd>d$i</dd>").mkString + "</dl>"
        val root = Vis.loadOrThrow(html)
        val dl = root.find("dl")
        (id, dl.find(":first-of-type").text(), dl.find(":last-of-type").text())
      }.toDF("doc_id", "fot", "lot").orderBy("doc_id")
    }),

    // ---- 6. sibling traversal (next_all / prev_all / siblings) ----
    "q_traverse" -> ((s, dir) => {
      import s.implicits._
      docs(s, dir).select("doc_id").as[Long].map { id =>
        val d = (id % 5) + 1
        val html = "<dl>" +
          (1L to d).map(i => s"<dt>t$i</dt><dd>d$i</dd>").mkString + "</dl>"
        val root = Vis.loadOrThrow(html)
        val firstDt = root.find("dt").first()
        val lastDd = root.find("dd").last()
        (id,
          firstDt.nextAll("dd").length.toLong,
          lastDd.prevAll("dt").length.toLong,
          firstDt.siblings("").length.toLong)
      }.toDF("doc_id", "nexts", "prevs", "sibs").orderBy("doc_id")
    }),

    // ---- 7. filter / not over class lists ----
    "q_filter_not" -> ((s, dir) => {
      import s.implicits._
      docs(s, dir).select("doc_id").as[Long].map { id =>
        val k = (id % 6) + 2
        val html = "<ul>" + (0L until k).map(i =>
          s"""<li class="${if (i % 2 == 0) "a" else "b"}">$i</li>""").mkString + "</ul>"
        val root = Vis.loadOrThrow(html)
        val lis = root.find("li")
        (id, lis.filter(".a").length.toLong, lis.not(".a").length.toLong)
      }.toDF("doc_id", "n_a", "n_b").orderBy("doc_id")
    }),

    // ---- 8. mutation: remove + set_text + set_attr ----
    "q_mutate" -> ((s, dir) => {
      import s.implicits._
      docs(s, dir).select("doc_id").as[Long].map { id =>
        val m = id % 10
        val html = s"""<div id="m"><b>x</b><i>y</i><script>s()</script></div>"""
        val root = Vis.loadOrThrow(html)
        root.find("i,script").remove()
        val b = root.find("b")
        b.setText(s"k$m")
        b.setAttr("data-x", Some(s"v$m"))
        (id, root.find("#m").text(), b.attr("data-x").map(_.value).getOrElse(""))
      }.toDF("doc_id", "txt", "att").orderBy("doc_id")
    }),

    // ---- 9. entity decoding (named / decimal / hex / nbsp) ----
    "q_entities" -> ((s, dir) => {
      import s.implicits._
      docs(s, dir).select("doc_id").as[Long].map { id =>
        val m = id % 100
        val html = s"<p>&lt;A&gt;&amp;&#66;&#x43;&nbsp;z$m</p>"
        val root = Vis.loadOrThrow(html)
        (id, root.find("p").text())
      }.toDF("doc_id", "txt").orderBy("doc_id")
    }),

    // ---- 10. form value (:checked + val) ----
    "q_val" -> ((s, dir) => {
      import s.implicits._
      docs(s, dir).select("doc_id").as[Long].map { id =>
        val sel = (id % 3) + 1
        val html = "<select>" + (1L to 3L).map(i =>
          s"""<option value="$i"${if (i == sel) " selected" else ""}>o$i</option>""").mkString +
          "</select>"
        val root = Vis.loadOrThrow(html)
        (id, root.find("select").valString(),
          root.find("option:checked").length.toLong)
      }.toDF("doc_id", "v", "checked_cnt").orderBy("doc_id")
    }),

    // ---- 11. render fidelity (outer_html round trip) ----
    "q_outer_html" -> ((s, dir) => {
      import s.implicits._
      docs(s, dir).select("doc_id").as[Long].map { id =>
        val m = id % 5
        val html = s"""<div class="c$m"><span id="s$m">T</span></div>"""
        val root = Vis.loadOrThrow(html)
        (id, root.find("div").outerHtml())
      }.toDF("doc_id", "o").orderBy("doc_id")
    }),

    // ---- 12. texts() collection (content tags as text nodes) ----
    "q_texts" -> ((s, dir) => {
      import s.implicits._
      docs(s, dir).select("doc_id").as[Long].map { id =>
        val m = id % 100
        val html = s"<div>a$m<span>B</span>C<script>J</script></div>"
        val root = Vis.loadOrThrow(html)
        val texts = root.find("div").texts(0)
        val parts = (0 until texts.length).map(i => texts.get(i).text())
        (id, parts.mkString("|"))
      }.toDF("doc_id", "t").orderBy("doc_id")
    }),

    // ---- corpus-level relational ops (Catalyst built-ins) ----
    "q_rollup_lang" -> ((s, dir) =>
      docs(s, dir).groupBy(col("lang"))
        .agg(count(lit(1)).as("cnt"), sum(col("n_chars")).as("chars"))
        .orderBy("lang")),

    "q_dedup_exact" -> ((s, dir) =>
      docs(s, dir).agg(
        countDistinct(col("text")).as("distinct_texts"),
        count(lit(1)).as("total_docs"))),

    "q_token_count" -> ((s, dir) =>
      TextOps.tokenCount(docs(s, dir)).orderBy("doc_id")),

    "q_quality" -> ((s, dir) =>
      TextOps.qualityScore(docs(s, dir)).orderBy("doc_id")),

    // ---- training-data ops without a SQL oracle (rows-only checks) ----
    "q_lang_id" -> ((s, dir) => {
      import s.implicits._
      docs(s, dir).select(col("doc_id").as[Long], col("text").as[String])
        .map { case (id, t) => (id, TextOps.langId(t)) }
        .toDF("doc_id", "lang_pred").orderBy("doc_id")
    }),

    "q_fingerprint" -> ((s, dir) => {
      import s.implicits._
      docs(s, dir).select(col("doc_id").as[Long], col("text").as[String])
        .map { case (id, t) => (id, TextOps.fingerprint(t, 16), TextOps.simHash(t)) }
        .toDF("doc_id", "fp", "simhash").orderBy("doc_id")
    }),

    "q_dedup_minhash" -> ((s, dir) => {
      val pairs = TextOps.minhashPairs(s, docs(s, dir))
      pairs.agg(count(lit(1)).as("pair_count"))
    }),

    "q_ann_topk" -> ((s, dir) => TextOps.annTopK(s, dir, queryId = 0L, k = 5)),

    "q_ann_lsh" -> ((s, dir) => TextOps.annLsh(s, dir, queryId = 0L, k = 5)),

    // lineage rollup over the salted bucket column (Spark hash; rows-only)
    "q_lineage" -> ((s, dir) => {
      val pages = PagesGen.asDataFrame(s, dir)
      pages.withColumn("bucket", graft.spark.ExtractJob.bucketCol(42, 16))
        .groupBy("bucket")
        .agg(count(lit(1)).as("doc_count"),
          sum(octet_length(col("html"))).as("byte_count"),
          min(col("warc_ts")).as("warc_ts_min"),
          max(col("warc_ts")).as("warc_ts_max"))
        .orderBy("bucket")
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q_extract_main" ->
      "SELECT doc_id, text AS extracted FROM documents ORDER BY doc_id",
    "q_sel_tag_count" ->
      "SELECT doc_id, CAST((doc_id % 7) + 1 AS BIGINT) AS cnt FROM documents ORDER BY doc_id",
    "q_sel_nth" ->
      ("SELECT doc_id, repeat('x', CAST(FLOOR(((doc_id % 7) + 1) / 2.0) AS INT)) AS nth_txt, " +
        "'x' AS first_txt FROM documents ORDER BY doc_id"),
    "q_sel_attr" ->
      ("SELECT doc_id, " +
        "CAST(CASE WHEN doc_id % 3 = 1 THEN 2 ELSE 3 END AS BIGINT) AS c_dash, " +
        "CAST(CASE WHEN doc_id % 3 = 0 THEN 2 ELSE 3 END AS BIGINT) AS c_word, " +
        "CAST(CASE WHEN doc_id % 3 = 2 THEN 3 ELSE 4 END AS BIGINT) AS c_ne " +
        "FROM documents ORDER BY doc_id"),
    "q_sel_type" ->
      ("SELECT doc_id, 't1d1' AS fot, " +
        "concat('t', CAST((doc_id % 5) + 1 AS VARCHAR), 'd', CAST((doc_id % 5) + 1 AS VARCHAR)) AS lot " +
        "FROM documents ORDER BY doc_id"),
    "q_traverse" ->
      ("SELECT doc_id, CAST((doc_id % 5) + 1 AS BIGINT) AS nexts, " +
        "CAST((doc_id % 5) + 1 AS BIGINT) AS prevs, " +
        "CAST(2 * ((doc_id % 5) + 1) - 1 AS BIGINT) AS sibs " +
        "FROM documents ORDER BY doc_id"),
    "q_filter_not" ->
      ("SELECT doc_id, CAST(FLOOR(((doc_id % 6) + 3) / 2.0) AS BIGINT) AS n_a, " +
        "CAST(FLOOR(((doc_id % 6) + 2) / 2.0) AS BIGINT) AS n_b " +
        "FROM documents ORDER BY doc_id"),
    "q_mutate" ->
      ("SELECT doc_id, concat('k', CAST(doc_id % 10 AS VARCHAR)) AS txt, " +
        "concat('v', CAST(doc_id % 10 AS VARCHAR)) AS att FROM documents ORDER BY doc_id"),
    "q_entities" ->
      ("SELECT doc_id, concat('<A>&BC', chr(160), 'z', CAST(doc_id % 100 AS VARCHAR)) AS txt " +
        "FROM documents ORDER BY doc_id"),
    "q_val" ->
      ("SELECT doc_id, CAST((doc_id % 3) + 1 AS VARCHAR) AS v, CAST(1 AS BIGINT) AS checked_cnt " +
        "FROM documents ORDER BY doc_id"),
    "q_outer_html" ->
      ("SELECT doc_id, concat('<div class=\"c', CAST(doc_id % 5 AS VARCHAR), " +
        "'\"><span id=\"s', CAST(doc_id % 5 AS VARCHAR), '\">T</span></div>') AS o " +
        "FROM documents ORDER BY doc_id"),
    "q_texts" ->
      ("SELECT doc_id, concat('a', CAST(doc_id % 100 AS VARCHAR), '|B|C|J') AS t " +
        "FROM documents ORDER BY doc_id"),
    "q_rollup_lang" ->
      ("SELECT lang, CAST(COUNT(*) AS BIGINT) AS cnt, CAST(SUM(n_chars) AS BIGINT) AS chars " +
        "FROM documents GROUP BY lang ORDER BY lang"),
    "q_dedup_exact" ->
      ("SELECT CAST(COUNT(DISTINCT text) AS BIGINT) AS distinct_texts, " +
        "CAST(COUNT(*) AS BIGINT) AS total_docs FROM documents"),
    "q_token_count" ->
      ("SELECT doc_id, CAST(CASE WHEN length(trim(text)) = 0 THEN 0 " +
        "ELSE array_length(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) AS token_count " +
        "FROM documents ORDER BY doc_id"),
    "q_quality" ->
      ("SELECT doc_id, " +
        "CAST(length(text) - length(regexp_replace(text, '[.!?,]', '', 'g')) AS BIGINT) AS punct_count, " +
        "CASE WHEN length(trim(text)) = 0 THEN 0.0 " +
        "ELSE CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE) / " +
        "array_length(regexp_split_to_array(trim(text), '\\s+')) END AS mean_token_len " +
        "FROM documents ORDER BY doc_id")
    // q_lang_id / q_fingerprint / q_dedup_minhash / q_ann_topk / q_ann_lsh /
    // q_lineage: engine-side hashing & heuristics — rows-only checks.
  )
}
