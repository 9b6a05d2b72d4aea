package graft.spark

import graft.dom.Entities
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import java.sql.Timestamp

/** One Common-Crawl-style page row (BASELINE.json input_hint):
  * (url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING).
  * `text` is the oracle column: the byte-exact main-content text the
  * extraction pipeline must recover. */
final case class PageRow(
    url: String,
    warc_ts: Timestamp,
    html: Array[Byte],
    text: String,
    lang: String)

/** Deterministic synthesis of the pages corpus from the driver-provided
  * `documents` table (FIXTURES.md §1): host drawn with a power-law skew to
  * exercise salting, four page templates exercising each main-content
  * heuristic, boilerplate (`nav`/`script`/`style`/ads/footer) that the
  * recipe must strip, and entity-encoded payload text so extraction also
  * proves the encode/decode round trip. No wall-clock, no randomness —
  * a pure function of (doc_id, text, lang). */
object PagesGen extends Serializable {

  private val EpochMs = 1735689600000L // 2025-01-01T00:00:00Z

  def mix(x: Long): Long = {
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** power-law host id: host-0 gets ~50% of pages, host-1 ~25%, … */
  def hostId(docId: Long): Int = {
    val z = java.lang.Long.numberOfTrailingZeros(mix(docId) | (1L << 12))
    z
  }

  def urlOf(docId: Long): String = s"https://host-${hostId(docId)}.example/doc/$docId"

  def tsOf(docId: Long): Timestamp = new Timestamp(EpochMs + docId * 1000L)

  /** page html for a document; template cycles by doc_id. */
  def htmlOf(docId: Long, text: String, lang: String): String = {
    val enc = Entities.encodeSpecial(text)
    val nav = """<nav class="top"><ul><li><a href="/">home</a></li><li><a href="/about">about</a></li></ul></nav>"""
    val ads = s"""<div class="ad" data-slot="$docId"><script>track($docId);</script></div>"""
    val style = """<style>.ad{color:red}</style>"""
    val script = """<script>var page=1;</script>"""
    val footer = """<footer><p>copyright</p></footer>"""
    val aside = """<aside>related links</aside>"""
    (docId % 4) match {
      case 0 =>
        s"""<!doctype html><html lang="$lang"><head><title>doc $docId</title>$style</head>""" +
          s"""<body>$nav$ads<main>$enc</main>$aside$footer</body></html>"""
      case 1 =>
        s"""<!doctype html><html lang="$lang"><head>$script</head>""" +
          s"""<body>$nav<div role="main">$enc</div>$footer</body></html>"""
      case 2 =>
        s"""<html><head><title>d$docId</title></head><body>$ads""" +
          s"""<div id="content">$enc</div>$aside</body></html>"""
      case _ =>
        // body fallback: the strip recipe must remove every non-content node
        s"""<html><body>$script$nav$ads<hidden-x hidden>h</hidden-x>$enc$aside$footer</body></html>"""
    }
  }

  def pageOf(docId: Long, text: String, lang: String): PageRow =
    PageRow(urlOf(docId), tsOf(docId),
      htmlOf(docId, text, lang).getBytes(java.nio.charset.StandardCharsets.UTF_8),
      text, lang)

  /** documents table -> pages dataset. */
  def fromDocuments(spark: SparkSession, sfDir: String): Dataset[PageRow] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text", "lang")
      .as[(Long, String, String)]
      .map { case (id, text, lang) => pageOf(id, if (text == null) "" else text, if (lang == null) "en" else lang) }
  }

  def asDataFrame(spark: SparkSession, sfDir: String): DataFrame =
    fromDocuments(spark, sfDir).toDF()

  /** deterministically amplified corpus for throughput benchmarking:
    * `reps` page copies per document (distinct urls) and `textRep`-fold
    * payload repetition, so the html volume is bench-scale while extraction
    * stays byte-verifiable (extracted == the amplified text column). */
  def amplified(spark: SparkSession, sfDir: String, reps: Int, textRep: Int): Dataset[PageRow] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text", "lang")
      .as[(Long, String, String)]
      .flatMap { case (id, text0, lang0) =>
        val text = if (text0 == null) "" else text0
        val lang = if (lang0 == null) "en" else lang0
        val big = if (textRep <= 1) text else Array.fill(textRep)(text).mkString(" ")
        (0 until reps).iterator.map { r =>
          val ampId = id + r.toLong * 1000000007L
          pageOf(ampId, big, lang)
        }
      }
  }
}
