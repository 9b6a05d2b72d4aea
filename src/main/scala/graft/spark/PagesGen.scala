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

  /** markup-dense page (Common-Crawl-realistic tag/text ratio): `k` controls
    * how much nav/menu/table boilerplate wraps the same main content. All
    * boilerplate is strippable by the default recipe (everything heavy sits
    * in nav/aside/footer), so extraction stays byte-identical to `text`. */
  def htmlOfDense(docId: Long, text: String, lang: String, k: Int): String = {
    val enc = Entities.encodeSpecial(text)
    val sb = new java.lang.StringBuilder(4096)
    sb.append(s"""<!doctype html><html lang="$lang"><head><title>doc $docId</title>""")
    sb.append("""<style>.ad{display:none}.m li{color:#333}</style><script>var cfg={a:1,b:"x"};</script></head><body>""")
    // menu: many small elements with attributes (parser-heavy, extractor-irrelevant)
    sb.append("""<nav class="m top" role="navigation"><ul class="menu">""")
    var i = 0
    val items = 8 * k
    while (i < items) {
      sb.append(s"""<li class="mi mi-$i" data-k="$i"><a href="/cat/${i % 7}/p/$i" title="page $i">item&nbsp;$i</a><span class="badge">${i % 10}</span></li>""")
      i += 1
    }
    sb.append("</ul></nav>")
    sb.append(s"""<aside class="rel"><table class="t"><thead><tr><th>k</th><th>v</th></tr></thead><tbody>""")
    i = 0
    while (i < 2 * k) {
      sb.append(s"""<tr class="r${i % 2}"><td>$i</td><td><em>v$i</em>&copy;</td></tr>""")
      i += 1
    }
    sb.append("</tbody></table></aside>")
    sb.append(s"""<div class="ad" data-slot="$docId" hidden><script>track($docId);</script>sponsored</div>""")
    (docId % 4) match {
      case 0 => sb.append(s"<main>$enc</main>")
      case 1 => sb.append(s"""<div role="main">$enc</div>""")
      case 2 => sb.append(s"""<div id="content">$enc</div>""")
      case _ => sb.append(enc) // body fallback: recipe strips everything else
    }
    sb.append("""<footer><p>copyright</p><nav class="m bottom"><a href="/tos">tos</a></nav></footer></body></html>""")
    sb.toString
  }

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
    * `reps` page copies per document (distinct urls — ids never collide
    * while doc_id < 1000000007, far above any sf corpus) and `boilerplate`
    * copies of the strip-side nav/table markup around each page's payload
    * (htmlOfDense's k). The PAYLOAD appears once per page, so extraction
    * stays byte-verifiable (extracted == the UNamplified text column);
    * the knob scales bytes-parsed-and-stripped per page, not extracted
    * output volume. */
  def amplified(spark: SparkSession, sfDir: String, reps: Int, boilerplate: Int): Dataset[PageRow] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text", "lang")
      .as[(Long, String, String)]
      .flatMap { case (id, text0, lang0) =>
        val text = if (text0 == null) "" else text0
        val lang = if (lang0 == null) "en" else lang0
        (0 until reps).iterator.map { r =>
          val ampId = id + r.toLong * 1000000007L
          PageRow(urlOf(ampId), tsOf(ampId),
            htmlOfDense(ampId, text, lang, boilerplate)
              .getBytes(java.nio.charset.StandardCharsets.UTF_8),
            text, lang)
        }
      }
  }
}
