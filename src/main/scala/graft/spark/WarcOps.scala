package graft.spark

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.charset.StandardCharsets.ISO_8859_1

/** WARC (ISO 28500) record parsing — the container Common Crawl actually
  * ships: a crawl source is a stream of `WARC/1.0` records, each a
  * CRLF-terminated header block (WARC-Type, WARC-Target-URI, WARC-Date,
  * Content-Length) framing an HTTP response whose body is the page.
  *
  * [[parseWarc]] walks a WARC byte buffer record by record using
  * Content-Length framing (never scanning payload bytes for separators —
  * bodies may contain anything), case-insensitive header lookup, and
  * HTTP-response splitting at the first CRLFCRLF. Malformed records stop
  * the walk at the last good record (crawl tolerance: a truncated fetch
  * keeps its complete prefix); a malformed file yields an empty list,
  * never a throw.
  *
  * Synthesis ([[synthWarc]]) is a REAL WARC file (warcinfo + response
  * records, correct Content-Length arithmetic) whose page bodies are the
  * deterministic function of the id that the DuckDB oracle recomputes. */
object WarcOps extends Serializable {

  final case class WarcPage(uri: String, date: String, html: Array[Byte])

  def pagesPerWarc(id: Long): Int = 1 + (id % 3).toInt

  def pageHtml(id: Long, p: Int): String =
    s"""<title>T$id-$p</title><nav>menu</nav><p>w$id body $p</p>"""

  def pageUri(id: Long, p: Int): String = s"https://warc-$id.example/p$p"

  /** a complete WARC file: one warcinfo record + [[pagesPerWarc]] response
    * records with full HTTP framing. */
  def synthWarc(id: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(1024)
    def w(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    def record(headers: Seq[(String, String)], block: Array[Byte]): Unit = {
      w("WARC/1.0\r\n")
      headers.foreach { case (k, v) => w(s"$k: $v\r\n") }
      w(s"Content-Length: ${block.length}\r\n\r\n")
      out.write(block)
      w("\r\n\r\n")
    }
    val info = "software: graft-synth/1.0\r\n".getBytes(ISO_8859_1)
    record(Seq("WARC-Type" -> "warcinfo",
      "WARC-Date" -> "2025-01-01T00:00:00Z"), info)
    (0 until pagesPerWarc(id)).foreach { p =>
      val body = pageHtml(id, p).getBytes(ISO_8859_1)
      val http = (s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
        s"Content-Length: ${body.length}\r\n\r\n").getBytes(ISO_8859_1) ++ body
      record(Seq("WARC-Type" -> "response",
        "WARC-Target-URI" -> pageUri(id, p),
        "WARC-Date" -> f"2025-01-01T00:00:${p % 60}%02dZ"), http)
    }
    out.toByteArray
  }

  /** per-record gzip members, concatenated — the `.warc.gz` layout
    * Common Crawl ships (each record its own member so readers can seek).
    * java.util.zip.GZIPInputStream consumes concatenated members
    * transparently. */
  def synthWarcGz(id: Long): Array[Byte] = {
    val raw = synthWarc(id)
    // split at record boundaries: re-walk via the version-line scan so
    // each record becomes its own member (like a real CC writer)
    val out = new java.io.ByteArrayOutputStream(raw.length)
    var at = 0
    while (at < raw.length) {
      var next = at + 1
      var found = -1
      while (found < 0 && next + 5 <= raw.length) {
        if (raw(next) == 'W' &&
          new String(raw, next, 5, ISO_8859_1) == "WARC/") found = next
        else next += 1
      }
      val end = if (found < 0) raw.length else found
      val gz = new java.util.zip.GZIPOutputStream(out)
      gz.write(raw, at, end - at)
      gz.finish()
      at = end
    }
    out.toByteArray
  }

  /** [[parseWarc]] over a gzip'd buffer (multi-member tolerated); null /
    * non-gzip input yields an empty list, never a throw. */
  def parseWarcGz(bytes: Array[Byte]): Seq[WarcPage] = {
    if (bytes == null || bytes.length < 2 ||
      (bytes(0) & 0xFF) != 0x1F || (bytes(1) & 0xFF) != 0x8B) return Nil
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(bytes), 8192)
      val out = new java.io.ByteArrayOutputStream(bytes.length * 4)
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
      in.close()
      parseWarc(out.toByteArray)
    } catch { case scala.util.control.NonFatal(_) => Nil }
  }

  /** magic-byte dispatch: gzip'd or plain WARC bytes. */
  def parseWarcAuto(bytes: Array[Byte]): Seq[WarcPage] =
    if (bytes != null && bytes.length >= 2 &&
      (bytes(0) & 0xFF) == 0x1F && (bytes(1) & 0xFF) == 0x8B) parseWarcGz(bytes)
    else parseWarc(bytes)

  private def indexOfCrlfCrlf(b: Array[Byte], from: Int, until: Int): Int = {
    var i = from
    val lim = math.min(until, b.length) - 3
    while (i <= lim) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' && b(i + 3) == '\n') return i
      i += 1
    }
    -1
  }

  /** every WARC-Type: response record's (uri, date, http-body bytes).
    * Content-Length framing, case-insensitive headers; stops at the first
    * malformed record (keeping the good prefix). */
  def parseWarc(bytes: Array[Byte]): Seq[WarcPage] = {
    val out = Seq.newBuilder[WarcPage]
    if (bytes == null) return out.result()
    try {
      var at = 0
      var going = true
      while (going && at + 10 <= bytes.length) {
        // record start: the WARC version line
        if (!new String(bytes, at, math.min(6, bytes.length - at), ISO_8859_1).startsWith("WARC/")) {
          going = false
        } else {
          val hdrEnd = indexOfCrlfCrlf(bytes, at, bytes.length)
          if (hdrEnd < 0) going = false
          else {
            val headerBlock = new String(bytes, at, hdrEnd - at, ISO_8859_1)
            val headers: Map[String, String] = headerBlock.split("\r\n").iterator
              .drop(1) // version line
              .flatMap { line =>
                val c = line.indexOf(':')
                if (c <= 0) None
                else Some(line.substring(0, c).trim.toLowerCase -> line.substring(c + 1).trim)
              }.toMap
            val len = headers.get("content-length").flatMap(v =>
              try Some(v.toLong) catch { case _: NumberFormatException => None })
            len match {
              case Some(l) if l >= 0 && hdrEnd + 4L + l <= bytes.length =>
                val body = hdrEnd + 4
                val end = body + l.toInt
                if (headers.get("warc-type").contains("response")) {
                  // HTTP response: page bytes follow the first CRLFCRLF
                  val split = indexOfCrlfCrlf(bytes, body, end)
                  val page =
                    if (split < 0) java.util.Arrays.copyOfRange(bytes, body, end)
                    else java.util.Arrays.copyOfRange(bytes, split + 4, end)
                  out += WarcPage(headers.getOrElse("warc-target-uri", ""),
                    headers.getOrElse("warc-date", ""), page)
                }
                // records are separated by CRLFCRLF after the block
                var nxt = end
                while (nxt < bytes.length &&
                  (bytes(nxt) == '\r' || bytes(nxt) == '\n')) nxt += 1
                at = nxt
              case _ => going = false // missing/overrunning length: stop
            }
          }
        }
      }
      out.result()
    } catch { case scala.util.control.NonFatal(_) => out.result() }
  }

  /** deterministic WARC pipeline over the documents table: synthesize a
    * real WARC file per row, parse its records per partition, run the
    * CRAWL-profile main-content extraction over each page body — every
    * output column closed-form for the DuckDB oracle. */
  def warcTable(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").as[Long])
      .mapPartitions { it =>
        it.map { id =>
          // odd ids ship as .warc.gz (per-record gzip members, the real
          // CC layout); even ids plain — one dispatch entry handles both
          val bytes = if (id % 2 == 1) synthWarcGz(id) else synthWarc(id)
          val pages = parseWarcAuto(bytes)
          val texts = pages.map { pg =>
            val t = Extractor.extractMainCrawlCodegen(pg.html)
            if (t == null) "" else t.toString
          }
          (id, pages.length.toLong,
            pages.map(_.uri).mkString(","),
            texts.mkString("|"))
        }
      }.toDF("doc_id", "n_pages", "uris", "texts")
  }
}
