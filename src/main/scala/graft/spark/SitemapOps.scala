package graft.spark

import java.io.ByteArrayInputStream
import java.util.zip.GZIPInputStream
import org.apache.spark.unsafe.types.UTF8String

/** Sitemap parsing per sitemaps.org Protocol 0.9: `<urlset>` URL lists,
  * `<sitemapindex>` index files, plain-text sitemaps (one URL per line),
  * each optionally gzip-compressed — the discovery-side companion of the
  * robots tier ([[RobotsOps]] already surfaces `Sitemap:` pointers).
  *
  * Built crawl-tolerant: a lenient XML pull scan (namespace-prefix
  * agnostic, comment/CDATA aware, entity-decoding via the HTML table —
  * a superset of XML's five), bounded everywhere (50 MiB inflate cap ≈
  * the protocol's own 50 MB limit, 50 000 entries — the protocol
  * maximum), and null on unrecognizable input instead of throwing.
  *
  * Scale note: sitemaps are per-host metadata like robots.txt — a crawl
  * joins a tiny per-host dim table against the frontier, so parses run
  * once per sitemap file, not per page row; no caching needed beyond
  * the row itself. */
object SitemapOps {

  /** one `<url>` / `<sitemap>` entry. `lastmod`/`changefreq` are null
    * when absent; `priority` is NaN when absent or unparseable. */
  final case class Entry(loc: String, lastmod: String, changefreq: String,
      priority: Double)

  /** `kind` is "urlset", "index" or "text"; null result = unrecognizable. */
  final case class Sitemap(kind: String, entries: Array[Entry])

  /** protocol limits (sitemaps.org: ≤50 000 URLs, ≤50 MB uncompressed). */
  private val MaxEntries = 50000
  private val MaxInflated = 50L * 1024 * 1024

  // ------------------------------------------------------------------ decode

  /** bytes → decoded text: gzip members inflated with a hard cap (the
    * capped PREFIX parses — a compliant sitemap never hits the cap, a
    * bomb costs at most 50 MiB), then BOM / XML-declaration charset
    * sniff, default UTF-8. Null on undecodable input. */
  private[spark] def decodeBody(bytes: Array[Byte]): String = {
    if (bytes == null) return null
    val raw =
      if (bytes.length >= 2 && bytes(0) == 0x1f.toByte && bytes(1) == 0x8b.toByte)
        inflateCapped(bytes)
      else bytes
    if (raw == null) return null
    try {
      // BOM first (authoritative), then the <?xml encoding=..?> label
      if (raw.length >= 3 && raw(0) == 0xEF.toByte && raw(1) == 0xBB.toByte &&
          raw(2) == 0xBF.toByte)
        new String(raw, 3, raw.length - 3, "UTF-8")
      else if (raw.length >= 2 && raw(0) == 0xFE.toByte && raw(1) == 0xFF.toByte)
        new String(raw, 2, raw.length - 2, "UTF-16BE")
      else if (raw.length >= 2 && raw(0) == 0xFF.toByte && raw(1) == 0xFE.toByte)
        new String(raw, 2, raw.length - 2, "UTF-16LE")
      else {
        val enc = xmlDeclEncoding(raw)
        new String(raw, if (enc == null) "UTF-8" else enc)
      }
    } catch { case scala.util.control.NonFatal(_) => null }
  }

  private def inflateCapped(bytes: Array[Byte]): Array[Byte] = {
    var in: GZIPInputStream = null
    val out = new java.io.ByteArrayOutputStream(math.min(bytes.length.toLong * 4,
      1L * 1024 * 1024).toInt.max(1024))
    try {
      in = new GZIPInputStream(new ByteArrayInputStream(bytes), 64 * 1024)
      val buf = new Array[Byte](64 * 1024)
      var total = 0L
      var n = in.read(buf)
      while (n > 0 && total < MaxInflated) {
        val take = math.min(n.toLong, MaxInflated - total).toInt
        out.write(buf, 0, take)
        total += take
        n = if (total < MaxInflated) in.read(buf) else -1
      }
    } catch {
      // truncated/corrupt members: keep what inflated so far (crawl
      // tolerance — same posture as the WARC reader); a header that is
      // not even gzip yields zero bytes → parse fails downstream
      case scala.util.control.NonFatal(_) => ()
    } finally if (in != null) { try in.close() catch { case _: Exception => () } }
    out.toByteArray
  }

  /** the `encoding=` label of a leading `<?xml ...?>` declaration,
    * resolved to a JDK charset name via the WHATWG label table; null
    * when absent/unknown (caller defaults to UTF-8). */
  private def xmlDeclEncoding(raw: Array[Byte]): String = {
    val n = math.min(raw.length, 128)
    if (n < 6 || raw(0) != '<' || raw(1) != '?') return null
    val head = new String(raw, 0, n, "ISO-8859-1")
    val end = head.indexOf("?>")
    if (end < 0 || !head.regionMatches(true, 2, "xml", 0, 3)) return null
    val decl = head.substring(0, end)
    val at = decl.toLowerCase(java.util.Locale.ROOT).indexOf("encoding")
    if (at < 0) return null
    var i = at + 8
    while (i < decl.length && (decl.charAt(i) == ' ' || decl.charAt(i) == '=')) i += 1
    if (i >= decl.length) return null
    val q = decl.charAt(i)
    if (q != '"' && q != '\'') return null
    val close = decl.indexOf(q, i + 1)
    if (close < 0) return null
    val canon = CharsetOps.normalizeLabel(decl.substring(i + 1, close))
    if (canon == null) null else CharsetOps.jdkFor(canon)
  }

  // ------------------------------------------------------------------- parse

  /** parse any sitemap body (XML urlset / index, plain text, gz of
    * either). Null when the body is unrecognizable. */
  def parse(bytes: Array[Byte]): Sitemap = {
    val txt = decodeBody(bytes)
    if (txt == null) return null
    parseText(txt)
  }

  def parseText(txt: String): Sitemap = {
    if (txt == null) return null
    var i = 0
    while (i < txt.length && Character.isWhitespace(txt.charAt(i))) i += 1
    if (i < txt.length && txt.charAt(i) == '<') parseXml(txt, i)
    else parsePlainText(txt)
  }

  /** plain-text sitemap: every line that is an absolute http(s) URL is
    * an entry; other lines are ignored. Null when NO line qualifies
    * (arbitrary text is not a sitemap). */
  private def parsePlainText(txt: String): Sitemap = {
    val entries = scala.collection.mutable.ArrayBuffer.empty[Entry]
    val it = txt.linesIterator
    while (it.hasNext && entries.length < MaxEntries) {
      val line = it.next().trim
      if (isHttpUrl(line)) entries += Entry(line, null, null, Double.NaN)
    }
    if (entries.isEmpty) null else Sitemap("text", entries.toArray)
  }

  private def isHttpUrl(s: String): Boolean =
    (s.regionMatches(true, 0, "http://", 0, 7) ||
      s.regionMatches(true, 0, "https://", 0, 8)) && UrlOps.host(s) != null

  // a tiny pull scanner: next '<' construct from `i`; returns (name,
  // kind, afterPos) where kind 0=open 1=close 2=selfclose/decl/comment.
  // Names are local (prefix before ':' stripped), lowercased.

  private def parseXml(txt: String, start: Int): Sitemap = {
    val n = txt.length
    var i = start
    var kind: String = null
    val entries = scala.collection.mutable.ArrayBuffer.empty[Entry]
    // current entry fields while inside <url>/<sitemap>
    var inEntry = false
    var loc: String = null; var lastmod: String = null
    var changefreq: String = null; var priority = Double.NaN

    def flush(): Unit = {
      if (inEntry && loc != null && isHttpUrl(loc) && entries.length < MaxEntries)
        entries += Entry(loc, lastmod, changefreq, priority)
      inEntry = false; loc = null; lastmod = null; changefreq = null
      priority = Double.NaN
    }

    while (i < n && entries.length < MaxEntries) {
      val lt = txt.indexOf('<', i)
      if (lt < 0) { i = n }
      else if (txt.startsWith("<!--", lt)) {
        val e = txt.indexOf("-->", lt + 4)
        i = if (e < 0) n else e + 3
      } else if (txt.startsWith("<![CDATA[", lt)) {
        // stray CDATA outside an element text read — skip
        val e = txt.indexOf("]]>", lt + 9)
        i = if (e < 0) n else e + 3
      } else if (lt + 1 < n && (txt.charAt(lt + 1) == '?' || txt.charAt(lt + 1) == '!')) {
        val e = txt.indexOf('>', lt + 1)
        i = if (e < 0) n else e + 1
      } else {
        val close = lt + 1 < n && txt.charAt(lt + 1) == '/'
        val nameStart = if (close) lt + 2 else lt + 1
        var j = nameStart
        while (j < n && { val c = txt.charAt(j)
          c != '>' && c != '/' && c != ' ' && c != '\t' && c != '\n' && c != '\r' }) j += 1
        val gt = txt.indexOf('>', j)
        if (gt < 0) { i = n }
        else {
          val raw = txt.substring(nameStart, j)
          val colon = raw.indexOf(':')
          val name = (if (colon >= 0) raw.substring(colon + 1) else raw)
            .toLowerCase(java.util.Locale.ROOT)
          if (close) {
            name match {
              case "url" | "sitemap" => flush()
              case _ => ()
            }
            i = gt + 1
          } else if (txt.charAt(gt - 1) == '/') { // self-closing: no text
            i = gt + 1
          } else name match {
            case "urlset" =>
              if (kind == null) kind = "urlset"
              i = gt + 1
            case "sitemapindex" =>
              if (kind == null) kind = "index"
              i = gt + 1
            case "url" | "sitemap" =>
              flush() // unterminated previous entry: keep it, then reset
              inEntry = true
              i = gt + 1
            case "loc" | "lastmod" | "changefreq" | "priority" =>
              val (value, after) = elementText(txt, gt + 1)
              if (inEntry) name match {
                case "loc" => if (loc == null) loc = value
                case "lastmod" => if (lastmod == null && value.nonEmpty) lastmod = value
                case "changefreq" =>
                  if (changefreq == null && value.nonEmpty)
                    changefreq = value.toLowerCase(java.util.Locale.ROOT)
                case "priority" =>
                  if (priority.isNaN && value.nonEmpty)
                    priority = try value.toDouble catch {
                      case _: NumberFormatException => Double.NaN
                    }
              }
              i = after
            case _ => i = gt + 1
          }
        }
      }
    }
    flush() // EOF inside an entry: keep what parsed (truncation tolerance)
    if (kind == null) null else Sitemap(kind, entries.toArray)
  }

  /** text content of a simple element starting at `from` (just past the
    * open tag's '>'): concatenated character data + CDATA sections up to
    * the next tag, entity-decoded and trimmed. Returns (text, posAfter)
    * where posAfter sits on the terminating '<' (or EOF). */
  private[spark] def elementText(txt: String, from: Int): (String, Int) = {
    val n = txt.length
    val sb = new java.lang.StringBuilder(64)
    var i = from
    var continue = true
    while (continue && i < n) {
      val lt = txt.indexOf('<', i)
      if (lt < 0) { sb.append(txt, i, n); i = n }
      else {
        sb.append(txt, i, lt)
        if (txt.startsWith("<![CDATA[", lt)) {
          val e = txt.indexOf("]]>", lt + 9)
          if (e < 0) { sb.append(txt, lt + 9, n); i = n }
          else { sb.append(txt, lt + 9, e); i = e + 3 }
        } else { i = lt; continue = false }
      }
    }
    (graft.dom.Entities.decode(sb.toString).trim, i)
  }

  // ------------------------------------------------------------- scope rule

  /** sitemaps.org location scope: a sitemap at
    * `http://h/catalog/sitemap.xml` may only contain URLs starting with
    * `http://h/catalog/` — same scheme, same host (case-insensitive,
    * via [[UrlOps]] canonicalization), same port, and the sitemap's
    * directory as a path prefix (case-sensitive, per the protocol's
    * all-URLs-case-sensitive rule). Cross-host sitemaps are only valid
    * when declared in robots.txt — that linkage is the caller's join;
    * this predicate evaluates the pure location rule. */
  def inScope(sitemapUrl: String, url: String): Boolean = {
    if (sitemapUrl == null || url == null) return false
    val s = UrlOps.normalize(sitemapUrl)
    val u = UrlOps.normalize(url)
    if (s == null || u == null) return false
    val dirEnd = {
      val q = s.indexOf('?')
      val stop = if (q >= 0) q else s.length
      val slash = s.lastIndexOf('/', stop - 1)
      slash + 1
    }
    if (dirEnd <= 0) return false
    // scheme://host[:port]/dir/ must prefix the url. normalize() already
    // lowercased scheme+host and dropped default ports, so a direct
    // prefix compare implements the rule (paths stay case-sensitive).
    val prefix = s.substring(0, dirEnd)
    // the prefix must cover the full authority: guard against a sitemap
    // URL with no path slash after host (normalize adds "/" for empty
    // paths, so dirEnd always lands past the authority)
    u.startsWith(prefix)
  }

  // ------------------------------------------------- codegen static entries

  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import org.apache.spark.sql.catalyst.InternalRow

  def kindCodegen(body: Array[Byte]): UTF8String = {
    if (body == null) return null
    val s = parse(body)
    if (s == null) null else UTF8String.fromString(s.kind)
  }

  def kindCodegenStr(body: UTF8String): UTF8String = {
    if (body == null) return null
    val s = parseText(body.toString)
    if (s == null) null else UTF8String.fromString(s.kind)
  }

  /** rows of (loc STRING, lastmod STRING, changefreq STRING,
    * priority DOUBLE) — priority NULL when absent. */
  def entriesCodegen(body: Array[Byte]): GenericArrayData = {
    if (body == null) return null
    toRows(parse(body))
  }

  def entriesCodegenStr(body: UTF8String): GenericArrayData = {
    if (body == null) return null
    toRows(parseText(body.toString))
  }

  private def toRows(s: Sitemap): GenericArrayData = {
    if (s == null) return null
    val rows = new Array[Any](s.entries.length)
    var i = 0
    while (i < s.entries.length) {
      val e = s.entries(i)
      rows(i) = InternalRow(
        UTF8String.fromString(e.loc),
        if (e.lastmod == null) null else UTF8String.fromString(e.lastmod),
        if (e.changefreq == null) null else UTF8String.fromString(e.changefreq),
        if (e.priority.isNaN) null else java.lang.Double.valueOf(e.priority))
      i += 1
    }
    new GenericArrayData(rows)
  }

  /** boxed three-state like robots_allowed: NULL when either side is
    * NULL (unknown), the location-rule evaluation otherwise. */
  def inScopeCodegen(sitemapUrl: UTF8String, url: UTF8String): java.lang.Boolean = {
    if (sitemapUrl == null || url == null) return null
    java.lang.Boolean.valueOf(inScope(sitemapUrl.toString, url.toString))
  }
}
