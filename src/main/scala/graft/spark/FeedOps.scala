package graft.spark

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Web-feed parsing — RSS 2.0 (`<rss>`), RSS 1.0 / RDF (`<rdf:RDF>`) and
  * Atom (RFC 4287 `<feed>`): the third body format a crawl meets at scale
  * after HTML and sitemaps, and the usual discovery channel for fresh
  * content. Shares the sitemap tier's crawl-tolerant posture: lenient
  * namespace-agnostic pull scan, CDATA/comment/entity handling, BOM +
  * XML-declaration charset detection, bounded everywhere, and null on
  * unrecognizable input — never an exception.
  *
  * Field mapping per format (local names, prefix-stripped):
  *  - entry boundary: `<item>` (RSS 2.0 / RDF) or `<entry>` (Atom)
  *  - title: `<title>` inside the entry; the first `<title>` OUTSIDE any
  *    entry is the feed/channel title
  *  - link: element text of `<link>` (RSS/RDF); Atom's `<link>` is an
  *    EMPTY element carrying `href` — the first `rel="alternate"` or
  *    rel-less link wins (self/enclosure/etc. are skipped)
  *  - published: `<pubDate>` (RSS), `<date>` (RDF's dc:date),
  *    `<published>` with `<updated>` as fallback (Atom) — verbatim text,
  *    date-format normalization is downstream's job
  *  - id: `<guid>` (RSS) or `<id>` (Atom)
  *
  * Scale note: like robots/sitemaps this is per-feed metadata — one
  * parse per feed document row, pure per-row compute, no shuffle. */
object FeedOps {

  /** one feed entry; every field null when absent. */
  final case class Entry(title: String, link: String, published: String, id: String)

  /** `kind` is "rss", "rdf" or "atom"; `title` is the channel title. */
  final case class Feed(kind: String, title: String, entries: Array[Entry])

  /** entry cap — feeds have no protocol limit; this bounds hostile
    * input (same posture as the sitemap tier's 50k). */
  private val MaxEntries = 10000

  def parse(bytes: Array[Byte]): Feed = {
    val txt = SitemapOps.decodeBody(bytes)
    if (txt == null) return null
    parseText(txt)
  }

  def parseText(txt: String): Feed = {
    if (txt == null) return null
    val n = txt.length
    var i = 0
    var kind: String = null
    var feedTitle: String = null
    val entries = scala.collection.mutable.ArrayBuffer.empty[Entry]

    var inEntry = false
    var title: String = null; var link: String = null
    var published: String = null; var updated: String = null; var id: String = null

    def flush(): Unit = {
      if (inEntry && entries.length < MaxEntries &&
          (title != null || link != null || id != null))
        entries += Entry(title, link, if (published != null) published else updated, id)
      inEntry = false; title = null; link = null
      published = null; updated = null; id = null
    }

    while (i < n && entries.length < MaxEntries) {
      val lt = txt.indexOf('<', i)
      if (lt < 0) { i = n }
      else if (txt.startsWith("<!--", lt)) {
        val e = txt.indexOf("-->", lt + 4)
        i = if (e < 0) n else e + 3
      } else if (txt.startsWith("<![CDATA[", lt)) {
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
          val selfClosed = txt.charAt(gt - 1) == '/'
          if (close) {
            name match {
              case "item" | "entry" => flush()
              case _ => ()
            }
            i = gt + 1
          } else name match {
            case "rss" =>
              if (kind == null) kind = "rss"
              i = gt + 1
            case "rdf" =>
              if (kind == null) kind = "rdf"
              i = gt + 1
            case "feed" =>
              if (kind == null) kind = "atom"
              i = gt + 1
            case "item" | "entry" if !selfClosed =>
              flush() // unterminated previous entry: keep it, then reset
              inEntry = true
              i = gt + 1
            case "title" if !selfClosed =>
              val (value, after) = SitemapOps.elementText(txt, gt + 1)
              if (inEntry) { if (title == null) title = nonEmpty(value) }
              else if (feedTitle == null) feedTitle = nonEmpty(value)
              i = after
            case "link" =>
              // Atom: empty element with href (+ optional rel); RSS/RDF:
              // element text. An href attr decides which rule applies.
              val href = attrValue(txt, j, gt, "href")
              if (href != null) {
                if (inEntry && link == null) {
                  val rel = attrValue(txt, j, gt, "rel")
                  if (rel == null || rel.equalsIgnoreCase("alternate"))
                    link = nonEmpty(href.trim)
                }
                i = gt + 1
              } else if (!selfClosed) {
                val (value, after) = SitemapOps.elementText(txt, gt + 1)
                if (inEntry && link == null) link = nonEmpty(value)
                i = after
              } else i = gt + 1
            case "pubdate" | "date" | "published" if !selfClosed =>
              val (value, after) = SitemapOps.elementText(txt, gt + 1)
              if (inEntry && published == null) published = nonEmpty(value)
              i = after
            case "updated" if !selfClosed =>
              val (value, after) = SitemapOps.elementText(txt, gt + 1)
              if (inEntry && updated == null) updated = nonEmpty(value)
              i = after
            case "guid" | "id" if !selfClosed =>
              val (value, after) = SitemapOps.elementText(txt, gt + 1)
              if (inEntry && id == null) id = nonEmpty(value)
              i = after
            case _ => i = gt + 1
          }
        }
      }
    }
    flush() // EOF inside an entry: keep what parsed (truncation tolerance)
    if (kind == null) null else Feed(kind, feedTitle, entries.toArray)
  }

  private def nonEmpty(s: String): String =
    if (s == null || s.isEmpty) null else s

  /** value of attribute `attr` (case-insensitive name, prefix-agnostic)
    * inside the tag span `txt[from, gt)`: quoted or unquoted, entity-
    * decoded; null when absent. */
  private def attrValue(txt: String, from: Int, gt: Int, attr: String): String = {
    var i = from
    while (i < gt) {
      // skip whitespace and stray '/'
      while (i < gt && { val c = txt.charAt(i)
        c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '/' }) i += 1
      if (i >= gt) return null
      val nameStart = i
      while (i < gt && { val c = txt.charAt(i)
        c != '=' && c != ' ' && c != '\t' && c != '\n' && c != '\r' && c != '/' && c != '>' }) i += 1
      val rawName = txt.substring(nameStart, i)
      val colon = rawName.indexOf(':')
      val name = if (colon >= 0) rawName.substring(colon + 1) else rawName
      // skip ws before '='
      var k = i
      while (k < gt && { val c = txt.charAt(k); c == ' ' || c == '\t' || c == '\n' || c == '\r' }) k += 1
      if (k < gt && txt.charAt(k) == '=') {
        k += 1
        while (k < gt && { val c = txt.charAt(k); c == ' ' || c == '\t' || c == '\n' || c == '\r' }) k += 1
        var value: String = null
        if (k < gt && (txt.charAt(k) == '"' || txt.charAt(k) == '\'')) {
          val q = txt.charAt(k)
          val end = txt.indexOf(q, k + 1)
          if (end < 0 || end > gt) return null // unterminated quote: bail
          value = txt.substring(k + 1, end)
          i = end + 1
        } else {
          // unquoted: '/' is a legal value char (URLs) EXCEPT the
          // self-closing slash immediately before '>'
          val vStart = k
          while (k < gt && { val c = txt.charAt(k)
            c != ' ' && c != '\t' && c != '\n' && c != '\r' && c != '>' &&
              !(c == '/' && k == gt - 1) }) k += 1
          value = txt.substring(vStart, k)
          i = k
        }
        if (name.equalsIgnoreCase(attr)) return graft.dom.Entities.decode(value)
      } else {
        i = k // boolean attr: no value
        if (name.equalsIgnoreCase(attr)) return ""
        if (i == nameStart) i += 1 // safety: always advance
      }
    }
    null
  }

  // ------------------------------------------------- codegen static entries

  def kindCodegen(body: Array[Byte]): UTF8String = {
    if (body == null) return null
    val f = parse(body)
    if (f == null) null else UTF8String.fromString(f.kind)
  }

  def kindCodegenStr(body: UTF8String): UTF8String = {
    if (body == null) return null
    val f = parseText(body.toString)
    if (f == null) null else UTF8String.fromString(f.kind)
  }

  def titleCodegen(body: Array[Byte]): UTF8String = {
    if (body == null) return null
    val f = parse(body)
    if (f == null || f.title == null) null else UTF8String.fromString(f.title)
  }

  def titleCodegenStr(body: UTF8String): UTF8String = {
    if (body == null) return null
    val f = parseText(body.toString)
    if (f == null || f.title == null) null else UTF8String.fromString(f.title)
  }

  /** rows of (title, link, published, id) — each NULL when absent. */
  def entriesCodegen(body: Array[Byte]): GenericArrayData = {
    if (body == null) return null
    toRows(parse(body))
  }

  def entriesCodegenStr(body: UTF8String): GenericArrayData = {
    if (body == null) return null
    toRows(parseText(body.toString))
  }

  private def toRows(f: Feed): GenericArrayData = {
    if (f == null) return null
    val rows = new Array[Any](f.entries.length)
    var i = 0
    while (i < f.entries.length) {
      val e = f.entries(i)
      def u(s: String) = if (s == null) null else UTF8String.fromString(s)
      rows(i) = InternalRow(u(e.title), u(e.link), u(e.published), u(e.id))
      i += 1
    }
    new GenericArrayData(rows)
  }
}
