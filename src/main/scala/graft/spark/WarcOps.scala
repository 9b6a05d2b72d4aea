package graft.spark

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.io.{BufferedInputStream, ByteArrayInputStream, EOFException, InputStream, PushbackInputStream}
import java.nio.charset.StandardCharsets.ISO_8859_1
import java.util.zip.GZIPInputStream

/** WARC (ISO 28500) ingest — the container Common Crawl actually ships: a
  * crawl source is a stream of `WARC/1.0` records, each a CRLF-terminated
  * header block (WARC-Type, WARC-Target-URI, WARC-Date, Content-Length)
  * framing an HTTP response whose body is the page.
  *
  * The core is [[WarcRecordReader]], a STREAMING record walk over an
  * `InputStream` with bounded memory: headers are read line-by-line under a
  * cap, bodies are read (or skipped) under `maxBodyBytes`, and record
  * offsets are Long — a ~1 GB-gz / ~4 GB-inflated Common Crawl WARC (or any
  * logical stream past 2 GiB) parses record-at-a-time without ever holding
  * the file. Framing is Content-Length only (payload bytes are never
  * scanned for separators — bodies may contain anything), header lookup is
  * case-insensitive, and malformation/truncation stops the walk at the last
  * good record (crawl tolerance: a truncated fetch keeps its complete
  * prefix) — never a throw.
  *
  * [[readWarcFiles]] is the file source: it maps a directory/glob of
  * `.warc` / `.warc.gz` FILES to page rows, one sequential streamed file
  * per task (gzip members via one `GZIPInputStream` — multi-member streams
  * are consumed transparently, which is exactly the per-record-member
  * layout CC writers emit so readers can seek). gzip is not splittable
  * without a member index, so the scale unit is the file — the layout
  * Common Crawl itself standardizes (~1 GB per WARC, thousands of files
  * per segment), giving natural task granularity at any corpus size.
  * [[warcPages]] adapts the source to [[ExtractJob]]'s pages schema, so
  * `.warc.gz files -> salted buckets -> extraction -> lineage` is one call.
  *
  * The buffer entries ([[parseWarc]] / [[parseWarcGz]]) delegate to the
  * same reader, so the round-5 whole-file inflate (and its
  * `bytes.length * 4` Int-overflow that silently dropped >512 MB-gz files
  * to Nil) is structurally gone.
  *
  * Synthesis ([[synthWarc]] / [[synthWarcDir]]) builds REAL WARC bytes and
  * files (warcinfo + response records, correct Content-Length arithmetic)
  * whose page bodies are deterministic functions of the id that the DuckDB
  * oracle recomputes. */
object WarcOps extends Serializable {

  /** serializable snapshot of a Hadoop Configuration for broadcast to
    * tasks (Spark's own SerializableConfiguration is private[spark]):
    * Configuration is a Writable, so its props round-trip through Java
    * serialization hooks. Tasks must see the SESSION's conf — s3a
    * credentials, custom schemes, spark.hadoop.* — or opens fail where
    * the driver's listing succeeded. */
  private[spark] final class ConfSnapshot(
      @transient private var conf: org.apache.hadoop.conf.Configuration)
      extends Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.defaultWriteObject()
      conf.write(out)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      in.defaultReadObject()
      conf = new org.apache.hadoop.conf.Configuration(false)
      conf.readFields(in)
    }
    def value: org.apache.hadoop.conf.Configuration = conf
  }

  /** `contentType` is the HTTP `Content-Type` header value (null when the
    * response carried none) — the transport-layer charset signal
    * [[CharsetOps]] sniffing starts from. `status` is the HTTP status
    * code (-1 when the record has no parseable HTTP framing) and
    * `location` the raw `Location` header value (null when absent) — the
    * 3xx redirect edge a crawl graph keeps; resolution against the
    * request URI is downstream's `url_resolve`. */
  final case class WarcPage(uri: String, date: String, html: Array[Byte],
      contentType: String = null, status: Int = -1, location: String = null,
      headers: Map[String, String] = null)

  /** one parsed record: lowercase header map + body (null when the body
    * exceeded `maxBodyBytes` and was skipped — the error channel, not a
    * silent drop). */
  final case class WarcRecord(headers: Map[String, String], body: Array[Byte], bodyLen: Long) {
    def skipped: Boolean = body == null
  }

  // ---------------------------------------------------------------- reader

  /** Streaming WARC record iterator over `in` with bounded memory:
    * at most `maxHeaderBytes` of header block and `min(Content-Length,
    * maxBodyBytes)` of body are ever resident per record. Bodies larger
    * than `maxBodyBytes` are SKIPPED in the stream (body = null, bodyLen
    * kept) so one pathological record cannot OOM an executor while the
    * rest of the file still parses. Stops (never throws) at EOF, a
    * malformed header block, or a body overrunning EOF. */
  final class WarcRecordReader(
      raw: InputStream,
      maxHeaderBytes: Int = 1 << 20,
      maxBodyBytes: Int = 256 << 20) extends Iterator[WarcRecord] with AutoCloseable {

    private val in = new PushbackInputStream(new BufferedInputStream(raw, 64 << 10), 1)
    private var nextRec: WarcRecord = _
    private var done = false

    override def hasNext: Boolean = {
      if (nextRec == null && !done) nextRec = advance()
      nextRec != null
    }

    override def next(): WarcRecord = {
      if (!hasNext) throw new NoSuchElementException("WarcRecordReader")
      val r = nextRec; nextRec = null; r
    }

    override def close(): Unit = { done = true; try in.close() catch { case _: Exception => () } }

    /** null => clean end (EOF or tolerated malformation); the stream is
      * closed as soon as the walk ends so fully-consumed iterators never
      * hold a descriptor. */
    private def ended(): WarcRecord = { close(); null }

    /** null => clean end (EOF or tolerated malformation). */
    private def advance(): WarcRecord =
      try {
        // records are separated by CRLFCRLF; tolerate any \r\n run (a
        // version line never starts with either, so greedy skip is safe)
        var c = in.read()
        while (c == '\r' || c == '\n') c = in.read()
        if (c < 0) return ended()
        in.unread(c)

        val version = readLine()
        if (version == null || !version.startsWith("WARC/")) return ended()

        var headerBytes = version.length
        var headers = Map.empty[String, String]
        var line = readLine()
        while (line != null && line.nonEmpty) {
          headerBytes += line.length + 2
          if (headerBytes > maxHeaderBytes) return ended()
          val colon = line.indexOf(':')
          if (colon > 0)
            headers += (line.substring(0, colon).trim.toLowerCase ->
              line.substring(colon + 1).trim)
          line = readLine()
        }
        if (line == null) return ended() // EOF inside headers

        val len = headers.get("content-length").flatMap(v =>
          try Some(v.toLong) catch { case _: NumberFormatException => None })
        len match {
          case Some(l) if l >= 0 && l <= maxBodyBytes =>
            val body = readFully(l.toInt)
            if (body == null) ended() // truncated body: drop, stop
            else WarcRecord(headers, body, l)
          case Some(l) if l > maxBodyBytes =>
            if (!skipFully(l)) ended()
            else WarcRecord(headers, null, l) // oversize: skipped, surfaced
          case _ => ended() // missing/invalid length
        }
      } catch {
        // corrupt gzip tail / truncated member / any stream fault: the
        // complete prefix stands, the walk ends
        case _: EOFException => ended()
        case scala.util.control.NonFatal(_) => ended()
      }

    /** CRLF (or bare-LF) line as ISO-8859-1, without the terminator; null
      * on EOF-before-any-byte; capped at maxHeaderBytes. */
    private def readLine(): String = {
      val sb = new java.io.ByteArrayOutputStream(96)
      var c = in.read()
      if (c < 0) return null
      while (c >= 0 && c != '\n') {
        sb.write(c)
        if (sb.size > maxHeaderBytes) return null
        c = in.read()
      }
      val b = sb.toByteArray
      val n = if (b.nonEmpty && b(b.length - 1) == '\r') b.length - 1 else b.length
      new String(b, 0, n, ISO_8859_1)
    }

    /** exactly n bytes or null (EOF first). */
    private def readFully(n: Int): Array[Byte] = {
      val buf = new Array[Byte](n)
      var at = 0
      while (at < n) {
        val r = in.read(buf, at, n - at)
        if (r < 0) return null
        at += r
      }
      buf
    }

    /** discard exactly n bytes; false on EOF first. */
    private def skipFully(n: Long): Boolean = {
      var left = n
      val buf = new Array[Byte](64 << 10)
      while (left > 0) {
        val r = in.read(buf, 0, math.min(left, buf.length.toLong).toInt)
        if (r < 0) return false
        left -= r
      }
      true
    }
  }

  /** response-record pages from a stream; `gz = true` wraps one
    * GZIPInputStream (concatenated members consumed transparently).
    * Oversize-skipped records surface as pages with `html = null`. */
  def pageIterator(raw: InputStream, gz: Boolean,
      maxBodyBytes: Int = 256 << 20): Iterator[WarcPage] = {
    val in = if (gz) new GZIPInputStream(raw, 64 << 10) else raw
    new WarcRecordReader(in, maxBodyBytes = maxBodyBytes).flatMap { rec =>
      if (!rec.headers.get("warc-type").contains("response")) Iterator.empty
      else {
        var page: Array[Byte] = null
        var status = -1
        var hdrs: Map[String, String] = null
        if (rec.body != null) {
          // HTTP response: page bytes follow the first CRLFCRLF; the
          // header block before it carries the status code and the full
          // header map (WAT-style) — Content-Type is the charset signal
          // CharsetOps sniffing starts from, Location the 3xx redirect
          // edge, and the caching headers feed HttpOps freshness
          val split = indexOfCrlfCrlf(rec.body, 0, rec.body.length)
          if (split < 0) page = rec.body
          else {
            page = java.util.Arrays.copyOfRange(rec.body, split + 4, rec.body.length)
            status = httpStatus(rec.body, split)
            hdrs = httpHeaders(rec.body, split)
          }
        }
        Iterator.single(WarcPage(rec.headers.getOrElse("warc-target-uri", ""),
          rec.headers.getOrElse("warc-date", ""), page,
          if (hdrs == null) null else hdrs.getOrElse("content-type", null),
          status,
          if (hdrs == null) null else hdrs.getOrElse("location", null),
          hdrs))
      }
    }
  }

  /** status code of the HTTP status line at `b[0, ...)` — the 3-digit
    * field after the first space of an `HTTP/x.y NNN ...` line; -1 when
    * the line is not HTTP-shaped (crawl tolerance, never a throw). */
  private def httpStatus(b: Array[Byte], limit: Int): Int = {
    var end = 0
    while (end < limit && b(end) != '\n') end += 1
    if (end > 0 && b(end - 1) == '\r') end -= 1
    if (end < 12 || b(0) != 'H' || b(1) != 'T' || b(2) != 'T' || b(3) != 'P') return -1
    var i = 4
    while (i < end && b(i) != ' ') i += 1
    i += 1 // past the space
    if (i + 3 > end) return -1
    var code = 0
    var k = 0
    while (k < 3) {
      val c = b(i + k)
      if (c < '0' || c > '9') return -1
      code = code * 10 + (c - '0')
      k += 1
    }
    code
  }

  /** every header of the HTTP block `b[0, limit)` as a lowercase-name →
    * value map (one scan; first occurrence wins, so repeated headers like
    * Set-Cookie keep the first value — the WAT convention); status line
    * skipped, CRLF or bare-LF line ends, header-less blocks yield an
    * empty map. */
  private def httpHeaders(b: Array[Byte], limit: Int): Map[String, String] = {
    val m = new scala.collection.mutable.HashMap[String, String]()
    var i = 0
    while (i < limit && b(i) != '\n') i += 1 // skip the status line
    i += 1
    while (i < limit) {
      var j = i
      while (j < limit && b(j) != '\n') j += 1
      val end = if (j > i && b(j - 1) == '\r') j - 1 else j
      var colon = i
      while (colon < end && b(colon) != ':') colon += 1
      if (colon < end && colon > i) {
        val name = {
          val sb = new java.lang.StringBuilder(colon - i)
          var k = i
          while (k < colon) {
            val ch = b(k)
            sb.append((if (ch >= 'A' && ch <= 'Z') ch + 32 else ch.toInt).toChar)
            k += 1
          }
          sb.toString
        }
        if (!m.contains(name)) {
          var v = colon + 1
          while (v < end && (b(v) == ' ' || b(v) == '\t')) v += 1
          m.put(name, new String(b, v, end - v, ISO_8859_1))
        }
      }
      i = j + 1
    }
    m.toMap
  }

  // ------------------------------------------------------------ file source

  /** pages from a directory/glob of `.warc` / `.warc.gz` files: the ingest
    * front door. One streamed file per task (bounded memory regardless of
    * file size), files packed largest-first round-robin into slot groups —
    * one group per partition (row-count round-robin `repartition(n)` on
    * exactly n rows places one group per task, so the LPT-ish assignment
    * is preserved exactly; a hash repartition would scramble it). Columns:
    * warc_file, uri, warc_date, html (BINARY, null when a record body
    * exceeded `maxBodyBytes` — the per-row error channel), n_bytes,
    * content_type, http_status (INT, null without HTTP framing),
    * redirect (the raw Location header — the 3xx crawl-graph edge) and
    * http_headers (MAP, lowercase names, the WAT-style full envelope —
    * caching headers feed [[HttpOps]] freshness; column pruning drops it
    * when unused). A corrupt/empty gzip file yields zero pages (crawl
    * tolerance), never a task failure. */
  def readWarcFiles(spark: SparkSession, pathOrGlob: String,
      maxBodyBytes: Int = 256 << 20): DataFrame = {
    import spark.implicits._
    val files = listWarcFiles(spark, pathOrGlob)
    // largest-first round-robin: a segment's few big files can't pile onto
    // one task wave (the file is the scale unit — gzip is unsplittable)
    val slots = math.max(1, math.min(files.length, spark.sparkContext.defaultParallelism * 2))
    val groups: Seq[Seq[String]] = files.sortBy(-_._2).zipWithIndex
      .groupBy(_._2 % slots).toSeq.sortBy(_._1)
      .map(_._2.map(_._1._1))
    val cap = maxBodyBytes
    // executors must open files under the SESSION's hadoop conf (s3a creds,
    // custom schemes, spark.hadoop.*) — a fresh Configuration() on the task
    // side would list on the driver and then fail every open
    val confBc = spark.sparkContext.broadcast(
      new ConfSnapshot(spark.sparkContext.hadoopConfiguration))
    spark.createDataset(groups)
      .repartition(groups.length)
      .mapPartitions { it =>
        val conf = confBc.value.value
        // every stream CHAIN (gzip wrapper included) registers for close:
        // the reader closes at walk end, the task listener covers early
        // exits (limit/take) — no descriptor or native-Inflater leaks
        val open = new java.util.ArrayList[InputStream]()
        val ctx = org.apache.spark.TaskContext.get()
        if (ctx != null) ctx.addTaskCompletionListener[Unit] { _ =>
          open.forEach(s => try s.close() catch { case _: Exception => () })
        }
        it.flatten.flatMap { pathStr =>
          val pages =
            try {
              val path = new org.apache.hadoop.fs.Path(pathStr)
              val fs = path.getFileSystem(conf)
              val base: InputStream = fs.open(path)
              // the gzip header is read EAGERLY by the constructor: a
              // truncated/empty file throws here — tolerated per file
              val in: InputStream =
                try {
                  if (pathStr.endsWith(".gz")) new GZIPInputStream(base, 64 << 10)
                  else base
                } catch {
                  case scala.util.control.NonFatal(e) =>
                    try base.close() catch { case _: Exception => () }
                    throw e
                }
              open.add(in)
              pageIterator(in, gz = false, cap)
            } catch {
              case scala.util.control.NonFatal(_) => Iterator.empty[WarcPage]
            }
          pages.map { pg =>
            (pathStr, pg.uri, pg.date, pg.html,
              if (pg.html == null) 0L else pg.html.length.toLong,
              pg.contentType,
              if (pg.status < 0) null else java.lang.Integer.valueOf(pg.status),
              pg.location,
              pg.headers)
          }
        }
      }.toDF("warc_file", "uri", "warc_date", "html", "n_bytes", "content_type",
        "http_status", "redirect", "http_headers")
  }

  /** [[readWarcFiles]] adapted to [[ExtractJob]]'s pages schema
    * (url, warc_ts, html): `.warc.gz files -> ExtractJob.run` is the
    * end-to-end crawl ingest path. Unparseable WARC-Dates yield null
    * warc_ts (counted by the job's error channel, never a task failure).
    *
    * `decode = true` (the default) transcodes each payload to UTF-8 via
    * [[CharsetOps]] (WHATWG sniff: BOM > the response's Content-Type
    * charset > meta prescan > content heuristic) — the extraction engine's
    * contract is UTF-8 bytes, and real crawl HTML is only ~95% UTF-8. The
    * dominant already-UTF-8 path is zero-copy, so decode costs one
    * validity scan per page. */
  def warcPages(spark: SparkSession, pathOrGlob: String,
      decode: Boolean = true): DataFrame = {
    val raw = readWarcFiles(spark, pathOrGlob)
    val html =
      if (!decode) col("html")
      // the codegen expression when the graft extensions are registered;
      // a CharsetOps UDF otherwise — warcPages is a public entry point
      // and must not acquire a silent spark.sql.extensions precondition
      else if (spark.catalog.functionExists("decode_html"))
        call_function("decode_html", col("html"), col("content_type")).as("html")
      else
        udf((b: Array[Byte], ct: String) => CharsetOps.toUtf8(b, ct))
          .apply(col("html"), col("content_type")).as("html")
    raw.select(col("uri").as("url"),
      to_timestamp(col("warc_date"), "yyyy-MM-dd'T'HH:mm:ssX").as("warc_ts"),
      html)
  }

  private[spark] def listWarcFiles(spark: SparkSession, pathOrGlob: String,
      suffixes: Seq[String] = Seq(".warc", ".warc.gz")): Seq[(String, Long)] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(pathOrGlob)
    val fs = p.getFileSystem(conf)
    val matches =
      if (fs.isDirectory(p)) fs.globStatus(new org.apache.hadoop.fs.Path(p, "*"))
      else fs.globStatus(p)
    if (matches == null) Seq.empty
    else matches.toSeq.filter(_.isFile).map(s => (s.getPath.toString, s.getLen))
      .filter { case (name, _) => suffixes.exists(name.endsWith) }
      .sortBy(_._1)
  }

  // -------------------------------------------------------------- synthesis

  def pagesPerWarc(id: Long): Int = 1 + (id % 3).toInt

  def pageHtml(id: Long, p: Int): String =
    s"""<title>T$id-$p</title><nav>menu</nav><p>w$id body $p</p>"""

  def pageUri(id: Long, p: Int): String = s"https://warc-$id.example/p$p"

  /** a complete WARC file: one warcinfo record + [[pagesPerWarc]] response
    * records with full HTTP framing. */
  def synthWarc(id: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(1024)
    writeWarcRecords(out, id)
    out.toByteArray
  }

  private def writeWarcRecords(out: java.io.OutputStream, id: Long): Unit = {
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
  }

  /** per-record gzip members, concatenated — the `.warc.gz` layout
    * Common Crawl ships (each record its own member so readers can seek).
    * One GZIPInputStream consumes concatenated members transparently. */
  def synthWarcGz(id: Long): Array[Byte] = {
    val raw = synthWarc(id)
    val out = new java.io.ByteArrayOutputStream(raw.length)
    gzipPerRecord(raw, out)
    out.toByteArray
  }

  /** split `raw` at record boundaries (version-line scan) and gzip each
    * record as its own member into `out`. close() (not just finish())
    * releases each member's native Deflater immediately — finalization
    * backlogs of pending Deflaters were a measured chunk of q_warc's
    * round-5 cost. Closing a GZIPOutputStream closes the underlying
    * stream too, which is a no-op for the byte sinks used here. */
  private def gzipPerRecord(raw: Array[Byte], out: java.io.OutputStream): Unit = {
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
      gz.close()
      at = end
    }
  }

  /** deterministic `.warc.gz` FILE directory for the documents table:
    * `docsPerFile` docs per file (ids sorted within a file, per-record
    * gzip members), written distributed (one shuffle groups ids to their
    * file) and idempotently (temp + rename, content a pure function of the
    * ids). Returns the directory; reuses it when the marker for this doc
    * count is already present. */
  def synthWarcDir(spark: SparkSession, sfDir: String,
      docsPerFile: Int = 16, baseDir: String = "/tmp/graft_warc_src"): String = {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val n = docs.count()
    val dir = s"$baseDir/n$n-d$docsPerFile-v6"
    // everything goes through the Hadoop FS API (executor writes, marker,
    // listing) so the path works on ANY filesystem — java.nio on executors
    // would scatter files across worker-local disks on a real cluster
    val driverFs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val markerPath = new org.apache.hadoop.fs.Path(dir, "_GRAFT_OK")
    if (driverFs.exists(markerPath)) return dir
    driverFs.mkdirs(new org.apache.hadoop.fs.Path(dir))
    val confBc = spark.sparkContext.broadcast(
      new ConfSnapshot(spark.sparkContext.hadoopConfiguration))
    val written = docs.select(col("doc_id")).as[Long]
      .groupByKey(_ / docsPerFile)
      .flatMapGroups { (g, it) =>
        val ids = it.toArray.sorted
        val raw = new java.io.ByteArrayOutputStream(4096)
        ids.foreach(writeWarcRecords(raw, _))
        val fileBytes = new java.io.ByteArrayOutputStream(raw.size)
        gzipPerRecord(raw.toByteArray, fileBytes)
        val fs = new org.apache.hadoop.fs.Path(dir)
          .getFileSystem(confBc.value.value)
        val tmp = new org.apache.hadoop.fs.Path(dir, f".tmp-part-$g%05d")
        val fin = new org.apache.hadoop.fs.Path(dir, f"part-$g%05d.warc.gz")
        val out = fs.create(tmp, true)
        try out.write(fileBytes.toByteArray) finally out.close()
        fs.delete(fin, false) // rename target must not exist (HDFS contract)
        if (!fs.rename(tmp, fin))
          throw new java.io.IOException(s"rename $tmp -> $fin failed")
        Iterator.single(ids.length)
      }.reduce(_ + _)
    require(written == n, s"synthWarcDir wrote $written of $n docs")
    val mo = driverFs.create(markerPath, true)
    try mo.write("ok".getBytes(ISO_8859_1)) finally mo.close()
    dir
  }

  // --------------------------------------------------------- buffer entries

  /** [[parseWarc]] over a gzip'd buffer (multi-member tolerated); null /
    * non-gzip input yields an empty list, never a throw. Streams through
    * [[WarcRecordReader]] — no whole-buffer inflate, no size cliff. */
  def parseWarcGz(bytes: Array[Byte]): Seq[WarcPage] = {
    if (bytes == null || bytes.length < 2 ||
      (bytes(0) & 0xFF) != 0x1F || (bytes(1) & 0xFF) != 0x8B) return Nil
    try pageIterator(new ByteArrayInputStream(bytes), gz = true).toVector
    catch { case scala.util.control.NonFatal(_) => Nil }
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
    if (bytes == null) return Nil
    try pageIterator(new ByteArrayInputStream(bytes), gz = false).toVector
    catch { case scala.util.control.NonFatal(_) => Nil }
  }

  // -------------------------------------------------------------- gate rows

  /** q_warc's bytes column, pre-materialized once per (doc count) under
    * /tmp: the gate row then measures READ + PARSE + EXTRACT, not per-trial
    * gzip synthesis (round-5 verdict: q_warc's bench number was
    * synthesis-dominated). Contents are a pure function of doc_id, so
    * reuse across sessions is exact; the version tag guards staleness. */
  private def warcBytesPath(spark: SparkSession, sfDir: String): String = {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val n = docs.count()
    // v7: hash-repartition into ≤256 files — the v6 cache inherited the
    // documents scan's task count (7 at sf0.1), and parquet row groups are
    // the split floor, so parse/extract ran 7-wide on 32 cores (guide §6)
    val dir = s"/tmp/graft_warc_bytes/n$n-v7"
    if (!new java.io.File(s"$dir/_SUCCESS").isFile) {
      docs.select(col("doc_id"))
        .repartition(math.min(n, 256L).toInt, col("doc_id")).as[Long]
        .map { id =>
          // odd ids ship as .warc.gz (per-record gzip members, the real
          // CC layout); even ids plain — one dispatch entry handles both
          val bytes = if (id % 2 == 1) synthWarcGz(id) else synthWarc(id)
          (id, bytes)
        }.toDF("doc_id", "warc")
        .write.mode("overwrite").parquet(dir)
    }
    dir
  }

  /** deterministic WARC pipeline over the documents table: a real WARC
    * byte buffer per row (pre-materialized, see [[warcBytesPath]]), parsed
    * per partition, CRAWL-profile main-content extraction over each page
    * body — every output column closed-form for the DuckDB oracle. */
  def warcTable(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    spark.read.parquet(warcBytesPath(spark, sfDir))
      .select(col("doc_id").as[Long], col("warc").as[Array[Byte]])
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
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

  /** WARC bytes exercising the HTTP envelope surface per id: a 200 with
    * a body, a 301/302 with absolute/relative Location, and a record
    * with no HTTP framing at all (raw payload — status must stay -1). */
  def synthWarcHttp(id: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(512)
    def w(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    def record(uri: String, block: Array[Byte]): Unit = {
      w("WARC/1.0\r\nWARC-Type: response\r\n")
      w(s"WARC-Target-URI: $uri\r\n")
      w("WARC-Date: 2025-02-02T00:00:00Z\r\n")
      w(s"Content-Length: ${block.length}\r\n\r\n")
      out.write(block); w("\r\n\r\n")
    }
    def http(statusLine: String, headers: Seq[String], body: String): Array[Byte] =
      (statusLine + "\r\n" + headers.map(_ + "\r\n").mkString + "\r\n" + body)
        .getBytes(ISO_8859_1)
    ((id % 4).toInt: @unchecked) match {
      case 0 => record(s"https://h$id.ex/ok", http("HTTP/1.1 200 OK",
        Seq("Content-Type: text/html; charset=utf-8"), s"<p>ok $id</p>"))
      case 1 => record(s"https://h$id.ex/old", http("HTTP/1.1 301 Moved Permanently",
        Seq("Location: https://moved-" + id + ".ex/new", "Content-Type: text/html"),
        "<p>moved</p>"))
      case 2 => record(s"https://h$id.ex/tmp", http("HTTP/1.0 302 Found",
        Seq(s"Location: /next/$id"), ""))
      case 3 => record(s"https://h$id.ex/raw",
        s"<p>raw $id</p>".getBytes(ISO_8859_1)) // no HTTP framing
    }
    out.toByteArray
  }

  /** HTTP-envelope gate table: one synthesized response record per doc,
    * parsed through the same [[pageIterator]] path as the file source —
    * status / redirect Location / content-type all closed-form for the
    * oracle. */
  def warcHttpTable(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id")).as[Long]
      .map { id =>
        val pg = parseWarc(synthWarcHttp(id)).head
        (id, pg.uri, pg.status,
          if (pg.location == null) "-" else pg.location,
          if (pg.contentType == null) "-" else pg.contentType,
          if (pg.html == null) "" else new String(pg.html, ISO_8859_1))
      }.toDF("doc_id", "uri", "status", "redirect", "ctype", "body")
  }

  /** WARC bytes exercising the caching-header surface per id: shared-cache
    * Cache-Control arithmetic (max-age/Age, no-store, s-maxage precedence),
    * Expires−Date, the Last-Modified 10% heuristic — with Last-Modified
    * spelled in all three RFC 9110 §5.6.7 formats across variants — and a
    * header-less record (freshness NULL). */
  def synthWarcCache(id: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(512)
    def w(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    val headers: Seq[String] = ((id % 6).toInt: @unchecked) match {
      case 0 => Seq(s"Cache-Control: max-age=${3600 + id % 100}",
        s"Age: ${id % 50}", "ETag: \"e" + id + "\"")
      case 1 => Seq("Cache-Control: no-store")
      case 2 => Seq("Cache-Control: private, s-maxage=600, max-age=7200", "Age: 0")
      case 3 => Seq("Date: Tue, 01 Apr 2025 00:00:00 GMT",
        "Expires: Tue, 01 Apr 2025 02:00:00 GMT",
        "Last-Modified: Sat Mar  1 00:00:00 2025") // asctime, padded day
      case 4 => Seq("Date: Tue, 01 Apr 2025 00:00:00 GMT",
        "Last-Modified: Saturday, 01-Mar-25 00:00:00 GMT") // rfc850
      case 5 => Seq.empty
    }
    val block = ("HTTP/1.1 200 OK\r\n" + headers.map(_ + "\r\n").mkString +
      s"\r\n<p>c $id</p>").getBytes(ISO_8859_1)
    w("WARC/1.0\r\nWARC-Type: response\r\n")
    w(s"WARC-Target-URI: https://c$id.ex/p\r\n")
    w("WARC-Date: 2025-04-02T00:00:00Z\r\n")
    w(s"Content-Length: ${block.length}\r\n\r\n")
    out.write(block); w("\r\n\r\n")
    out.toByteArray
  }

  /** caching-tier gate table: synthesized records through the full parse
    * (headers map) into `http_fresh_seconds` / `http_date` — freshness,
    * Last-Modified epoch, and ETag all closed-form for the oracle (-1 is
    * the NULL stand-in so the hash compare stays exact). */
  def warcCacheTable(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id")).as[Long]
      .map { id =>
        val h = parseWarc(synthWarcCache(id)).head.headers
        def g(n: String) = h.getOrElse(n, null)
        (id, g("cache-control"), g("age"), g("expires"), g("date"),
          g("last-modified"), h.getOrElse("etag", "-"))
      }.toDF("doc_id", "cc", "age", "expires", "dt", "lm", "etag")
      .select(col("doc_id"),
        coalesce(call_function("http_fresh_seconds", col("cc"), col("age"),
          col("expires"), col("dt"), col("lm")), lit(-1L)).as("fresh"),
        coalesce(call_function("http_date", col("lm")), lit(-1L)).as("lm_epoch"),
        col("etag"))
  }

  /** the FILE-source pipeline: real multi-record `.warc.gz` files on disk
    * (16 docs/file, per-record gzip members), read back through
    * [[readWarcFiles]] (streamed, bounded memory), crawl-profile
    * extraction per page — one row per page, closed-form for the oracle. */
  def warcFileTable(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = synthWarcDir(spark, sfDir)
    readWarcFiles(spark, dir)
      .select(col("uri"),
        call_function("extract_main_crawl", col("html")).as("main_txt"))
  }
}
