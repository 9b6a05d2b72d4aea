package graft.spark

import java.io.InputStream
import java.util.zip.Inflater

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CDX capture index over `.warc.gz` archives — the Common-Crawl-index
  * derivative (the public CDXJ format of webarchive-commons / pywb): one
  * row per response record carrying the SURT key, 14-digit timestamp,
  * payload digest, and — the part that matters at 100 TB — the record's
  * exact **compressed byte span** `(filename, offset, length)` inside its
  * archive file. Common Crawl writes each record as its own gzip member,
  * so a reader holding a CDX row can `seek(offset)`, read `length` bytes,
  * and inflate ONE page out of a multi-petabyte archive without touching
  * the rest. Building the index is a full scan (this module, one streamed
  * file per task); every later access is O(1) per record — that asymmetry
  * is the entire economics of crawl-archive serving, and it is also what
  * makes corpus-wide dedup joins cheap: the join runs over 100-byte CDX
  * rows, never over page bytes, and only the surviving records' spans are
  * ever fetched.
  *
  * The member walk cannot come from `GZIPInputStream`: it consumes
  * concatenated members transparently and never surfaces their
  * boundaries. [[GzipMemberWalker]] reparses the RFC 1952 framing itself
  * (header flags, raw-deflate body via `Inflater(nowrap)`, 8-byte
  * trailer) with its own buffered input so the compressed cursor is exact
  * to the byte — pinned in the gate by re-reading every record through
  * `(offset, length)` random access and recomputing its payload digest.
  *
  * Digest note: rows carry `sha1:<base32>` over the HTTP payload — the
  * convention Common Crawl's own CDX uses (CdxSpec pins the empty-payload
  * vector `3I42H3S6NNFQ2MSVX7XZKYAYSCX5QBYJ`). */
object CdxOps extends Serializable {

  /** one gzip member: compressed span `[offset, offset+length)` in the
    * underlying stream, plus the inflated bytes (`data` null when the
    * member inflated past `maxInflatedBytes` — skipped, surfaced). */
  final case class GzipMember(offset: Long, length: Long, data: Array[Byte])

  /** streaming walk of concatenated gzip members with exact compressed
    * offsets and bounded memory (64 KiB input buffer; inflated member
    * capped at `maxInflatedBytes`, oversize members skipped in-stream).
    * Stops (never throws) at EOF or the first malformed/truncated member,
    * keeping the good prefix — the same tolerance contract as
    * [[WarcOps.WarcRecordReader]]. */
  final class GzipMemberWalker(
      in: InputStream,
      maxInflatedBytes: Int = 256 << 20) extends Iterator[GzipMember] with AutoCloseable {

    private val buf = new Array[Byte](64 << 10)
    private var len = 0 // valid bytes in buf
    private var at = 0 // cursor into buf
    private var base = 0L // absolute offset of buf(0)
    private var nextM: GzipMember = _
    private var done = false

    override def hasNext: Boolean = {
      if (nextM == null && !done) nextM = advance()
      nextM != null
    }

    override def next(): GzipMember = {
      if (!hasNext) throw new NoSuchElementException("GzipMemberWalker")
      val m = nextM; nextM = null; m
    }

    override def close(): Unit = {
      done = true
      try in.close() catch { case _: Exception => () }
    }

    /** refill from `in`; false at EOF. Only called with the buffer fully
      * consumed, so absolute accounting stays exact. */
    private def fill(): Boolean = {
      if (at < len) return true
      base += len
      at = 0
      len = 0
      val r = in.read(buf)
      if (r <= 0) false else { len = r; true }
    }

    private def readByte(): Int =
      if (!fill()) -1 else { val b = buf(at) & 0xff; at += 1; b }

    /** skip RFC 1952 header fields after the fixed 10 bytes per `flg`;
      * false on EOF-first. */
    private def skipHeaderTail(flg: Int): Boolean = {
      if ((flg & 4) != 0) { // FEXTRA: 2-byte LE length + payload
        val lo = readByte(); val hi = readByte()
        if (lo < 0 || hi < 0) return false
        var left = lo | (hi << 8)
        while (left > 0) { if (readByte() < 0) return false; left -= 1 }
      }
      if ((flg & 8) != 0) { // FNAME: zero-terminated
        var c = readByte()
        while (c > 0) c = readByte()
        if (c < 0) return false
      }
      if ((flg & 16) != 0) { // FCOMMENT: zero-terminated
        var c = readByte()
        while (c > 0) c = readByte()
        if (c < 0) return false
      }
      if ((flg & 2) != 0) { // FHCRC: 2 bytes
        if (readByte() < 0 || readByte() < 0) return false
      }
      true
    }

    private def ended(): GzipMember = { close(); null }

    /** null => clean end (EOF / tolerated malformation). */
    private def advance(): GzipMember = {
      if (!fill()) return ended()
      val start = base + at
      // ---- header
      val id1 = readByte(); val id2 = readByte(); val cm = readByte()
      if (id1 != 0x1f || id2 != 0x8b || cm != 8) return ended()
      val flg = readByte()
      var i = 0
      while (i < 6) { if (readByte() < 0) return ended(); i += 1 } // MTIME/XFL/OS
      if (flg < 0 || !skipHeaderTail(flg)) return ended()
      // ---- raw-deflate body
      val inf = new Inflater(true)
      try {
        val outChunk = new Array[Byte](64 << 10)
        val bos = new java.io.ByteArrayOutputStream(64 << 10)
        var oversize = false
        var fedFrom = -1 // buf index the current setInput started at
        while (!inf.finished()) {
          if (inf.needsInput()) {
            if (fedFrom >= 0) at = len // previous segment fully consumed
            if (!fill()) return ended() // truncated member
            inf.setInput(buf, at, len - at)
            fedFrom = at
          }
          val n = inf.inflate(outChunk)
          if (n > 0) {
            if (!oversize && bos.size.toLong + n > maxInflatedBytes) oversize = true
            if (!oversize) bos.write(outChunk, 0, n)
          } else if (n == 0 && inf.needsDictionary()) {
            return ended() // not a gzip-legal state; malformed
          }
        }
        // finished: part of the current segment may be unconsumed
        at = len - inf.getRemaining
        // ---- 8-byte trailer (CRC32 + ISIZE), possibly across fills
        var t = 0
        while (t < 8) { if (readByte() < 0) return ended(); t += 1 }
        val end = base + at
        GzipMember(start, end - start, if (oversize) null else bos.toByteArray)
      } catch {
        case scala.util.control.NonFatal(_) => ended()
      } finally inf.end()
    }
  }

  // ----------------------------------------------------------------- rows

  /** one CDX capture row. `digest` is `sha1:<base32>` over the HTTP
    * payload (the WARC-Payload-Digest convention); `mime` is the
    * Content-Type value up to any parameters, lowercased; `ts` is the
    * WARC-Date collapsed to the CDX 14-digit form. */
  final case class CdxRow(surt: String, ts: String, url: String,
      mime: String, status: Int, digest: String,
      offset: Long, length: Long, filename: String)

  private def ts14(warcDate: String): String = {
    if (warcDate == null) return null
    val sb = new java.lang.StringBuilder(14)
    var i = 0
    while (i < warcDate.length && sb.length < 14) {
      val c = warcDate.charAt(i)
      if (c >= '0' && c <= '9') sb.append(c)
      i += 1
    }
    if (sb.length == 14) sb.toString else null
  }

  private def mimeOf(contentType: String): String = {
    if (contentType == null) return "unk"
    val semi = contentType.indexOf(';')
    val t = (if (semi >= 0) contentType.substring(0, semi) else contentType).trim
    if (t.isEmpty) "unk" else t.toLowerCase(java.util.Locale.ROOT)
  }

  /** CDX rows of one `.warc.gz` stream (member-per-record layout, the one
    * Common Crawl ships): response records only, one streamed member at a
    * time. `filename` is caller-provided (CDX stores basenames). */
  def cdxIterator(in: InputStream, filename: String,
      maxInflatedBytes: Int = 256 << 20): Iterator[CdxRow] = {
    new GzipMemberWalker(in, maxInflatedBytes).flatMap { m =>
      if (m.data == null) Iterator.empty // oversize member: skipped, surfaced by absence
      else WarcOps.parseWarc(m.data).iterator.flatMap { pg =>
        val ts = ts14(pg.date)
        if (pg.uri == null || pg.uri.isEmpty || ts == null) Iterator.empty
        else {
          val payload = if (pg.html == null) Array.empty[Byte] else pg.html
          Iterator.single(CdxRow(
            UrlOps.surt(pg.uri), ts, pg.uri, mimeOf(pg.contentType),
            pg.status, "sha1:" + WetOps.base32(WetOps.sha1(payload)),
            m.offset, m.length, filename))
        }
      }
    }
  }

  /** the index build: CDX rows for every `.warc.gz` under `pathOrGlob`.
    * Scale shape mirrors [[WarcOps.readWarcFiles]] — the FILE is the unit
    * of work (members only walk forward), largest-first round-robin slot
    * packing, one streamed file per task, per-file corruption tolerance,
    * stream cleanup via task listener. Output columns: surt, ts, url,
    * mime, status, digest, offset, length, filename (basename). Sorting /
    * range-partitioning by `surt` upstream of a write gives the
    * host-contiguous layout real CDX servers binary-search. */
  def cdxTable(spark: SparkSession, pathOrGlob: String,
      maxInflatedBytes: Int = 256 << 20): DataFrame = {
    import spark.implicits._
    val files = WarcOps.listWarcFiles(spark, pathOrGlob, suffixes = Seq(".warc.gz"))
    val slots = math.max(1, math.min(files.length, spark.sparkContext.defaultParallelism * 2))
    val groups: Seq[Seq[String]] = files.sortBy(-_._2).zipWithIndex
      .groupBy(_._2 % slots).toSeq.sortBy(_._1)
      .map(_._2.map(_._1._1))
    val cap = maxInflatedBytes
    val confBc = spark.sparkContext.broadcast(
      new WarcOps.ConfSnapshot(spark.sparkContext.hadoopConfiguration))
    spark.createDataset(groups)
      .repartition(math.max(1, groups.length))
      .mapPartitions { it =>
        val conf = confBc.value.value
        val open = new java.util.ArrayList[InputStream]()
        val ctx = org.apache.spark.TaskContext.get()
        if (ctx != null) ctx.addTaskCompletionListener[Unit] { _ =>
          open.forEach(s => try s.close() catch { case _: Exception => () })
        }
        it.flatten.flatMap { pathStr =>
          try {
            val path = new org.apache.hadoop.fs.Path(pathStr)
            val fs = path.getFileSystem(conf)
            val in: InputStream = fs.open(path)
            open.add(in)
            cdxIterator(in, path.getName, cap)
          } catch {
            case scala.util.control.NonFatal(_) => Iterator.empty[CdxRow]
          }
        }
      }.toDF("surt", "ts", "url", "mime", "status", "digest",
        "offset", "length", "filename")
  }

  // -------------------------------------------------------- random access

  /** the read side of the index: seek to `offset` in `file`, read exactly
    * `length` bytes (one gzip member), inflate + parse the single record.
    * None when the span is not a parseable response member. `length` is
    * bounded by `maxSpanBytes` (a hostile/corrupt CDX row must not
    * allocate unbounded). This is the per-record O(1) archive access a
    * CDX row exists to enable. */
  def fetchRecord(conf: org.apache.hadoop.conf.Configuration,
      file: String, offset: Long, length: Long,
      maxSpanBytes: Int = 256 << 20): Option[WarcOps.WarcPage] = {
    if (length <= 0 || length > maxSpanBytes || offset < 0) return None
    try {
      val path = new org.apache.hadoop.fs.Path(file)
      val fs = path.getFileSystem(conf)
      val in = fs.open(path)
      try {
        val bytes = new Array[Byte](length.toInt)
        in.readFully(offset, bytes) // positioned read: no seek-side effects
        WarcOps.parseWarcGz(bytes).headOption
      } finally in.close()
    } catch {
      case scala.util.control.NonFatal(_) => None
    }
  }

  // ------------------------------------------------------------- gate row

  /** gate table: build the CDX over the synthesized `.warc.gz` directory,
    * then RE-READ every record through its `(filename, offset, length)`
    * span and emit the fetched record's fields — every output value flows
    * through the random-access path, so a one-byte offset error breaks
    * the member inflate and turns the row red. `payload_sha256` is
    * recomputed by DuckDB over the closed-form page bytes. */
  def cdxTableGate(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val dir = WarcOps.synthWarcDir(spark, sfDir)
    val confBc = spark.sparkContext.broadcast(
      new WarcOps.ConfSnapshot(spark.sparkContext.hadoopConfiguration))
    val cdx = cdxTable(spark, dir)
    cdx.select("surt", "ts", "mime", "status", "offset", "length", "filename")
      .as[(String, String, String, Int, Long, Long, String)]
      .mapPartitions { it =>
        val conf = confBc.value.value
        // records of one file arrive consecutively (the index build is
        // file-ordered): reuse the open stream across consecutive rows
        var curPath: String = null
        var curIn: org.apache.hadoop.fs.FSDataInputStream = null
        val ctx = org.apache.spark.TaskContext.get()
        if (ctx != null) ctx.addTaskCompletionListener[Unit] { _ =>
          if (curIn != null) try curIn.close() catch { case _: Exception => () }
        }
        val dirPath = new org.apache.hadoop.fs.Path(dir)
        val fs = dirPath.getFileSystem(conf)
        it.flatMap { case (surt, ts, mime, status, offset, length, filename) =>
          val full = new org.apache.hadoop.fs.Path(dirPath, filename).toString
          if (full != curPath) {
            if (curIn != null) try curIn.close() catch { case _: Exception => () }
            curIn = fs.open(new org.apache.hadoop.fs.Path(full))
            curPath = full
          }
          val bytes = new Array[Byte](length.toInt)
          curIn.readFully(offset, bytes)
          WarcOps.parseWarcGz(bytes).headOption.map { pg =>
            val payload = if (pg.html == null) Array.empty[Byte] else pg.html
            (surt, ts, pg.uri, mime, status, filename, payload)
          }
        }
      }.toDF("surt", "ts", "fetch_uri", "mime", "status", "filename", "payload")
      .select(col("surt"), col("ts"), col("fetch_uri"), col("mime"),
        col("status"), col("filename"),
        sha2(col("payload"), 256).as("payload_sha256"))
      .orderBy("surt", "ts")
  }
}
