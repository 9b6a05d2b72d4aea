package graft.spark

import java.io.InputStream
import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WET sink/source — the Common Crawl "conversion" derivative: one
  * WARC/1.0 `conversion` record per page whose body is the page's
  * extracted plain text (`Content-Type: text/plain`), one gzip member per
  * record, files named `*.warc.wet.gz`. This is how a 100-TB extraction
  * run ships its output back into the crawl ecosystem: WET is readable by
  * every existing WARC toolchain, seekable per record (member-per-record
  * gzip), and self-describing (URI + date + digest travel with the text).
  *
  * Scale shape mirrors [[WarcOps.readWarcFiles]]: the FILE is the unit of
  * work (gzip is unsplittable), one streamed file per task with bounded
  * per-record buffers on read, and on write each task streams its
  * partition through one Hadoop-FS output with temp-file + atomic-rename
  * publish — no whole-file byte arrays on either side.
  *
  * Determinism: record ids are `urn:uuid` values DERIVED from the record's
  * (uri, date, sha-1(text)) rather than drawn from a RNG — a re-run of the
  * same extraction writes byte-identical WET output, which is what makes
  * the sink idempotent under the exactly-once resume story (a replaced
  * file replaces like content). The block digest is `sha1:<base32>`, the
  * same convention Common Crawl's own WET records use. */
object WetOps extends Serializable {

  // ------------------------------------------------------------- record IO

  private[spark] def base32(b: Array[Byte]): String = {
    val alpha = "ABCDEFGHIJKLMNOPQRSTUVWXYZ234567"
    val sb = new java.lang.StringBuilder((b.length * 8 + 4) / 5)
    var buf = 0L
    var bits = 0
    var i = 0
    while (i < b.length) {
      buf = (buf << 8) | (b(i) & 0xffL)
      bits += 8
      while (bits >= 5) {
        sb.append(alpha(((buf >> (bits - 5)) & 31).toInt))
        bits -= 5
      }
      i += 1
    }
    if (bits > 0) sb.append(alpha(((buf << (5 - bits)) & 31).toInt))
    sb.toString
  }

  private[spark] def sha1(b: Array[Byte]): Array[Byte] =
    java.security.MessageDigest.getInstance("SHA-1").digest(b)

  /** deterministic urn:uuid for a record: the first 16 bytes of
    * sha-1(uri | date | sha1(body)) with the RFC 4122 version/variant
    * bits set to "name-based, sha-1" (version 5) form. */
  private def recordId(uri: String, date: String, bodySha1: Array[Byte]): String = {
    val h = sha1((uri + "\n" + date + "\n").getBytes(UTF_8) ++ bodySha1)
    h(6) = ((h(6) & 0x0f) | 0x50).toByte // version 5
    h(8) = ((h(8) & 0x3f) | 0x80).toByte // RFC 4122 variant
    val hex = h.take(16).map(x => f"$x%02x").mkString
    s"urn:uuid:${hex.substring(0, 8)}-${hex.substring(8, 12)}-${hex.substring(12, 16)}-" +
      s"${hex.substring(16, 20)}-${hex.substring(20, 32)}"
  }

  /** write one `conversion` record (uncompressed) to `out`. */
  private def writeConversion(out: java.io.OutputStream,
      uri: String, date: String, text: String): Unit = {
    def w(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    val body = (if (text == null) "" else text).getBytes(UTF_8)
    val digest = sha1(body)
    w("WARC/1.0\r\n")
    w("WARC-Type: conversion\r\n")
    w(s"WARC-Target-URI: $uri\r\n")
    w(s"WARC-Date: $date\r\n")
    w(s"WARC-Record-ID: <${recordId(uri, date, digest)}>\r\n")
    w(s"WARC-Block-Digest: sha1:${base32(digest)}\r\n")
    w("Content-Type: text/plain\r\n")
    w(s"Content-Length: ${body.length}\r\n\r\n")
    out.write(body)
    w("\r\n\r\n")
  }

  private def writeWarcinfo(out: java.io.OutputStream, date: String): Unit = {
    def w(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    val body = ("software: graft-wet/1.0\r\nformat: WARC File Format 1.0\r\n")
      .getBytes(ISO_8859_1)
    w("WARC/1.0\r\n")
    w("WARC-Type: warcinfo\r\n")
    w(s"WARC-Date: $date\r\n")
    w("Content-Type: application/warc-fields\r\n")
    w(s"Content-Length: ${body.length}\r\n\r\n")
    out.write(body)
    w("\r\n\r\n")
  }

  // ------------------------------------------------------------------ sink

  /** write `pages` (columns `uri`, `date`, `text`) as WET files under
    * `outDir`, one file per non-empty input partition
    * (`part-<pid>.warc.wet[.gz]`), each record its own gzip member, a
    * leading warcinfo record stamped with the partition's first page date.
    * Streams record-by-record through the FS output (bounded memory),
    * publishes via temp + atomic rename. Returns the record count.
    *
    * Partitioning IS the file layout: repartition/sort upstream to choose
    * file count and record order (e.g. by SURT key for locality). */
  def writeWetFiles(pages: DataFrame, outDir: String, gzip: Boolean = true): Long = {
    val spark = pages.sparkSession
    import spark.implicits._
    val confBc = spark.sparkContext.broadcast(
      new WarcOps.ConfSnapshot(spark.sparkContext.hadoopConfiguration))
    val suffix = if (gzip) ".warc.wet.gz" else ".warc.wet"
    val dirPath = new org.apache.hadoop.fs.Path(outDir)
    dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration).mkdirs(dirPath)
    val counts = pages.select(col("uri").cast("string"),
      col("date").cast("string"), col("text").cast("string"))
      .as[(String, String, String)]
      .mapPartitions { it =>
        if (!it.hasNext) Iterator.empty
        else {
          val pid = org.apache.spark.TaskContext.get().partitionId()
          val fs = new org.apache.hadoop.fs.Path(outDir)
            .getFileSystem(confBc.value.value)
          val tmp = new org.apache.hadoop.fs.Path(outDir, f".tmp-part-$pid%05d$suffix")
          val fin = new org.apache.hadoop.fs.Path(outDir, f"part-$pid%05d$suffix")
          val raw = fs.create(tmp, true)
          var n = 0L
          try {
            var first = true
            while (it.hasNext) {
              val (uri, date, text) = it.next()
              if (first) {
                if (gzip) {
                  val gz = new GZIPOutputStream(new NonClosingStream(raw))
                  writeWarcinfo(gz, if (date == null) "" else date)
                  gz.finish(); gz.close()
                } else writeWarcinfo(raw, if (date == null) "" else date)
                first = false
              }
              if (gzip) {
                val gz = new GZIPOutputStream(new NonClosingStream(raw))
                writeConversion(gz, uri, date, text)
                gz.finish(); gz.close()
              } else writeConversion(raw, uri, date, text)
              n += 1
            }
          } finally raw.close()
          fs.delete(fin, false)
          if (!fs.rename(tmp, fin))
            throw new java.io.IOException(s"rename $tmp -> $fin failed")
          Iterator.single(n)
        }
      }.toDF("n").agg(coalesce(sum("n"), lit(0L))).as[Long].head()
    counts
  }

  /** GZIPOutputStream.close() closes its target; each record member must
    * NOT close the shared file stream. */
  private final class NonClosingStream(target: java.io.OutputStream)
      extends java.io.FilterOutputStream(target) {
    override def write(b: Array[Byte], off: Int, len: Int): Unit =
      target.write(b, off, len)
    override def close(): Unit = flush()
  }

  // ---------------------------------------------------------------- source

  /** read WET files (`*.warc.wet` / `*.warc.wet.gz`, dir or glob) back to
    * (wet_file, uri, wet_date, text) — `conversion` records only, one
    * streamed file per task, largest-first slot packing, per-file
    * corruption tolerance, full stream-chain cleanup on early exit
    * (mirrors [[WarcOps.readWarcFiles]]). */
  def readWetFiles(spark: SparkSession, pathOrGlob: String,
      maxBodyBytes: Int = 256 << 20): DataFrame = {
    import spark.implicits._
    val files = WarcOps.listWarcFiles(spark, pathOrGlob,
      suffixes = Seq(".warc.wet", ".warc.wet.gz"))
    val slots = math.max(1, math.min(files.length, spark.sparkContext.defaultParallelism * 2))
    val groups: Seq[Seq[String]] = files.sortBy(-_._2).zipWithIndex
      .groupBy(_._2 % slots).toSeq.sortBy(_._1)
      .map(_._2.map(_._1._1))
    val cap = maxBodyBytes
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
          val recs =
            try {
              val path = new org.apache.hadoop.fs.Path(pathStr)
              val fs = path.getFileSystem(conf)
              val base: InputStream = fs.open(path)
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
              new WarcOps.WarcRecordReader(in, maxBodyBytes = cap)
                .filter(_.headers.get("warc-type").contains("conversion"))
            } catch {
              case scala.util.control.NonFatal(_) =>
                Iterator.empty[WarcOps.WarcRecord]
            }
          recs.map { r =>
            (pathStr,
              r.headers.getOrElse("warc-target-uri", ""),
              r.headers.getOrElse("warc-date", ""),
              if (r.body == null) null else new String(r.body, UTF_8))
          }
        }
      }.toDF("wet_file", "uri", "wet_date", "text")
  }

  // ------------------------------------------------------------- gate table

  /** gate pipeline: planted html per doc -> extract_main -> WET files
    * (marker-cached under /tmp, keyed by doc count) -> read back. The
    * round-trip pins writer framing, member-per-record gzip, digest/id
    * lines, and the conversion filter against the closed-form oracle. */
  def wetTable(spark: SparkSession, sfDir: String,
      baseDir: String = "/tmp/graft_wet_src"): DataFrame = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val n = docs.count()
    val dir = s"$baseDir/n$n-v2"
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(dir, "_GRAFT_OK")
    if (!fs.exists(marker)) {
      val pages = docs.select(col("doc_id"),
        concat(lit("https://wet-"), col("doc_id"), lit(".example/")).as("uri"),
        concat(lit("2025-01-01T00:00:"),
          lpad((col("doc_id") % 60).cast("string"), 2, "0"), lit("Z")).as("date"),
        call_function("extract_main_crawl",
          concat(lit("<title>W"), col("doc_id"),
            lit("</title><nav>menu</nav><p>wet "), col("doc_id"),
            lit(" body</p>")).cast("binary")).as("text"))
        .repartition(4, col("doc_id"))
      val written = writeWetFiles(pages.select("uri", "date", "text"), dir)
      require(written == n, s"wetTable wrote $written of $n")
      val mo = fs.create(marker, true)
      try mo.write("ok".getBytes(ISO_8859_1)) finally mo.close()
    }
    readWetFiles(spark, dir).select("uri", "wet_date", "text")
  }
}
