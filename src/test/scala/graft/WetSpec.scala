package graft

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import graft.spark.{WarcOps, WetOps}
import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}

/** WET conversion-record round trips: writer framing, member-per-record
  * gzip, deterministic ids/digests, conversion filtering on read. */
class WetSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    // a leaked session from an earlier suite in the shared forked JVM
    // would be adopted by getOrCreate() with THAT suite's config --
    // never this one's extensions; always start fresh
    SparkSession.getActiveSession.foreach(_.stop())
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-wet-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.spark.GraftSparkExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("WET round trip: write partitions, read conversion records back") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("wetspec").toString
    val pages = (0 until 37).map { i =>
      (s"https://wet$i.ex/", f"2025-01-01T00:00:$i%02dZ",
        if (i % 9 == 8) null else s"text $i\nline two & [$i]")
    }.toDF("uri", "date", "text").repartition(3)
    val n = WetOps.writeWetFiles(pages, dir)
    assert(n == 37)
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".warc.wet.gz"))
    assert(files.length == 3)
    val back = WetOps.readWetFiles(s, dir)
      .select("uri", "wet_date", "text").as[(String, String, String)]
      .collect().sortBy(_._1)
    assert(back.length == 37)
    val expect = (0 until 37).map { i =>
      (s"https://wet$i.ex/", f"2025-01-01T00:00:$i%02dZ",
        if (i % 9 == 8) "" else s"text $i\nline two & [$i]")
    }.sortBy(_._1)
    assert(back.toSeq == expect)
  }

  test("records are framed WARC/1.0 with deterministic ids and sha1 digests") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("wetspec2").toString
    val one = Seq(("https://a.ex/", "2025-01-01T00:00:00Z", "hello wet"))
      .toDF("uri", "date", "text").coalesce(1)
    WetOps.writeWetFiles(one, dir)
    // determinism: a second write of the same content is byte-identical
    val f = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".warc.wet.gz")).head
    val bytes1 = java.nio.file.Files.readAllBytes(f.toPath)
    WetOps.writeWetFiles(one, dir)
    val bytes2 = java.nio.file.Files.readAllBytes(f.toPath)
    assert(java.util.Arrays.equals(bytes1, bytes2))
    // walk raw records through the streaming reader: warcinfo + conversion
    val in = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(bytes1))
    val recs = new WarcOps.WarcRecordReader(in).toList
    assert(recs.map(_.headers("warc-type")) == List("warcinfo", "conversion"))
    val c = recs(1)
    assert(c.headers("warc-target-uri") == "https://a.ex/")
    assert(new String(c.body, UTF_8) == "hello wet")
    assert(c.headers("warc-record-id").startsWith("<urn:uuid:"))
    // sha1("hello wet") base32, the Common-Crawl digest convention
    val md = java.security.MessageDigest.getInstance("SHA-1")
      .digest("hello wet".getBytes(UTF_8))
    assert(c.headers("warc-block-digest").startsWith("sha1:"))
    assert(c.headers("warc-block-digest").length == 5 + 32) // 160 bits -> 32 base32 chars
    // reading the same file back as WARC pages yields nothing (wrong type)
    val asWet = WetOps.readWetFiles(s, dir).count()
    assert(asWet == 1)
  }

  test("uncompressed .warc.wet files read back too") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("wetspec3").toString
    val pages = Seq(("https://u.ex/", "2025-01-02T00:00:00Z", "plain"))
      .toDF("uri", "date", "text").coalesce(1)
    WetOps.writeWetFiles(pages, dir, gzip = false)
    assert(new java.io.File(dir).listFiles().exists(_.getName.endsWith(".warc.wet")))
    val back = WetOps.readWetFiles(s, dir).select("text").as[String].collect()
    assert(back.toSeq == Seq("plain"))
  }

  test("corrupt member tolerated per file; response records filtered out") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("wetspec4").toString
    // one good file
    WetOps.writeWetFiles(Seq(("https://g.ex/", "2025-01-01T00:00:00Z", "good"))
      .toDF("uri", "date", "text").coalesce(1), dir)
    // one corrupt file alongside
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "bad.warc.wet.gz"),
      Array[Byte](0x1f, 0x0b, 1, 2, 3))
    // one file with a response record only (valid WARC, wrong type)
    val rawOut = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(rawOut)
    val body = "HTTP/1.1 200 OK\r\n\r\n<p>x</p>".getBytes(ISO_8859_1)
    gz.write(("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: https://r.ex/\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n").getBytes(ISO_8859_1))
    gz.write(body); gz.write("\r\n\r\n".getBytes(ISO_8859_1)); gz.finish(); gz.close()
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "resp.warc.wet.gz"),
      rawOut.toByteArray)
    val back = WetOps.readWetFiles(s, dir).select("uri").as[String].collect()
    assert(back.toSeq == Seq("https://g.ex/"))
  }
}
