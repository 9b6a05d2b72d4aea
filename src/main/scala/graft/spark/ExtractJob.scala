package graft.spark

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import java.sql.Timestamp
import scala.collection.mutable

final case class ExtractedRow(bucket: Int, url: String, text: String)

final case class LineageRow(
    partition_id: Int,
    warc_ts_min: Timestamp,
    warc_ts_max: Timestamp,
    doc_count: Long,
    byte_count: Long,
    failure_count: Long,
    status: String,
    run_id: String)

/** The corpus-scale extraction pipeline (north rule):
  *
  *  - **partitioning / skew**: pages are bucketed by `pmod(hash(url, salt),
  *    buckets)` — an explicit salted url-hash so power-law hosts cannot pin a
  *    partition; the same expression is the physical repartition key, so one
  *    shuffle co-locates each bucket and the writer emits one directory per
  *    bucket.
  *  - **lineage / exactly-once resume**: one lineage row per bucket
  *    (ts range, doc/byte/failure counts) collected via a driver-side
  *    accumulator (O(buckets), not O(rows)) and appended to a lineage table;
  *    rerunning skips buckets already recorded `done` and dynamic partition
  *    overwrite makes re-extraction of a half-written bucket idempotent.
  *  - **per-row engine, zero per-row allocation churn**: `mapPartitions`
  *    with the thread-local arena in [[Extractor]].
  *
  * At 100 TB the only wide exchange is the single hash repartition; the
  * extraction itself is embarrassingly parallel map work.
  */
object ExtractJob {

  final case class Config(
      buckets: Int = 64,
      salt: Int = 42,
      runId: String = "run-0",
      recipe: Extractor.Recipe = Extractor.Recipe.default)

  def bucketCol(salt: Int, buckets: Int) =
    pmod(hash(col("url"), lit(salt)), lit(buckets))

  /** run extraction over a pages dataframe, writing extracted + lineage
    * tables under outDir; resumes from lineage when present. */
  def run(spark: SparkSession, pages: DataFrame, outDir: String, cfg: Config = Config()): Unit = {
    import spark.implicits._
    val lineagePath = s"$outDir/lineage"
    val extractedPath = s"$outDir/extracted"

    val done: Set[Int] =
      if (fsExists(spark, lineagePath)) {
        spark.read.parquet(lineagePath)
          .where(col("status") === "done")
          .select("partition_id").as[Int].collect().toSet
      } else Set.empty

    val withBucket = pages
      .withColumn("bucket", bucketCol(cfg.salt, cfg.buckets))
    val pending =
      if (done.isEmpty) withBucket
      else withBucket.where(!col("bucket").isInCollection(done))

    val acc = spark.sparkContext.collectionAccumulator[LineageRow]("graft.lineage")
    val recipe = cfg.recipe
    val runId = cfg.runId

    // one shuffle: co-locate buckets (salted url hash)
    val extracted: Dataset[ExtractedRow] = pending
      .repartition(cfg.buckets, col("bucket"))
      .select(col("bucket"), col("url"), col("warc_ts"), col("html"))
      .as[(Int, String, Timestamp, Array[Byte])]
      .mapPartitions { it =>
        // one shuffle partition may carry several buckets (hash-of-bucket
        // mod partitions) — aggregate lineage per bucket, not per task
        final class Stats {
          var tsMin = Long.MaxValue; var tsMax = Long.MinValue
          var docs = 0L; var bytes = 0L; var failures = 0L
        }
        val stats = new java.util.HashMap[Int, Stats]()
        var emitted = false
        val out = it.map { case (b, url, ts, html) =>
          val s = {
            val cur = stats.get(b)
            if (cur != null) cur else { val n = new Stats; stats.put(b, n); n }
          }
          s.docs += 1
          if (html != null) s.bytes += html.length
          val t = ts.getTime
          if (t < s.tsMin) s.tsMin = t
          if (t > s.tsMax) s.tsMax = t
          val text = Extractor.extractMain(html, recipe)
          if (text == null) s.failures += 1
          ExtractedRow(b, url, text)
        }
        new Iterator[ExtractedRow] {
          override def hasNext: Boolean = {
            val h = out.hasNext
            if (!h && !emitted) {
              emitted = true
              stats.forEach { (b, s) =>
                acc.add(LineageRow(b, new Timestamp(s.tsMin), new Timestamp(s.tsMax),
                  s.docs, s.bytes, s.failures, "done", runId))
              }
            }
            h
          }
          override def next(): ExtractedRow = out.next()
        }
      }

    // idempotent per-bucket overwrite => exactly-once on resume
    extracted.toDF()
      .write
      .partitionBy("bucket")
      .option("partitionOverwriteMode", "dynamic")
      .mode(SaveMode.Overwrite)
      .parquet(extractedPath)

    val lineage = scala.jdk.CollectionConverters.ListHasAsScala(acc.value).asScala.toSeq
    if (lineage.nonEmpty) {
      spark.createDataset(dedupLineage(lineage)).toDF()
        .repartition(1)
        .write.mode(SaveMode.Append).parquet(lineagePath)
    }
  }

  /** speculative / retried tasks can double-report a bucket; keep one. */
  private def dedupLineage(rows: Seq[LineageRow]): Seq[LineageRow] = {
    val seen = mutable.HashSet[Int]()
    rows.filter(r => seen.add(r.partition_id))
  }

  /** spark-submit entry:
    * `spark-submit --class graft.spark.ExtractJob visdomspark.jar
    *    <pagesPathOrSfDir> <outDir> [buckets] [salt] [runId]`
    * A directory containing `documents.parquet` is synthesized into pages
    * first (sandbox path); anything else is read as a pages table. */
  def main(args: Array[String]): Unit = {
    val in = args(0)
    val outDir = args(1)
    val buckets = if (args.length > 2) args(2).toInt else 64
    val salt = if (args.length > 3) args(3).toInt else 42
    val runId = if (args.length > 4) args(4) else "run-0"
    val spark = SparkSession.builder()
      .appName("graft-extract")
      .config("spark.sql.extensions", "graft.spark.GraftSparkExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    try {
      val pages =
        if (fsExists(spark, s"$in/documents.parquet")) PagesGen.asDataFrame(spark, in)
        else spark.read.parquet(in)
      run(spark, pages, outDir, Config(buckets, salt, runId))
      spark.read.parquet(s"$outDir/lineage").orderBy("partition_id").show(20, truncate = false)
    } finally spark.stop()
  }

  private def fsExists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }
}
