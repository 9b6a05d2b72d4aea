package graft.spark

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import java.sql.Timestamp
import scala.util.control.NonFatal

final case class ExtractedRow(
    bucket: Int,
    url: String,
    warc_ts: Timestamp,
    html_bytes: Long,
    failed: Boolean,
    text: String)

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
  *  - **lineage / exactly-once resume**: one lineage row per bucket (ts
  *    range, doc/byte/failure counts) derived by AGGREGATING THE WRITTEN
  *    OUTPUT — idempotent by construction (no accumulator best-effort
  *    semantics across stage retries, no driver-side dedup), one cheap
  *    column-pruned scan (never reads `text`). Rerunning skips buckets
  *    already recorded `done`; dynamic partition overwrite makes
  *    re-extraction of a half-written bucket idempotent.
  *  - **per-row engine, zero per-row allocation churn**: `mapPartitions`
  *    with the thread-local arena in [[Extractor]]. Every per-row failure
  *    (parse error, pathological input, null timestamp) yields a null-text
  *    row counted in `failure_count` — never a task failure.
  *
  * At 100 TB the only wide exchange is the single hash repartition; the
  * extraction itself is embarrassingly parallel map work.
  */
object ExtractJob {

  /** `preShuffled = true` skips the bucket repartition: correct whenever
    * the input is already laid out bucket-aligned (e.g. a previous run's
    * output, or a corpus stored partitioned by this job's own bucket
    * expression) — extraction then runs map-only, zero exchanges, which is
    * the re-run shape you want at 100 TB. The bucket column is still
    * computed for lineage/output partitioning; only the shuffle is skipped
    * (buckets land wherever the files are, which is exactly co-located for
    * bucket-aligned storage). */
  /** `rowGroupBytes` caps the parquet row-group size of the extracted
    * output (`parquet.block.size`). Scan-split planning on parquet can
    * parallelize at row-group granularity, so a bucket file holding many
    * row groups is readable by many tasks — downstream parallelism is then
    * independent of the FILE count (one file per bucket here), which is
    * what survives a 100× scale-up without re-tuning `buckets`. 32 MB ≈
    * 4 row groups per default 128 MB scan split: enough split freedom,
    * still large enough for dictionary/statistics efficiency. */
  /** `clean = true` runs the training-data cleanup on each extracted
    * text inside the SAME per-row pass (no extra stage, no plan change):
    * [[TextNorm.fixText]] (mojibake repair + NFC + control strip) then
    * [[TextNorm.scrubPii]] (email/IPv4/phone redaction). Clean ASCII
    * short-circuits both, so the flag costs one scan per row on the
    * common path. Off by default — extraction parity stays byte-exact. */
  final case class Config(
      buckets: Int = 64,
      salt: Int = 42,
      runId: String = "run-0",
      recipe: Extractor.Recipe = Extractor.Recipe.default,
      preShuffled: Boolean = false,
      rowGroupBytes: Long = 32L << 20,
      clean: Boolean = false)

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
        val lin = spark.read.parquet(lineagePath)
        // resume-config guard: lineage partition ids are only meaningful
        // under the bucketing that produced them — resuming with a
        // different buckets/salt would subtract stale ids from a REMAPPED
        // space and silently skip data. Rows written before the config
        // columns existed are accepted as-is (legacy lineage).
        if (lin.columns.contains("buckets")) {
          val cfgs = lin.select(col("buckets").as[Int], col("salt").as[Int])
            .distinct().collect()
          cfgs.foreach { case (b, sa) =>
            require(b == cfg.buckets && sa == cfg.salt,
              s"lineage at $lineagePath was written with buckets=$b salt=$sa; " +
                s"resuming with buckets=${cfg.buckets} salt=${cfg.salt} would " +
                "silently skip remapped data — use a fresh outDir or the " +
                "original config")
          }
        }
        lin.where(col("status") === "done")
          .select("partition_id").as[Int].collect().toSet
      } else Set.empty

    val withBucket = pages
      .withColumn("bucket", bucketCol(cfg.salt, cfg.buckets))
    val pending =
      if (done.isEmpty) withBucket
      else withBucket.where(!col("bucket").isInCollection(done))
    // nothing to do (empty corpus, or every bucket already done): return
    // before writing — a zero-row partitioned write emits no data files,
    // and the lineage read-back of an empty directory cannot infer a
    // schema (AnalysisException). isEmpty is a limit(1) probe.
    if (pending.isEmpty) return

    val recipe = cfg.recipe
    val doClean = cfg.clean

    // one shuffle co-locates buckets (salted url hash) — or none at all
    // when the input is already bucket-aligned storage
    val shuffled =
      if (cfg.preShuffled) pending
      else pending.repartition(cfg.buckets, col("bucket"))
    val extracted: Dataset[ExtractedRow] = shuffled
      .select(col("bucket"), col("url"), col("warc_ts"), col("html"))
      .as[(Int, String, Timestamp, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (b, url, ts, html) =>
          val bytes = if (html == null) 0L else html.length.toLong
          val raw =
            try Extractor.extractMain(html, recipe)
            catch { case NonFatal(_) => null }
          val text =
            if (raw == null || !doClean) raw
            else TextNorm.scrubPii(TextNorm.fixText(raw))
          ExtractedRow(b, url, ts, bytes, text == null, text)
        }
      }

    // idempotent per-bucket overwrite => exactly-once on resume;
    // parquet.block.size bounds row groups so each bucket file stays
    // splittable (see Config.rowGroupBytes)
    extracted.toDF()
      .write
      .partitionBy("bucket")
      .option("partitionOverwriteMode", "dynamic")
      .option("parquet.block.size", cfg.rowGroupBytes)
      .mode(SaveMode.Overwrite)
      .parquet(extractedPath)

    // lineage FROM the written data: column pruning keeps this scan tiny
    // (bucket/warc_ts/html_bytes/failed only — never the text column)
    val written = spark.read.parquet(extractedPath)
      .where(if (done.isEmpty) lit(true) else !col("bucket").isInCollection(done))
    val runId = cfg.runId
    val lineage = written.groupBy(col("bucket"))
      .agg(
        min(col("warc_ts")).as("warc_ts_min"),
        max(col("warc_ts")).as("warc_ts_max"),
        count(lit(1)).as("doc_count"),
        sum(col("html_bytes")).as("byte_count"),
        sum(col("failed").cast("long")).as("failure_count"))
      .select(
        col("bucket").cast("int").as("partition_id"),
        col("warc_ts_min"), col("warc_ts_max"),
        col("doc_count"), col("byte_count"), col("failure_count"),
        lit("done").as("status"), lit(runId).as("run_id"),
        lit(cfg.buckets).as("buckets"), lit(cfg.salt).as("salt"))
    lineage
      .repartition(1)
      .write.mode(SaveMode.Append).parquet(lineagePath)
  }

  /** spark-submit entry:
    * `spark-submit --class graft.spark.ExtractJob visdomspark.jar
    *    <pagesPathOrSfDir> <outDir> [buckets] [salt] [runId] [preShuffled]`
    * A directory containing `documents.parquet` is synthesized into pages
    * first (sandbox path); anything else is read as a pages table. */
  def main(args: Array[String]): Unit = {
    val in = args(0)
    val outDir = args(1)
    val buckets = if (args.length > 2) args(2).toInt else 64
    val salt = if (args.length > 3) args(3).toInt else 42
    val runId = if (args.length > 4) args(4) else "run-0"
    val preShuffled = args.length > 5 && args(5).toBoolean
    val spark = SparkSession.builder()
      .appName("graft-extract")
      .config("spark.sql.extensions", "graft.spark.GraftSparkExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    try {
      val pages =
        if (fsExists(spark, s"$in/documents.parquet")) PagesGen.asDataFrame(spark, in)
        else spark.read.parquet(in)
      run(spark, pages, outDir, Config(buckets, salt, runId, preShuffled = preShuffled))
      // run() no-ops on an empty corpus without creating the lineage table.
      if (fsExists(spark, s"$outDir/lineage"))
        spark.read.parquet(s"$outDir/lineage").orderBy("partition_id").show(20, truncate = false)
      else println(s"graft-extract: no work (empty corpus), no lineage written to $outDir")
    } finally spark.stop()
  }

  private def fsExists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }
}
