package graft.spark

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Structured Streaming variant of the extraction pipeline: continuously
  * ingest newly-landed page files, extract main content, and append to the
  * extracted table with checkpointed exactly-once file-sink semantics.
  *
  * The reference has no streaming surface (single-string API) — this is the
  * Spark-native composition: the same per-row engine rides any source.
  * `extract_main` being a deterministic scalar `Expression`, the streaming
  * planner treats it like any built-in; watermarking applies to `warc_ts`
  * for the windowed ingest-rate metrics stream.
  */
object StreamingExtract {

  private val pageSchema =
    org.apache.spark.sql.Encoders.product[PageRow].schema

  /** start the extraction stream: pagesDir (parquet files, pages schema) ->
    * outDir/extracted, checkpoint in outDir/checkpoint. */
  def start(spark: SparkSession, pagesDir: String, outDir: String,
      buckets: Int = 64, salt: Int = 42): StreamingQuery = {
    val schema = pageSchema
    val pages = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "8")
      .parquet(pagesDir)
    pages
      .withColumn("bucket", ExtractJob.bucketCol(salt, buckets))
      .select(col("bucket"), col("url"),
        call_function("extract_main", col("html")).as("text"))
      .writeStream
      .option("checkpointLocation", s"$outDir/checkpoint")
      .option("path", s"$outDir/extracted")
      .trigger(Trigger.AvailableNow())
      .format("parquet")
      .start()
  }

  /** extraction stream WITH per-batch lineage: `foreachBatch` writes the
    * extracted rows AND one lineage row per (batch, bucket) — both keyed by
    * `batch_id`, both written with dynamic partition overwrite, so a
    * replayed micro-batch (checkpoint recovery) rewrites its own partitions
    * idempotently: exactly-once lineage without accumulators, the streaming
    * analog of [[ExtractJob]]'s derive-from-output design. */
  def startWithLineage(spark: SparkSession, pagesDir: String, outDir: String,
      buckets: Int = 64, salt: Int = 42): StreamingQuery = {
    val pages = spark.readStream
      .schema(pageSchema)
      .option("maxFilesPerTrigger", "8")
      .parquet(pagesDir)
    pages
      .withColumn("bucket", ExtractJob.bucketCol(salt, buckets))
      .select(col("bucket"), col("url"), col("warc_ts"),
        octet_length(col("html")).cast("long").as("html_bytes"),
        call_function("extract_main", col("html")).as("text"))
      .writeStream
      .option("checkpointLocation", s"$outDir/checkpoint")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val rows = batch.withColumn("batch_id", lit(batchId)).persist()
        rows
          .write.partitionBy("batch_id", "bucket")
          .option("partitionOverwriteMode", "dynamic")
          .mode("overwrite")
          .parquet(s"$outDir/extracted")
        rows.groupBy(col("batch_id"), col("bucket"))
          .agg(min(col("warc_ts")).as("warc_ts_min"),
            max(col("warc_ts")).as("warc_ts_max"),
            count(lit(1)).as("doc_count"),
            sum(col("html_bytes")).as("byte_count"),
            sum(col("text").isNull.cast("long")).as("failure_count"))
          .write.partitionBy("batch_id")
          .option("partitionOverwriteMode", "dynamic")
          .mode("overwrite")
          .parquet(s"$outDir/lineage")
        rows.unpersist()
        ()
      }
      .start()
  }

  /** streaming content-hash dedup with BOUNDED state: extract, key by
    * (xxhash64, byte length) of the extracted text — state never stores the
    * text itself, so at corpus scale state is bounded by (dedup window) x
    * (ingest rate), never corpus size; the residual is the standard
    * content-hash tradeoff (a 64-bit+length collision inside one window,
    * ~2^-64 — the batch [[TextOps.dedupExact]] verifies with the text and
    * stays exact). Failed pages (null text) are NOT deduped: they pass
    * through with a null hash so the failure channel never collapses to
    * one row (xxhash64 of a null column would hash every failure to the
    * same seed value). State expires as the `dedupWindow` event-time
    * watermark advances. */
  def dedupStream(spark: SparkSession, pagesDir: String, outDir: String,
      dedupWindow: String = "1 hour"): StreamingQuery = {
    val pages = spark.readStream
      .schema(pageSchema)
      .option("maxFilesPerTrigger", "8")
      .parquet(pagesDir)
    val extracted = pages
      .select(col("url"), col("warc_ts"),
        call_function("extract_main", col("html")).as("text"))
    val deduped = extracted
      .where(col("text").isNotNull)
      .withColumn("text_hash", xxhash64(col("text")))
      .withColumn("text_len", octet_length(col("text")))
      .withWatermark("warc_ts", dedupWindow)
      .dropDuplicatesWithinWatermark("text_hash", "text_len")
    val failures = extracted
      .where(col("text").isNull)
      .withColumn("text_hash", lit(null).cast("long"))
      .withColumn("text_len", lit(null).cast("int"))
    deduped.unionByName(failures)
      .writeStream
      .option("checkpointLocation", s"$outDir/checkpoint")
      .option("path", s"$outDir/deduped")
      .trigger(Trigger.AvailableNow())
      .format("parquet")
      .start()
  }

  /** windowed ingest metrics with a watermark on warc_ts (docs/bytes per
    * 1-minute event-time window). */
  def metricsStream(spark: SparkSession, pagesDir: String): DataFrame = {
    val schema = pageSchema
    spark.readStream
      .schema(schema)
      .parquet(pagesDir)
      .withWatermark("warc_ts", "10 minutes")
      .groupBy(window(col("warc_ts"), "1 minute"))
      .agg(count(lit(1)).as("doc_count"), sum(octet_length(col("html"))).as("byte_count"))
  }
}
