package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.spark.Extractor

/** Diagnostic: separate parquet-scan cost from engine cost at 8 vs 32 cores. */
object ScanBench {
  def session(cpus: Int): SparkSession = {
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.spark.GraftSparkExtensions")
      .config("spark.sql.files.maxPartitionBytes", (8 * 1024 * 1024).toString)
      .getOrCreate()
  }

  def t(f: => Unit): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
  def force(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val pagesPath = "/tmp/graft-bench/pages"
    for (cpus <- Seq(8, 32)) {
      val spark = session(cpus)
      import spark.implicits._
      val pages = spark.read.parquet(pagesPath)
      val scanOnly = pages.select(col("url"), octet_length(col("html")).as("n"))
      val exprJob = pages.select(col("url"), call_function("extract_main", col("html")).as("t"))
      val typedJob = pages.select(col("url"), col("html")).as[(String, Array[Byte])]
        .mapPartitions(it => it.map { case (u, h) =>
          (u, Extractor.extractMain(h, Extractor.Recipe.default))
        }).toDF("url", "t")
      force(scanOnly); force(exprJob); force(typedJob) // warmup
      def best(df: DataFrame): Double = Seq.fill(3)(t(force(df))).min
      println(f"cpus=$cpus scan=${best(scanOnly)}%.2f expr=${best(exprJob)}%.2f typed=${best(typedJob)}%.2f")
      spark.stop()
    }
  }
}
