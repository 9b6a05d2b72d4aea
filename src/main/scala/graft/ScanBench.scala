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
      // generic selector expr over the BINARY column: must ride the same
      // byte-native parseBytes path as extract_main (round-3 fix) — within
      // ~10% of extract_main's rate, not a UTF-16 round trip behind it
      val textExprJob = pages.select(col("url"),
        call_function("extract_text", col("html"), lit("main,article,body")).as("t"))
      // encoding-isolated control: SAME selector work over the UTF-16 path
      // (cast to string -> String parse) — the delta binary-vs-string is the
      // round-trip cost the round-3 fix removed; the remaining delta vs
      // extract_main is the general selector engine vs the fused strip walk
      val textExprStrJob = pages.select(col("url"),
        call_function("extract_text", col("html").cast("string"), lit("main,article,body")).as("t"))
      val typedJob = pages.select(col("url"), col("html")).as[(String, Array[Byte])]
        .mapPartitions(it => it.map { case (u, h) =>
          (u, Extractor.extractMain(h, Extractor.Recipe.default))
        }).toDF("url", "t")
      force(scanOnly); force(exprJob); force(textExprJob); force(textExprStrJob); force(typedJob) // warmup
      def best(df: DataFrame): Double = Seq.fill(3)(t(force(df))).min
      println(f"cpus=$cpus scan=${best(scanOnly)}%.2f expr=${best(exprJob)}%.2f " +
        f"text_expr_binary=${best(textExprJob)}%.2f text_expr_string=${best(textExprStrJob)}%.2f " +
        f"typed=${best(typedJob)}%.2f")
      spark.stop()
    }
  }
}
