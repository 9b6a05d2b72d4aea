package graft
import org.apache.spark.sql.functions._
object ScanBench32 {
  def main(args: Array[String]): Unit = {
    val spark = ScanBench.session(32)
    val pages = spark.read.parquet("/tmp/graft-bench/pages")
    val job = pages.select(col("url"), call_function("extract_main", col("html")).as("t"))
    ScanBench.force(job)
    for (i <- 1 to sys.props.getOrElse("loop", "5").toInt)
      println(f"iter=$i sec=${ScanBench.t(ScanBench.force(job))}%.2f")
    spark.stop()
  }
}
