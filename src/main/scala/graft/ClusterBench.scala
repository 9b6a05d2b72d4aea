package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-executor scaling probe: `local-cluster[N, cores, mem]` launches N
  * separate executor JVMs — the honest sandbox stand-in for "N vs 4N
  * executors via spark-submit" (isolated heaps and GC, shuffle over real
  * block transfers). */
object ClusterBench {
  def session(executors: Int, coresPerExec: Int): SparkSession = {
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master(s"local-cluster[$executors,$coresPerExec,4096]")
      .config("spark.executor.memory", "3g")
      .config("spark.executor.extraJavaOptions", "-XX:+UseParallelGC")
      .config("spark.jars", sys.props.getOrElse("graft.jar",
        "target/scala-2.13/visdomspark_2.13-0.1.0.jar"))
      .config("spark.sql.shuffle.partitions", executors * coresPerExec)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.spark.GraftSparkExtensions")
      .config("spark.sql.files.maxPartitionBytes", (8 * 1024 * 1024).toString)
      .config("spark.sql.files.openCostInBytes", (1024 * 1024).toString)
      .getOrCreate()
  }

  def t(f: => Unit): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
  def force(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    // the local-cluster worker builds executor commands from the Spark dist
    sys.props("spark.test.home") = sys.env.getOrElse("SPARK_HOME", "/opt/spark")
    val pagesPath = "/tmp/graft-bench/pages"
    for (execs <- sys.env.getOrElse("GRAFT_EXECS", "2,4,8").split(",").map(_.trim.toInt).toSeq) {
      val spark = session(execs, 4)
      try {
        val pages = spark.read.parquet(pagesPath)
        val job = pages.select(col("url"), call_function("extract_main", col("html")).as("t"))
        force(job) // warmup: JIT in executor JVMs
        val sec = Seq.fill(2)(t(force(job))).min
        println(f"executors=$execs cores=${execs * 4} sec=$sec%.2f")
      } finally spark.stop()
    }
  }
}
