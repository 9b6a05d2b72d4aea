package graft

import org.apache.spark.sql.SparkSession

/** Dev harness: time individual `SparkEntry.queries` entries without the
  * full Bench protocol. `runMain graft.QueryBench q_a,q_b [sfDir] [reps]`
  * — one warmup then `reps` timed runs per query, prints each trial and
  * the median. Parallelism via SPARK_GRAFT_CPUS (default 8). */
object QueryBench {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-query-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.spark.GraftSparkExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      names.foreach { name =>
        val fn = SparkEntry.queries(name)
        def once(): Double = {
          val t0 = System.nanoTime()
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        once() // warmup
        val ts = Seq.fill(reps)(once())
        val med = ts.sorted.apply(ts.length / 2)
        println(f"$name%s: median=$med%.3f s  trials=${ts.map(t => f"$t%.3f").mkString(",")}%s")
      }
    } finally spark.stop()
  }
}
