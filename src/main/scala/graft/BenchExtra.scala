package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Round-7 optimization harness (guide §1.4/§1.5): per-query noop-sink
  * timing PLUS scheduling-shape evidence — the number of Spark jobs,
  * stages and tasks one run of the query submits. The gate corpora are
  * tiny (5k docs at sf0.1), so most heavy rows are dominated by fixed
  * job-submission overhead, not data; job count is therefore the
  * before/after witness that matters for the lifecycle/iterative rows.
  *
  * Separate main so `graft.Bench` (frozen driver contract) is untouched.
  * Usage: runMain graft.BenchExtra q_a,q_b [sfDir] [reps]
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-extra")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.spark.GraftSparkExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = { stages.incrementAndGet(); () }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = { tasks.incrementAndGet(); () }
    })
    try {
      names.foreach { name =>
        val fn = SparkEntry.queries(name)
        spark.sparkContext.setJobDescription(s"bench-extra: $name")
        def once(): Double = {
          val t0 = System.nanoTime()
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        once() // warmup (codegen, file listing, fixture materialization)
        val ts = Seq.fill(math.max(0, reps - 1))(once())
        // counted run last: steady state
        jobs.set(0); stages.set(0); tasks.set(0L)
        val tN = once()
        // listener events drain asynchronously; settle before reading
        Thread.sleep(300)
        val all = ts :+ tN
        val med = all.sorted.apply(all.length / 2)
        println(f"$name%s: median=$med%.3f s trials=${all.map(t => f"$t%.3f").mkString(",")}%s " +
          f"jobs=${jobs.get()}%d stages=${stages.get()}%d tasks=${tasks.get()}%d")
        spark.sparkContext.setJobDescription(null)
      }
    } finally spark.stop()
  }
}
