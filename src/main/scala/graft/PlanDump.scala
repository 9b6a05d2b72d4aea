package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dump `.explain("formatted")` for named `SparkEntry.queries` entries to
  * `plans/r07/<query>_<tag>.txt` — the round-7 before/after plan evidence.
  * Imperative lifecycle rows (q_ann_append_idx / q_ann_compact_idx) run
  * their side effects during query construction and return a driver-local
  * relation; their files carry that local-relation plan plus a note — the
  * scheduling evidence for them is BenchExtra's job/stage/task counts.
  *
  * Usage: runMain graft.PlanDump <tag> q_a,q_b [sfDir] [outDir]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val tag = args(0)
    val names = args(1).split(",").toSeq
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val outDir = if (args.length > 3) args(3) else "plans/r07"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-plan-dump")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.spark.GraftSparkExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    try {
      names.foreach { name =>
        val fn = SparkEntry.queries(name)
        val df = fn(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(s"$outDir/${name}_$tag.txt"), plan)
        println(s"wrote $outDir/${name}_$tag.txt (${plan.length} chars)")
      }
    } finally spark.stop()
  }
}
