package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Scale audit: for every SparkEntry query, count the wide exchanges in the
  * EXECUTED plan (post-AQE) and print each shuffle's partitioning key — the
  * inventory behind the 100-TB story (a query is scale-safe when every
  * exchange is keyed by a bounded-width hash and its input is
  * pre-aggregated or capped). */
object ShuffleAudit {
  private def collectExchanges(p: SparkPlan): (Seq[String], Int) = {
    var shuffles = Vector.empty[String]
    var broadcasts = 0
    def rec(n: SparkPlan): Unit = {
      n match {
        case a: AdaptiveSparkPlanExec => rec(a.executedPlan)
        case s: ShuffleExchangeExec =>
          shuffles :+= s.outputPartitioning.toString.take(100)
        case _: BroadcastExchangeExec => broadcasts += 1
        case _ =>
      }
      n.children.foreach(rec)
      n.subqueries.foreach(rec)
    }
    rec(p)
    (shuffles, broadcasts)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.spark.GraftSparkExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        df.write.format("noop").mode("overwrite").save() // finalize AQE
        val (shuffles, bcasts) = collectExchanges(df.queryExecution.executedPlan)
        println(s"$name shuffles=${shuffles.size} broadcasts=$bcasts")
        shuffles.zipWithIndex.foreach { case (s, i) => println(s"  [$i] $s") }
      } catch {
        case e: Throwable => println(s"$name ERROR ${e.getMessage.take(80)}")
      }
    }
    spark.stop()
  }
}
