package graft.tools

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.CartesianProductExec

import graft.SparkEntry
import graft.engine.GraftSession

/** Plan audit over every SparkEntry query: execute, then report shuffle /
  * broadcast / cartesian counts from the final (AQE) plan — the smell test
  * for "would this survive a 100× scale-up".
  *
  * Usage: runMain graft.tools.PlanAudit [sfDir]
  */
object PlanAudit extends AdaptiveSparkPlanHelper {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt, "plan-audit")
    println(f"${"query"}%-28s shuffles bcasts cartesian rows")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val n = df.count()
        val plan = df.queryExecution.executedPlan
        val shuffles = collect(plan) { case s: ShuffleExchangeExec => s }.size
        val bcasts = collect(plan) { case b: BroadcastExchangeExec => b }.size
        val cart = collect(plan) { case c: CartesianProductExec => c }.size
        val flag = if (cart > 0) "  <-- CARTESIAN" else ""
        println(f"$name%-28s $shuffles%8d $bcasts%6d $cart%9d $n%7d$flag")
      } catch { case e: Throwable => println(f"$name%-28s FAILED: ${e.getMessage.take(60)}") }
    }
    spark.stop()
  }
}
