package graft.tools

import graft.SparkEntry
import graft.engine.GraftSession

/** Dev tool: print the formatted physical plan and row count for one
  * SparkEntry query — the `.explain` audit loop SURVEY.md §7 calls for.
  *
  * Usage: runMain graft.tools.Explain <queryName> [sfDir] [--count]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1 && !args(1).startsWith("--")) args(1)
      else "/root/testdata/sf0.01"
    val spark = GraftSession.build(graft.engine.GraftSession.envCpus(16), "graft-explain")
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.explain("formatted")
    if (args.contains("--count")) {
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"[explain] $name: $n rows in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
