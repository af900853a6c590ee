package graft

import org.apache.spark.sql.SparkSession

/** One shared local SparkSession for all suites. */
object TestSpark {
  lazy val spark: SparkSession = graft.engine.GraftSession.build(4, "graft-test")
  val sfDir = "/root/testdata/sf0.001"
}
