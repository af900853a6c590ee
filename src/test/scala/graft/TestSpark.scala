package graft

import org.apache.spark.sql.SparkSession

/** One shared local SparkSession for all suites. */
object TestSpark {
  lazy val spark: SparkSession = graft.engine.GraftSession.build(4, "graft-test")
  val sfDir = "/root/testdata/sf0.001"

  /** The driver's oracle-scale dataset (overridable; absent on machines
    * without the generated testdata — suites `assume` on [[hasOracleSf]]
    * and skip with a clear message rather than fail).
    */
  val oracleSfDir: String =
    sys.env.getOrElse("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
  def hasOracleSf: Boolean = new java.io.File(oracleSfDir).isDirectory
}
