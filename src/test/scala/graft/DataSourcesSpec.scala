package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.GraftSession
import graft.sources.DataSources

class DataSourcesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("round-trips every supported format") {
    val src = GraftSession.table(spark, TestSpark.sfDir, "nation")
    DataSources.formats.foreach { fmt =>
      val path = s"/tmp/graft-ds-roundtrip-$fmt"
      DataSources.write(src, path, fmt, mode = "overwrite")
      val back = DataSources.read(spark, path, fmt, Some(src.schema))
      assert(back.count() == 25, fmt)
      val sums = back.agg(sum(col("n_nationkey"))).collect()(0).getLong(0)
      assert(sums == (0 to 24).sum, fmt)
    }
  }
}
