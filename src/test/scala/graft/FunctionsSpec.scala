package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{DotProductExpr, RollingMinHashExpr}

class FunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("DotProductExpr computes the exact dot product") {
    val df = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0))).toDF("a", "b")
    val v = df.select(DotProductExpr.dotProduct(col("a"), col("b"))).collect()(0).getDouble(0)
    assert(v == 32.0)
  }

  test("DotProductExpr survives both codegen and interpreted paths") {
    val df = Seq.tabulate(100)(i => (Array.fill(8)(i.toDouble), Array.fill(8)(2.0)))
      .toDF("a", "b")
    val got = df.select(DotProductExpr.dotProduct(col("a"), col("b")).as("d"))
      .agg(sum(col("d"))).collect()(0).getDouble(0)
    assert(got == (0 until 100).map(i => i * 2.0 * 8).sum)
  }

  test("rolling min-hash: deterministic, content-sensitive") {
    val df = Seq((1L, "the quick brown fox"), (2L, "the quick brown fox"), (3L, "a different text"))
      .toDF("id", "text")
    val fps = df.select(RollingMinHashExpr.rollingMinHash(col("text"), 8))
      .collect().map(_.getLong(0))
    assert(fps(0) == fps(1) && fps(0) != fps(2))
  }

  test("rolling min-hash: shared long chunk gives shared fingerprint") {
    val common = "spark catalyst tungsten adaptive execution columnar parquet shuffle " * 3
    val df = Seq((1L, common + " tail one"), (2L, "head two " + common)).toDF("id", "text")
    val fps = df.select(RollingMinHashExpr.rollingMinHash(col("text"), 16))
      .collect().map(_.getLong(0))
    assert(fps(0) == fps(1)) // min window falls inside the shared chunk
  }

  test("native expressions are callable from SQL after registration") {
    graft.engine.GraftSession.registerFunctions(spark)
    Seq((1L, "the quick brown fox", Array(1.0, 2.0), Array(3.0, 4.0)))
      .toDF("id", "text", "a", "b").createOrReplaceTempView("fn_probe")
    val r = spark.sql(
      """SELECT rolling_minhash(text, 8) AS rh, dot_product(a, b) AS dp,
                size(minhash_signature(array(xxhash64(text)), 16)) AS sig_len
         FROM fn_probe""").collect()(0)
    assert(r.getDouble(1) == 11.0 && r.getInt(2) == 16)
  }

  test("rolling min-hash: short and empty inputs do not fail") {
    val df = Seq((1L, ""), (2L, "ab")).toDF("id", "text")
    val fps = df.select(RollingMinHashExpr.rollingMinHash(col("text"), 16)).collect()
    assert(fps.length == 2)
  }
}
