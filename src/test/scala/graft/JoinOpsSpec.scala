package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.GraftSession
import graft.operators.JoinOps

class JoinOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def customer = GraftSession.table(spark, TestSpark.sfDir, "customer")
  private def orders = GraftSession.table(spark, TestSpark.sfDir, "orders")

  test("rightAnti equals NOT EXISTS semantics") {
    val c = customer.filter(col("c_custkey") <= 50L)
    val o = orders
    val got = JoinOps.rightAnti(c, o, c("c_custkey") === o("o_custkey"))
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    GraftSession.registerAll(spark, TestSpark.sfDir)
    val want = spark.sql(
      """SELECT o_orderkey FROM orders o WHERE NOT EXISTS
        (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey AND c.c_custkey <= 50)""")
      .collect().map(_.getLong(0)).toSet
    assert(got == want && got.nonEmpty)
  }

  test("fullOuterAnti equals full-join-then-null-filter") {
    val c = customer.filter(col("c_custkey") <= 100L).select("c_custkey", "c_name")
    val o = orders.filter(col("o_totalprice") > 480000.0).select("o_orderkey", "o_custkey")
    val got = JoinOps.fullOuterAnti(c, o, c("c_custkey") === o("o_custkey"))
    val full = c.join(o, c("c_custkey") === o("o_custkey"), "full")
      .filter(c("c_custkey").isNull || o("o_custkey").isNull)
      .select("c_custkey", "c_name", "o_orderkey", "o_custkey")
    assert(got.count() == full.count() && got.count() > 0)
    assert(got.exceptAll(full).isEmpty && full.exceptAll(got).isEmpty)
  }

  test("fullOuterAnti never contains matched rows") {
    val c = customer.select("c_custkey", "c_name")
    val o = orders.select("o_orderkey", "o_custkey")
    val matched = JoinOps.fullOuterAnti(c, o, c("c_custkey") === o("o_custkey"))
      .filter(col("c_custkey").isNotNull && col("o_custkey").isNotNull)
    assert(matched.count() == 0)
  }
}
