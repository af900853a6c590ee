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

  test("fullOuterAnti keeps values of a SHARED join-key column name (suffixes right as _r)") {
    import spark.implicits._
    val l = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
    val r = Seq((2L, 9.0), (3L, 7.0)).toDF("id", "score")
    val got = JoinOps.fullOuterAnti(l, r, l("id") === r("id"))
    assert(got.columns.toSeq == Seq("id", "name", "id_r", "score"))
    val rows = got.collect().map(x => (Option(x.get(0)), Option(x.get(2)))).toSet
    // left-only row 1 keeps its real id; right-only row 3 keeps its real id_r
    assert(rows == Set((Some(1L), None), (None, Some(3L))), rows)
  }

  test("fullOuterAnti rename target collision: left already owns <name>_r") {
    import spark.implicits._
    val l = Seq((1L, "x")).toDF("id", "id_r") // pathological: left has id AND id_r
    val r = Seq((2L, 9.0)).toDF("id", "score")
    val got = JoinOps.fullOuterAnti(l, r, l("id") === r("id"))
    assert(got.columns.distinct.length == got.columns.length,
      s"duplicate output columns: ${got.columns.toSeq}")
    assert(got.columns.contains("id_r_r"), got.columns.toSeq)
    assert(got.count() == 2)
  }

  test("fullOuterAnti rename targets stay unique when BOTH sides share id and id_r") {
    import spark.implicits._
    val l = Seq((1L, "x")).toDF("id", "id_r")
    val r = Seq((2L, "y")).toDF("id", "id_r") // both right columns collide
    val got = JoinOps.fullOuterAnti(l, r, l("id") === r("id"))
    assert(got.columns.distinct.length == got.columns.length,
      s"duplicate output columns: ${got.columns.toSeq}")
    assert(got.count() == 2)
  }
}
