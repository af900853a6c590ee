package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.GraftSession
import graft.operators.ScaleOps

class ScaleOpsSpec extends AnyFunSuite with AdaptiveSparkPlanHelper {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("saltedJoin equals the plain join on skewed data") {
    // 90% of rows share one hot key — the classic straggler shape
    val skewed = (1 to 2000).map(i => (if (i % 10 == 0) i.toLong % 50 else 7L, i))
      .toDF("k", "v")
    val dim = (0L to 49L).map(k => (k, s"dim_$k")).toDF("dk", "name")
    val plain = skewed.join(dim, col("k") === col("dk"))
      .select("k", "v", "name")
    val salted = ScaleOps.saltedJoin(skewed, dim, "k", "dk", saltFactor = 8)
      .select("k", "v", "name")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("saltedJoin rejects a non-positive salt factor instead of returning empty") {
    val skewed = Seq((1L, 1)).toDF("k", "v")
    val dim = Seq((1L, "d")).toDF("dk", "name")
    intercept[IllegalArgumentException](ScaleOps.saltedJoin(skewed, dim, "k", "dk", 0))
  }

  test("saltedJoin tolerates map columns (xxhash64 rejects MapType) and stays correct") {
    val skewed = Seq((1L, 1), (1L, 2), (2L, 3)).toDF("k", "v")
      .withColumn("props", map(lit("a"), col("v")))
    val dim = Seq((1L, "d1"), (2L, "d2")).toDF("dk", "name")
    val plain = skewed.join(dim, col("k") === col("dk")).select("k", "v", "name")
    val salted = ScaleOps.saltedJoin(skewed, dim, "k", "dk", 4).select("k", "v", "name")
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("bucketed tables join without a shuffle") {
    val c = GraftSession.table(spark, TestSpark.sfDir, "customer")
    val o = GraftSession.table(spark, TestSpark.sfDir, "orders")
    ScaleOps.writeBucketed(c, "b_customer", "c_custkey", 8)
    ScaleOps.writeBucketed(o.withColumnRenamed("o_custkey", "b_custkey"), "b_orders", "b_custkey", 8)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_customer")
        .join(spark.table("b_orders"), col("c_custkey") === col("b_custkey"))
      joined.collect()
      val shuffles = collect(joined.queryExecution.executedPlan) {
        case s: ShuffleExchangeExec => s
      }
      assert(shuffles.isEmpty, s"bucketed join must not shuffle, found ${shuffles.size}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("partitioned layout prunes partitions on the filter") {
    val o = GraftSession.table(spark, TestSpark.sfDir, "orders")
    val path = "/tmp/graft-part-orders"
    ScaleOps.writePartitioned(o, path, "o_orderstatus")
    val read = spark.read.parquet(path).filter(col("o_orderstatus") === "F")
    read.collect()
    val scan = read.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(o_orderstatus"), scan)
    assert(read.count() == o.filter(col("o_orderstatus") === "F").count())
  }
}
