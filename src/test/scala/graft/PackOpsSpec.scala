package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{PackOps, SampleOps}

class PackOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val docs = Seq.tabulate(300)(i =>
    (i.toLong, if (i % 50 == 7) null else Seq.fill(i % 13 + 1)(s"w$i").mkString(" ")))
    .toDF("doc_id", "text")

  test("packed layout is sound: running offsets, budget-bounded start, integral math") {
    val budget = 16
    val rows = PackOps.packSequences(docs, "doc_id", "text", budget, shards = 4)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getInt(4)))
    assert(rows.length == 300, "every doc (incl. NULL text) keeps its slot")
    // recompute the layout per shard in the driver and compare exactly
    rows.groupBy(_._2).foreach { case (_, shard) =>
      // the op orders by (xxhash64(id), id); rebuilding the offset chain in
      // emitted (seq_no*budget + seq_offset) order must reproduce itself.
      // Zero-length docs share their successor's position — sort them first
      // at equal offsets so the cum chain stays well-defined
      val inOrder = shard.sortBy { case (_, _, seqNo, off, n) => (seqNo, off, n) }
      var cum = 0L
      inOrder.foreach { case (id, _, seqNo, off, n) =>
        assert(seqNo == cum / budget && off == cum % budget,
          s"doc $id expected cum=$cum, got seq=$seqNo off=$off")
        assert(off < budget)
        cum += n
      }
    }
    // NULL-text docs pack as zero-length, not dropped
    assert(rows.filter(_._1 % 50 == 7).forall(_._5 == 0))
  }

  test("deterministic under repartitioning, for both hash families") {
    def layout(df: org.apache.spark.sql.DataFrame,
        oh: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
      PackOps.packSequences(df, "doc_id", "text", 32, shards = 4, orderHash = oh)
        .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2), r.getLong(3))).toMap
    Seq[org.apache.spark.sql.Column => org.apache.spark.sql.Column](
      org.apache.spark.sql.functions.xxhash64(_), SampleOps.md5OrderHash).foreach { oh =>
      assert(layout(docs, oh) == layout(docs.repartition(7), oh))
    }
  }

  test("rejects non-positive budget/shards at analysis time") {
    intercept[IllegalArgumentException](PackOps.packSequences(docs, "doc_id", "text", 0))
    intercept[IllegalArgumentException](
      PackOps.packSequences(docs, "doc_id", "text", 16, shards = 0))
  }
}
