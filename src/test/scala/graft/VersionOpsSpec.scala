package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.VersionOps

class VersionOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("snapshotDiff: added/removed/changed; unchanged (incl. both-NULL) suppressed") {
    val a = Seq(
      (1L, "same text"),
      (2L, "old text"),                 // edited in b
      (3L, "gone"),                     // removed in b
      (4L, null.asInstanceOf[String]),  // NULL in both -> unchanged
      (5L, "becomes null"))             // NULL-vs-text flip -> changed
      .toDF("doc_id", "text")
    val b = Seq(
      (1L, "SAME   text"),              // fingerprint-identical -> unchanged
      (2L, "new text"),
      (4L, null.asInstanceOf[String]),
      (5L, null.asInstanceOf[String]),
      (6L, "brand new"))                // added
      .toDF("doc_id", "text")
    val got = VersionOps.snapshotDiff(a, b, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(got.toSeq == Seq((2L, "changed"), (3L, "removed"),
      (5L, "changed"), (6L, "added")), got.toSeq)
  }

  test("scd2History: run-collapse, null-safe changes, tie order, intervals chain gap-free, last version current") {
    import spark.implicits._
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    def L(x: Long): java.lang.Long = java.lang.Long.valueOf(x)
    val rows = Seq[(java.lang.Long, java.sql.Timestamp, Long, String)](
      // user 1: A A B B A — runs collapse to A, B, A
      (L(1), ts(10), 1L, "A"), (L(1), ts(20), 2L, "A"), (L(1), ts(30), 3L, "B"),
      (L(1), ts(40), 4L, "B"), (L(1), ts(50), 5L, "A"),
      // user 2: NULL NULL C NULL — NULL is a value; flips are versions
      (L(2), ts(10), 6L, null), (L(2), ts(20), 7L, null),
      (L(2), ts(30), 8L, "C"), (L(2), ts(40), 9L, null),
      // user 3: equal-timestamp tie decided by event_id (D then E)
      (L(3), ts(10), 11L, "D"), (L(3), ts(10), 12L, "E"),
      // dropped: NULL key / NULL ts
      (null, ts(10), 13L, "X"),
      (L(4), null, 14L, "X"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = graft.operators.VersionOps
      .scd2History(rows, "user_id", "ts", "event_id", "event_type")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1),
        r.getLong(2), if (r.isNullAt(3)) None else Some(r.getLong(3)),
        r.getBoolean(4)))
      .sortBy(v => (v._1, v._3))
    def us(sec: Long) = sec * 1000000L
    assert(got.filter(_._1 == 1L).toSeq == Seq(
      (1L, "A", us(10), Some(us(30)), false),
      (1L, "B", us(30), Some(us(50)), false),
      (1L, "A", us(50), None, true)))
    assert(got.filter(_._1 == 2L).toSeq == Seq(
      (2L, null, us(10), Some(us(30)), false),
      (2L, "C", us(30), Some(us(40)), false),
      (2L, null, us(40), None, true)))
    assert(got.filter(_._1 == 3L).toSeq == Seq(
      (3L, "D", us(10), Some(us(10)), false),
      (3L, "E", us(10), None, true)))
    assert(!got.exists(v => v._1 == 4L), "NULL ts row must be dropped")
    // intervals chain gap-free per key: each valid_to equals the next
    // valid_from, exactly one current version per key
    got.groupBy(_._1).foreach { case (k, vs) =>
      vs.sliding(2).foreach {
        case Array(a, b) => assert(a._4.contains(b._3), s"key $k gap: $a -> $b")
        case _ => ()
      }
      assert(vs.count(_._5) == 1 && vs.last._5, s"key $k current-flag discipline")
    }
  }

  test("snapshotDiff: identical snapshots diff to empty") {
    val a = Seq((1L, "x"), (2L, "y")).toDF("doc_id", "text")
    assert(VersionOps.snapshotDiff(a, a, "doc_id", "text").count() == 0)
  }
}
