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

  test("snapshotDiff: identical snapshots diff to empty") {
    val a = Seq((1L, "x"), (2L, "y")).toDF("doc_id", "text")
    assert(VersionOps.snapshotDiff(a, a, "doc_id", "text").count() == 0)
  }
}
