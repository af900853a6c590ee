package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val docs = Seq((1L, "abcdefghij"), (2L, "xy"), (3L, "")).toDF("doc_id", "text")

  test("attachBinary round-trips the payload bytes with metadata") {
    val rows = Multimodal.attachBinary(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> new String(r.getAs[Array[Byte]](1), "UTF-8")).toMap
    assert(rows(1L) == "abcdefghij" && rows(3L) == "")
  }

  test("decodeStub extracts deterministic byte features") {
    val feats = Multimodal.featurize(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(feats(1L) == 10 && feats(2L) == 2 && feats(3L) == 0)
  }

  test("featurize carries metadata through the decode pass: one scan, zero joins") {
    val feats = Multimodal.featurize(docs, "doc_id", "text")
    assert(!feats.queryExecution.executedPlan.toString.contains("Join"),
      "featurize must not join back for metadata")
    val r1 = feats.filter(col("doc_id") === 1L).collect().head
    assert(r1.getInt(4) == 2 && r1.getInt(5) == 2) // width = 1%640+1, height = 1%480+1
  }

  test("resizeStub caps metadata at the target and thins the payload") {
    val out = Multimodal.resizeStub(
        Multimodal.attachBinary(docs, "doc_id", "text"), 2, 2)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Array[Byte]](1).length, r.getInt(2), r.getInt(3))).toMap
    val (len1, w1, h1) = out(1L)
    assert(w1 <= 2 && h1 <= 2 && len1 >= 1 && len1 <= 10)
    assert(out(3L)._1 == 0) // empty payload: take(1) of nothing stays empty
  }

  test("frameSample slices fixed-stride frames and keeps every Nth") {
    val frames = Multimodal.frameSample(
        Multimodal.attachBinary(docs, "doc_id", "text"), 4, 2)
      .collect().map(r => (r.getLong(0), r.getInt(1),
        new String(r.getAs[Array[Byte]](3), "UTF-8")))
    // doc 1: 10 bytes -> frames 0,1,2 (4,4,2 bytes); keep 0 and 2
    assert(frames.toSet == Set((1L, 0, "abcd"), (1L, 2, "ij"), (2L, 0, "xy")))
  }

  test("frameSample rejects non-positive stride/step instead of returning empty") {
    val wb = Multimodal.attachBinary(docs, "doc_id", "text")
    // frameBytes = 0: length/0 -> Infinity -> int cast wraps negative ->
    // every row filtered; everyN = 0: pmod NULL filters every row — both
    // must fail loudly, not produce a silent zero-frame result
    intercept[IllegalArgumentException](Multimodal.frameSample(wb, 0, 2))
    intercept[IllegalArgumentException](Multimodal.frameSample(wb, 4, 0))
  }

  test("attachBinary normalizes an int id to the long the decode schema declares") {
    val intId = Seq((1, "abc"), (2, "de")).toDF("doc_id", "text")
    val feats = Multimodal.featurize(intId, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(feats == Map(1L -> 3, 2L -> 2))
  }
}
