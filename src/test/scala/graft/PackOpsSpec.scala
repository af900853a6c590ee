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
    intercept[IllegalArgumentException](
      PackOps.materializeSequences(docs, "doc_id", "text", 0))
    intercept[IllegalArgumentException](
      PackOps.materializeSequences(docs, "doc_id", "text", 16, shards = 0))
  }

  test("chunkDocuments: exact overlapping windows, tail covered, short docs whole") {
    import org.apache.spark.sql.functions.col
    val doc = (1 to 10).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, doc), (2L, "a b c"), (3L, null.asInstanceOf[String]), (4L, " "))
      .toDF("doc_id", "text")
    val got = PackOps.chunkDocuments(df, "doc_id", "text", maxTokens = 4, overlap = 1)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> ((r.getString(2), r.getInt(3))))
      .toMap
    // stride 3: chunks at 0,3,6 — the last window reaches token 10
    assert(got == Map(
      (1L, 0) -> (("w1 w2 w3 w4", 4)),
      (1L, 1) -> (("w4 w5 w6 w7", 4)),
      (1L, 2) -> (("w7 w8 w9 w10", 4)),
      (2L, 0) -> (("a b c", 3))), got) // docs 3/4: nothing
    // reconstruction: chunk 0 + each later chunk minus its overlap prefix
    val parts = got.collect { case ((1L, k), (txt, _)) => k -> txt.split(" ").toSeq }
      .toSeq.sortBy(_._1).map { case (k, ws) => if (k == 0) ws else ws.drop(1) }
    assert(parts.flatten == (1 to 10).map(i => s"w$i"))
    intercept[IllegalArgumentException](
      PackOps.chunkDocuments(df, "doc_id", "text", maxTokens = 4, overlap = 4))
    intercept[IllegalArgumentException](
      PackOps.chunkDocuments(df, "doc_id", "text", maxTokens = 0))
  }

  test("chunkDocuments property: random docs/params reconstruct and respect window bounds") {
    val rnd = new scala.util.Random(31)
    (0 until 3).foreach { trial =>
      val maxTokens = 2 + rnd.nextInt(12)
      val overlap = rnd.nextInt(maxTokens)
      val stride = maxTokens - overlap
      val docsR = (0 until 40).map(i => (i.toLong,
        (1 to (1 + rnd.nextInt(60))).map(j => s"t$j").mkString(" ")))
      val df = docsR.toDF("doc_id", "text")
      val chunks = PackOps.chunkDocuments(df, "doc_id", "text", maxTokens, overlap)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
        .groupBy(_._1)
      docsR.foreach { case (id, text) =>
        val toks = text.split(" ").toSeq
        val cs = chunks(id).sortBy(_._2)
        // chunk ids dense from 0; every chunk holds its exact token window
        assert(cs.map(_._2).sameElements(cs.indices))
        cs.foreach { case (_, k, txt, n) =>
          val want = toks.slice(k * stride, k * stride + maxTokens)
          assert(txt.split(" ").toSeq == want && n == want.size,
            s"trial=$trial doc=$id chunk=$k")
        }
        // last chunk reaches the end; no chunk fully inside its predecessor
        assert(cs.last._2 * stride + maxTokens >= toks.size)
        assert(cs.forall { case (_, k, _, _) => k == 0 || k * stride < toks.size })
      }
    }
  }

  test("materializeSequences on an all-NULL/empty-text corpus: no sequences, no failure") {
    val degenerate = Seq((1L, null.asInstanceOf[String]), (2L, "   "), (3L, ""))
      .toDF("doc_id", "text")
    assert(PackOps.materializeSequences(degenerate, "doc_id", "text", 16).count() == 0)
  }

  test("materialized sequences reconstruct each shard's exact token stream") {
    val budget = 16
    val seqs = PackOps.materializeSequences(docs, "doc_id", "text", budget, shards = 4)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    // 1. each sequence's text carries exactly seq_len tokens
    seqs.foreach { case (sh, sq, _, len, text) =>
      assert(text.split(" ").count(_.nonEmpty) == len, s"seq ($sh,$sq) len mismatch")
    }
    // 2. within a shard: seq_nos are 0..max with no gaps, all full except
    //    possibly the last
    seqs.groupBy(_._1).foreach { case (sh, ss) =>
      val byNo = ss.sortBy(_._2)
      assert(byNo.map(_._2).sameElements(byNo.indices.map(_.toLong)), s"shard $sh gaps")
      byNo.dropRight(1).foreach { case (_, sq, _, len, _) =>
        assert(len == budget, s"shard $sh seq $sq not full: $len") }
    }
    // 3. concatenating a shard's sequences in order reproduces the shard's
    //    token stream in (xxhash64(id), id) doc order — the layout contract
    val expected = docs.na.drop(Seq("text"))
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"),
        org.apache.spark.sql.functions.xxhash64(org.apache.spark.sql.functions.col("doc_id")).as("oh"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .groupBy { case (_, _, oh) => java.lang.Math.floorMod(oh, 4L).toInt }
      .view.mapValues(_.sortBy { case (id, _, oh) => (oh, id) }
        .flatMap(_._2.split(" ").filter(_.nonEmpty)).mkString(" ")).toMap
    seqs.groupBy(_._1).foreach { case (sh, ss) =>
      val got = ss.sortBy(_._2).map(_._5).mkString(" ")
      assert(got == expected(sh), s"shard $sh stream mismatch")
    }
    // 4. cross-check against the planned layout: total tokens agree
    val planned = PackOps.packSequences(docs, "doc_id", "text", budget, shards = 4)
      .agg(org.apache.spark.sql.functions.sum("n_tokens")).head.getLong(0)
    assert(seqs.map(_._4).sum == planned)
  }

  test("packManifest: shard totals match the layout, seq count and utilization exact") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = (Seq.tabulate(40)(i => (i.toLong, ("tok " * (i % 7 + 1)).trim)) :+
      (1000L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val m = PackOps.packManifest(docs, "doc_id", "text", tokenBudget = 10, shards = 4)
      .collect().map(r => r.getInt(0) -> r).toMap
    // totals agree with the windowed layout's per-shard sums
    val layout = PackOps.packSequences(docs, "doc_id", "text", 10, shards = 4)
      .groupBy("shard").agg(count(lit(1)).as("nd"), sum("n_tokens").as("nt"))
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(m.keySet == layout.keySet)
    m.foreach { case (sh, r) =>
      val (nd, nt) = layout(sh)
      assert(r.getLong(1) == nd && r.getLong(2) == nt, s"shard $sh: $r vs $layout")
      val nSeqs = (nt + 9) / 10
      assert(r.getLong(3) == nSeqs, r.toString)
      assert(r.getDouble(4) == nt.toDouble / (nSeqs * 10), r.toString)
    }
  }

  test("epochSchedule: each epoch covers every unit once, orders vary by epoch, repartition-stable") {
    val packed = (for (sh <- 0 until 3; sq <- 0L until 10L) yield (sh, sq))
      .toDF("shard", "seq_no")
    val got = PackOps.epochSchedule(packed, "shard", "seq_no", epochs = 2)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(3), r.getInt(4)))
    // coverage: 2 epochs x 30 units, each unit once per epoch
    assert(got.length == 60)
    (0 until 2).foreach { ep =>
      val units = got.filter(_._1 == ep).map(r => (r._2, r._4)).toSet
      assert(units.size == 30, s"epoch $ep covers all units")
      // ranks are contiguous permutations
      (0 until 3).foreach { sh =>
        val ords = got.filter(r => r._1 == ep && r._2 == sh).map(_._5).sorted
        assert(ords.toSeq == (1 to 10), s"epoch $ep shard $sh seq_ords")
      }
      assert(got.filter(_._1 == ep).map(r => (r._2, r._3)).distinct.map(_._2).sorted.toSeq
        == (1 to 3), s"epoch $ep shard_ords")
    }
    // the epochs differ somewhere (the reshuffle actually reshuffles)
    val ord0 = got.filter(_._1 == 0).sortBy(r => (r._2, r._4)).map(r => r._5)
    val ord1 = got.filter(_._1 == 1).sortBy(r => (r._2, r._4)).map(r => r._5)
    assert(ord0.toSeq != ord1.toSeq, "epoch orders must differ")
    // deterministic under repartitioning
    val again = PackOps.epochSchedule(packed.repartition(7), "shard", "seq_no", epochs = 2)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(3), r.getInt(4)))
    assert(again.toSet == got.toSet)
    intercept[IllegalArgumentException](
      PackOps.epochSchedule(packed, "shard", "seq_no", epochs = 0))
  }
}
