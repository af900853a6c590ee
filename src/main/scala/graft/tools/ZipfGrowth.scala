package graft.tools

import org.apache.spark.sql.functions._

import graft.engine.GraftSession
import graft.operators.Dedup

/** Growth-curve harness for the PPJoin/containment scale claims
  * (round 18): measures d05's symmetric Jaccard join (unblocked) and
  * d28's containment join (16-way blocked, the production shape) on the
  * deterministic Heaps-law Zipf corpus ([[ScaleData.ensureZipfCorpus]])
  * at each requested size, printing one line per (size, op) with the
  * pre-join candidate bound, wall, and result count — the data behind
  * BENCH_NOTES' vocabulary-growth table. Bounds are read BEFORE the
  * joins (the d37/d38 discipline this repo's gate enforces).
  *
  * Usage: runMain graft.tools.ZipfGrowth [nDocs,nDocs,...]
  * (default 5000,50000). Corpora land under benchdata/zipf<n>.
  */
object ZipfGrowth {
  def main(args: Array[String]): Unit = {
    val sizes = args.headOption.getOrElse("5000,50000")
      .split(',').map(_.trim.toLong).toSeq
    val cpus = GraftSession.envCpus(32)
    val spark = GraftSession.build(cpus, "graft-zipf-growth")
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    sizes.foreach { n =>
      val dir = new java.io.File(s"benchdata/zipf$n").getAbsolutePath
      ScaleData.ensureZipfCorpus(spark, dir, n, partitions = cpus * 4)
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val blocked = docs.withColumn("source",
        concat(lit("blk"), pmod(col("doc_id"), lit(16L)).cast("string")))
      val jB = Dedup.ppjoinCandidateBound(docs, "doc_id", "text", "source", 0.8)
        .agg(sum(col("candidate_pairs"))).head().getLong(0)
      val cB = Dedup.containmentCandidateBound(blocked, "doc_id", "text", "source", 0.9)
        .agg(sum(col("candidate_pairs"))).head().getLong(0)
      var rows = 0L
      val tJ = time { rows = Dedup.ngramJaccardPairs(
        docs, "doc_id", "text", "source", 0.8).count() }
      println(s"ZIPF n=$n op=d05_jaccard bound=$jB wall=${f"$tJ%.1f"} pairs=$rows")
      val tC = time { rows = Dedup.containmentPairs(
        blocked, "doc_id", "text", "source", 0.9).count() }
      println(s"ZIPF n=$n op=d28_contain_blk16 bound=$cB wall=${f"$tC%.1f"} pairs=$rows")
    }
    spark.stop()
  }
}
