package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f), 0),
    (1L, Array(0.9f, 0.1f, 0.0f), 0),
    (2L, Array(0.0f, 1.0f, 0.0f), 0),
    (3L, Array(0.0f, 0.0f, 1.0f), 1),
    (4L, Array(-1.0f, 0.0f, 0.0f), 1)
  ).toDF("vec_id", "embedding", "label")

  test("bruteForceTopK ranks by cosine") {
    val res = Similarity.bruteForceTopK(vecs, "vec_id", "embedding", col("vec_id") === 0, k = 3)
      .collect().sortBy(_.getInt(2)).map(r => (r.getLong(1), r.getInt(2)))
    assert(res.toSeq == Seq((1L, 1), (2L, 2), (3L, 3)))
  }

  test("filtered ANN: pre-filtering finds the neighbor post-filtering misses; filters independent; full probe exact") {
    // query 100 points at x; the two CLOSEST vectors (2, 4) fail the
    // filter (even ids allowed = odd labels here: allowed = label 1),
    // the true FILTERED neighbor (1) is farther — the post-filtering
    // pitfall fixture
    val df = Seq(
      (100L, Array(1.0f, 0.0f), 0),   // query, NOT in the filter itself
      (1L, Array(0.70f, 0.71f), 1),   // allowed, cos ~0.70
      (2L, Array(0.99f, 0.14f), 0),   // closest, filtered out
      (4L, Array(0.95f, 0.31f), 0)    // second closest, filtered out
    ).toDF("vec_id", "embedding", "label")
    val q = col("vec_id") === 100L
    val cand = col("label") === 1
    val model = Similarity.ivfAssign(df, "vec_id", "embedding",
      nCentroids = 1, sampleSize = 4, iters = 1)
    // post-filtering: unfiltered top-2 = {2, 4}, then the filter drops
    // BOTH — zero rows, the true filtered neighbor lost
    val post = Similarity.ivfProbe(df, "vec_id", "embedding", model, q,
        k = 2, nProbe = 1)
      .join(df.filter(cand).select(col("vec_id").as("n_id")), Seq("n_id"), "left_semi")
    assert(post.count() == 0L, "post-filtering unexpectedly kept a row")
    // pre-filtering: the probe searches only allowed vectors — finds 1
    val pre = Similarity.ivfProbeFiltered(df, "vec_id", "embedding", model,
        q, cand, k = 2, nProbe = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pre.toSeq == Seq((100L, 1L, 1)), s"pre-filtered result: ${pre.toSeq}")
    // query predicate independent of the candidate filter: the query's
    // own label fails `cand` yet it still searches the filtered corpus
    // (asserted above — query 100 has label 0); the exact filtered
    // baseline agrees
    val exact = Similarity.bruteForceTopKFiltered(df, "vec_id", "embedding",
        q, cand, k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(exact.toSeq == pre.toSeq)
    // full probe over the shared fixture: filtered IVF == filtered exact
    // for every query (recall 1.0 at nProbe = nCentroids)
    val modelV = Similarity.ivfAssign(vecs, "vec_id", "embedding",
      nCentroids = 2, sampleSize = 8, iters = 2)
    val allQ = col("vec_id") >= 0
    val candV = col("label") === 0
    val ivfAll = Similarity.ivfProbeFiltered(vecs, "vec_id", "embedding",
        modelV, allQ, candV, k = 3, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exactAll = Similarity.bruteForceTopKFiltered(vecs, "vec_id", "embedding",
        allQ, candV, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivfAll == exactAll, s"ivf=$ivfAll exact=$exactAll")
    // only allowed ids ever appear as neighbors
    assert(ivfAll.forall { case (_, n) => Set(0L, 1L, 2L).contains(n) })
  }

  test("unitNorm leaves zero vectors untouched and normalizes others") {
    val df = Seq((0L, Array(3.0f, 4.0f)), (1L, Array(0.0f, 0.0f))).toDF("id", "v")
    val out = df.select(Similarity.unitNorm(col("v")).as("u")).collect()
      .map(_.getSeq[Double](0))
    assert(math.abs(out(0).map(x => x * x).sum - 1.0) < 1e-12)
    assert(out(1).forall(_ == 0.0))
  }

  test("cosineNearDupPairs respects blocking and threshold") {
    val pairs = Similarity.cosineNearDupPairs(vecs, "vec_id", "embedding", "label", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((0L, 1L))) // 0~1 cos≈0.994 same label; 3,4 orthogonal
  }

  test("semanticDedup: transitive chains collapse to one survivor; isolated and NULL vectors handled") {
    // angle chain at threshold 0.9: cos(0,1)≈0.906, cos(1,2)≈0.906 but
    // cos(0,2)≈0.64 — only the TRANSITIVE closure drops vector 2
    def rot(deg: Double) = {
      val r = math.toRadians(deg)
      Array(math.cos(r).toFloat, math.sin(r).toFloat)
    }
    val emb = Seq(
      (0L, rot(0), 0), (1L, rot(25), 0), (2L, rot(50), 0),
      (3L, rot(180), 0),                         // isolated: survives
      (4L, null.asInstanceOf[Array[Float]], 0))  // NULL: excluded
      .toDF("vec_id", "embedding", "label")
    val kept = Similarity.semanticDedup(emb, "vec_id", "embedding", "label", 0.9)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(0L, 3L), kept)
  }

  test("ivfTopK finds high-overlap neighbors vs brute force on real embeddings") {
    val emb = graft.engine.GraftSession.table(spark, TestSpark.sfDir, "embeddings")
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", col("vec_id") < 5, k = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val ivf = Similarity.ivfTopK(emb, "vec_id", "embedding", col("vec_id") < 5, k = 5,
      nCentroids = 8, nProbe = 3, sampleSize = 256)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val byQ = ivf.groupBy(_._1)
    assert(byQ.keySet == (0L until 5L).toSet, s"all queries answered: ${byQ.keySet}")
    byQ.foreach { case (q, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1 to rows.length), s"ranks contiguous for $q")
      // with nProbe=3/8 cells, most approximate neighbors should appear in
      // the exact top-20
      val overlap = rows.map(_._2).count(exact(q).contains)
      assert(overlap >= rows.length / 2, s"query $q overlap $overlap of ${rows.length}")
    }
  }

  test("crossCorpusSemanticContamination: cross-corpus only, matches brute force") {
    val emb = graft.engine.GraftSession.table(spark, TestSpark.sfDir, "embeddings")
    val train = emb.filter(col("vec_id") % 10 =!= 0)
    val eval = emb.filter(col("vec_id") % 10 === 0)
    val got = Similarity.crossCorpusSemanticContamination(
      train, eval, "vec_id", "embedding", "label", 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // never train x train or eval x eval
    assert(got.forall { case (t, e) => t % 10 != 0 && e % 10 == 0 }, "cross-corpus only")
    // brute force within label across the split
    def side(df: org.apache.spark.sql.DataFrame, id: String, v: String) =
      df.filter(col("embedding").isNotNull)
        .select(col("vec_id").as(id), col("label"), Similarity.unitNorm(col("embedding")).as(v))
    val brute = side(train, "t_id", "u_t").join(side(eval, "e_id", "u_e"), "label")
      .filter(Similarity.dot(col("u_t"), col("u_e")) >= 0.4)
      .select("t_id", "e_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == brute, s"got ${got.size} vs brute ${brute.size}")
    assert(got.nonEmpty, "fixture must produce at least one contaminated pair")
  }

  test("ivfTopK rejects fixture-sized configs pointed at the wrong scale") {
    val emb = graft.engine.GraftSession.table(spark, TestSpark.sfDir, "embeddings")
    // probe count cannot exceed the cell count
    intercept[IllegalArgumentException](Similarity.ivfTopK(
      emb, "vec_id", "embedding", col("vec_id") < 5, k = 5, nCentroids = 4, nProbe = 5))
    // sample too small to train the requested cells (sqrt(n)-sized
    // nCentroids with a fixture-sized sample is exactly the 100 TB misuse)
    intercept[IllegalArgumentException](Similarity.ivfTopK(
      emb, "vec_id", "embedding", col("vec_id") < 5, k = 5,
      nCentroids = 512, nProbe = 2, sampleSize = 1024))
    // sample is driver-collected: the cap must hold
    intercept[IllegalArgumentException](Similarity.ivfTopK(
      emb, "vec_id", "embedding", col("vec_id") < 5, k = 5,
      nCentroids = 1024, nProbe = 2, sampleSize = (1 << 20) + 1))
  }

  test("lshBucket fails loudly on dimension mismatch (silent bucket-0 collapse is O(n^2))") {
    val e = intercept[Throwable] {
      Similarity.lshTopK(vecs, "vec_id", "embedding", col("vec_id") === 0, k = 2,
        nPlanes = 4, dim = 8).collect()
    }
    def messages(t: Throwable): String =
      if (t == null) "" else Option(t.getMessage).getOrElse("") + messages(t.getCause)
    assert(messages(e).contains("lshBucket"), messages(e))
  }

  test("lshBucket: NULL vectors are skipped (null bucket), not a job-aborting error") {
    val withNull = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f), 0),
      (1L, Array(0.9f, 0.1f, 0.0f), 0),
      (2L, null.asInstanceOf[Array[Float]], 0)
    ).toDF("vec_id", "embedding", "label")
    val res = Similarity.lshTopK(withNull, "vec_id", "embedding", col("vec_id") === 0, k = 2,
      nPlanes = 4, dim = 3).collect().map(_.getLong(1))
    assert(res.contains(1L) && !res.contains(2L), res.toSeq)
  }

  test("cosineNearDupPairs: oversized blocks are subdivided, capped result stays sound") {
    // one dominant block: 40 vectors in label 0; even/odd index = two
    // distinct sign patterns, near-identical within each pattern
    val big = (0 until 40).map(i =>
      (i.toLong, Array(1.0f + i * 0.01f, if (i % 2 == 0) 1.0f else -1.0f, 0.5f), 0))
      .toDF("vec_id", "embedding", "label")
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairSet(Similarity.cosineNearDupPairs(big, "vec_id", "embedding", "label", 0.95))
    val capped = pairSet(Similarity.cosineNearDupPairs(big, "vec_id", "embedding", "label", 0.95,
      maxBlockSize = 10))
    // same-sign near-dups land in the same sub-bucket: nothing is lost here,
    // and nothing unsound is ever added
    assert(exact.size == 2 * 20 * 19 / 2, s"even-even + odd-odd pairs, got ${exact.size}")
    assert(capped == exact, s"missing: ${exact -- capped}; extra: ${capped -- exact}")
  }

  test("withRecallAtK: per-query recall floor on real embeddings (d08/d09 driver shape)") {
    val emb = graft.engine.GraftSession.table(spark, TestSpark.sfDir, "embeddings")
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", col("vec_id") < 10, k = 5)
    def recalls(approx: org.apache.spark.sql.DataFrame): Map[Long, Double] =
      Similarity.withRecallAtK(approx, exact, k = 5)
        .select(col("q_id"), col("recall")).distinct()
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val ivf = recalls(Similarity.ivfTopK(emb, "vec_id", "embedding", col("vec_id") < 10, k = 5))
    val lsh = recalls(Similarity.lshTopK(emb, "vec_id", "embedding", col("vec_id") < 10, k = 5))
    // each query carries exactly one recall value in [0,1]; the suite floor
    // is the driver-visible accuracy claim for the approximate paths
    (ivf.values ++ lsh.values).foreach(r => assert(r >= 0.0 && r <= 1.0))
    assert(ivf.values.sum / ivf.size >= 0.6, s"ivf mean recall ${ivf.values.sum / ivf.size}")
    assert(lsh.values.sum / lsh.size >= 0.6, s"lsh mean recall ${lsh.values.sum / lsh.size}")
  }

  test("withRecallAtK: recall 1.0 when approx equals exact, 0.0 on disjoint") {
    val exact = Similarity.bruteForceTopK(vecs, "vec_id", "embedding", col("vec_id") === 0, k = 3)
    val self = Similarity.withRecallAtK(exact, exact, k = 3)
      .select(col("recall")).distinct().collect().map(_.getDouble(0))
    assert(self.toSeq == Seq(1.0))
    val disjoint = exact.withColumn("n_id", col("n_id") + 100L)
    val zero = Similarity.withRecallAtK(disjoint, exact, k = 3)
      .select(col("recall")).distinct().collect().map(_.getDouble(0))
    assert(zero.toSeq == Seq(0.0))
  }

  test("lshTopK returns correctly-ranked subset of brute-force results") {
    val exact = Similarity.bruteForceTopK(vecs, "vec_id", "embedding", col("vec_id") === 0, k = 4)
      .collect().map(r => r.getLong(1) -> r.getInt(2)).toMap
    val approx = Similarity.lshTopK(vecs, "vec_id", "embedding", col("vec_id") === 0, k = 4,
      nPlanes = 4, dim = 3).collect().map(r => (r.getLong(1), r.getInt(2)))
    // every returned neighbor must exist in the exact result with rank order preserved
    assert(approx.sortBy(_._2).map(_._1).forall(exact.contains))
  }

  test("d08 oracle margin: no sign(dot) can flip between engine roundings at sf0.01") {
    // The d08 DuckDB oracle replays bucketing on sign(dot(raw, plane));
    // Spark buckets on sign(dot(unit, plane)). The two engines' double
    // roundings differ by ~1e-13 relative — a bucket divergence needs a
    // row×plane dot within that of zero. Assert the live data/hyperplane
    // margin (all rows × 8 tables × 4 planes, the exact constants d08
    // embeds) sits orders of magnitude above it.
    assume(TestSpark.hasOracleSf, s"oracle-scale dataset ${TestSpark.oracleSfDir} not present")
    val emb = graft.engine.GraftSession.table(spark, TestSpark.oracleSfDir, "embeddings")
    val unit = Similarity.normalized(emb, "vec_id", "embedding")
    val dots = for {
      t <- 0 until 8
      p <- Similarity.hyperplanes(nPlanes = 4, dim = 64, seed = 7L + t * 1009L)
    } yield abs(Similarity.dot(col("unit"), typedlit(p)))
    val minMargin = unit.select(least(dots: _*).as("m"))
      .agg(min(col("m"))).head.getDouble(0)
    assert(minMargin > 1e-6, s"min |dot(unit, plane)| = $minMargin — too close to a sign flip")
  }

  test("d09 oracle margin: cell assignment and probe cut can't flip between engines at sf0.01") {
    // The d09 DuckDB oracle ranks cells by dot(raw, centroid); Spark by
    // dot(unit, centroid) — same order up to the positive per-row scale,
    // UNLESS two cell similarities sit within double-rounding distance
    // (~1e-13). Assignment uses rank 1, the probe list ranks 1..2: assert
    // every row's rank-1/2 and rank-2/3 similarity gaps clear that by
    // orders of magnitude, with the exact centroids the oracle embeds.
    assume(TestSpark.hasOracleSf, s"oracle-scale dataset ${TestSpark.oracleSfDir} not present")
    val emb = graft.engine.GraftSession.table(spark, TestSpark.oracleSfDir, "embeddings")
    val cents = Similarity.ivfCentroids(emb, "vec_id", "embedding",
      nCentroids = 16, sampleSize = 1024, iters = 5)
    val unit = Similarity.normalized(emb, "vec_id", "embedding")
    val sims = array_sort(array(cents.map(c =>
      Similarity.dot(col("unit"), typedlit(c.toSeq))): _*), (a, b) => when(a < b, 1).when(a > b, -1).otherwise(0))
    val gaps = unit.select(
        (element_at(sims, 1) - element_at(sims, 2)).as("g12"),
        (element_at(sims, 2) - element_at(sims, 3)).as("g23"))
      .agg(min(col("g12")), min(col("g23"))).head
    assert(gaps.getDouble(0) > 1e-6, s"min rank-1/2 sim gap ${gaps.getDouble(0)}")
    assert(gaps.getDouble(1) > 1e-6, s"min rank-2/3 sim gap ${gaps.getDouble(1)}")
  }

  test("diversitySample: every sign cell capped at perBucket, sparse cells kept whole") {
    val emb = graft.engine.GraftSession.table(spark, TestSpark.sfDir, "embeddings")
    val kept = Similarity.diversitySample(emb, "vec_id", "embedding", bits = 4, perBucket = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    // direct-definition twin: sign pattern of the 4 leading components
    val full = emb.filter(col("embedding").isNotNull)
      .select(col("vec_id"), col("embedding")).collect()
      .map { r =>
        val v = r.getSeq[Float](1)
        val bucket = (0 until 4).map(j =>
          if (j < v.length && v(j) >= 0f) 1 << j else 0).sum
        (r.getLong(0), bucket)
      }
    val cellSizes = full.groupBy(_._2).view.mapValues(_.size).toMap
    val keptSizes = kept.groupBy(_._2).view.mapValues(_.size).toMap
    assert(cellSizes.size > 1, "fixture must populate more than one cell")
    cellSizes.foreach { case (b, n) =>
      assert(keptSizes.getOrElse(b, 0) == math.min(n, 10), s"cell $b: $n rows")
    }
    val byId = full.toMap
    kept.foreach { case (id, b) => assert(byId(id) == b, s"bucket of $id") }
    // deterministic: a second run picks the identical sample
    val again = Similarity.diversitySample(emb, "vec_id", "embedding", bits = 4, perBucket = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(again.toSet == kept.toSet)
  }

  test("IVF nProbe curve: recall is monotone in the probe budget, exact at full probe") {
    val emb = TestSpark.spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      org.apache.spark.sql.functions.col("vec_id") < 5, k = 3)
    def meanRecall(np: Int): Double = {
      val rows = Similarity.withRecallAtK(
          Similarity.ivfTopK(emb, "vec_id", "embedding",
            org.apache.spark.sql.functions.col("vec_id") < 5, k = 3,
            nCentroids = 8, nProbe = np, sampleSize = 64, iters = 3),
          exact, k = 3)
        .select("q_id", "recall").distinct().collect().map(_.getDouble(1))
      rows.sum / rows.length
    }
    val curve = Seq(1, 2, 8).map(meanRecall)
    assert(curve(0) <= curve(1) + 1e-12 && curve(1) <= curve(2) + 1e-12, curve)
    // probing EVERY cell is brute force: recall must be exactly 1
    assert(curve(2) == 1.0, curve)
  }

  test("pqTopK: lossless codebook degenerates to exact ranking; config guards") {
    // 8 well-separated 4-dim vectors, m=2 subspaces, ksub=8 >= distinct
    // sub-vectors: k-means init = the sub-vectors themselves, every
    // assignment has distance 0, so the codebook is LOSSLESS and ADC
    // ranking must equal brute-force cosine ranking exactly
    val emb = Seq(
      (0L, Array(5.0f, 1.0f, 0.0f, 2.0f)),
      (1L, Array(4.0f, 2.0f, 1.0f, 0.0f)),
      (2L, Array(0.0f, 7.0f, 3.0f, 1.0f)),
      (3L, Array(1.0f, 0.0f, 6.0f, 2.0f)),
      (4L, Array(2.0f, 3.0f, 0.0f, 5.0f)),
      (5L, Array(0.0f, 1.0f, 2.0f, 7.0f)),
      (6L, Array(3.0f, 0.0f, 4.0f, 1.0f)),
      (7L, Array(1.0f, 5.0f, 1.0f, 3.0f))).toDF("vec_id", "embedding")
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
        col("vec_id") < 2, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val pq = Similarity.pqTopK(emb, "vec_id", "embedding", col("vec_id") < 2,
        k = 3, m = 2, ksub = 8, sampleSize = 64, iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pq == exact, s"lossless PQ must match exact: pq=$pq exact=$exact")
    // real embeddings: a lossy codebook still recovers most of the exact set
    val real = graft.engine.GraftSession.table(spark, TestSpark.sfDir, "embeddings")
    val ex20 = Similarity.bruteForceTopK(real, "vec_id", "embedding",
        col("vec_id") < 5, k = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val approx = Similarity.pqTopK(real, "vec_id", "embedding", col("vec_id") < 5, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val byQ = approx.groupBy(_._1)
    assert(byQ.keySet == (0L until 5L).toSet, s"all queries answered: ${byQ.keySet}")
    byQ.foreach { case (q, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1 to rows.length), s"ranks contiguous for $q")
      val overlap = rows.map(_._2).count(ex20(q).contains)
      assert(overlap >= rows.length / 2, s"query $q overlap $overlap of ${rows.length}")
    }
    // fixture-sized configs can't silently ship to the wrong scale
    intercept[IllegalArgumentException](Similarity.pqTopK(
      emb, "vec_id", "embedding", col("vec_id") < 2, k = 3, m = 3)) // 4 % 3 != 0
    intercept[IllegalArgumentException](Similarity.pqTopK(
      emb, "vec_id", "embedding", col("vec_id") < 2, k = 3, ksub = 512))
    intercept[IllegalArgumentException](Similarity.pqTopK(
      emb, "vec_id", "embedding", col("vec_id") < 2, k = 3, sampleSize = 8))
  }

  test("pqTopKReranked: full-corpus shortlist recovers exact ranking under a LOSSY codebook; recall never drops") {
    val emb = Seq(
      (0L, Array(5.0f, 1.0f, 0.0f, 2.0f)),
      (1L, Array(4.0f, 2.0f, 1.0f, 0.0f)),
      (2L, Array(0.0f, 7.0f, 3.0f, 1.0f)),
      (3L, Array(1.0f, 0.0f, 6.0f, 2.0f)),
      (4L, Array(2.0f, 3.0f, 0.0f, 5.0f)),
      (5L, Array(0.0f, 1.0f, 2.0f, 7.0f)),
      (6L, Array(3.0f, 0.0f, 4.0f, 1.0f)),
      (7L, Array(1.0f, 5.0f, 1.0f, 3.0f))).toDF("vec_id", "embedding")
    // ksub=2 is aggressively lossy (8 sub-vectors -> 2 centroids), but a
    // shortlist of 3·3 >= the 7 possible neighbors means the re-rank sees
    // EVERY candidate — the result must equal brute-force cosine exactly,
    // independent of how bad the ADC order was
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
        col("vec_id") < 2, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val rr = Similarity.pqTopKReranked(emb, "vec_id", "embedding",
        col("vec_id") < 2, k = 3, shortlist = 3, m = 2, ksub = 2,
        sampleSize = 8, iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(rr == exact, s"full-shortlist re-rank must equal exact: rr=$rr exact=$exact")
    // real embeddings, production-shaped config: the re-rank can only
    // help — per-query hit count vs the exact top-k never decreases
    val real = graft.engine.GraftSession.table(spark, TestSpark.sfDir, "embeddings")
    val ex = Similarity.bruteForceTopK(real, "vec_id", "embedding",
        col("vec_id") < 5, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    def hitCounts(df: org.apache.spark.sql.DataFrame): Map[Long, Int] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
        .map { case (q, rs) =>
          q -> rs.map(_._2).count(ex.getOrElse(q, Set.empty[Long]).contains)
        }
    val adcHits = hitCounts(
      Similarity.pqTopK(real, "vec_id", "embedding", col("vec_id") < 5, k = 5))
    val rrHits = hitCounts(Similarity.pqTopKReranked(real, "vec_id", "embedding",
      col("vec_id") < 5, k = 5, shortlist = 4))
    (0L until 5L).foreach { q =>
      assert(rrHits.getOrElse(q, 0) >= adcHits.getOrElse(q, 0),
        s"query $q: re-rank hits ${rrHits.get(q)} < adc hits ${adcHits.get(q)}")
    }
    intercept[IllegalArgumentException](Similarity.pqTopKReranked(
      emb, "vec_id", "embedding", col("vec_id") < 2, k = 3, shortlist = 0))
  }

  test("ivfPqTopK: full-probe + full-shortlist degenerates to exact; defaults sane on real embeddings") {
    val emb = Seq(
      (0L, Array(5.0f, 1.0f, 0.0f, 2.0f)),
      (1L, Array(4.0f, 2.0f, 1.0f, 0.0f)),
      (2L, Array(0.0f, 7.0f, 3.0f, 1.0f)),
      (3L, Array(1.0f, 0.0f, 6.0f, 2.0f)),
      (4L, Array(2.0f, 3.0f, 0.0f, 5.0f)),
      (5L, Array(0.0f, 1.0f, 2.0f, 7.0f)),
      (6L, Array(3.0f, 0.0f, 4.0f, 1.0f)),
      (7L, Array(1.0f, 5.0f, 1.0f, 3.0f))).toDF("vec_id", "embedding")
    // probing EVERY cell + a shortlist covering every candidate must give
    // the exact brute-force ranking, however lossy the ksub=2 codes are —
    // the composition can only lose recall through the two prunes it owns
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
        col("vec_id") < 2, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val full = Similarity.ivfPqTopK(emb, "vec_id", "embedding", col("vec_id") < 2,
        k = 3, nCentroids = 2, nProbe = 2, m = 2, ksub = 2,
        sampleSize = 8, iters = 3, shortlist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(full == exact, s"full-probe/full-shortlist must equal exact: got=$full exact=$exact")
    // production-shaped defaults on the real embeddings: every query
    // answered with contiguous ranks, result ids within the corpus
    val real = graft.engine.GraftSession.table(spark, TestSpark.sfDir, "embeddings")
    val got = Similarity.ivfPqTopK(real, "vec_id", "embedding", col("vec_id") < 5, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val byQ = got.groupBy(_._1)
    assert(byQ.keySet == (0L until 5L).toSet, s"all queries answered: ${byQ.keySet}")
    byQ.foreach { case (q, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1 to rows.length), s"ranks contiguous for $q")
      assert(rows.forall(r => r._2 != q), s"query $q returned itself")
    }
    intercept[IllegalArgumentException](Similarity.ivfPqTopK(
      emb, "vec_id", "embedding", col("vec_id") < 2, k = 3, nProbe = 99))
  }

  test("two-stage models: probes against one shared encode equal the one-shot API per config") {
    val real = TestSpark.spark.read
      .parquet(s"${TestSpark.sfDir}/embeddings.parquet")
    // one ivfPqEncode serves every (nProbe, shortlist) config — exactly
    // d35's discipline — and each probe must equal the train-inside
    // one-shot call, because centroids/codebooks are deterministic
    // functions of the data and the probe stages share their algebra
    val model = Similarity.ivfPqEncode(real, "vec_id", "embedding")
    Seq((1, 4), (2, 2), (4, 4)).foreach { case (np, sl) =>
      val viaModel = Similarity.ivfPqProbe(real, "vec_id", "embedding", model,
          col("vec_id") < 5, k = 5, nProbe = np, shortlist = sl)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val oneShot = Similarity.ivfPqTopK(real, "vec_id", "embedding",
          col("vec_id") < 5, k = 5, nProbe = np, shortlist = sl)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(viaModel == oneShot, s"config ($np, $sl) diverged")
    }
    // same contract for plain IVF (d25's discipline)
    val ivf = Similarity.ivfAssign(real, "vec_id", "embedding")
    Seq(1, 2, 4).foreach { np =>
      val viaModel = Similarity.ivfProbe(real, "vec_id", "embedding", ivf,
          col("vec_id") < 5, k = 5, nProbe = np)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val oneShot = Similarity.ivfTopK(real, "vec_id", "embedding",
          col("vec_id") < 5, k = 5, nProbe = np)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(viaModel == oneShot, s"nProbe $np diverged")
    }
    intercept[IllegalArgumentException](Similarity.ivfPqProbe(
      real, "vec_id", "embedding", model, col("vec_id") < 2, k = 3, nProbe = 99))
  }

  test("ivfAssign distributedTrainer: model carries the full-corpus centroids; full probe stays exact") {
    import graft.engine.GraftSession
    val real = GraftSession.table(spark, TestSpark.sfDir, "embeddings")
    val model = Similarity.ivfAssign(real, "vec_id", "embedding",
      nCentroids = 4, iters = 3, distributedTrainer = true)
    val direct = Similarity.kmeansDistributed(real, "vec_id", "embedding", 4, 3)
    assert(model.centroids.map(_.toSeq).toSeq == direct.map(_.toSeq).toSeq,
      "ivfAssign must delegate training verbatim to kmeansDistributed")
    // the probe stage is trainer-agnostic: probing EVERY cell of ANY
    // correct assignment recovers the exact brute-force ranking
    val q = col("vec_id") < 3
    val full = Similarity.ivfProbe(real, "vec_id", "embedding", model, q,
        k = 4, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val exact = Similarity.bruteForceTopK(real, "vec_id", "embedding", q, k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(full == exact)
  }

  test("kmeansDistributed: separates planted clusters, deterministic across partitionings, empty cell keeps its centroid") {
    // three tight clusters around orthogonal axes — any correct k-means
    // with k=3 lands one centroid per axis whatever the iteration count
    val pts = (0 until 30).map { i =>
      val axis = i % 3
      val eps = 0.01f * (i / 3)
      val base = Array(0.0f, 0.0f, 0.0f); base(axis) = 1.0f
      base((axis + 1) % 3) = eps
      (i.toLong, base)
    }
    val df1 = pts.toDF("vec_id", "embedding").repartition(1)
    val df7 = pts.toDF("vec_id", "embedding").repartition(7)
    val c1 = Similarity.kmeansDistributed(df1, "vec_id", "embedding", 3, 4)
    val c7 = Similarity.kmeansDistributed(df7, "vec_id", "embedding", 3, 4)
    // partitioning-independence is the POINT of the integer re-estimation
    // sums: bit-identical centroids whatever the partial-sum order
    assert(c1.map(_.toSeq).toSeq == c7.map(_.toSeq).toSeq)
    val assign = Similarity.kmeansAssign(df1, "vec_id", "embedding", c1)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    (0 until 3).foreach { axis =>
      val members = (0 until 30).filter(_ % 3 == axis).map(_.toLong)
      assert(members.map(assign).toSet.size == 1,
        s"axis-$axis cluster split: ${members.map(assign)}")
    }
    assert(assign.values.toSet.size == 3, s"clusters collapsed: $assign")
    // k=4 over 3 real clusters: some cell ends empty mid-iteration and
    // must KEEP its previous centroid (not NaN out)
    val c4 = Similarity.kmeansDistributed(df1, "vec_id", "embedding", 4, 4)
    assert(c4.length == 4 && c4.forall(_.forall(x => !x.isNaN)))
    // fewer non-null vectors than centroids fails loudly
    intercept[IllegalArgumentException](
      Similarity.kmeansDistributed(pts.take(2).toDF("vec_id", "embedding"),
        "vec_id", "embedding", 3, 2))
  }

  test("kmeansAssignJoin: bit-identical to the plan-literal form; the literal form enforces its k*dim ceiling") {
    import graft.engine.GraftSession
    val real = GraftSession.table(spark, TestSpark.sfDir, "embeddings")
    val cents = Similarity.kmeansDistributed(real, "vec_id", "embedding", 4, 3)
    val viaLit = Similarity.kmeansAssign(real, "vec_id", "embedding", cents)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val viaJoin = Similarity.kmeansAssignJoin(real, "vec_id", "embedding", cents)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // same dot fold over the same doubles, same struct tie order — the
    // broadcast-table shape must not move a single vector
    assert(viaLit == viaJoin)
    // the literal form refuses past 10^6 plan-embedded doubles (the
    // round-18 verdict's scale ceiling) instead of OOMing the driver
    val big = Array.fill(2001)(Array.fill(500)(0.1))
    val e = intercept[IllegalArgumentException](
      Similarity.kmeansAssign(real, "vec_id", "embedding", big))
    assert(e.getMessage.contains("kmeansAssignJoin"))
  }

  test("ivfAssign distributedTrainer ignores sampleSize (round-19 advisor find)") {
    import graft.engine.GraftSession
    val real = GraftSession.table(spark, TestSpark.sfDir, "embeddings")
    // 100 cells with the default-sized sampleSize=128 would trip the
    // 4x-per-centroid require on the SAMPLE trainer; the distributed
    // trainer never reads it and must not throw
    val model = Similarity.ivfAssign(real, "vec_id", "embedding",
      nCentroids = 100, sampleSize = 128, iters = 1, distributedTrainer = true)
    assert(model.centroids.length == 100)
    // the sample trainer still validates
    intercept[IllegalArgumentException](Similarity.ivfAssign(real, "vec_id",
      "embedding", nCentroids = 100, sampleSize = 128, iters = 1))
  }

  test("pqCodebooksDistributed: partitioning-independent, empty code keeps its centroid, loud on bad dims") {
    // 3 tight clusters in dim 8 (divisible by m=2) — the d42 fixture
    // idiom adapted to subspace training
    val pts = (0 until 30).map { i =>
      val axis = i % 3
      val v = Array.fill(8)(0.0f); v(axis) = 1.0f; v(axis + 4) = 0.01f * (i / 3)
      (i.toLong, v)
    }
    val df1 = pts.toDF("vec_id", "embedding").repartition(1)
    val df7 = pts.toDF("vec_id", "embedding").repartition(7)
    def flat(b: Array[Array[Array[Double]]]) = b.map(_.map(_.toSeq).toSeq).toSeq
    val b1 = Similarity.pqCodebooksDistributed(df1, "vec_id", "embedding", 2, 4, 3)
    val b7 = Similarity.pqCodebooksDistributed(df7, "vec_id", "embedding", 2, 4, 3)
    // the POINT of the exact-integer re-estimation: bit-identical books
    // whatever the partial-sum order
    assert(flat(b1) == flat(b7))
    assert(b1.length == 2 && b1.forall(_.length == 4) &&
      b1.forall(_.forall(_.length == 4)))
    // ksub=8 over ~3 natural groups: some code goes empty mid-iteration
    // and must keep its previous centroid, never NaN
    val b8 = Similarity.pqCodebooksDistributed(df1, "vec_id", "embedding", 2, 8, 3)
    assert(b8.forall(_.forall(_.forall(x => !x.isNaN))))
    // dim=8 not divisible by m=3 fails loudly
    intercept[IllegalArgumentException](
      Similarity.pqCodebooksDistributed(df1, "vec_id", "embedding", 3, 4, 2))
    // fewer vectors than ksub fails loudly
    intercept[IllegalArgumentException](
      Similarity.pqCodebooksDistributed(pts.take(3).toDF("vec_id", "embedding"),
        "vec_id", "embedding", 2, 4, 2))
  }

  test("distributed-trained IVF-PQ stack: recall at least matches the sample-trained stack on the real embeddings") {
    import graft.engine.GraftSession
    val real = GraftSession.table(spark, TestSpark.sfDir, "embeddings")
    val q = col("vec_id") < 10
    val k = 5
    val exact = Similarity.bruteForceTopK(real, "vec_id", "embedding", q, k)
      .localCheckpoint(true)
    def meanRecall(model: Similarity.IvfPqModel): Double = {
      val r = Similarity.withRecallAtK(
          Similarity.ivfPqProbe(real, "vec_id", "embedding", model, q,
            k = k, nProbe = 2, shortlist = 4), exact, k)
        .groupBy(col("q_id")).agg(max(col("recall")).as("recall"))
        .agg(avg(col("recall"))).head().getDouble(0)
      r
    }
    val sample = meanRecall(Similarity.ivfPqEncode(real, "vec_id", "embedding",
      nCentroids = 8, m = 4, ksub = 8, sampleSize = 512, iters = 3))
    val dist = meanRecall(Similarity.ivfPqEncodeDistributed(real, "vec_id",
      "embedding", nCentroids = 8, m = 4, ksub = 8, iters = 3))
    // full-corpus training sees everything the 512-sample trainer saw and
    // more — on this corpus it must not LOSE recall (small slack for
    // quantization-boundary flips), and both stacks must be usable
    assert(dist >= sample - 0.05, s"distributed $dist vs sample $sample")
    assert(dist >= 0.5, s"distributed-trained stack unusable: recall $dist")
  }
}
