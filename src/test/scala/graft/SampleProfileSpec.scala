package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Profile, SampleOps}

class SampleProfileSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val df = Seq.tabulate(1000)(i =>
    (i.toLong, s"cat${i % 4}", if (i % 10 == 0) null else s"v$i"))
    .toDF("id", "cat", "v")

  test("deterministicSplit: reproducible, disjoint, roughly the asked fraction") {
    val s1 = SampleOps.deterministicSplit(df, "id", 80)
    val s2 = SampleOps.deterministicSplit(df.repartition(7), "id", 80)
    val m1 = s1.select("id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val m2 = s2.select("id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m1 == m2) // stable under repartitioning
    val nTrain = m1.values.count(_ == "train")
    assert(nTrain > 700 && nTrain < 900) // ~80% of 1000
  }

  test("semanticClusterProfile: exact masses, source diversity, mode tie to the smaller language") {
    import graft.operators.Profile
    val docs = Seq(
      (1L, "der hund und die katze nicht", "sA"),   // de, 28 chars
      (2L, "the cat and the dog of a", "sA"),       // en
      (3L, "the dog and a cat of it", "sB"),        // en
      (4L, "le chat et la maison les", "sB"),       // fr
      (5L, "el gato los perros las casas es", "sC") // es
    ).toDF("doc_id", "text", "source")
    // cell 0 = {1, 2}: de vs en tied 1-1 -> 'de' (lexicographically
    // smaller) must win; cell 1 = {3, 4, 5}: en/fr/es tied 1-1-1 -> 'en'
    val assigned = Seq((1L, 0), (2L, 0), (3L, 1), (4L, 1), (5L, 1),
      (99L, 2)).toDF("vec_id", "cell") // 99: assignment with no doc -> no row
    val got = Profile.semanticClusterProfile(docs, "doc_id", "text", "source", assigned)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    val chars0 = docs.filter(col("doc_id") <= 2).agg(sum(length(col("text"))))
      .head().getLong(0)
    val chars1 = docs.filter(col("doc_id") >= 3).agg(sum(length(col("text"))))
      .head().getLong(0)
    assert(got(0) == ((2L, chars0, 1L, "de")), got.toString)
    assert(got(1) == ((3L, chars1, 2L, "en")), got.toString) // sources {sB, sC}
    assert(got.size == 2, s"orphan assignment must not produce a row: $got")
  }

  test("stratifiedQuotaSplit: EXACT per-stratum quotas, deterministic, id-hash-ordered cut") {
    // strata of deliberately awkward sizes: 1000 rows over cat0..3 are
    // 250 each — add a 7-row and a 3-row stratum where the expectation
    // split would swing wildly; quota = floor(n*80/100)
    val skewed = df.unionByName(Seq.tabulate(10)(i =>
      (10000L + i, if (i < 7) "tiny7" else "tiny3", "x")).toDF("id", "cat", "v"))
    val s1 = SampleOps.stratifiedQuotaSplit(skewed, "id", "cat", 80)
    val s2 = SampleOps.stratifiedQuotaSplit(skewed.repartition(7), "id", "cat", 80)
    val m1 = s1.select("id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val m2 = s2.select("id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m1 == m2) // stable under repartitioning
    val counts = s1.groupBy("cat", "split").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    (0 until 4).foreach { c =>
      assert(counts((s"cat$c", "train")) == 200L, counts.toString) // exactly 80% of 250
      assert(counts((s"cat$c", "test")) == 50L)
    }
    assert(counts(("tiny7", "train")) == 5L) // floor(7*0.8) = 5, never 7 or 3
    assert(counts(("tiny3", "train")) == 2L) // floor(3*0.8) = 2
    // the cut is the md5-rank prefix: train ids are exactly the quota-many
    // smallest (md5OrderHash, id) keys within each stratum
    val cat0 = skewed.filter(col("cat") === "cat0")
      .select(col("id"), SampleOps.md5OrderHash(col("id")).as("h"))
      .collect().map(r => (r.getLong(1), r.getLong(0))).sorted.map(_._2)
    val expectTrain = cat0.take(200).toSet
    val gotTrain = s1.filter(col("cat") === "cat0" && col("split") === "train")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(gotTrain == expectTrain)
  }

  test("hashSample keeps the id-stable subset of the split") {
    val sampled = SampleOps.hashSample(df, "id", 80).select("id")
      .collect().map(_.getLong(0)).toSet
    val train = SampleOps.deterministicSplit(df, "id", 80)
      .filter(col("split") === "train").select("id").collect().map(_.getLong(0)).toSet
    assert(sampled == train)
  }

  test("stratifiedCap bounds every stratum and is deterministic") {
    val c1 = SampleOps.stratifiedCap(df, "cat", "id", 10)
    val c2 = SampleOps.stratifiedCap(df.repartition(5), "cat", "id", 10)
    val counts = c1.groupBy("cat").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.forall(_ == 10) && counts.size == 4)
    assert(c1.select("id").collect().map(_.getLong(0)).toSet ==
      c2.select("id").collect().map(_.getLong(0)).toSet)
  }

  test("md5 family: hashSample + stratifiedCap obey the same contract as xxhash64 (x03 path)") {
    // same structural guarantees as the production family — determinism
    // under repartitioning, cap bound per stratum, sample ≈ fraction —
    // with the md5 bucket/order-hash the driver's DuckDB oracle replays
    val samp = SampleOps.hashSample(df, "id", 50, bucket = SampleOps.md5Bucket)
    val n = samp.count()
    assert(n > 400 && n < 600, s"~50% of 1000 expected, got $n")
    val c1 = SampleOps.stratifiedCap(samp, "cat", "id", 5, orderHash = SampleOps.md5OrderHash)
    val c2 = SampleOps.stratifiedCap(samp.repartition(7), "cat", "id", 5,
      orderHash = SampleOps.md5OrderHash)
    val counts = c1.groupBy("cat").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.forall(_ <= 5) && counts.size == 4)
    assert(c1.select("id").collect().map(_.getLong(0)).toSet ==
      c2.select("id").collect().map(_.getLong(0)).toSet)
  }

  test("resampleToMix: quota proportions, binding stratum kept whole, non-targets dropped") {
    // a:60 b:30 c:10 rows; targets a:0.5 b:0.4 -> T = floor(min(60/.5, 30/.4)) = 75
    // quotas: a floor(.5*75)=37, b floor(.4*75)=30 (binding stratum fully kept); c dropped
    val rows = (1 to 60).map(i => (i.toLong, "a")) ++
      (61 to 90).map(i => (i.toLong, "b")) ++ (91 to 100).map(i => (i.toLong, "c"))
    val df = rows.toDF("id", "s")
    val got = SampleOps.resampleToMix(df, "s", "id", Seq("a" -> 0.5, "b" -> 0.4))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val byS = got.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byS == Map("a" -> 37, "b" -> 30), byS)
    // deterministic: same pick on re-run over a repartitioned frame
    val again = SampleOps.resampleToMix(df.repartition(7), "s", "id",
      Seq("a" -> 0.5, "b" -> 0.4)).collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.sorted.sameElements(again.sorted))
    // a target stratum with zero rows forces an empty sample
    assert(SampleOps.resampleToMix(df, "s", "id",
      Seq("a" -> 0.5, "zz" -> 0.5)).count() == 0)
    intercept[IllegalArgumentException](SampleOps.resampleToMix(df, "s", "id", Seq()))
    intercept[IllegalArgumentException](
      SampleOps.resampleToMix(df, "s", "id", Seq("a" -> 0.0)))
    intercept[IllegalArgumentException](
      SampleOps.resampleToMix(df, "s", "id", Seq("a" -> 0.5, "a" -> 0.4)))
  }

  test("Profile.quantiles: rank-selected values match the sorted-array definition") {
    val values = Seq.tabulate(1000)(i => ((i * 37) % 101).toDouble) ++ Seq.fill(5)(50.0)
    val vdf = values.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
      .union(Seq((9999L, Option.empty[Double])).toDF("id", "v")) // NULL ignored
    val ps = Seq(0.01, 0.25, 0.5, 0.75, 0.95, 1.0)
    val got = Profile.quantiles(vdf, "v", ps).collect()
      .map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val sorted = values.sorted
    ps.foreach { p =>
      val expect = sorted(math.max(1, math.ceil(p * sorted.length).toInt) - 1)
      assert(got(p) == expect, s"p=$p: got ${got(p)}, want $expect")
    }
  }

  test("Profile.groupedQuantiles: per-group sorted-array definition, groups independent") {
    val a = Seq.tabulate(100)(i => ("a", ((i * 13) % 41).toDouble))
    val b = Seq.tabulate(7)(i => ("b", (i * 10).toDouble)) // small group, with dups below
    val rows = (a ++ b ++ Seq(("b", 30.0), ("b", 30.0))).zipWithIndex
      .map { case ((g, v), i) => (i.toLong, g, v) }
    val df = (rows :+ ((9999L, "a", Double.NaN))).toDF("id", "g", "v")
      .filter(!org.apache.spark.sql.functions.isnan(org.apache.spark.sql.functions.col("v")))
    val ps = Seq(0.5, 0.9, 1.0)
    val got = Profile.groupedQuantiles(df, Seq("g"), "v", ps).collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    def expect(vs: Seq[Double], p: Double) = {
      val s = vs.sorted; s(math.max(1, math.ceil(p * s.length).toInt) - 1)
    }
    val va = a.map(_._2); val vb = b.map(_._2) ++ Seq(30.0, 30.0)
    ps.foreach { p =>
      assert(got(("a", p)) == expect(va, p), s"a p=$p")
      assert(got(("b", p)) == expect(vb, p), s"b p=$p")
    }
    assert(got.size == ps.size * 2, "exactly one row per (group, p)")
    intercept[IllegalArgumentException](Profile.groupedQuantiles(df, Seq(), "v", ps))
    intercept[IllegalArgumentException](Profile.groupedQuantiles(df, Seq("g"), "v", Seq(1.5)))
  }

  test("Profile.winsorizedStats: hand-computed clamp, clip counts, outlier immunity") {
    // group g: 1..20 plus a 1000 outlier; p=(0.1, 0.9) over n=21 ->
    // ranks ceil(2.1)=3, ceil(18.9)=19 -> bounds [3, 19]; clamped sum =
    // 3*3 + (4+..+18) + 3*19 = 231 -> mean 11.0; two clips each side
    val rows = ((1 to 20).map(v => ("g", v.toLong)) :+ (("g", 1000L))) ++
      Seq(("h", 5L), ("h", 7L))
    val df = rows.zipWithIndex.map { case ((g, v), i) => (i.toLong, g, v) }
      .toDF("id", "g", "v")
    val got = Profile.winsorizedStats(df, Seq("g"), "v", 0.1, 0.9).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6)))
      .toMap
    assert(got("g") == ((21L, 2L, 2L, 3L, 19L, 11.0)), got("g"))
    // tiny group: ranks ceil(.2)=1, ceil(1.8)=2 -> bounds [5, 7], nothing clips
    assert(got("h") == ((2L, 0L, 0L, 5L, 7L, 6.0)), got("h"))
    intercept[IllegalArgumentException](
      Profile.winsorizedStats(df, Seq("g"), "v", 0.9, 0.1))
  }

  test("Profile.approxQuantiles agrees with exact quantiles on a bounded-cardinality column") {
    val vdf = Seq.tabulate(2000)(i => (i.toLong, ((i * 13) % 50).toDouble)).toDF("id", "v")
    val ps = Seq(0.25, 0.5, 0.75)
    val exact = Profile.quantiles(vdf, "v", ps).collect()
      .map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val approx = Profile.approxQuantiles(vdf, "v", ps).collect()
      .map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(approx == exact, s"$approx vs $exact")
    intercept[IllegalArgumentException](Profile.approxQuantiles(vdf, "v", Seq(2.0)))
  }

  test("quantiles/histogram/approxQuantiles on empty or all-NULL input: zero rows, no failure") {
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.DoubleType))))
    val allNull = Seq(Option.empty[Double], Option.empty[Double]).toDF("v")
    Seq(empty, allNull).foreach { in =>
      assert(Profile.quantiles(in, "v", Seq(0.5)).count() == 0)
      assert(Profile.histogram(in, "v", 5).count() == 0)
      // NULL sketch array -> arrays_zip NULL -> explode drops the agg row
      assert(Profile.approxQuantiles(in, "v", Seq(0.5)).count() == 0)
    }
  }

  test("Profile.quantiles rejects out-of-range probabilities") {
    intercept[IllegalArgumentException](Profile.quantiles(df, "id", Seq(0.0)))
    intercept[IllegalArgumentException](Profile.quantiles(df, "id", Seq(1.5)))
    intercept[IllegalArgumentException](Profile.quantiles(df, "id", Seq.empty))
  }

  test("Profile.quantiles on a near-unique column: exact, and every WindowExec is partitioned") {
    // 20k distinct values — the shape that used to funnel through ONE
    // partition-less window task; now a distributed prefix sum
    val values = Seq.tabulate(20000)(i => ((i * 2654435761L) % 1000003L).toDouble)
    val vdf = values.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
      .repartition(8)
    val ps = Seq(0.001, 0.25, 0.5, 0.75, 0.999, 1.0)
    val q = Profile.quantiles(vdf, "v", ps)
    val got = q.collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val sorted = values.sorted
    ps.foreach { p =>
      val expect = sorted(math.max(1, math.ceil(p * sorted.length).toInt) - 1)
      assert(got(p) == expect, s"p=$p: got ${got(p)}, want $expect")
    }
    val helper = new org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper {}
    val windows = helper.collect(q.queryExecution.executedPlan) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty, "expected the per-block running-sum window")
    windows.foreach(w => assert(w.partitionSpec.nonEmpty,
      "no window may be partition-less (single-task global sort)"))
  }

  test("Profile.quantiles/approxQuantiles dedupe duplicate probabilities") {
    val vdf = Seq.tabulate(100)(i => (i.toLong, (i % 10).toDouble)).toDF("id", "v")
    assert(Profile.quantiles(vdf, "v", Seq(0.5, 0.5, 0.25)).count() == 2)
    assert(Profile.approxQuantiles(vdf, "v", Seq(0.5, 0.5, 0.25)).count() == 2)
  }

  test("Profile.quantiles on strings: guarded single-partition fallback") {
    val sdf = Seq.tabulate(100)(i => (i.toLong, f"s${i % 7}")).toDF("id", "s")
    // median string via the fallback path (percentile_approx can't bucket strings)
    val got = Profile.quantiles(sdf, "s", Seq(0.5)).collect()
    assert(got.length == 1 && got(0).getString(1) == "s3", got.mkString(","))
    // NDV guard: 7 distinct values over a cap of 3 must fail loudly
    val e = intercept[IllegalArgumentException](
      Profile.quantiles(sdf, "s", Seq(0.5), maxDistinctFallback = 3L))
    assert(e.getMessage.contains("distinct"), e.getMessage)
  }

  test("Profile.correlation: matches the closed form, zero-variance group NULL, partition-stable") {
    val pts = Seq( // group a: y = 2x + noise-free shift -> r = 1
      ("a", 1.0, 2.0), ("a", 2.0, 4.0), ("a", 3.0, 6.0),
      // group b: hand-checkable mixed cloud
      ("b", 1.0, 1.0), ("b", 2.0, 5.0), ("b", 3.0, 2.0), ("b", 4.0, 8.0),
      // group c: x constant -> vx = 0 -> NULL r
      ("c", 5.0, 1.0), ("c", 5.0, 9.0))
    val df = pts.zipWithIndex.map { case ((g, x, y), i) => (i.toLong, g, x, y) }
      .toDF("id", "g", "x", "y")
    def run(d: org.apache.spark.sql.DataFrame) =
      Profile.correlation(d, Seq("g"), "x", "y", scale = 1).collect()
        .map(r => r.getString(0) -> (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    val got = run(df)
    assert(got("a") == Some(1.0), got("a"))
    val bx = Seq(1.0, 2.0, 3.0, 4.0); val by = Seq(1.0, 5.0, 2.0, 8.0)
    val n = 4.0
    val (sx, sy) = (bx.sum, by.sum)
    val sxy = bx.zip(by).map { case (p, q) => p * q }.sum
    val (sxx, syy) = (bx.map(v => v * v).sum, by.map(v => v * v).sum)
    val want = (n * sxy - sx * sy) / math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    assert(math.abs(got("b").get - want) < 1e-12, s"${got("b")} vs $want")
    assert(got("c").isEmpty, "zero x-variance must be NULL, not NaN")
    assert(run(df.repartition(5)) == got, "partition-order independent")
    intercept[IllegalArgumentException](Profile.correlation(df, Seq(), "x", "y"))
  }

  test("Profile.histogram: counts and bounds match manual binning; max folds into last bucket") {
    val vdf = (0 to 100).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val rows = Profile.histogram(vdf, "v", 10).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).sortBy(_._1)
    assert(rows.map(_._1).sameElements(0L to 9L))
    // buckets 0..8 carry 10 values each, bucket 9 carries 10 + the max
    assert(rows.dropRight(1).forall(_._3 == 10) && rows.last._3 == 11)
    rows.foreach { case (b, lo, _) => assert(lo == b * 10.0) }
  }

  test("Profile.histogram: constant column lands in bucket 0") {
    val vdf = Seq.fill(7)(42.0).zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val rows = Profile.histogram(vdf, "v", 5).collect()
    assert(rows.length == 1 && rows(0).getLong(0) == 0 && rows(0).getLong(2) == 7)
  }

  test("histogram2d: joint cells, max folds into last bucket, constant dim lands in 0") {
    import spark.implicits._
    val df = Seq((0.0, 0.0), (0.0, 10.0), (10.0, 10.0), (5.0, 10.0), (10.0, 0.0))
      .toDF("x", "y")
    val got = Profile.histogram2d(df, "x", "y", 2, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(4)).toMap
    // x: [0,5) -> 0, [5,10] -> 1 (10 folds); y likewise
    assert(got == Map((0L, 0L) -> 1L, (0L, 1L) -> 1L, (1L, 1L) -> 2L, (1L, 0L) -> 1L),
      got.toString)
    val const = Profile.histogram2d(df.withColumn("y", lit(7.0)), "x", "y", 2, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(4)).toMap
    assert(const.keySet.forall(_._2 == 0L), "constant y must land in bucket 0: " + const)
  }

  test("Profile.describe matches hand-computed stats, nulls counted") {
    val rows = Profile.describe(df, Seq("id", "cat", "v"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows("id").getLong(1) == 1000 && rows("id").getLong(2) == 0 &&
      rows("id").getLong(3) == 1000 && rows("id").getString(4) == "0" &&
      rows("id").getString(5) == "999")
    assert(rows("cat").getLong(3) == 4)
    assert(rows("v").getLong(1) == 900 && rows("v").getLong(2) == 100 &&
      rows("v").getLong(3) == 900)
  }

  test("Profile.describe is one exchange: partial+final aggregate, no row shuffle") {
    val plan = Profile.describe(df, Seq("id", "cat")).queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate") || plan.contains("SortAggregate") ||
      plan.contains("ObjectHashAggregate"))
  }

  test("md5Bucket split is deterministic, disjoint, and near the requested fraction") {
    import org.apache.spark.sql.functions._
    val docs = graft.engine.GraftSession.table(spark, TestSpark.sfDir, "documents")
    val s1 = graft.operators.SampleOps.deterministicSplit(docs, "doc_id", 80,
      bucket = graft.operators.SampleOps.md5Bucket)
    val s2 = graft.operators.SampleOps.deterministicSplit(docs.repartition(7), "doc_id", 80,
      bucket = graft.operators.SampleOps.md5Bucket)
    // deterministic + repartition-stable
    assert(s1.select("doc_id", "split").exceptAll(s2.select("doc_id", "split")).count() == 0)
    val counts = s1.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = counts.values.sum.toDouble
    assert(counts("train") / total > 0.7 && counts("train") / total < 0.9, counts)
  }

  test("NULL ids: both bucket families yield NULL buckets, split lands them in test") {
    val withNull = Seq((Some(1L), "a"), (None, "b"), (None, "c")).toDF("id", "v")
    // a bare xxhash64(NULL) hashes the seed alone and would herd every
    // null-id row into one arbitrary bucket (all sampled or none)
    val h = withNull.select(SampleOps.hashBucket(col("id"))).collect()
    val m = withNull.select(SampleOps.md5Bucket(col("id"))).collect()
    assert(h.count(_.isNullAt(0)) == 2 && m.count(_.isNullAt(0)) == 2)
    val split = SampleOps.deterministicSplit(withNull, "id", 80)
      .filter(col("id").isNull).select("split").collect().map(_.getString(0))
    assert(split.toSeq == Seq("test", "test"))
    assert(SampleOps.hashSample(withNull, "id", 80).filter(col("id").isNull).count() == 0)
  }

  test("Profile.describe on an empty table: zero counts, not NULL NPE bait") {
    val empty = Seq.empty[(Long, String)].toDF("id", "v")
    val rows = Profile.describe(empty, Seq("id", "v")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows("id") == ((0L, 0L, 0L)) && rows("v") == ((0L, 0L, 0L)))
  }

  test("groupedSplit: every row of a group lands in one split; NULL group -> test") {
    val docs = Seq.tabulate(300)(i => (i.toLong, s"site${i % 17}")) :+ (300L, null)
    val split = SampleOps.groupedSplit(
      docs.toDF("doc_id", "source"), "source", 60, bucket = SampleOps.md5Bucket)
    val perGroup = split.groupBy("source")
      .agg(countDistinct(col("split")).as("k"), first(col("split")).as("s"))
      .collect()
    perGroup.foreach { r =>
      assert(r.getLong(1) == 1L, s"group ${r.get(0)} crosses splits")
      if (r.isNullAt(0)) assert(r.getString(2) == "test", "NULL group key must land in test")
    }
    // both splits are populated and the same hash decides row- and
    // group-level identically (17 sites, 60% target)
    val splits = split.select("split").distinct().collect().map(_.getString(0)).toSet
    assert(splits == Set("train", "test"))
  }

  test("diversity: exact Simpson / effective values from integer counts") {
    val df = (Seq.fill(6)(("a", "en")) ++ Seq.fill(2)(("a", "de")) ++
      Seq.fill(5)(("b", "zh")) ++ Seq(("c", null)))
      .toDF("source", "lang")
    val got = Profile.diversity(df, Seq("source"), "lang").collect()
      .map(r => r.getString(0) -> r).toMap
    val a = got("a") // n=8, counts 6,2 -> ss=40; simpson=(64-40)/64, eff=64/40
    assert(a.getLong(1) == 8L && a.getLong(2) == 2L, a.toString)
    assert(a.getDouble(3) == (64.0 - 40.0) / 64.0, a.toString)
    assert(a.getDouble(4) == 64.0 / 40.0, a.toString)
    val b = got("b") // single value: zero diversity, effective 1
    assert(b.getLong(2) == 1L && b.getDouble(3) == 0.0 && b.getDouble(4) == 1.0, b.toString)
    assert(!got.contains("c"), "all-NULL-value group has no diversity row")
  }

  test("regression: exact line recovered; zero-x-variance group is NULL") {
    // group a: y = 2x + 1 exactly; group b: constant x (undefined line);
    // group c: one row (n*sxx - sx^2 = 0 -> NULL, not a crash)
    val df = (Seq.tabulate(5)(i => ("a", Option(i.toDouble), 2.0 * i + 1.0)) ++
      Seq(("b", Some(3.0), 1.0), ("b", Some(3.0), 9.0), ("c", Some(2.0), 5.0),
        ("a", None, 99.0))) // null x drops
      .toDF("g", "x", "y")
    val got = Profile.regression(df, Seq("g"), "x", "y", scale = 2)
      .collect().map(r => r.getString(0) -> r).toMap
    val a = got("a")
    assert(a.getLong(1) == 5L, a.toString)
    assert(a.getDouble(2) == 2.0 && a.getDouble(3) == 1.0,
      s"exact sufficient stats must recover the exact line: $a")
    assert(got("b").isNullAt(2) && got("b").isNullAt(3), got("b").toString)
    assert(got("c").isNullAt(2) && got("c").isNullAt(3), got("c").toString)
  }

  test("budgetSelect: exact prefix cut, repartition-stable, within-level id order") {
    // quality levels 9,9,5,5,5,1 with weights; budget 10 selects in
    // (quality DESC, id ASC) order: (1,9,w4)+(2,9,w3)=7, then (3,5,w2)=9,
    // then (4,5,w2) would hit 11 > 10 -> cut
    val df = Seq((1L, 9L, 4L), (2L, 9L, 3L), (3L, 5L, 2L), (4L, 5L, 2L),
      (5L, 5L, 8L), (6L, 1L, 1L)).toDF("id", "q", "w")
    val got = SampleOps.budgetSelect(df, "id", "q", "w", budget = 10L)
    val ids = got.select("id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 2L, 3L), got.collect().mkString(", "))
    val cums = got.collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(cums == Map(1L -> 4L, 2L -> 7L, 3L -> 9L), cums.toString)
    val again = SampleOps.budgetSelect(df.repartition(7), "id", "q", "w", budget = 10L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(again == ids, "selection must be partitioning-invariant")
  }

  test("dedupClosedSplit: near-dup cluster never straddles the split; singletons hash as rows") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again today somehow"
    val docs = Seq(
      (1L, base), (2L, base + " twin"), (30L, base + " twin two"),
      (40L, "completely different content here entirely unrelated words throughout all"),
      (50L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = SampleOps.dedupClosedSplit(docs, "doc_id", "text", trainPct = 60,
        signature = Some(graft.operators.Dedup.md5MinhashSignature(_, 8)))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(got.size == 5)
    // the twin cluster shares one representative (the min id) and one side
    assert(got(1L)._1 == 1L && got(2L)._1 == 1L && got(30L)._1 == 1L, got.toString)
    assert(Set(got(1L)._2, got(2L)._2, got(30L)._2).size == 1,
      "near-dup cluster must land on ONE side: " + got)
    // singletons are their own representative; the null-text doc splits too
    assert(got(40L)._1 == 40L && got(50L)._1 == 50L, got.toString)
    // and the split of a singleton equals the plain row-hash split
    val plain = SampleOps.deterministicSplit(
        docs.filter(col("doc_id") === 40L), "doc_id", 60,
        bucket = SampleOps.md5Bucket)
      .select("split").head.getString(0)
    assert(got(40L)._2 == plain, "singleton must split exactly as the row-hash split")
  }

  test("weightedQuantiles: weighted rank, zero weights vanish, negative weight fails") {
    import spark.implicits._
    // values/weights: (10,1) (20,6) (30,3) -> W=10; p=0.5 rank 5 -> 20
    // (cum 1,7,10); p=0.95 rank 10 -> 30; the zero-weight 999 never appears
    val df = Seq((10L, 1L), (20L, 6L), (30L, 3L), (999L, 0L)).toDF("v", "w")
    val got = Profile.weightedQuantiles(df, "v", "w", Seq(0.5, 0.95))
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    assert(got == Map(0.5 -> 20L, 0.95 -> 30L), got.toString)
    val neg = Seq((1L, -2L)).toDF("v", "w")
    val ex = intercept[Exception](
      Profile.weightedQuantiles(neg, "v", "w", Seq(0.5)).collect())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("weightedQuantiles")), msgs(ex).mkString(" | "))
  }

  test("temperatureMix: sqrt quotas, population clamp, deterministic pick") {
    // big: 100 rows (w=10), small: 9 rows (w=3), tiny: 1 row (w=1) ->
    // tot=14; target 28 -> quotas big=20, small=6, tiny=1 (clamped by n)
    val df = (Seq.tabulate(100)(i => ("big", i.toLong)) ++
      Seq.tabulate(9)(i => ("small", 1000L + i)) ++ Seq(("tiny", 5000L)))
      .toDF("src", "id")
    val got = SampleOps.temperatureMix(df, "src", "id", targetTotal = 28L)
    val bySrc = got.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc == Map("big" -> 20L, "small" -> 6L, "tiny" -> 1L), bySrc.toString)
    val again = SampleOps.temperatureMix(df.repartition(7), "src", "id", 28L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(again == got.collect().map(r => (r.getString(0), r.getLong(1))).toSet,
      "hash-order pick must be partitioning-invariant")
    assert(SampleOps.temperatureMix(df.filter(col("id") < 0), "src", "id", 10L).count() == 0L)
  }

  test("mad: rank-exact both passes, outlier-immune, empty input empty frame") {
    import spark.implicits._
    // values 1..9 plus an outlier 1000: median = type-1 at ceil(0.5*10)=5
    // -> 5.0; deviations |v-5| sorted: 0,1,1,2,2,3,3,4,4,995 -> rank 5 -> 2.0
    val df = ((1 to 9).map(_.toDouble) :+ 1000.0).toDF("v")
    val got = Profile.mad(df, "v").collect()
    assert(got.length == 1 && got(0).getDouble(0) == 5.0 && got(0).getDouble(1) == 2.0,
      got.mkString(", "))
    // stddev would be ~313 here; MAD stays 2 — the outlier-immunity claim
    val empty = Profile.mad(df.filter(col("v") > 1e9), "v")
    assert(empty.count() == 0L && empty.columns.toSeq == Seq("median", "mad"))
  }

  test("categoricalDrift: hand-computed chi2, one-sided population, other labels excluded") {
    val df = (Seq.fill(30)(("en", "train")) ++ Seq.fill(10)(("en", "test")) ++
      Seq.fill(10)(("de", "train")) ++ Seq.fill(10)(("de", "test")) ++
      Seq.fill(3)(("fr", "validation")) ++ Seq(((null: String), "train")))
      .toDF("lang", "split")
    val got = Profile.categoricalDrift(df, "lang", "split", "train", "test")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got.size == 2, "validation label and NULL value excluded: " + got.keySet)
    // na=40 nb=20 n=60; en: row 40, ea=40*40/60, eb=40*20/60
    val (na, nb, n) = (40.0, 20.0, 60.0)
    def chi(a: Long, b: Long): Double = {
      val (ea, eb) = ((a + b) * na / n, (a + b) * nb / n)
      (a - ea) * (a - ea) / ea + (b - eb) * (b - eb) / eb
    }
    assert(got("en").getLong(1) == 30L && got("en").getLong(2) == 10L)
    assert(got("en").getDouble(3) == chi(30L, 10L), got("en").toString)
    assert(got("de").getDouble(3) == chi(10L, 10L), got("de").toString)
    // one empty side: counts survive, chi2 is NULL (expected undefined)
    val oneSided = Seq(("en", "train"), ("de", "train")).toDF("lang", "split")
    val os = Profile.categoricalDrift(oneSided, "lang", "split", "train", "test").collect()
    assert(os.length == 2 && os.forall(_.isNullAt(3)), os.mkString(", "))
    // both sides empty: empty frame with the right schema
    assert(Profile.categoricalDrift(oneSided, "lang", "split", "x", "y").count() == 0L)
  }

  test("budgetSelect: oversized first row selects nothing; negative weight fails loudly") {
    val big = Seq((1L, 9L, 100L), (2L, 5L, 1L)).toDF("id", "q", "w")
    assert(SampleOps.budgetSelect(big, "id", "q", "w", budget = 50L).count() == 0L,
      "greedy prefix: a first row wider than the budget blocks the cut")
    val neg = Seq((1L, 9L, 4L), (2L, 5L, -1L)).toDF("id", "q", "w")
    val ex = intercept[Exception] {
      SampleOps.budgetSelect(neg, "id", "q", "w", budget = 10L).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(m => m.contains("budgetSelect") && m.contains("`id`=2")),
      msgs(ex).mkString(" | "))
  }

  test("binnedKsDrift: hand-computed ECDF gaps, empty bins skipped, clamped top edge") {
    // A: 0,1,2,3  B: 2,3,3,3 ; vmin=0 vmax=3, 2 bins of width 1.5
    // bucket(v) = least(1, floor(v/3*2)): 0,1 -> 0 ; 2,3 -> 1
    val df = Seq(
      (0.0, "a"), (1.0, "a"), (2.0, "a"), (3.0, "a"),
      (2.0, "b"), (3.0, "b"), (3.0, "b"), (3.0, "b"),
      (99.0, "other"))  // other labels excluded from domain AND totals
      .toDF("v", "lbl")
    val got = Profile.binnedKsDrift(df, "v", "lbl", "a", "b", nBuckets = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5),
          r.getDouble(6)))).toMap
    assert(got.keySet == Set(0L, 1L), got.toString)
    assert(got(0L) == ((0.0, 2L, 0L, 0.5, 0.0, 0.5)), got(0L).toString)
    assert(got(1L) == ((1.5, 2L, 4L, 1.0, 1.0, 0.0)), got(1L).toString)
    // one-sided population: empty B slice -> NULL shares, not a crash
    val oneSided = Seq((1.0, "a"), (2.0, "a")).toDF("v", "lbl")
    val os = Profile.binnedKsDrift(oneSided, "v", "lbl", "a", "b", nBuckets = 2)
      .collect()
    assert(os.forall(r => r.isNullAt(5) && r.isNullAt(6)), os.mkString("; "))
    intercept[IllegalArgumentException](
      Profile.binnedKsDrift(df, "v", "lbl", "a", "a"))
  }

  test("curriculumPack: exact quartile stages, shard cuts at the token budget, tie cohesion") {
    // 8 docs, difficulty 1..8, 100 tokens each: rank-exact quartiles put
    // {1,2}->0 {3,4}->1 {5,6}->2 {7,8}->3; shardTokens=100 cuts each
    // stage's stream at offsets 0,100 -> seq_no {0,1} regardless of the
    // hash order (equal token counts)
    val df = (1L to 8L).map(i => (i, i * 10, 100L)).toDF("doc_id", "diff", "n_tokens")
    val got = SampleOps.curriculumPack(df, "doc_id", "diff", "n_tokens",
        nStages = 4, subShards = 1, shardTokens = 100L)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(2), r.getInt(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got.size == 8)
    (1L to 8L).foreach { i =>
      val expStage = (((i - 1) / 2)).toInt
      assert(got(i)._1 == expStage && got(i)._2 == 0 && got(i)._4 == 100L,
        s"doc $i -> ${got(i)}")
    }
    (0 until 4).foreach { st =>
      val seqs = got.values.filter(_._1 == st).map(_._3).toSeq.sorted
      assert(seqs == Seq(0L, 1L), s"stage $st cuts: $seqs")
    }
    // ties share a stage (the rule is on the VALUE, not the row)
    val ties = Seq((1L, Some(5), 10L), (2L, Some(5), 10L), (3L, Some(5), 10L),
      (4L, Some(5), 10L), (5L, None: Option[Int], 10L))
      .toDF("doc_id", "diff", "n_tokens")
    val t2 = SampleOps.curriculumPack(ties, "doc_id", "diff", "n_tokens",
        nStages = 4, subShards = 2, shardTokens = 1000L)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(t2.values.toSet == Set(0), s"equal difficulty is one stage: $t2")
    assert(!t2.contains(5L), "NULL difficulty has no curriculum position")
    intercept[IllegalArgumentException](
      SampleOps.curriculumPack(df, "doc_id", "diff", "n_tokens", nStages = 0))
  }

  test("giniConcentration: hand-computed Lorenz values, equal-mass zero, empty-mass NULL, negative fails") {
    val df = Seq(
      ("a", 1L), ("a", 2L), ("a", 3L), ("a", 4L), // G = (2*30 - 5*10)/(4*10) = 0.25
      ("b", 5L), ("b", 5L), ("b", 5L),            // equal masses: G = 0 exactly
      ("c", 7L),                                  // single doc: G = 0
      ("d", 0L), ("d", 0L))                       // zero total mass: NULL
      .toDF("src", "mass")
    val got = Profile.giniConcentration(df, Seq("src"), "mass")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    assert(got("a") == ((4L, 10L, Some(0.25))), got("a").toString)
    assert(got("b") == ((3L, 15L, Some(0.0))))
    assert(got("c") == ((1L, 7L, Some(0.0))))
    assert(got("d") == ((2L, 0L, None)))
    val ex = intercept[Exception] {
      Profile.giniConcentration(Seq(("x", -1L)).toDF("src", "mass"),
        Seq("src"), "mass").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("giniConcentration")), msgs(ex).mkString(" | "))
  }

  test("frequentItems: equals the exact threshold set under any partitioning") {
    // 200 noise values (1 row each) + two heavy values; n = 230,
    // k = 9 -> threshold 23: only "hot" (25) qualifies; "warm" (5) and
    // noise do not. NDV (202) >> k so the sketch must actually evict.
    val data = (1 to 200).map(i => s"noise$i") ++
      Seq.fill(25)("hot") ++ Seq.fill(5)("warm")
    Seq(1, 7, 32).foreach { parts =>
      val df = data.toDF("v").repartition(parts)
      val got = Profile.frequentItems(df, "v", k = 9)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      assert(got.toSeq == Seq(("hot", 25L, 25.0 / 230)),
        s"parts=$parts -> ${got.mkString(";")}")
    }
    // no qualifying value -> empty, not an error; and the k guard
    val flat = (1 to 50).map(i => s"v$i").toDF("v")
    assert(Profile.frequentItems(flat, "v", k = 4).count() == 0)
    intercept[IllegalArgumentException](Profile.frequentItems(flat, "v", k = 0))
  }

  test("cramersV: perfect association 1.0, independence 0.0, degenerate NULL, empty input") {
    val perfect = (Seq.fill(10)(("a", "x")) ++ Seq.fill(10)(("b", "y"))).toDF("s", "l")
    val p = Profile.cramersV(perfect, "s", "l").collect().head
    assert((p.getLong(0), p.getLong(1), p.getLong(2), p.getLong(3)) == ((20L, 2L, 2L, 2L)))
    assert(p.getDouble(4) == 20.0 && p.getDouble(5) == 1.0, p.toString)
    val indep = (Seq.fill(5)(("a", "x")) ++ Seq.fill(5)(("a", "y")) ++
      Seq.fill(5)(("b", "x")) ++ Seq.fill(5)(("b", "y"))).toDF("s", "l")
    val i = Profile.cramersV(indep, "s", "l").collect().head
    assert(i.getDouble(4) == 0.0 && i.getDouble(5) == 0.0, i.toString)
    // one-category column: V undefined, chi2 still 0
    val deg = Seq(("a", "x"), ("a", "y")).toDF("s", "l")
    val dg = Profile.cramersV(deg, "s", "l").collect().head
    assert(dg.getDouble(4) == 0.0 && dg.isNullAt(5), dg.toString)
    // empty input: ONE row (the documented contract, matching SQL
    // aggregate-over-empty: SUM -> NULL, COUNTs -> 0), never zero rows
    val er = Profile.cramersV(
      Seq.empty[(String, String)].toDF("s", "l"), "s", "l").collect()
    assert(er.length == 1, s"empty input must yield exactly one row, got ${er.length}")
    assert(er.head.isNullAt(0) && er.head.getLong(1) == 0L &&
      er.head.getLong(2) == 0L && er.head.getLong(3) == 0L &&
      er.head.isNullAt(4) && er.head.isNullAt(5), er.head.toString)
  }

  test("correlationMatrix: exact ±1 pairs, constant-column NULLs, listwise-shared n") {
    // y = 2x (r = 1), z = −x (r = −1), w constant (undefined), and one
    // row with NULL w: listwise deletion keeps n = 4 for EVERY pair
    val df = Seq(
      (1, 2, -1, Some(5)), (2, 4, -2, Some(5)),
      (3, 6, -3, Some(5)), (4, 8, -4, Some(5)),
      (10, 20, -10, None: Option[Int]))
      .toDF("x", "y", "z", "w")
    val got = Profile.correlationMatrix(df, Seq("x", "y", "z", "w"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    assert(got.size == 6)
    assert(got(("x", "y")) == ((4L, Some(1.0))), got.toString)
    assert(got(("x", "z")) == ((4L, Some(-1.0))))
    assert(got(("y", "z")) == ((4L, Some(-1.0))))
    Seq(("x", "w"), ("y", "w"), ("z", "w")).foreach(p =>
      assert(got(p) == ((4L, None)), s"$p constant column must be NULL"))
    intercept[IllegalArgumentException](
      Profile.correlationMatrix(df, Seq("x", "x")))
  }

  test("splitLeakage: equals an independent per-fingerprint derivation") {
    // 40 ids over 10 distinct texts (4 copies each): whichever side the
    // md5 buckets land on, the audit must match a from-scratch fold
    val docs = (1L to 40L).map(i => (i, s"doc number ${i % 10}")).toDF("doc_id", "text")
    val sides = docs
      .select(col("doc_id"), (SampleOps.md5Bucket(col("doc_id")) < 80).as("tr"), col("text"))
      .collect().map(r => (r.getBoolean(1), r.getString(2)))
    val byText = sides.groupBy(_._2).view.mapValues { rs =>
      (rs.count(_._1).toLong, rs.count(!_._1).toLong)
    }.toMap
    val expTrain = byText.values.map(_._1).sum
    val expTest = byText.values.map(_._2).sum
    val expBoth = byText.values.count { case (a, b) => a > 0 && b > 0 }.toLong
    val expLeaked = byText.values.collect { case (a, b) if a > 0 => b }.sum
    val got = SampleOps.splitLeakage(docs, "doc_id", "text", trainPct = 80)
      .collect().head
    assert((got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3)) ==
      ((expTrain, expTest, expBoth, expLeaked)), got.toString)
    assert(got.getDouble(4) == expLeaked.toDouble / expTest)
    // with 4 copies of everything, a 20% test side is virtually certain
    // to be contaminated — the fact x13 exists to fix
    assert(got.getLong(3) > 0, "fixture must show leakage")
    intercept[IllegalArgumentException](
      SampleOps.splitLeakage(docs, "doc_id", "text", trainPct = 0))
  }

  test("mergeable profile state: merge == from-scratch, associative, nulls and clamps roll up") {
    val vals = Seq.tabulate(300)(i =>
      (i.toLong, if (i % 7 == 0) None else Some((i * 13 % 700).toLong - 20L)))
      .toDF("id", "v") // some NULLs, some below lo=0, some above hi=512
    def stateOf(d: org.apache.spark.sql.DataFrame) =
      Profile.numericProfileState(d, "v", 0L, 512L, 8)
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.get(2), r.get(3), r.get(4), r.get(5)))).toMap
    val a = vals.filter(col("id") % 3 === 0)
    val b = vals.filter(col("id") % 3 === 1)
    val c = vals.filter(col("id") % 3 === 2)
    val whole = rows(stateOf(vals))
    // merge of the 3 shard states == the from-scratch state of the union
    val merged = rows(Profile.mergeProfileStates(stateOf(a), stateOf(b), stateOf(c)))
    assert(merged == whole, s"merged=$merged whole=$whole")
    // associativity: ((a+b)+c) == (a+(b+c))
    val left = rows(Profile.mergeProfileStates(
      Profile.mergeProfileStates(stateOf(a), stateOf(b)), stateOf(c)))
    val right = rows(Profile.mergeProfileStates(
      stateOf(a), Profile.mergeProfileStates(stateOf(b), stateOf(c))))
    assert(left == right && left == whole)
    // structure: NULLs in bucket -1 with null sums; out-of-range clamps
    // land in the end buckets; all 300 rows accounted for
    assert(whole.contains(-1L) && whole(-1L)._2 == null)
    assert(whole.keySet.forall(k => k >= -1 && k <= 7))
    assert(whole.values.map(_._1).sum == 300L)
    // the one-row corpus profile derives from state alone — against a
    // directly computed check
    val p = Profile.profileFromState(Profile.mergeProfileStates(
        stateOf(a), stateOf(b), stateOf(c)))
      .collect().head
    val direct = vals.filter(col("v").isNotNull)
      .agg(count(lit(1)), avg(col("v")), min(col("v")), max(col("v"))).head()
    assert(p.getLong(0) == 300L && p.getLong(1) == vals.filter(col("v").isNull).count())
    assert(math.abs(p.getDouble(2) - direct.getDouble(1)) < 1e-9)
    assert(p.getLong(4) == direct.getLong(2) && p.getLong(5) == direct.getLong(3))
    intercept[IllegalArgumentException](
      Profile.numericProfileState(vals, "v", 10L, 10L, 8))
  }

  test("profile-state compaction: superseded generation drops, compacted merge == effective from-scratch, idempotent") {
    val vals = Seq.tabulate(240)(i => (i.toLong, (i * 11 % 500).toLong))
      .toDF("id", "v")
    def stateOf(d: org.apache.spark.sql.DataFrame) =
      Profile.numericProfileState(d, "v", 0L, 512L, 8)
    def tag(d: org.apache.spark.sql.DataFrame, sh: String, g: Int) =
      d.withColumn("shard", lit(sh)).withColumn("gen", lit(g))
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.get(2), r.get(3), r.get(4), r.get(5)))).toMap
    val shardA = vals.filter(col("id") % 2 === 0)
    val shardB = vals.filter(col("id") % 2 === 1)
    // B's first profile ran on a stale partial (every 4th id); gen 2
    // re-profiles the full shard — the supersede case
    val stale = vals.filter(col("id") % 4 === 1)
    val states = tag(stateOf(shardA), "A", 1)
      .unionByName(tag(stateOf(stale), "B", 1))
      .unionByName(tag(stateOf(shardB), "B", 2))
    val compacted = Profile.compactProfileStates(states)
    // only A gen-1 and B gen-2 rows survive
    assert(compacted.select("shard", "gen").distinct().collect()
      .map(r => (r.getString(0), r.getInt(1))).toSet == Set(("A", 1), ("B", 2)))
    // compacted merge == the from-scratch state of the EFFECTIVE corpus
    val merged = rows(Profile.mergeProfileStates(compacted.drop("shard", "gen")))
    assert(merged == rows(stateOf(vals)), "compacted merge != effective from-scratch")
    // a NAIVE merge over all three states double-counts the stale shard
    val naive = rows(Profile.mergeProfileStates(states.drop("shard", "gen")))
    assert(naive.values.map(_._1).sum == 240L + 60L, "fixture must make naive wrong")
    // idempotent
    assert(rows(Profile.mergeProfileStates(
        Profile.compactProfileStates(compacted).drop("shard", "gen")))
      == merged)
    // duplicate-inclusion guard (round 16): the same (shard, gen) state
    // unioned twice survives a latest-gen filter and would double-count —
    // compaction must fail loudly, not pass it through
    val doubled = states.unionByName(tag(stateOf(shardA), "A", 1))
    val e = intercept[Exception](Profile.compactProfileStates(doubled).collect())
    assert(e.getMessage != null && e.getMessage.contains("duplicate state rows"),
      s"expected the duplicate-inclusion error, got: ${e.getMessage}")
  }

  test("quantile rank EPS: exactly-integral q*N (0.55 * 100) does not shift the bucket") {
    // ceil(0.55 * 100) = ceil(55.000000000000007) = 56 in doubles: without
    // the 1e-9 guard the rank — and with 1 value per bucket, the reported
    // bucket — shifts by one. Values 0..99 over [0, 100) x 100 buckets:
    // rank must be 55, the 55th smallest value is 54, bucket 54.
    val vals = Seq.tabulate(100)(i => (i.toLong, i.toLong)).toDF("id", "v")
    val row = Profile.quantilesFromState(
      Profile.numericProfileState(vals, "v", 0L, 100L, 100),
      Seq(0.55), 0L, 100L, 100).collect()
    assert(row.length == 1)
    assert(row(0).getLong(1) == 54L,
      s"q=0.55, n=100 must hit bucket 54 (rank 55), got ${row(0).getLong(1)}")
  }

  test("quantile/histogram state read-out: merge == from-scratch any order, exact quantile within bounds, bounds integer-exact") {
    val vals = Seq.tabulate(500)(i => (i.toLong, (i * 37 % 1000).toLong))
      .toDF("id", "v")
    def stateOf(d: org.apache.spark.sql.DataFrame) =
      Profile.numericProfileState(d, "v", 0L, 1024L, 16)
    val qs = Seq(0.25, 0.5, 0.75, 0.9)
    def ans(st: org.apache.spark.sql.DataFrame) =
      Profile.quantilesFromState(st, qs, 0L, 1024L, 16).collect()
        .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4))).toSet
    // answering merged shard states == answering the from-scratch state,
    // whatever the merge order (bucket counts add exactly)
    val shards = (0 until 3).map(i => stateOf(vals.filter(col("id") % 3 === i)))
    val fromScratch = ans(stateOf(vals))
    assert(fromScratch.size == qs.size)
    assert(ans(Profile.mergeProfileStates(shards: _*)) == fromScratch)
    assert(ans(Profile.mergeProfileStates(shards.reverse: _*)) == fromScratch)
    // containment: the sort-derived exact q-quantile (rank max(1,
    // ceil(q*N)), the read-out's own rank rule) lies in [lo_v, hi_v)
    val sorted = vals.select("v").collect().map(_.getLong(0)).sorted
    fromScratch.foreach { case (q, _, loV, hiV, n) =>
      assert(n == 500L)
      val exact = sorted(math.max(1, math.ceil(q * n - 1e-9).toInt) - 1)
      assert(exact >= loV && exact < hiV, s"q=$q exact=$exact not in [$loV, $hiV)")
    }
    // histogram read-out: counts match a direct recompute and bounds are
    // the integer-exact bucket tiling of [lo, hi)
    val hist = Profile.histogramFromState(stateOf(vals), 0L, 1024L, 16)
      .filter(col("bucket") >= 0).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    val direct = vals
      .select(expr("(LEAST(GREATEST(v, 0L), 1023L) * 16L) div 1024L").as("b"))
      .groupBy("b").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hist.map(_._1).toSet == direct.keySet)
    hist.foreach { case (b, loV, hiV, n) =>
      assert(direct(b) == n, s"bucket $b count $n != direct ${direct(b)}")
      assert(loV == b * 64 && hiV == (b + 1) * 64, s"bucket $b bounds [$loV, $hiV)")
    }
    // an all-NULL/empty state answers no quantiles (no silent zero row)
    assert(Profile.quantilesFromState(
      stateOf(vals.filter(lit(false))), qs, 0L, 1024L, 16).count() == 0L)
  }

  test("log-bucket state: bound-free merge == from-scratch, containment, relative width, bounded size, geometry check") {
    // magnitudes spanning 9 decades plus zero and negatives — exactly the
    // corpus where fixed [lo, hi) buckets would need a pre-scan
    val raw = Seq(-1000000L, -777L, -3L, 0L, 0L, 1L, 2L, 3L, 63L, 64L, 65L,
      1000L, 12345L, 999999L, 123456789L, 4000000000L) ++
      Seq.tabulate(300)(i => (i * i * 37 + 1).toLong)
    val vals = raw.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val subBits = 4
    def stateOf(d: org.apache.spark.sql.DataFrame) =
      Profile.logBucketState(d, "v", subBits)
    def rows(st: org.apache.spark.sql.DataFrame) = st.collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getInt(4))).toSet
    // merge == from-scratch hash-for-hash, any shard split and order
    val whole = rows(stateOf(vals))
    Seq(2, 3, 5).foreach { shards =>
      val states = (0 until shards).map(s => stateOf(vals.filter(col("id") % shards === s)))
      Seq(states, states.reverse).foreach { order =>
        assert(rows(Profile.mergeLogBucketStates(order: _*)) == whole,
          s"merged $shards-way state != from-scratch")
      }
    }
    // state is bounded and far smaller than the documented worst case
    assert(whole.size <= 2 * (63 - subBits) * (1 << (subBits + 1)) + (1 << (subBits + 2)) + 1)
    // the total count is preserved
    assert(whole.toSeq.map(_._4).sum == raw.size)
    // containment + relative width: the sort-derived exact q-quantile
    // (the read-out's shared EPS rank rule) lies in [lo_v, hi_v), and the
    // interval's width obeys the 2^-subBits relative bound
    val qs = Seq(0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0)
    val sorted = raw.sorted
    val got = Profile.quantilesFromLogBucketState(stateOf(vals), qs).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length == qs.size)
    got.foreach { case (q, loV, hiV, n) =>
      assert(n == raw.size.toLong)
      val exact = sorted(math.max(1, math.ceil(q * n - 1e-9).toInt) - 1)
      assert(exact >= loV && exact < hiV, s"q=$q exact=$exact not in [$loV, $hiV)")
      // relative width: exact for small magnitudes, <= |lo|/2^subBits wide
      assert(hiV - loV == 1L ||
        (hiV - loV).toDouble <= math.max(math.abs(loV), math.abs(hiV)) / (1 << subBits),
        s"q=$q interval [$loV, $hiV) wider than the relative bound")
    }
    // buckets tile the line: values on EXACT bucket boundaries (powers of
    // two and their neighbors, negatives) each land in exactly one bucket
    val boundary = Seq(-65L, -64L, -63L, -1L, 0L, 1L, 15L, 16L, 17L,
      (1L << 40) - 1, 1L << 40, (1L << 40) + 1)
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    assert(rows(stateOf(boundary)).toSeq.map(_._4).sum == 12L)
    // mixed sub_bits geometries fail loudly instead of colliding keys
    val e = intercept[Exception](Profile.mergeLogBucketStates(
      stateOf(vals), Profile.logBucketState(vals, "v", 5)).collect())
    assert(e.getMessage != null && e.getMessage.contains("sub_bits"))
    // values at the domain guard fail loudly, not silently mis-bucket
    val huge = Seq((1L, 1L << 62)).toDF("id", "v")
    val e2 = intercept[Exception](Profile.logBucketState(huge, "v", subBits).collect())
    assert(e2.getMessage != null && e2.getMessage.contains("2^62"))
    // empty input answers no quantiles (no silent zero row)
    assert(Profile.quantilesFromLogBucketState(
      stateOf(vals.filter(lit(false))), qs).count() == 0L)
  }

  test("hll state: merge == from-scratch, duplicate-invariance, both estimator regimes within error, geometry checks") {
    val p = 9
    val m = 1 << p
    def stateOf(d: org.apache.spark.sql.DataFrame) = Profile.hllState(d, "v", p)
    def rows(st: org.apache.spark.sql.DataFrame) = st.collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSet
    def est(st: org.apache.spark.sql.DataFrame) = {
      val r = Profile.distinctFromHllState(st, p).collect()
      assert(r.length == 1)
      (r(0).getLong(0), r(0).getLong(1), r(0).getLong(2),
        r(0).getString(4), r(0).getDouble(5))
    }
    // RAW regime: 5000 distinct values >> 2.5m = 1280
    val big = (0 until 5000).map(i => (i.toLong, s"val_$i")).toDF("id", "v")
    val whole = rows(stateOf(big))
    assert(whole.size <= m)
    assert(whole.forall { case (idx, reg, hp) =>
      idx >= 0 && idx < m && reg >= 1 && reg <= 61 - p && hp == p })
    // merge == from-scratch hash-for-hash, any shard split and order
    Seq(2, 3, 5).foreach { shards =>
      val states = (0 until shards).map(s =>
        stateOf(big.filter(col("id") % shards === s)))
      Seq(states, states.reverse).foreach { order =>
        assert(rows(Profile.mergeHllStates(order: _*)) == whole,
          s"merged $shards-way state != from-scratch")
      }
    }
    // duplicates change nothing: the sketch counts DISTINCT values
    assert(rows(stateOf(big.unionAll(big).unionAll(big))) == whole)
    // raw-regime accuracy: within 3 standard errors (1.04/sqrt(m))
    val (m1, _, _, method1, e1) = est(stateOf(big))
    assert(m1 == m.toLong && method1 == "raw")
    assert(math.abs(e1 - 5000.0) / 5000.0 <= 3.0 * 1.04 / math.sqrt(m.toDouble),
      s"raw estimate $e1 off by more than 3 sigma from 5000")
    // LINEAR regime: 100 distinct values (duplicated) << 2.5m
    val small = (0 until 400).map(i => (i.toLong, s"u_${i % 100}")).toDF("id", "v")
    val (_, nz2, _, method2, e2) = est(stateOf(small))
    assert(method2 == "linear" && nz2 > 0)
    assert(math.abs(e2 - 100.0) / 100.0 <= 0.15,
      s"linear estimate $e2 off by more than 15% from 100")
    // empty input: est = 0.0 via the linear fixed point, never a non-row
    val (_, nz3, _, method3, e3) = est(stateOf(big.filter(lit(false))))
    assert(nz3 == m.toLong && method3 == "linear" && e3 == 0.0)
    // mixed hll_p geometries fail loudly instead of colliding registers
    val e4 = intercept[Exception](Profile.mergeHllStates(
      stateOf(big), Profile.hllState(big, "v", 8)).collect())
    assert(e4.getMessage != null && e4.getMessage.contains("hll_p"))
    // a read-out at the wrong p fails loudly too
    val e5 = intercept[Exception](
      Profile.distinctFromHllState(stateOf(big), 10).collect())
    assert(e5.getMessage != null && e5.getMessage.contains("hll_p"))
    // guards
    intercept[IllegalArgumentException](Profile.hllState(big, "v", 3))
    intercept[IllegalArgumentException](Profile.mergeHllStates())
  }

  test("functionalDependencies: held, violated with exact counts, null discipline, fan-out") {
    val df = Seq(
      (1L, "a", "X"), (2L, "a", "X"), (3L, "a", "Y"),   // a -> {X, Y}: violates
      (4L, "b", "X"), (5L, "b", "X"),                   // b -> {X}: fine
      (6L, "c", null.asInstanceOf[String]),             // c -> only NULL: fan-out 0
      (7L, null.asInstanceOf[String], "Z"))             // NULL key excluded
      .toDF("id", "k", "v")
    val got = Profile.functionalDependencies(df,
        Seq(("id", "k"), ("k", "v"), ("k", "id")))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap
    // id is unique -> FD holds over all 7 non-null ids (NULL k fans 0 for id 7)
    assert(got(("id", "k")) == ((7L, 0L, 1L, true)), got.toString)
    // k -> v: keys a (2 dependents), b (1), c (0 - only NULL) => 1 violation
    assert(got(("k", "v")) == ((3L, 1L, 2L, false)), got.toString)
    // k -> id: every key fans out to its row count => a:3, b:2, c:1
    assert(got(("k", "id")) == ((3L, 2L, 3L, false)), got.toString)
    intercept[IllegalArgumentException](Profile.functionalDependencies(df, Seq()))
  }

  test("kmv state: merge == from-scratch bottom-k, overlap estimates within error, exact regime, geometry checks") {
    val k = 128
    def stateOf(d: org.apache.spark.sql.DataFrame, kk: Int = k) =
      Profile.kmvState(d, "v", kk)
    def rows(st: org.apache.spark.sql.DataFrame) = st.collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    // A = ids 0..999, B = ids 500..1499: true J = 1/3, union 1500, inter 500
    val a = (0 until 1000).map(i => (i.toLong, s"id_$i")).toDF("id", "v")
    val b = (500 until 1500).map(i => (i.toLong, s"id_$i")).toDF("id", "v")
    // merge == from-scratch hash-for-hash, any shard split and order
    val whole = rows(stateOf(a))
    assert(whole.size == k && whole.forall(_._2 == k))
    Seq(2, 3, 5).foreach { shards =>
      val states = (0 until shards).map(s => stateOf(a.filter(col("id") % shards === s)))
      Seq(states, states.reverse).foreach { order =>
        assert(rows(Profile.mergeKmvStates(k, order: _*)) == whole,
          s"merged $shards-way state != from-scratch")
      }
    }
    // duplicates change nothing: hashes are distinct'd
    assert(rows(stateOf(a.unionAll(a))) == whole)
    // the state IS the k smallest: merging with a superset-corpus state
    // never pushes a kept hash out unless a smaller one arrives — check
    // bottom-k ordering directly against the brute-force hash set
    val allHashes = a.select(
        expr("cast(conv(substring(md5(cast(v as string)), 1, 15), 16, 10) as bigint)").as("h"))
      .collect().map(_.getLong(0)).sorted.take(k).toSet
    assert(whole.map(_._1) == allHashes)
    // overlap estimates within error bounds (3 sigma-ish)
    val ov = Profile.kmvOverlap(stateOf(a), stateOf(b), k).collect()
    assert(ov.length == 1)
    val r = ov(0)
    assert(r.getInt(0) == k && r.getString(8) == "estimate")
    val (jac, uni, inter) = (r.getDouble(5), r.getDouble(6), r.getDouble(7))
    assert(math.abs(jac - 1.0 / 3.0) <= 0.15, s"jaccard_est $jac vs 1/3")
    assert(math.abs(uni - 1500.0) / 1500.0 <= 0.30, s"union_est $uni vs 1500")
    assert(math.abs(inter - 500.0) / 500.0 <= 0.45, s"inter_est $inter vs 500")
    // exact regime: NDV < k on both sides -> every figure exact
    val sa = (0 until 60).map(i => (i.toLong, s"id_$i")).toDF("id", "v")
    val sb = (30 until 90).map(i => (i.toLong, s"id_$i")).toDF("id", "v")
    val ex = Profile.kmvOverlap(stateOf(sa), stateOf(sb), k).collect()(0)
    assert(ex.getString(8) == "exact")
    assert(ex.getLong(3) == 90L && ex.getLong(4) == 30L)
    assert(ex.getDouble(5) == 30.0 / 90.0 && ex.getDouble(6) == 90.0 &&
      ex.getDouble(7) == (30.0 / 90.0) * 90.0)
    // empty sides: zero row counts, zeroed estimates, never a crash
    val e0 = Profile.kmvOverlap(
      stateOf(a.filter(lit(false))), stateOf(b.filter(lit(false))), k).collect()(0)
    assert(e0.getLong(3) == 0L && e0.getDouble(5) == 0.0 &&
      e0.getDouble(6) == 0.0 && e0.getString(8) == "exact")
    // mixed kmv_k geometries fail loudly instead of biasing the kth min
    val eMix = intercept[Exception](
      Profile.mergeKmvStates(k, stateOf(a), stateOf(b, kk = 64)).collect())
    assert(eMix.getMessage != null && eMix.getMessage.contains("kmv_k"))
    // guards
    intercept[IllegalArgumentException](Profile.kmvState(a, "v", 0))
    intercept[IllegalArgumentException](Profile.mergeKmvStates(k))
    intercept[IllegalArgumentException](Profile.kmvOverlap(stateOf(a), stateOf(b), 0))
  }

  test("misra-gries state: merged-state heavy hitters == frequentItems under any shard split; state bounded by k") {
    // p15's shape: 200-value noise floor + two heavy values, NDV >> k
    val data = (1 to 200).map(i => s"noise$i") ++
      Seq.fill(25)("hot") ++ Seq.fill(5)("warm")
    val df = data.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
    val expect = Profile.frequentItems(df, "v", k = 9)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(expect == Seq(("hot", 25L, 25.0 / 230)))
    // any shard split, any state order: the merged-state result is equal
    Seq(2, 3, 5).foreach { shards =>
      val states = (0 until shards).map(s =>
        Profile.misraGriesState(df.filter(col("id") % shards === s), "v", 9))
      // every persisted state is <= k rows however the shard looks
      states.foreach(st => assert(st.count() <= 9))
      Seq(states, states.reverse).foreach { order =>
        val got = Profile.frequentItemsFromStates(df, "v", 9, order: _*)
          .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
        assert(got == expect, s"shards=$shards -> $got")
      }
    }
    // the merged STATE itself keeps the one-sided guarantee: hot present
    val st = (0 until 3).map(s =>
      Profile.misraGriesState(df.filter(col("id") % 3 === s), "v", 9))
    val mergedItems = Profile.mergeMisraGriesStates(9, st: _*)
      .collect().map(_.getString(0)).toSet
    assert(mergedItems.contains("hot") && mergedItems.size <= 9)
    // guards
    intercept[IllegalArgumentException](Profile.misraGriesState(df, "v", 0))
    intercept[IllegalArgumentException](Profile.mergeMisraGriesStates(9))
  }
}
