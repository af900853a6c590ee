package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{DotProductExpr, MatchFractionExpr, RollingMinHashExpr, SimHashTextExpr, UnitNormExpr}

class FunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("DotProductExpr computes the exact dot product") {
    val df = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0))).toDF("a", "b")
    val v = df.select(DotProductExpr.dotProduct(col("a"), col("b"))).collect()(0).getDouble(0)
    assert(v == 32.0)
  }

  test("DotProductExpr survives both codegen and interpreted paths") {
    val df = Seq.tabulate(100)(i => (Array.fill(8)(i.toDouble), Array.fill(8)(2.0)))
      .toDF("a", "b")
    val got = df.select(DotProductExpr.dotProduct(col("a"), col("b")).as("d"))
      .agg(sum(col("d"))).collect()(0).getDouble(0)
    assert(got == (0 until 100).map(i => i * 2.0 * 8).sum)
  }

  test("rolling min-hash: deterministic, content-sensitive") {
    val df = Seq((1L, "the quick brown fox"), (2L, "the quick brown fox"), (3L, "a different text"))
      .toDF("id", "text")
    val fps = df.select(RollingMinHashExpr.rollingMinHash(col("text"), 8))
      .collect().map(_.getLong(0))
    assert(fps(0) == fps(1) && fps(0) != fps(2))
  }

  test("rolling min-hash: shared long chunk gives shared fingerprint") {
    val common = "spark catalyst tungsten adaptive execution columnar parquet shuffle " * 3
    val df = Seq((1L, common + " tail one"), (2L, "head two " + common)).toDF("id", "text")
    val fps = df.select(RollingMinHashExpr.rollingMinHash(col("text"), 16))
      .collect().map(_.getLong(0))
    assert(fps(0) == fps(1)) // min window falls inside the shared chunk
  }

  test("native expressions are callable from SQL after registration") {
    graft.engine.GraftSession.registerFunctions(spark)
    Seq((1L, "the quick brown fox", Array(1.0, 2.0), Array(3.0, 4.0)))
      .toDF("id", "text", "a", "b").createOrReplaceTempView("fn_probe")
    val r = spark.sql(
      """SELECT rolling_minhash(text, 8) AS rh, dot_product(a, b) AS dp,
                size(minhash_signature(array(xxhash64(text)), 16)) AS sig_len
         FROM fn_probe""").collect()(0)
    assert(r.getDouble(1) == 11.0 && r.getInt(2) == 16)
  }

  test("rolling min-hash: short and empty inputs do not fail") {
    val df = Seq((1L, ""), (2L, "ab")).toDF("id", "text")
    val fps = df.select(RollingMinHashExpr.rollingMinHash(col("text"), 16)).collect()
    assert(fps.length == 2)
  }

  test("rolling min-hash: optimized recurrence equals the direct-definition twin") {
    // edge shapes the rolling update could get wrong: empty, shorter than
    // the window (w clamps to n), exactly the window, window+1 (first
    // rolling step), multi-byte UTF-8 (byte- not char-windows), long text
    // with 64-bit wrap-around, and NULL (both null-intolerant)
    val texts = Seq("", "ab", "0123456789abcdef", "0123456789abcdefg",
      "äöü €𝄞 мир 漢字", "spark catalyst tungsten " * 40, null)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val rows = df.select(
        RollingMinHashExpr.rollingMinHash(col("text"), 16).as("opt"),
        RollingMinHashExpr.rollingMinHashNaive(col("text"), 16).as("ref"))
      .collect()
    rows.foreach { r => assert(r.isNullAt(0) == r.isNullAt(1) &&
      (r.isNullAt(0) || r.getLong(0) == r.getLong(1)), s"mismatch: $r") }
  }

  test("SimHashTextExpr matches the explode/groupBy column-algebra form bit-for-bit") {
    val df = Seq((1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "spark catalyst tungsten adaptive"), (3L, "one"), (4L, "  padded   tokens  "))
      .toDF("id", "text")
    // oracle: the staged form — explode tokens, xxhash64, 64 ±1 bit sums, sign
    val toks = df.select(col("id"), explode(filter(split(col("text"), " "), w => w =!= "")).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val bitSums = (0 until 64).map { bit =>
      sum(when(shiftright(col("h"), bit).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$bit")
    }
    val staged = toks.groupBy(col("id")).agg(bitSums.head, bitSums.tail: _*)
      .select(col("id"),
        (0 until 64).map(bit => when(col(s"b$bit") > 0, lit(1L << bit)).otherwise(0L))
          .reduce(_ bitwiseOR _).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fused = df.select(col("id"), SimHashTextExpr.simhashText(col("text")).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fused == staged)
  }

  test("UnitNormExpr normalizes float and double arrays; zero vector passes through") {
    val f = Seq((1L, Array(3.0f, 4.0f)), (2L, Array(0.0f, 0.0f))).toDF("id", "v")
    val rows = f.select(col("id"), UnitNormExpr.unitNorm(col("v")).as("u"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(rows(1L) == Seq(0.6, 0.8) && rows(2L) == Seq(0.0, 0.0))
    val d = Seq((1L, Array(1.0, 1.0, 1.0, 1.0))).toDF("id", "v")
      .select(UnitNormExpr.unitNorm(col("v"))).collect()(0).getSeq[Double](0)
    assert(d == Seq(0.5, 0.5, 0.5, 0.5))
  }

  test("MatchFractionExpr equals the zip_with/filter/size form") {
    val df = Seq(
      (Array(1L, 2L, 3L, 4L), Array(1L, 9L, 3L, 4L)),
      (Array(1L, 2L), Array(5L, 6L))).toDF("a", "b")
    val staged = df.select(
      (size(filter(zip_with(col("a"), col("b"), (x, y) => x === y), b => b)).cast("double") /
        size(col("a"))).as("f")).collect().map(_.getDouble(0))
    val native = df.select(MatchFractionExpr.matchFraction(col("a"), col("b")).as("f"))
      .collect().map(_.getDouble(0))
    assert(native(0) == 0.75 && native(0) == staged(0))
    assert(native(1) == 0.0 && native(1) == staged(1))
    // staged form divides by zero on empty signatures (ANSI); native defines 0.0
    val empty = Seq((Array.empty[Long], Array.empty[Long])).toDF("a", "b")
      .select(MatchFractionExpr.matchFraction(col("a"), col("b"))).collect()(0).getDouble(0)
    assert(empty == 0.0)
  }

  test("MinHashTextExpr: interior whitespace runs do not change the signature") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick  brown fox jumps  over the   lazy dog"), // extra spaces only
      (3L, "a different document entirely about databases"))
      .toDF("id", "text")
    val sigs = df.select(col("id"),
      graft.functions.MinHashTextExpr.minhashText(col("text")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) == sigs(2L), "single-space canonical form must collide")
    assert(sigs(1L) != sigs(3L))
  }

  test("DotProductExpr: ragged lengths and null elements yield NULL, never a fabricated score") {
    val df = Seq(
      (1L, Array(1.0, 2.0), Array(3.0, 4.0, 5.0)), // ragged
      (2L, Array(1.0, 2.0), Array(3.0, 4.0)))      // clean
      .toDF("id", "a", "b")
    val rows = df.select(col("id"), DotProductExpr.dotProduct(col("a"), col("b")).as("d"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(rows(1L).isEmpty && rows(2L).contains(11.0))
    val withNull = spark.sql(
      "SELECT dot_product(array(1.0D, CAST(NULL AS DOUBLE)), array(2.0D, 3.0D)) AS d")
    assert(withNull.collect()(0).isNullAt(0))
  }

  test("null array elements: unit_norm propagates null, match_fraction never matches them") {
    graft.engine.GraftSession.registerFunctions(spark)
    val r = spark.sql(
      """SELECT unit_norm(array(3.0D, CAST(NULL AS DOUBLE), 4.0D)) AS un,
                match_fraction(array(1L, CAST(NULL AS BIGINT)),
                               array(2L, CAST(NULL AS BIGINT))) AS mf""").collect()(0)
    assert(r.isNullAt(0), "null element must null the unit vector, not read as 0.0")
    assert(r.getDouble(1) == 0.0, "null slots must not count as signature matches")
  }

  test("mistyped SQL inputs fail at analysis, not at runtime") {
    graft.engine.GraftSession.registerFunctions(spark)
    Seq(Tuple1("x")).toDF("s").createOrReplaceTempView("ty_probe")
    val bad = Seq(
      "SELECT match_fraction(array('a'), array('b')) FROM ty_probe",
      "SELECT simhash(42) FROM ty_probe",
      "SELECT unit_norm(array('a')) FROM ty_probe",
      "SELECT dot_product(array('a'), array('b')) FROM ty_probe",
      "SELECT minhash_signature(array('a'), 16) FROM ty_probe",
      "SELECT rolling_minhash(array(1), 8) FROM ty_probe")
    bad.foreach { q =>
      val e = intercept[org.apache.spark.sql.AnalysisException](spark.sql(q).collect())
      assert(e.getMessage.contains("expects"), s"$q -> ${e.getMessage}")
    }
  }

  test("SQL literal arrays (array<int>/array<decimal>) are widened, not misread") {
    graft.engine.GraftSession.registerFunctions(spark)
    Seq(Tuple1("x")).toDF("s").createOrReplaceTempView("ty_probe")
    // array(1,2) is array<int>, array(1.5,...) is array<decimal>: reading
    // those UnsafeArrayData slots with a long/double accessor fabricates
    // garbage — the expressions must dispatch on the element type instead
    val r = spark.sql(
      """SELECT dot_product(array(1, 2), array(3, 4)) AS di,
                dot_product(array(1.5, 2.0), array(2.0, 1.0)) AS dd,
                size(minhash_signature(array(1, 2), 4)) AS msz
         FROM ty_probe""").collect()(0)
    assert(r.getDouble(0) == 11.0, "int-array dot product")
    assert(r.getDouble(1) == 5.0, "decimal-array dot product")
    assert(r.getInt(2) == 4, "int-array minhash signature")
  }

  test("minhash_signature: null element yields NULL, never a fabricated minimum") {
    graft.engine.GraftSession.registerFunctions(spark)
    val r = spark.sql("SELECT minhash_signature(array(1L, CAST(NULL AS BIGINT)), 4) AS s").collect()(0)
    assert(r.isNullAt(0))
  }

  test("sorted_intersect_count: null element yields NULL, never a fabricated match") {
    val df = Seq((Array[String](null, "a"), Array("", "a"))).toDF("a", "b")
    val r = df.select(graft.functions.SortedIntersectCountExpr
      .sortedIntersectCount(sort_array(col("a")), sort_array(col("b")))).collect()(0)
    assert(r.isNullAt(0), "null slot must not compare (unsafe path reads it as \"\")")
  }

  test("MatchFractionExpr: ragged signature lengths yield NULL, not an order-dependent estimate") {
    val df = Seq((Array(1L, 2L, 3L), Array(1L, 2L))).toDF("a", "b")
    val row = df.select(MatchFractionExpr.matchFraction(col("a"), col("b")).as("f"),
      MatchFractionExpr.matchFraction(col("b"), col("a")).as("g")).collect()(0)
    assert(row.isNullAt(0) && row.isNullAt(1), "both orders must agree (symmetric NULL)")
  }

  test("shared word-span scanner ≡ split-on-space tokens on 500 random strings") {
    // the ONE scanner behind MinHashTextExpr/Md5Family60 (and the contract
    // SimHashTextExpr's inline copy must keep): byte spans over random
    // text — multibyte runs, tabs/newlines INSIDE tokens, leading/
    // trailing/run-of-space — must equal filter(split(text, " "), _ != "")
    val rnd = new scala.util.Random(42)
    val pieces = Array("a", "bc", " ", "  ", "π", "é", "日", "😀", "\t", "\n", "ж")
    (1 to 500).foreach { _ =>
      val s = Seq.fill(rnd.nextInt(24))(pieces(rnd.nextInt(pieces.length))).mkString
      val bytes = org.apache.spark.unsafe.types.UTF8String.fromString(s).getBytes
      val (starts, ends) = graft.functions.Md5Family60.wordSpans(bytes)
      val words = starts.indices.map(i =>
        new String(java.util.Arrays.copyOfRange(bytes, starts(i), ends(i)), "UTF-8"))
      val expected = s.split(" ", -1).filter(_.nonEmpty).toSeq
      assert(words == expected, s"input=${s.codePoints().toArray.mkString(",")}")
    }
  }

  test("MisraGriesAggregator: classic decrement step, merge cut, guarantee under adversarial order") {
    val mg = new graft.functions.MisraGriesAggregator(2)
    // k=2: a,b fill; c triggers the decrement-all (itself included) -> {}
    val m1 = Seq("a", "b", "c").foldLeft(mg.zero)(mg.reduce)
    assert(m1.isEmpty, m1.toString)
    // merge cut: {a:5,b:3} + {c:4,d:1} -> cut = 3rd largest = 3 -> {a:2,c:1}
    val merged = mg.merge(Map("a" -> 5L, "b" -> 3L), Map("c" -> 4L, "d" -> 1L))
    assert(merged == Map("a" -> 2L, "c" -> 1L), merged.toString)
    // guarantee: any x with count > n/(k+1) survives EVERY processing
    // order. Stream: a×5 + b,c,d,e (n=9, k=2 -> threshold 3): try the
    // adversarial permutations that interleave noise between the a's
    val stream = Seq.fill(5)("a") ++ Seq("b", "c", "d", "e")
    Seq(stream, stream.reverse,
      Seq("b", "a", "c", "a", "d", "a", "e", "a", "a")).foreach { order =>
      val m = order.foldLeft(mg.zero)(mg.reduce)
      assert(m.contains("a"), s"a evicted under $order -> $m")
      assert(m("a") >= 5 - 9 / 3 && m("a") <= 5, s"estimate bound: $m")
    }
    // split-merge keeps the guarantee too
    val (s1, s2) = stream.splitAt(4)
    val m2 = mg.merge(s1.foldLeft(mg.zero)(mg.reduce), s2.foldLeft(mg.zero)(mg.reduce))
    assert(m2.contains("a") && m2.size <= 2, m2.toString)
    intercept[IllegalArgumentException](new graft.functions.MisraGriesAggregator(0))
  }

  test("GraftExtensions: spark.sql.extensions path injects the native catalog at session build") {
    import org.apache.spark.sql.SparkSession
    val base = spark // materialize the shared context first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder().master("local[2]")
        .withExtensions(new graft.engine.GraftExtensions().apply(_))
        .getOrCreate()
      assert(s2 ne base, "a fresh session must have been built for the extension to apply")
      val d = s2.sql("SELECT dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
        .head.getDouble(0)
      assert(d == 11.0)
      // built-in (not temp) registration survives newSession() clones —
      // the property the temp-function path lacks
      val clone = s2.newSession()
      assert(clone.sql("SELECT simhash('a b c') AS s").head.getLong(0) != 0L)
    } finally {
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
  }
}
