package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LayoutOps

class LayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def brute(x: Long, y: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, j) =>
      acc | (((x >> j) & 1L) << (2 * j)) | (((y >> j) & 1L) << (2 * j + 1))
    }

  /** Full 64x64 grid — every (x, y) with 0 <= x, y < 64. */
  private lazy val grid =
    (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)).toDF("x", "y")

  test("mortonCode equals the bit-interleave definition on a full grid") {
    val got = grid.select(col("x"), col("y"),
        LayoutOps.mortonCode(Seq(col("x"), col("y")), 6).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.size == 64 * 64)
    got.foreach { case ((x, y), z) => assert(z == brute(x, y, 6), s"($x,$y)") }
    // bijective on the grid: 4096 distinct codes covering exactly [0, 4096)
    assert(got.values.toSet == (0L until 4096L).toSet)
  }

  test("mortonCode clamps outliers to the edge and propagates NULL") {
    val df = Seq((Some(-5L), Some(3L)), (Some(99L), Some(2L)),
      (None: Option[Long], Some(1L))).toDF("x", "y")
    val z = df.select(LayoutOps.mortonCode(Seq(col("x"), col("y")), 4).as("z"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(z(0) == Some(brute(0, 3, 4)), "negative clamps to 0")
    assert(z(1) == Some(brute(15, 2, 4)), "overflow clamps to 2^bits-1")
    assert(z(2).isEmpty, "NULL dimension must yield NULL code, not bucket 0")
  }

  test("zorderStats: every bucket bounds BOTH dimensions by the pigeonhole span") {
    // top 4 code bits fix the top 2 bits of each dimension: within a
    // bucket each dim spans < 2^4 = 16 of the 64 values — exactly the
    // min/max-skipping bound a reader gets on either column
    val stats = LayoutOps.zorderStats(grid, Seq("x", "y"), bits = 6, bucketBits = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(stats.length == 16 && stats.map(_._2).sum == 4096L)
    stats.foreach { case (b, _, minX, maxX, minY, maxY) =>
      assert(maxX - minX < 16, s"bucket $b x-span")
      assert(maxY - minY < 16, s"bucket $b y-span")
    }
  }

  test("zorder skips 12/16 buckets on a y-box a single-column x-sort cannot skip at all") {
    val lo = 8L; val hi = 15L // y in [8, 15]
    val zOverlap = LayoutOps.zorderStats(grid, Seq("x", "y"), 6, 4)
      .filter(col("min_y") <= hi && col("max_y") >= lo).count()
    assert(zOverlap == 4, s"y top-2-bits = 0 in exactly 4 of 16 Z-buckets, got $zOverlap")
    // the competing layout: sort by x into 16 equal files — every file
    // contains every y value, so min/max on y prunes nothing
    val xSorted = grid.withColumn("f", (col("x") / lit(4)).cast("long"))
      .groupBy(col("f")).agg(min(col("y")).as("min_y"), max(col("y")).as("max_y"))
    assert(xSorted.filter(col("min_y") <= hi && col("max_y") >= lo).count() == 16)
  }

  test("zorderLayout: partition count honored, ranges disjoint, sorted within") {
    val laid = LayoutOps.zorderLayout(grid, Seq("x", "y"), 6, numFiles = 8)
    val zs = laid.select(col("__z"))
    assert(zs.rdd.getNumPartitions == 8)
    val parts = zs.rdd.mapPartitionsWithIndex { (i, it) =>
      val a = it.map(_.getLong(0)).toArray
      if (a.isEmpty) Iterator.empty
      else Iterator((i, a.head, a.last, a.zip(a.tail).forall(p => p._1 <= p._2)))
    }.collect().sortBy(_._1)
    assert(parts.forall(_._4), "every partition sorted by code")
    parts.sliding(2).foreach {
      case Array((_, _, aMax, _), (_, bMin, _, _)) =>
        assert(aMax <= bMin, "partition Z-ranges must be disjoint and ordered")
      case _ =>
    }
  }

  test("mortonCodeScaled: domain endpoints hit the bit-space edges, formula integer-exact") {
    val pts = Seq((0L, 0L), (1999L, 99L), (1000L, 50L), (37L, 84L), (-5L, 1000L))
    val got = pts.toDF("p", "s")
      .select(LayoutOps.mortonCodeScaled(
        Seq((col("p"), 0L, 1999L), (col("s"), 0L, 99L)), 16).as("z"))
      .collect().map(_.getLong(0))
    def sc(v: Long, lo: Long, up: Long) =
      (math.max(lo, math.min(up, v)) - lo) * 65535L / (up - lo)
    val exp = pts.map { case (p, s) => brute(sc(p, 0, 1999), sc(s, 0, 99), 16) }
    assert(got.sameElements(exp), s"${got.toSeq} vs $exp")
    assert(got(0) == 0L, "domain minimum must map to code 0")
    assert(got(1) == (1L << 32) - 1, "domain maxima must map to the all-ones code")
    assert(got(4) == 0xAAAAAAAAL,
      "clamped (-5, 1000) lands at (0, max): every odd (suppkey) bit set")
  }

  test("guards: code width and bucketBits are validated") {
    intercept[IllegalArgumentException](LayoutOps.mortonCode(Seq(col("x")), 64))
    intercept[IllegalArgumentException](
      LayoutOps.mortonCode(Seq(col("x"), col("y"), col("x"), col("y")), 16))
    intercept[IllegalArgumentException](LayoutOps.zorderStats(grid, Seq("x", "y"), 6, 13))
    intercept[IllegalArgumentException](LayoutOps.zorderLayout(grid, Seq("x", "y"), 6, 0))
  }
}
