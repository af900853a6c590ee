package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering.
  *
  * At 100 TB a scan is won or lost at the file/row-group skipping level:
  * parquet min/max statistics prune only when values are clustered, and a
  * sort on one column destroys clustering on every other. Interleaving the
  * bits of several columns into one Morton code and range-sorting by the
  * code bounds EVERY interleaved dimension within each file — the
  * Delta/Iceberg `OPTIMIZE ZORDER BY` layout, built here from plain column
  * algebra (shift/and/or — fully codegen'd, no UDF).
  *
  * Guarantee made testable: fixing the top `b` bits of a 2-column code
  * fixes the top `ceil(b/2)` bits of the first column and `floor(b/2)`
  * bits of the second, so a bucket spans at most `2^(bits-ceil(b/2))` /
  * `2^(bits-floor(b/2))` distinct values per dimension — the bound
  * `zorderStats` exposes and LayoutSpec pins exactly.
  */
object LayoutOps {

  /** Morton (Z-order) code: the low `bits` bits of each column,
    * interleaved — column k contributes its bit j at output position
    * `j * n + k` (bit 0 of column 0 is output bit 0). Codegen'd
    * shift/and/or algebra, one pass, no shuffle.
    *
    * Inputs are clamped to [0, 2^bits): layout code must never fail a
    * 100 TB write over one outlier row, and a clamped outlier merely
    * lands in the edge bucket (locality for the non-outliers is
    * unaffected). NULL in any dimension yields a NULL code — callers
    * route NULLs to a dedicated bucket rather than silently colocating
    * them with (0,…,0).
    *
    * `n * bits <= 63` keeps the code in a non-negative BIGINT.
    */
  def mortonCode(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty, "mortonCode needs at least one column")
    require(bits >= 1, s"bits must be >= 1, got $bits")
    require(cols.size * bits <= 63,
      s"${cols.size} cols x $bits bits exceeds a signed 64-bit code")
    val hi = (1L << bits) - 1
    // explicit NULL gate: Spark's greatest/least SKIP null arguments, so
    // without it a NULL dimension would silently clamp to the top edge
    // instead of propagating
    interleave(cols.map { c =>
      val v = c.cast("long")
      when(v.isNull, lit(null).cast("long"))
        .otherwise(greatest(least(v, lit(hi)), lit(0L)))
    }, bits)
  }

  /** [[mortonCode]] over columns whose natural domain is NOT [0, 2^bits):
    * each dimension is first mapped linearly from its [lo, up] domain onto
    * the full bit space — `(clamp(v) - lo) * (2^bits - 1) div (up - lo)` —
    * so the interleave spreads real data across all buckets instead of
    * crowding the bottom corner. This is the production shape: ZORDER
    * implementations map values to range ids before interleaving, and the
    * per-column [lo, up] come from table statistics (ANALYZE min/max) — a
    * metadata lookup, not a data pass. The division is kept integer-exact
    * (remainder subtracted before dividing), so Spark and any replaying
    * engine agree bit-for-bit.
    */
  def mortonCodeScaled(dims: Seq[(Column, Long, Long)], bits: Int): Column = {
    require(dims.nonEmpty, "mortonCodeScaled needs at least one dimension")
    require(bits >= 1, s"bits must be >= 1, got $bits")
    require(dims.size * bits <= 63,
      s"${dims.size} dims x $bits bits exceeds a signed 64-bit code")
    val hi = (1L << bits) - 1
    dims.foreach { case (_, lo, up) =>
      require(up > lo, s"domain [$lo, $up] must be non-degenerate")
      require(up - lo <= Long.MaxValue / hi,
        s"domain span ${up - lo} x $hi overflows the scale arithmetic")
    }
    interleave(dims.map { case (c, lo, up) =>
      val v = c.cast("long")
      val clamped = greatest(least(v, lit(up)), lit(lo))
      val num = (clamped - lit(lo)) * lit(hi)
      val den = lit(up - lo)
      // exact floor division for non-negative operands: subtracting the
      // remainder first makes the double division exact (result < 2^53)
      when(v.isNull, lit(null).cast("long"))
        .otherwise(((num - pmod(num, den)) / den).cast("long"))
    }, bits)
  }

  /** Bit-interleave of already-scaled non-negative [0, 2^bits) columns. */
  private def interleave(scaled: Seq[Column], bits: Int): Column = {
    val n = scaled.size
    val terms = for {
      j <- 0 until bits
      (c, k) <- scaled.zipWithIndex
    } yield shiftleft(shiftright(c, j).bitwiseAND(lit(1L)), j * n + k)
    terms.reduce(_ + _)
  }

  /** The write-path layout: range-repartition on the Morton code and sort
    * within partitions, so each output file owns one contiguous Z-range
    * and its parquet min/max stats are tight on EVERY interleaved
    * dimension. The code column is kept (callers drop it after write).
    * repartitionByRange samples the code distribution — buckets are
    * balanced by ROW COUNT even when the value space is skewed.
    */
  def zorderLayout(df: DataFrame, dims: Seq[String], bits: Int,
      numFiles: Int): DataFrame = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    df.withColumn("__z", mortonCode(dims.map(col), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
  }

  /** Per-bucket locality statistics — the pruning bound made visible:
    * bucket = top `bucketBits` bits of the code (a fixed-width Z-range,
    * deterministic — no global sort, no sampled boundaries), with each
    * dimension's min/max/count inside the bucket. One hash aggregate.
    * A reader filtering on ANY dimension can skip every bucket whose
    * [min,max] misses the predicate — the 2-D generalization of
    * single-column min/max skipping.
    */
  def zorderStats(df: DataFrame, dims: Seq[String], bits: Int,
      bucketBits: Int, domains: Option[Seq[(Long, Long)]] = None): DataFrame = {
    require(bucketBits >= 1 && bucketBits <= dims.size * bits,
      s"bucketBits must be in [1, ${dims.size * bits}], got $bucketBits")
    domains.foreach(ds => require(ds.size == dims.size,
      s"${ds.size} domains for ${dims.size} dims"))
    val code = domains match {
      case None => mortonCode(dims.map(col), bits)
      case Some(ds) =>
        mortonCodeScaled(dims.zip(ds).map { case (d, (lo, up)) => (col(d), lo, up) }, bits)
    }
    val coded = df.withColumn("__z", code)
      .withColumn("zbucket", shiftright(col("__z"), dims.size * bits - bucketBits))
    coded.groupBy(col("zbucket"))
      .agg(count(lit(1)).as("n_rows"),
        dims.flatMap(d =>
          Seq(min(col(d)).as(s"min_$d"), max(col(d)).as(s"max_$d"))): _*)
  }
}
