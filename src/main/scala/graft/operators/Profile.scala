package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling — the user-facing twin of the reference's startup
  * statistics harvest (`engine/src/statistics_manager.cpp:9-142`: COUNT(*),
  * COUNT(DISTINCT col), MIN/MAX per column), exposed as a query instead of
  * an internal catalog side-effect.
  *
  * One pass over the table: a single multi-aggregate computes every
  * column's stats map-side-partial (one exchange carrying one row per
  * partition), then a tiny per-column unpivot on the driver-sized result.
  * At 100 TB this is exactly the shape ANALYZE TABLE runs — no per-column
  * scans, no shuffle of data rows.
  */
object Profile {

  /** (col_name, n, n_null, n_distinct, min_value, max_value) — min/max
    * rendered as strings so heterogeneous column types stack into one
    * result.
    *
    * `exact = true` uses COUNT(DISTINCT …): Spark plans k distinct columns
    * as an Expand producing k+1 rows per input row plus a regrouping
    * shuffle — exact, oracle-able, fine up to mid scale. `exact = false`
    * swaps in `approx_count_distinct` (HyperLogLog++): partial-mergeable,
    * so the whole profile is ONE pass with a single one-row exchange and no
    * Expand — the shape to run on 100 TB (this is what ANALYZE-style stats
    * collection does too).
    */
  def describe(df: DataFrame, cols: Seq[String], exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "describe needs at least one column")
    // data columns referenced with backticks (a legal dotted column name
    // would otherwise parse as struct-field access); internal aliases are
    // position-indexed so they stay plain identifiers AND unique even when
    // sanitized siblings would collide ("a.b" vs "a_b")
    def c0(c: String) = col(s"`$c`")
    def a0(i: Int) = s"c$i"
    val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
      val nd = if (exact) countDistinct(c0(c)) else approx_count_distinct(c0(c))
      Seq(
        count(c0(c)).as(s"${a0(i)}__n"),
        // count, not sum: sum over ZERO rows is NULL, and an empty table
        // must profile as n_null = 0, not a null that NPEs on unboxing
        count(when(c0(c).isNull, 1L)).as(s"${a0(i)}__nulls"),
        nd.as(s"${a0(i)}__distinct"),
        min(c0(c)).cast("string").as(s"${a0(i)}__min"),
        max(c0(c)).cast("string").as(s"${a0(i)}__max"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // unpivot the single stats row into one row per column
    val stacked = cols.zipWithIndex.map { case (c, i) =>
      struct(lit(c).as("col_name"), col(s"${a0(i)}__n").as("n"), col(s"${a0(i)}__nulls").as("n_null"),
        col(s"${a0(i)}__distinct").as("n_distinct"), col(s"${a0(i)}__min").as("min_value"),
        col(s"${a0(i)}__max").as("max_value"))
    }
    one.select(explode(array(stacked: _*)).as("s")).select(col("s.*"))
  }

  /** Exact rank-selected quantiles: for each requested p, the value at row
    * `max(1, ceil(p·n))` of the ascending sort (type-1 / lower-value
    * quantile — an actual data value, never an interpolation, so the
    * result is engine-replayable bit-for-bit).
    *
    * Scale design: NOT a global sort of the data. One shuffle builds the
    * value DISTRIBUTION (`groupBy(value).count`, map-side partials), and
    * the running-total window then walks the distinct-value histogram —
    * whose size is the column's cardinality, not the row count. For the
    * bounded-cardinality columns quantile profiling targets (quantities,
    * prices, scores, lengths) that histogram is KB-scale at any corpus
    * size. For a near-unique column, use `approxQuantiles` instead: a
    * t-digest-style mergeable sketch is the honest 100 TB answer there,
    * and Spark ships it as `approx_percentile`.
    */
  def quantiles(df: DataFrame, valueCol: String, ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty, "quantiles needs at least one probability")
    require(ps.forall(p => p > 0.0 && p <= 1.0), s"probabilities must be in (0, 1], got $ps")
    import org.apache.spark.sql.expressions.Window
    val v = col(s"`$valueCol`")
    val dist = df.filter(v.isNotNull).groupBy(v.as("v")).agg(count(lit(1)).as("cnt"))
    // running total AND grand total in ONE WindowExec (same ordering, two
    // frames) — no second scan of the data, no count-aggregate join
    val ord = Window.orderBy(col("v"))
    val withN = dist
      .withColumn("cum", sum(col("cnt")).over(
        ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", sum(col("cnt")).over(
        ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    withN.select(col("v"), col("cnt"), col("cum"), col("n"),
        explode(lit(ps.toArray)).as("p"))
      // ceil(p·n) in doubles: exact for any n < 2^52, same bits as the
      // DuckDB replay's identical expression
      .withColumn("rank", greatest(lit(1L), ceil(col("p") * col("n")).cast("long")))
      .filter(col("cum") >= col("rank") && (col("cum") - col("cnt")) < col("rank"))
      .select(col("p"), col("v").as("quantile"))
  }

  /** Sketch-based quantiles — the near-unique-column path [[quantiles]]'s
    * scaladoc points at: `approx_percentile` (Greenwald-Khanna) is
    * partial-mergeable, so the whole pass is one scan + a one-row
    * exchange, with NO per-value histogram — the shape for a 100 TB
    * high-cardinality column. Error bound: rank error ≤ n/`accuracy`.
    * Same (p, quantile) output contract as [[quantiles]]; on a
    * bounded-cardinality column the two agree exactly (spec-asserted).
    */
  def approxQuantiles(df: DataFrame, valueCol: String, ps: Seq[Double],
      accuracy: Int = 10000): DataFrame = {
    require(ps.nonEmpty, "approxQuantiles needs at least one probability")
    require(ps.forall(p => p > 0.0 && p <= 1.0), s"probabilities must be in (0, 1], got $ps")
    require(accuracy >= 1, s"accuracy must be >= 1, got $accuracy")
    val v = col(s"`$valueCol`")
    df.filter(v.isNotNull)
      .agg(percentile_approx(v, lit(ps.toArray), lit(accuracy)).as("__q"))
      .select(explode(arrays_zip(lit(ps.toArray).as("p"), col("__q").as("quantile"))).as("z"))
      .select(col("z.p"), col("z.quantile"))
  }

  /** Equi-width histogram: `nBuckets` buckets spanning [min, max], each row
    * counted into `least(nBuckets-1, floor((v-min)/(max-min)·nBuckets))`
    * (the max value folds into the last bucket; a constant column lands
    * entirely in bucket 0). One stats pass + one aggregation shuffle on the
    * bucket id — the scan dominates at any scale. Bucket bounds are derived
    * from (bucket, min, width) with the same fp expression the assignment
    * used, so bounds and counts can never disagree.
    */
  def histogram(df: DataFrame, valueCol: String, nBuckets: Int): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    val v = col(s"`$valueCol`").cast("double")
    val stats = df.filter(v.isNotNull)
      .agg(min(v).as("vmin"), max(v).as("vmax"))
    df.filter(v.isNotNull).crossJoin(broadcast(stats))
      .withColumn("bucket",
        when(col("vmax") > col("vmin"),
          least(lit(nBuckets - 1),
            floor((v - col("vmin")) / (col("vmax") - col("vmin")) * nBuckets)))
          .otherwise(0L))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        first(col("vmin")).as("vmin"), first(col("vmax")).as("vmax"))
      .select(col("bucket"),
        (col("vmin") + col("bucket") * (col("vmax") - col("vmin")) / nBuckets).as("lo"),
        col("n"))
  }
}
