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
    val aggs = cols.flatMap { c =>
      val nd = if (exact) countDistinct(col(c)) else approx_count_distinct(col(c))
      Seq(
        count(col(c)).as(s"${c}__n"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        nd.as(s"${c}__distinct"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // unpivot the single stats row into one row per column
    val stacked = cols.map { c =>
      struct(lit(c).as("col_name"), col(s"${c}__n").as("n"), col(s"${c}__nulls").as("n_null"),
        col(s"${c}__distinct").as("n_distinct"), col(s"${c}__min").as("min_value"),
        col(s"${c}__max").as("max_value"))
    }
    one.select(explode(array(stacked: _*)).as("s")).select(col("s.*"))
  }
}
