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
}
