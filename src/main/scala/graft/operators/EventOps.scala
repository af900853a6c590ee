package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-stream analytics beyond windowed aggregation: ordered-funnel
  * progression (the "how far did each user get" question every product
  * analytics pipeline asks).
  */
object EventOps {

  /** Per-user funnel depth over an ordered step list: depth d means the
    * user's FIRST occurrences of steps 0..d-1 happen in strictly
    * increasing time order (a purchase before the first click does not
    * count as a completed click→purchase).
    *
    * ONE aggregation pass: min-timestamp-per-step via conditional
    * aggregation (no per-step joins, no window), then a codegen'd chained
    * comparison — one shuffle on the user key regardless of step count,
    * the shape that holds at 100 TB of events.
    *
    * @return (userCol, funnel_depth) — depth in 0..steps.length
    */
  def funnel(events: DataFrame, userCol: String, typeCol: String, tsCol: String,
      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size, s"duplicate funnel steps: $steps")
    val aggs = steps.zipWithIndex.map { case (s, i) =>
      min(when(col(typeCol) === s, col(tsCol))).as(s"__t$i")
    }
    val perUser = events.groupBy(col(userCol)).agg(aggs.head, aggs.tail: _*)
    // ok(i) ⇒ ok(i-1), so the last taken branch is the deepest prefix
    val depth = steps.indices.foldLeft(lit(0)) { (acc, i) =>
      val ordered = (0 to i).map(j => col(s"__t$j").isNotNull).reduce(_ && _) &&
        (1 to i).map(j => col(s"__t${j - 1}") < col(s"__t$j"))
          .foldLeft(lit(true))(_ && _)
      when(ordered, lit(i + 1)).otherwise(acc)
    }
    perUser.select(col(userCol), depth.as("funnel_depth"))
  }

  /** Cohort retention matrix: users are cohorted by the week of their
    * FIRST `cohortStep` event, and counted as retained in week offset k if
    * they have ANY event in the k-th week after that — the standard
    * "week-0 signup, week-k activity" product-analytics table.
    *
    * Two aggregation passes, both on the user key (one shuffle each, the
    * second on the already-small distinct (cohort, offset, user) set):
    * cohort assignment is a conditional min like [[funnel]]'s, activity
    * weeks dedupe per user before counting, and offsets are integral
    * day-diffs `div` 7 — never fp. Users with no cohort event are
    * excluded (they belong to no cohort), and pre-cohort activity
    * (negative offsets) is dropped.
    *
    * @return (cohort_week DATE, week_offset INT, n_users BIGINT)
    */
  def retention(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, cohortStep: String): DataFrame = {
    val cohorts = events.groupBy(col(userCol))
      .agg(date_trunc("week", min(when(col(typeCol) === cohortStep, col(tsCol))))
        .as("__cohort"))
      .filter(col("__cohort").isNotNull)
    events.select(col(userCol), date_trunc("week", col(tsCol)).as("__week"))
      .join(cohorts, userCol)
      .withColumn("week_offset",
        expr("CAST(datediff(__week, __cohort) div 7 AS INT)"))
      .filter(col("week_offset") >= 0)
      .select(col("__cohort").cast("date").as("cohort_week"),
        col("week_offset"), col(userCol))
      .distinct()
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }
}
