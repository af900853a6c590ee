package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join-type helpers for the two join variants the reference parses that
  * Spark lacks as single join types (reference `engine/src/parser.cpp:99-121`
  * parses INNER/LEFT/RIGHT/FULL/NATURAL/LEFT ANTI/RIGHT ANTI/FULL OUTER ANTI;
  * SURVEY.md §2a #6).
  *
  * Scale note: both helpers compose from anti joins, which Spark executes as
  * broadcast- or shuffled-hash anti joins — strictly cheaper than
  * materializing a full outer join and filtering, because matched pairs are
  * never produced.
  */
object JoinOps {

  /** RIGHT ANTI: rows of `right` with no match in `left` — Spark's
    * `left_anti` with the inputs swapped.
    */
  def rightAnti(left: DataFrame, right: DataFrame, cond: Column): DataFrame =
    right.join(left, cond, "left_anti")

  /** FULL OUTER ANTI: rows of either side with no match on the other, padded
    * with NULLs for the opposite side's columns — the union of the two anti
    * joins. Equivalent to `l FULL JOIN r ON c WHERE l.k IS NULL OR r.k IS
    * NULL` but never materializes matched rows.
    *
    * Right-side columns whose name collides with a left column are emitted
    * as `<name>_r` (a DataFrame can't carry two same-named columns; the
    * old withColumn padding silently OVERWROTE the left side's values with
    * NULL for shared names such as a common join key).
    */
  def fullOuterAnti(left: DataFrame, right: DataFrame, cond: Column): DataFrame = {
    // every rename target must be globally fresh: not a left column, not a
    // right column, and not a target already assigned to an earlier right
    // column (left (x, x_r) with right (x, x_r) would otherwise map BOTH
    // right columns to x_r_r and fail the union as ambiguous)
    val taken = scala.collection.mutable.Set[String](left.columns: _*)
    val assigned = right.columns.map { n =>
      var out = n
      while (taken(out)) out += "_r"
      taken += out
      n -> out
    }.toMap
    def rName(n: String): String = assigned(n)
    val leftOnly = left.join(right, cond, "left_anti").select(
      left.columns.map(col) ++
        right.schema.fields.map(f => lit(null).cast(f.dataType).as(rName(f.name))): _*)
    val rightOnly = right.join(left, cond, "left_anti").select(
      left.schema.fields.map(f => lit(null).cast(f.dataType).as(f.name)) ++
        right.schema.fields.map(f => col(f.name).as(rName(f.name))): _*)
    leftOnly.unionByName(rightOnly)
  }

  /** AS-OF join (inclusive): each left row picks the LATEST right row with
    * the same key whose timestamp is at or before the left row's
    * (`direction = "backward"`, default), or the EARLIEST at or after it
    * (`direction = "forward"`) — the time-series primitive (trades→quotes,
    * purchases→latest click, signup→next action) Spark has no join type
    * for.
    *
    * Spark-first realization: NOT a per-row probe and not an inequality
    * join (which Spark would plan as a nested loop). Both sides union into
    * one frame tagged by side; one window per key, ordered by
    * (ts, side, right-payload) with a running `last(right, ignoreNulls)`,
    * gives every left row its match in a single shuffle + sort — the same
    * merge a hand-written ASOF operator performs, expressed declaratively
    * so Catalyst handles spill/codegen. Cost at 100 TB: one exchange on
    * the key, one sort — identical to any windowed analytic over the
    * stream.
    *
    * Matched right columns (timestamp + payload) come back prefixed with
    * `rightPrefix`; unmatched left rows keep them NULL (left-outer
    * semantics, like DuckDB's `ASOF LEFT JOIN`). Right rows with NULL key
    * or NULL timestamp can never match (SQL equality/inequality
    * semantics) and are dropped before the union. Ties: right rows sort
    * before left rows at the same timestamp (inclusive "at or before");
    * duplicate right rows on the same (key, ts) resolve to the full-row
    * maximum — deterministic under repartitioning. (If the right payload
    * carries an unorderable type such as a map, that tie-break is
    * skipped — matches are then deterministic only when (key, ts) is
    * unique on the right, which is the shape callers should feed anyway.)
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
      rightPrefix: String = "asof_", direction: String = "backward"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.StructType
    require(direction == "backward" || direction == "forward",
      s"direction must be 'backward' or 'forward', got '$direction'")
    val rFields = right.schema.fields.filterNot(_.name == keyCol)
    // fail at plan time, not with an ambiguous-column frame downstream
    val clash = left.columns.toSet.intersect(rFields.map(rightPrefix + _.name).toSet)
    require(clash.isEmpty,
      s"rightPrefix '$rightPrefix' makes matched columns collide with left columns: $clash")
    val rStruct = StructType(rFields)
    val lStruct = StructType(left.schema.fields)
    val l2 = left.select(col(keyCol).as("__k"), col(tsCol).as("__ts"),
      lit(1).as("__side"),
      struct(left.columns.map(col): _*).as("__l"),
      lit(null).cast(rStruct).as("__r"))
    val r2 = right.filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(col(keyCol).as("__k"), col(tsCol).as("__ts"),
        lit(0).as("__side"),
        lit(null).cast(lStruct).as("__l"),
        struct(rFields.map(f => col(f.name)): _*).as("__r"))
    // __r in the order: at equal (ts, side), the running last() must pick a
    // deterministic duplicate — the struct-ordered maximum. Unorderable
    // payload types (maps) can't join that tie-break; see scaladoc
    val tieBreak =
      if (org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(rStruct))
        Seq(col("__r").asc)
      else Seq.empty
    // forward = the same running merge over the REVERSED timeline: in
    // descending-ts order, "latest right seen so far" is the EARLIEST
    // right at or after the left row. __side still ascends, so an
    // equal-ts right row enters the frame before the left row — the
    // inclusive bound, both directions. desc_nulls_first: a NULL-ts left
    // row must head its partition (as asc's NULLS FIRST gives backward)
    // so its frame holds no right row — plain desc would sort it LAST and
    // hand it the key's earliest right row as a spurious match
    val tsOrd = if (direction == "forward") col("__ts").desc_nulls_first else col("__ts").asc
    val w = Window.partitionBy(col("__k"))
      .orderBy(Seq(tsOrd, col("__side").asc) ++ tieBreak: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l2.unionByName(r2)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__l.*") +:
        rFields.map(f => col(s"__m.${f.name}").as(rightPrefix + f.name)): _*)
  }

  /** Nearest-event join: each left row matches the right row CLOSEST in
    * time, searching both directions — the sensor-alignment semantics
    * ("the reading nearest this event, before or after") that neither
    * as-of direction alone gives. Ties (equidistant matches) prefer the
    * BACKWARD match, the convention that favors information already
    * available at the left timestamp.
    *
    * Composed from the two [[asofJoin]] passes (backward + forward) and a
    * per-row pick: the backward pick is the nearest right row at-or-before
    * and the forward pick the nearest at-or-after, so the closer of the
    * two IS the global nearest — no inequality join, no per-left-row
    * candidate explosion. Cost: two key-partitioned window merges (the
    * second reuses the first's key partitioning: same `__k` exchange
    * contract). The distance comparison is whole-MICROSECOND integer
    * arithmetic (`unix_micros`), so the boundary decision is bit-identical
    * on any engine with microsecond timestamps. `tsCol` must be
    * timestamp-typed on both sides.
    *
    * @return left columns + `rightPrefix`-prefixed right columns from the
    *         winning side (all NULL when the key has no right rows)
    */
  def nearestJoin(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, rightPrefix: String = "near_"): DataFrame = {
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    Seq(left, right).foreach { df =>
      val t = df.schema(tsCol).dataType
      require(t == TimestampType || t == TimestampNTZType,
        s"nearestJoin needs a timestamp `$tsCol`, got $t")
    }
    val rNames = right.schema.fields.filterNot(_.name == keyCol).map(_.name)
    val bwd = asofJoin(left, right, keyCol, tsCol, "__b_", "backward")
    val both = asofJoin(bwd, right, keyCol, tsCol, "__f_", "forward")
    // cast through TIMESTAMP so NTZ inputs also take the integer-μs path
    // (session zone is pinned UTC: the NTZ→LTZ cast is value-preserving)
    def us(c: org.apache.spark.sql.Column) = unix_micros(c.cast(TimestampType))
    val ts = us(col(tsCol))
    val bTs = col(s"__b_$tsCol")
    val fTs = col(s"__f_$tsCol")
    val useBwd = fTs.isNull ||
      (bTs.isNotNull && (ts - us(bTs)) <= (us(fTs) - ts))
    both.select(left.columns.map(col) ++
      rNames.map(f => when(useBwd, col(s"__b_$f")).otherwise(col(s"__f_$f"))
        .as(rightPrefix + f)): _*)
  }

  /** Piecewise-linear interpolation join — the time-series RESAMPLE: for
    * each left (key, t), linearly interpolate the right series' value
    * between its bracketing points (last at-or-before and first
    * at-or-after t). Off the series' ends the nearer endpoint HOLDS
    * (clamp — the standard resampler edge rule); a key with no right
    * points interpolates to NULL; an exact timestamp hit returns that
    * point's value (both as-ofs land on it, so the 0/0 ratio never
    * forms). This is [[nearestJoin]]'s continuous sibling: nearest
    * SNAPS to a bracket end, interpolate blends between them.
    *
    * Same cost as two [[asofJoin]]s (union + per-key ordered window —
    * never an inequality nested loop); the blend is a per-row projection
    * whose fp operations run in one fixed order (`b + (f−b)·ratio` with
    * the ratio an integer-μs quotient cast once), so results replay
    * bit-identically on any engine given the same doubles.
    *
    * @return left columns + (t_before, t_after, `outCol`)
    */
  def interpolateJoin(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, valueCol: String, outCol: String = "interp_value"): DataFrame = {
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    Seq(left, right).foreach { df =>
      val t = df.schema(tsCol).dataType
      require(t == TimestampType || t == TimestampNTZType,
        s"interpolateJoin needs a timestamp `$tsCol`, got $t")
    }
    val points = right.select(col(keyCol), col(tsCol), col(valueCol))
    val bwd = asofJoin(left, points, keyCol, tsCol, "__b_", "backward")
    val both = asofJoin(bwd, points, keyCol, tsCol, "__f_", "forward")
    def us(c: org.apache.spark.sql.Column) = unix_micros(c.cast(TimestampType))
    val ts = us(col(tsCol))
    val bTs = col(s"__b_$tsCol")
    val fTs = col(s"__f_$tsCol")
    val bV = col(s"__b_$valueCol")
    val fV = col(s"__f_$valueCol")
    val interp = when(bTs.isNull && fTs.isNull, lit(null))
      .when(bTs.isNull, fV)
      .when(fTs.isNull, bV)
      .when(us(fTs) === us(bTs), bV)
      .otherwise(bV + (fV - bV) *
        ((ts - us(bTs)).cast("double") / (us(fTs) - us(bTs))))
    both.select(left.columns.map(col) ++ Seq(
      bTs.as("t_before"), fTs.as("t_after"), interp.as(outCol)): _*)
  }

  /** [[asofJoin]] bounded by a freshness horizon: a match farther than
    * `toleranceSeconds` from the left timestamp is nulled out (the left
    * row survives, unmatched) — the financial-tick semantics of "last
    * quote, but only if recent". `tsCol` must be timestamp-typed on both
    * sides.
    *
    * A post-window null-out, NOT a second join: the as-of pick is already
    * the nearest right row in the direction searched, so whenever any
    * in-tolerance match exists the as-of match IS it — nulling the
    * out-of-tolerance pick is exactly the bounded join. The gap test is
    * a whole-second integer difference (`unix_timestamp` floors ≡ any
    * engine's second-boundary datediff), so the boundary decision is
    * bit-identical cross-engine. Costs nothing beyond [[asofJoin]]'s one
    * shuffle+sort: the null-out is a per-row projection.
    */
  def asofJoinTolerance(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, toleranceSeconds: Long, rightPrefix: String = "asof_",
      direction: String = "backward"): DataFrame = {
    require(toleranceSeconds >= 0,
      s"toleranceSeconds must be >= 0, got $toleranceSeconds")
    val joined = asofJoin(left, right, keyCol, tsCol, rightPrefix, direction)
    val mTs = col(rightPrefix + tsCol)
    val gap =
      if (direction == "backward") unix_timestamp(col(tsCol)) - unix_timestamp(mTs)
      else unix_timestamp(mTs) - unix_timestamp(col(tsCol))
    val within = gap <= toleranceSeconds
    val rNames = right.schema.fields.filterNot(_.name == keyCol)
      .map(rightPrefix + _.name).toSet
    joined.select(joined.columns.map { c =>
      if (rNames.contains(c)) when(within, col(c)).as(c) else col(c)
    }: _*)
  }

  /** Temporal anti join: left rows with NO right row on the same key
    * within `horizonSeconds` AFTER them — "signups with no purchase
    * within 7 days", "purchases with no refund within 30" — the
    * non-activation / non-churn cohort selector. A naive formulation is
    * a NOT EXISTS over an inequality-range predicate, which Spark plans
    * as a nested loop; this is [[asofJoinTolerance]] forward (one
    * window merge) + a null filter: the as-of pick is the EARLIEST right
    * row at-or-after, so "that row is absent or out of horizon" is
    * exactly "no right row within the horizon". Left columns only —
    * anti-join semantics.
    */
  def noFollowupWithin(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, horizonSeconds: Long): DataFrame = {
    require(!left.columns.contains("__nf_" + tsCol),
      s"'__nf_$tsCol' is reserved by noFollowupWithin — rename that input column first")
    asofJoinTolerance(left, right, keyCol, tsCol, horizonSeconds,
        rightPrefix = "__nf_", direction = "forward")
      .filter(col("__nf_" + tsCol).isNull)
      .select(left.columns.map(col): _*)
  }

  /** Point-in-interval range join: left rows (a point) joined to right rows
    * (an interval `[lo, hi]`, inclusive) — without the O(|L|·|R|) nested
    * loop Spark plans for a raw inequality join.
    *
    * Bucketization: intervals explode to the fixed-width buckets they
    * overlap, points land in exactly one bucket, and the match becomes an
    * EQUI-join on the bucket id followed by the exact BETWEEN filter.
    * Because a point occupies one bucket, each qualifying (point,
    * interval) pair meets exactly once — no dedup needed. Choose
    * `bucketWidth` near the typical interval width: shuffle volume is
    * |points| + |intervals|·(width/bucketWidth + 1), all hash-partitioned.
    * NULL points/bounds never match (SQL BETWEEN semantics) — they drop at
    * the equi-join on a NULL bucket.
    *
    * `maxBucketsPerInterval` guards the explode: one outlier-wide interval
    * (or a bucketWidth sized for the typical interval but not the worst)
    * would otherwise materialize a near-unbounded bucket array — blowing
    * past Spark's array limits or an executor's memory with an opaque
    * error deep in `sequence`. The check is evaluated in-plan per row, so
    * a data-quality outlier fails FAST with the offending bounds in the
    * message instead of failing the job minutes later.
    */
  def rangeJoin(points: DataFrame, intervals: DataFrame,
      pointCol: String, loCol: String, hiCol: String,
      bucketWidth: Double, maxBucketsPerInterval: Long = 4096L): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be > 0, got $bucketWidth")
    require(maxBucketsPerInterval >= 1,
      s"maxBucketsPerInterval must be >= 1, got $maxBucketsPerInterval")
    val shared = points.columns.toSet.intersect(intervals.columns.toSet)
    require(shared.isEmpty,
      s"points and intervals must not share column names (ambiguous output), got: $shared")
    require(!points.columns.contains("__b") && !intervals.columns.contains("__b"),
      "'__b' is reserved by rangeJoin — rename that input column first")
    val pb = points.withColumn("__b", floor(col(pointCol) / bucketWidth))
    // the guard lives INSIDE the exploded expression (a standalone
    // assert_true projection column would be dead code and pruned away);
    // raise_error's NullType coerces under the array branch
    val nBuckets = floor(col(hiCol) / bucketWidth) - floor(col(loCol) / bucketWidth) + 1
    val ib = intervals.filter(col(loCol) <= col(hiCol))
      .withColumn("__b", explode(
        when(nBuckets <= lit(maxBucketsPerInterval), sequence(
          floor(col(loCol) / bucketWidth), floor(col(hiCol) / bucketWidth)))
          .otherwise(raise_error(concat(
            lit("rangeJoin: interval ["), col(loCol).cast("string"), lit(", "),
            col(hiCol).cast("string"),
            lit(s"] spans more than maxBucketsPerInterval=$maxBucketsPerInterval buckets " +
              s"at bucketWidth=$bucketWidth; raise bucketWidth, raise the cap, or filter " +
              "outlier intervals"))))))
    pb.join(ib, "__b")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__b")
  }

  /** Interval-OVERLAP equi-join analog: pairs (a, b) whose closed numeric
    * intervals intersect (`loA <= hiB AND loB <= hiA`) — the temporal/
    * genomic overlap shape that a naive formulation makes a nested-loop
    * inequality join over |A|·|B|.
    *
    * Same bucketization as [[rangeJoin]], on BOTH sides: each interval
    * explodes to the `bucketWidth`-buckets it covers, candidates meet on
    * bucket equality, the exact overlap predicate filters. An overlapping
    * pair co-occurs in every bucket of its intersection, so the join
    * emits it once per shared bucket — the FIRST-OVERLAP-BUCKET ownership
    * rule (keep only `bucket == floor(greatest(loA, loB) / width)`, the
    * intersection's first bucket) dedups in-plan, no distinct shuffle.
    * Shuffle volume is Σ per-interval bucket counts, hash-partitioned —
    * scale-safe for bounded interval-to-bucketWidth ratios, guarded by
    * `maxBucketsPerInterval` exactly as [[rangeJoin]]. NULL bounds never
    * match (NULL bucket arrays explode to nothing / NULL ownership fails).
    */
  def intervalJoin(a: DataFrame, b: DataFrame,
      loA: String, hiA: String, loB: String, hiB: String,
      bucketWidth: Double, maxBucketsPerInterval: Long = 4096L): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be > 0, got $bucketWidth")
    require(maxBucketsPerInterval >= 1,
      s"maxBucketsPerInterval must be >= 1, got $maxBucketsPerInterval")
    val shared = a.columns.toSet.intersect(b.columns.toSet)
    require(shared.isEmpty,
      s"the two sides must not share column names (ambiguous output), got: $shared")
    require(!a.columns.contains("__b") && !b.columns.contains("__b"),
      "'__b' is reserved by intervalJoin — rename that input column first")
    def buckets(df: DataFrame, lo: String, hi: String) = {
      val n = floor(col(hi) / bucketWidth) - floor(col(lo) / bucketWidth) + 1
      df.filter(col(lo) <= col(hi))
        .withColumn("__b", explode(
          when(n <= lit(maxBucketsPerInterval), sequence(
            floor(col(lo) / bucketWidth), floor(col(hi) / bucketWidth)))
            .otherwise(raise_error(concat(
              lit("intervalJoin: interval ["), col(lo).cast("string"), lit(", "),
              col(hi).cast("string"),
              lit(s"] spans more than maxBucketsPerInterval=$maxBucketsPerInterval " +
                s"buckets at bucketWidth=$bucketWidth; raise bucketWidth, raise the " +
                "cap, or filter outlier intervals"))))))
    }
    buckets(a, loA, hiA).join(buckets(b, loB, hiB), "__b")
      .filter(col(loA) <= col(hiB) && col(loB) <= col(hiA))
      .filter(col("__b") === floor(greatest(col(loA), col(loB)) / bucketWidth))
      .drop("__b")
  }

  /** Interval COALESCE (gaps-and-islands): merge each key's overlapping or
    * touching intervals into maximal disjoint spans — session stitching,
    * redaction-span flattening, downtime-window consolidation. Emits one
    * row per island: (key, island ordinal from 1, span bounds, member
    * count). Intervals are half-open in spirit — `start == prev end`
    * touches and therefore merges; `start > prev end` opens a new island.
    *
    * Classic two-window construction, both windows partitioned BY KEY
    * (never a global sort): a running `max(end)` over preceding rows marks
    * island openers (a plain `lag(end)` would break on nested intervals —
    * a long interval can swallow many following short ones), and the
    * running sum of opener flags numbers the islands; one aggregate
    * collapses members to spans. Per-key cost is that key's interval
    * count; at 100 TB keys parallelize freely and no state beyond one
    * window partition is held. With duplicate (start, end) rows the
    * tie order inside a window is engine-chosen, but only a tie group's
    * first row can ever open an island and all members land in the same
    * island, so the emitted aggregates are deterministic anyway.
    *
    * Rows with a NULL bound are dropped (an unbounded claim, not a
    * mergeable interval — and the engines disagree on NULL sort
    * placement); inverted intervals (end < start) are rejected loudly
    * rather than silently producing phantom islands.
    */
  def coalesceIntervals(df: DataFrame, keyCol: String,
      startCol: String, endCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byStart = Window.partitionBy(col(keyCol)).orderBy(col(startCol), col(endCol))
    val prevMax = byStart.rowsBetween(Window.unboundedPreceding, -1)
    val running = byStart.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(keyCol), col(startCol), col(endCol))
      .filter(col(startCol).isNotNull && col(endCol).isNotNull)
      .select(col(keyCol), col(startCol),
        when(col(endCol) >= col(startCol), col(endCol))
          .otherwise(raise_error(concat(lit("coalesceIntervals: inverted interval ["),
            col(startCol).cast("string"), lit(", "), col(endCol).cast("string"),
            lit(")")))).as(endCol))
      .withColumn("__pmax", max(col(endCol)).over(prevMax))
      .withColumn("__open",
        when(col("__pmax").isNull || col(startCol) > col("__pmax"), 1L).otherwise(0L))
      .withColumn("island", sum(col("__open")).over(running))
      .groupBy(col(keyCol), col("island"))
      .agg(min(col(startCol)).as("span_start"), max(col(endCol)).as("span_end"),
        count(lit(1)).as("n_intervals"))
  }
}
