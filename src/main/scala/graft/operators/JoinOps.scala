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
}
