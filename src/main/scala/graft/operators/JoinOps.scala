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
    */
  def fullOuterAnti(left: DataFrame, right: DataFrame, cond: Column): DataFrame = {
    val leftOnly = right.schema.fields.foldLeft(left.join(right, cond, "left_anti")) {
      (df, f) => df.withColumn(f.name, lit(null).cast(f.dataType))
    }
    val rightOnly0 = right.join(left, cond, "left_anti")
    val rightOnly = left.schema.fields.foldLeft(rightOnly0) {
      (df, f) => df.withColumn(f.name, lit(null).cast(f.dataType))
    }
    val outCols = (left.columns ++ right.columns).map(col)
    leftOnly.select(outCols: _*).unionByName(rightOnly.select(outCols: _*))
  }
}
