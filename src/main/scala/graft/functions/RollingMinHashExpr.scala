package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Document fingerprint: minimum polynomial rolling hash over all
  * `window`-byte substrings of the text — the winnowing/Rabin-Karp
  * primitive, O(n) per document via the rolling update
  * `h' = (h - b_out·B^(w-1))·B + b_in`.
  *
  * Two near-identical documents share most windows, hence (with high
  * probability) the same minimum — a locality-sensitive scalar fingerprint
  * that costs one pass and no shuffle, complementing md5 (exact) and
  * MinHash (set-similarity) dedup keys.
  */
case class RollingMinHashExpr(child: Expression, window: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"rolling_minhash expects a string, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    RollingMinHashExpr.minRollingHash(input.asInstanceOf[UTF8String], window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = RollingMinHashExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.minRollingHash($c, $window);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Direct-definition twin of [[RollingMinHashExpr]]: recomputes every
  * window's polynomial hash from scratch (fresh accumulation, no rolling
  * update, no precomputed B^(w-1)) — the executable spec the optimized
  * rolling recurrence is checked against. The 64-bit wrapping arithmetic
  * has no DuckDB twin (BIGINT overflow throws there), so the driver-gate
  * check is Spark-vs-Spark: the t07 entry selects rows where the two
  * implementations disagree and is oracled as zero rows.
  */
case class RollingMinHashNaiveExpr(child: Expression, window: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"rolling_minhash_naive expects a string, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    RollingMinHashExpr.minRollingHashNaive(input.asInstanceOf[UTF8String], window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = RollingMinHashExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.minRollingHashNaive($c, $window);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingMinHashExpr {
  private val B = 1000003L

  /** O(n·w)/doc reference evaluation: each window hashed independently by
    * the definition `h = Σ b_j·B^(w-1-j)` (wrapping). Shares only the base
    * constant with [[minRollingHash]] — the rolling update, the min-tracking
    * seed, and the precomputed power are all re-derived, so a bug in any of
    * them surfaces as a t07 disagreement row.
    */
  def minRollingHashNaive(s: UTF8String, window: Int): Long = {
    val bytes = s.getBytes
    val n = bytes.length
    if (n == 0) return 0L
    val w = math.min(window, n)
    var minH = 0L
    var first = true
    var start = 0
    while (start + w <= n) {
      var h = 0L
      var j = 0
      while (j < w) { h = h * B + (bytes(start + j) & 0xff); j += 1 }
      if (first || h < minH) { minH = h; first = false }
      start += 1
    }
    minH
  }

  def minRollingHash(s: UTF8String, window: Int): Long = {
    val bytes = s.getBytes
    val n = bytes.length
    if (n == 0) return 0L
    val w = math.min(window, n)
    // B^(w-1) with wrapping arithmetic (consistent everywhere)
    var bw = 1L
    var i = 1
    while (i < w) { bw *= B; i += 1 }
    var h = 0L
    i = 0
    while (i < w) { h = h * B + (bytes(i) & 0xff); i += 1 }
    var minH = h
    i = w
    while (i < n) {
      h = (h - (bytes(i - w) & 0xff) * bw) * B + (bytes(i) & 0xff)
      if (h < minH) minH = h
      i += 1
    }
    minH
  }

  def rollingMinHash(text: Column, window: Int = 16): Column =
    ColumnBridge.column(RollingMinHashExpr(ColumnBridge.expression(text), window))

  /** Column form of the direct-definition twin ([[RollingMinHashNaiveExpr]]). */
  def rollingMinHashNaive(text: Column, window: Int = 16): Column =
    ColumnBridge.column(RollingMinHashNaiveExpr(ColumnBridge.expression(text), window))
}
