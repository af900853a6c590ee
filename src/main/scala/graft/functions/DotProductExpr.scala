package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native dot product of two numeric array columns (evaluated in double).
  *
  * This sits on the O(|Q|·|N|) hot path of similarity search — one
  * evaluation per candidate pair — where the `aggregate(zip_with(...))`
  * column-algebra form pays per-element lambda dispatch and boxing.
  * Codegen emits a primitive fused multiply-add loop inline.
  *
  * Accepts float/double/int/long/decimal elements (SQL literal arrays
  * arrive as `array<int>`/`array<decimal>`); anything else fails at
  * ANALYSIS time — reading a mistyped `UnsafeArrayData` slot with the
  * wrong accessor would otherwise fabricate garbage values silently.
  *
  * Null semantics match the lambda form it replaced: a length mismatch or
  * any null element yields NULL (zip_with pads the shorter side with null →
  * the aggregate folds to null) — never a truncated or fabricated score.
  */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  // null also arises from ragged lengths / null elements, not just null children
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(DoubleType | FloatType | LongType | IntegerType | _: DecimalType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"dot_product expects two numeric arrays, got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  /** (element-type code, decimal precision, decimal scale) — same scheme as
    * [[UnitNormExpr.norm]].
    */
  private def elemInfo(e: Expression): (Int, Int, Int) = e.dataType match {
    case ArrayType(DoubleType, _)     => (0, 0, 0)
    case ArrayType(FloatType, _)      => (1, 0, 0)
    case ArrayType(LongType, _)       => (2, 0, 0)
    case ArrayType(IntegerType, _)    => (3, 0, 0)
    case ArrayType(d: DecimalType, _) => (4, d.precision, d.scale)
    case other => throw new IllegalArgumentException(
      s"dot_product expects a numeric array, got ${other.simpleString}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val (lc, lp, ls) = elemInfo(left)
    val (rc, rp, rs) = elemInfo(right)
    DotProductExpr.dotOrNull(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData],
      lc, lp, ls, rc, rp, rs)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = DotProductExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val (lc, lp, ls) = elemInfo(left)
    val (rc, rp, rs) = elemInfo(right)
    val boxed = ctx.freshName("dotBoxed")
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"""java.lang.Double $boxed = (java.lang.Double) $cls.dotOrNull($l, $r, $lc, $lp, $ls, $rc, $rp, $rs);
         if ($boxed == null) { ${ev.isNull} = true; }
         else { ${ev.value} = $boxed.doubleValue(); }""")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProductExpr {

  private def get(a: ArrayData, i: Int, code: Int, prec: Int, scale: Int): Double = code match {
    case 0 => a.getDouble(i)
    case 1 => a.getFloat(i).toDouble
    case 2 => a.getLong(i).toDouble
    case 3 => a.getInt(i).toDouble
    case _ => a.getDecimal(i, prec, scale).toDouble
  }

  def dotOrNull(a: ArrayData, b: ArrayData,
      ac: Int, ap: Int, as: Int, bc: Int, bp: Int, bs: Int): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    if (ac == 0 && bc == 0) {
      // hot path (similarity search feeds unit-normed array<double>): no
      // per-element type dispatch in the loop
      while (i < n) {
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        acc += a.getDouble(i) * b.getDouble(i)
        i += 1
      }
    } else {
      while (i < n) {
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        acc += get(a, i, ac, ap, as) * get(b, i, bc, bp, bs)
        i += 1
      }
    }
    java.lang.Double.valueOf(acc)
  }

  def dotProduct(a: Column, b: Column): Column =
    ColumnBridge.column(DotProductExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
