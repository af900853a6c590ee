package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native dot product of two `array<double>` columns.
  *
  * This sits on the O(|Q|·|N|) hot path of similarity search — one
  * evaluation per candidate pair — where the `aggregate(zip_with(...))`
  * column-algebra form pays per-element lambda dispatch and boxing.
  * Codegen emits a primitive fused multiply-add loop inline.
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

  override def nullSafeEval(l: Any, r: Any): Any =
    DotProductExpr.dotOrNull(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = DotProductExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val boxed = ctx.freshName("dotBoxed")
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"""java.lang.Double $boxed = (java.lang.Double) $cls.dotOrNull($l, $r);
         if ($boxed == null) { ${ev.isNull} = true; }
         else { ${ev.value} = $boxed.doubleValue(); }""")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProductExpr {
  def dotOrNull(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  def dotProduct(a: Column, b: Column): Column =
    ColumnBridge.column(DotProductExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
