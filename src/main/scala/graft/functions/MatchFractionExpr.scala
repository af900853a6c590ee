package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Fraction of positions where two `array<long>` MinHash signatures agree —
  * the Jaccard estimate, evaluated once per LSH candidate pair (the verify
  * hot path), where the `zip_with → filter → size` column-algebra form pays
  * three interpreted lambda passes per pair.
  */
case class MatchFractionExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  // null also arises from ragged (different-length) signatures, matching
  // DotProductExpr's semantics — an order-dependent estimate over a length
  // mismatch would silently hide a broken signature pipeline
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType}
    def ok(e: Expression) = e.dataType match {
      case ArrayType(LongType | IntegerType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"match_fraction expects two integral arrays, got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  // int arrays arrive from SQL literals (`array(1,2,3)`); widen to long
  private def isLong(e: Expression): Boolean = e.dataType match {
    case org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType, _) => true
    case _ => false
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    MatchFractionExpr.fraction(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData],
      isLong(left), isLong(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = MatchFractionExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val boxed = ctx.freshName("fracBoxed")
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"""java.lang.Double $boxed = (java.lang.Double) $cls.fraction($l, $r, ${isLong(left)}, ${isLong(right)});
         if ($boxed == null) { ${ev.isNull} = true; }
         else { ${ev.value} = $boxed.doubleValue(); }""")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object MatchFractionExpr {

  /** equal-position count / shared length; NULL on a length mismatch —
    * signatures share a fixed k by contract, and a symmetric NULL beats the
    * order-dependent estimate that dividing by one side's length produced.
    */
  def fraction(a: ArrayData, b: ArrayData, aLong: Boolean, bLong: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var eq = 0
    var i = 0
    while (i < n) {
      // null slots never match (the zip_with form's null comparison is
      // dropped by its filter; reading null as 0 would count 0==0)
      if (!a.isNullAt(i) && !b.isNullAt(i)) {
        val av = if (aLong) a.getLong(i) else a.getInt(i).toLong
        val bv = if (bLong) b.getLong(i) else b.getInt(i).toLong
        if (av == bv) eq += 1
      }
      i += 1
    }
    java.lang.Double.valueOf(if (n == 0) 0.0 else eq.toDouble / n)
  }

  def matchFraction(a: Column, b: Column): Column =
    ColumnBridge.column(MatchFractionExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
