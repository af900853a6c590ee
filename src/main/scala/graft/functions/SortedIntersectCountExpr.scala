package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Intersection size of two SORTED, duplicate-free `array<string>` columns
  * — one allocation-free merge walk per candidate pair, the verify step of
  * exact set-similarity joins (`array_intersect` + `size` builds the whole
  * intersection array just to count it).
  */
case class SortedIntersectCountExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  // null also arises from null ELEMENTS (null-propagated, same convention
  // as the other native expressions — an unsafe null slot reads as "" and
  // would count as an intersection hit)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.types.{ArrayType, StringType}
    def ok(e: Expression) = e.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect_count expects two string arrays, got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    SortedIntersectCountExpr.count(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = SortedIntersectCountExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val boxed = ctx.freshName("sicBoxed")
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"""java.lang.Integer $boxed = (java.lang.Integer) $cls.count($l, $r);
         if ($boxed == null) { ${ev.isNull} = true; }
         else { ${ev.value} = $boxed.intValue(); }""")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCountExpr {

  /** merge walk; inputs must be sorted ascending (sort_array order); NULL
    * on any null element REACHED BY THE WALK — an unguarded read NPEs on
    * the interpreted path and silently reads "" (a fabricated match) on
    * the unsafe path. Elements past the shorter side's exhaustion are
    * never examined: they cannot change the count, so a null there keeps
    * the (already-determined) result rather than poisoning it.
    */
  def count(a: ArrayData, b: ArrayData): java.lang.Integer = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var eq = 0
    while (i < na && j < nb) {
      if (a.isNullAt(i) || b.isNullAt(j)) return null
      val c = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (c == 0) { eq += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    java.lang.Integer.valueOf(eq)
  }

  def sortedIntersectCount(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectCountExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
