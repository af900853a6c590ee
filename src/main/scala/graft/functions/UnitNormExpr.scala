package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native unit-L2-normalize of a numeric array column to `array<double>`
  * (zero vectors pass through unchanged).
  *
  * This is the shared prefix of every similarity operator — evaluated once
  * per vector per query — where the `transform`/`aggregate` higher-order
  * form pays three interpreted lambda passes per row. Codegen emits one
  * primitive squared-sum loop plus one scale loop. Accepts
  * float/double/int/long/decimal elements (SQL literals arrive as decimal).
  */
case class UnitNormExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  // null also arises from null ELEMENTS (null-propagated), not just a null child
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType | FloatType | LongType | IntegerType | _: DecimalType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"unit_norm expects a numeric array, got ${other.simpleString}")
    }

  /** (element-type code, decimal precision, decimal scale) */
  private def elemInfo: (Int, Int, Int) = child.dataType match {
    case ArrayType(DoubleType, _)     => (0, 0, 0)
    case ArrayType(FloatType, _)      => (1, 0, 0)
    case ArrayType(LongType, _)       => (2, 0, 0)
    case ArrayType(IntegerType, _)    => (3, 0, 0)
    case ArrayType(d: DecimalType, _) => (4, d.precision, d.scale)
    case other => throw new IllegalArgumentException(
      s"unit_norm expects a numeric array, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val (code, p, s) = elemInfo
    val r = UnitNormExpr.norm(input.asInstanceOf[ArrayData], code, p, s)
    if (r == null) null else new GenericArrayData(r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = UnitNormExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val (code, p, s) = elemInfo
    val arr = ctx.freshName("unitNormArr")
    nullSafeCodeGen(ctx, ev, c =>
      s"""double[] $arr = $cls.norm($c, $code, $p, $s);
         if ($arr == null) { ${ev.isNull} = true; }
         else { ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($arr); }""")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnitNormExpr {

  /** null when any element is null (the lambda form this replaces
    * null-propagates; reading a null slot as 0.0 would fabricate a vector).
    */
  def norm(a: ArrayData, code: Int, prec: Int, scale: Int): Array[Double] = {
    val n = a.numElements()
    val out = new Array[Double](n)
    var ss = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val x = code match {
        case 0 => a.getDouble(i)
        case 1 => a.getFloat(i).toDouble
        case 2 => a.getLong(i).toDouble
        case 3 => a.getInt(i).toDouble
        case _ => a.getDecimal(i, prec, scale).toDouble
      }
      out(i) = x
      ss += x * x
      i += 1
    }
    val nrm = math.sqrt(ss)
    if (nrm != 0.0) {
      i = 0
      while (i < n) {
        out(i) /= nrm
        i += 1
      }
    }
    out
  }

  def unitNorm(vec: Column): Column =
    ColumnBridge.column(UnitNormExpr(ColumnBridge.expression(vec)))
}
