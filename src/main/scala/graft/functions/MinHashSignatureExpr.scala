package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native MinHash signature: from an `array<long>` of shingle hashes,
  * produce the k-minima signature under the seeded-xxhash64 family
  * (`xxh64(h, seed=i)` for i in 0..k-1).
  *
  * Why a custom Catalyst Expression (SURVEY.md custom-operator ladder,
  * step b): the same computation as `array(transform(hashes, h =>
  * xxhash64(h, i)) …)` column algebra, but one tight primitive-long loop
  * instead of k interpreted higher-order lambdas with per-element boxing —
  * ~100× on the signature projection, which dominates MinHash-LSH dedup.
  * Codegen emits the same loop inline, keeping the projection inside
  * whole-stage codegen.
  */
case class MinHashSignatureExpr(child: Expression, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  // null also arises from null ELEMENTS (null-propagated, like UnitNormExpr
  // — hashing a null slot as 0 would fabricate a signature minimum)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType | org.apache.spark.sql.types.IntegerType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        // SQL literal arrays are array<int> — widened below; anything else
        // (array<decimal>, array<string>) would misread UnsafeArrayData
        // slots and fabricate signatures, so it must fail at analysis
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_signature expects array<long>/array<int>, got ${other.simpleString}")
    }

  private def isLong: Boolean = child.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any = {
    val hashes = input.asInstanceOf[ArrayData]
    val sig = MinHashSignatureExpr.signature(hashes, k, isLong)
    if (sig == null) null else new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = MinHashSignatureExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val arr = ctx.freshName("minhashArr")
    nullSafeCodeGen(ctx, ev, c =>
      s"""long[] $arr = $cls.signature($c, $k, $isLong);
         if ($arr == null) { ${ev.isNull} = true; }
         else { ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($arr); }""")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSignatureExpr {
  /** One pass over the shingle hashes, k running minima in a primitive
    * array; null on any null element (reading a null slot as 0 would
    * fabricate a minimum). XXH64.hashLong is Spark's own xxhash64 kernel.
    */
  def signature(hashes: ArrayData, k: Int, isLong: Boolean): Array[Long] = {
    val n = hashes.numElements()
    val minima = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (hashes.isNullAt(i)) return null
      val h = if (isLong) hashes.getLong(i) else hashes.getInt(i).toLong
      var j = 0
      while (j < k) {
        val v = XXH64.hashLong(h, j)
        if (v < minima(j)) minima(j) = v
        j += 1
      }
      i += 1
    }
    minima
  }

  def minhashSignature(shingleHashes: Column, k: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(MinHashSignatureExpr(ColumnBridge.expression(shingleHashes), k))
  }
}
