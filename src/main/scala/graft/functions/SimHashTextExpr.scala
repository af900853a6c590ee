package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused 64-bit SimHash of a text column: whitespace-tokenize (byte spans,
  * no substring materialization), xxhash64 each token (seed 42 — Spark's
  * `xxhash64` default, so values match the staged explode/groupBy form
  * bit-for-bit), accumulate the 64 frequency-weighted ±1 bit sums, and take
  * the sign — one codegen'd pass per document.
  *
  * This replaces a whole explode → shuffle → 64-column hash aggregate with
  * a per-row projection: SimHash is a pure function of the document, so at
  * 100 TB the signature stage needs ZERO shuffle — the only exchange left
  * in near-dup detection is the (block, blockValue) candidate join.
  */
case class SimHashTextExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"simhash expects a string column, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    SimHashTextExpr.simhash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = SimHashTextExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.simhash($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashTextExpr {

  /** Sign of the per-bit ±1 sums over token hashes; 0L for token-less text
    * (callers that need explode-drop semantics filter empties first).
    */
  def simhash(text: UTF8String): Long = {
    val bytes = text.getBytes
    val n = bytes.length
    // KEEP IN SYNC: the whitespace scan below matches Md5Family60.wordSpans
    // and MinHashTextExpr's inline scanner (parity-spec'd)
    val sums = new Array[Int](64)
    var i = 0
    while (i < n) {
      while (i < n && bytes(i) == ' ') i += 1
      if (i < n) {
        val start = i
        while (i < n && bytes(i) != ' ') i += 1
        val h = XXH64.hashUnsafeBytes(bytes,
          org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + start, i - start, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) sums(b) += 1 else sums(b) -= 1
          b += 1
        }
      }
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (sums(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  def simhashText(text: Column): Column =
    ColumnBridge.column(SimHashTextExpr(ColumnBridge.expression(text)))
}
