package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused MinHash-from-text: whitespace-tokenize, form word `n`-gram
  * shingles as BYTE SPANS of the original text (no substring
  * materialization), xxhash64 each span, and fold the k seeded-family
  * minima — one pass, one primitive minima array, zero per-shingle
  * allocations.
  *
  * Replaces the `shingles → transform(xxhash64) → MinHashSignatureExpr`
  * pipeline's remaining interpreted stage (shingle string construction via
  * higher-order lambdas), which dominated signature cost after the k-minima
  * stage went native. Signature semantics: documents sharing word n-grams
  * (single-space canonical form) collide exactly as before.
  */
case class MinHashTextExpr(child: Expression, shingle: Int, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash text signature expects a string, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(MinHashTextExpr.signature(input.asInstanceOf[UTF8String], shingle, k))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = MinHashTextExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($cls.signature($c, $shingle, $k));")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashTextExpr {

  def signature(text: UTF8String, shingle: Int, k: Int): Array[Long] = {
    val bytes = text.getBytes
    val n = bytes.length
    // word boundaries from the family's ONE shared scanner (primitive int
    // spans — no per-word boxing on this hot path); SimHashTextExpr's
    // inline scan is the only other copy and must stay in sync
    val (starts, ends) = Md5Family60.wordSpans(bytes)
    val words = starts.length
    val minima = Array.fill(k)(Long.MaxValue)
    // shingles hash in CANONICAL single-space form: words are copied into a
    // scratch buffer joined by one ' ' each, so 'a  b' and 'a b' collide —
    // hashing the raw byte span would leak interior whitespace runs into
    // the signature and silently miss near-dups that differ only in spacing
    val scratch = new Array[Byte](n)
    def fold(base: Long): Unit = {
      var j = 0
      while (j < k) {
        val v = XXH64.hashLong(base, j)
        if (v < minima(j)) minima(j) = v
        j += 1
      }
    }
    def hashWords(from: Int, untilWord: Int): Long = {
      var len = 0
      var w = from
      while (w < untilWord) {
        if (len > 0) { scratch(len) = ' '; len += 1 }
        val s = starts(w)
        val e = ends(w)
        System.arraycopy(bytes, s, scratch, len, e - s)
        len += e - s
        w += 1
      }
      XXH64.hashUnsafeBytes(scratch, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
        len, 42L)
    }
    if (words < shingle) {
      fold(hashWords(0, words))
    } else {
      var w = 0
      while (w <= words - shingle) {
        fold(hashWords(w, w + shingle))
        w += 1
      }
    }
    minima
  }

  def minhashText(text: Column, shingle: Int = 3, k: Int = 64): Column =
    ColumnBridge.column(MinHashTextExpr(ColumnBridge.expression(text), shingle, k))
}
