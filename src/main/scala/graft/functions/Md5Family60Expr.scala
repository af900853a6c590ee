package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The md5-60 oracle hash family, fused into native expressions.
  *
  * Family definition (shared with every DuckDB oracle that replays it):
  * `h(seed, s) = int(hex_prefix_15(md5(seed || "|" || s)))` — the first 15
  * hex chars (60 bits) of the md5 of the seed-prefixed string, as a
  * non-negative long. Column-algebra twin:
  * `conv(substring(md5(concat(seed, "|", s)), 1, 15), 16, 10)` — concat,
  * NOT concat_ws: concat_ws silently skips NULL inputs, while this family
  * (native exprs nullIntolerant, DuckDB `||`) propagates NULL → NULL;
  * DuckDB twin: `CAST('0x' || substr(md5(seed || '|' || s), 1, 15) AS
  * BIGINT)`. DedupSpec/TextOpsSpec assert native ≡ column-algebra on real
  * corpus docs, and the driver's oracle asserts ≡ DuckDB end-to-end.
  *
  * These exist because the column-algebra forms pay ~16µs per interpreted
  * higher-order-lambda hash eval (measured) — 12M evals at sf0.1 for the
  * minhash signature alone. The fused loops here hash straight from the
  * document's UTF-8 bytes with zero per-shingle allocations beyond one
  * scratch buffer, same as [[MinHashTextExpr]] (the xxhash64 production
  * family these oracle twins shadow).
  */
object Md5Family60 {

  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** 60-bit value = first 15 hex chars of the digest: bytes d0..d6 whole,
    * plus the high nibble of d7.
    */
  private def prefix60(d: Array[Byte]): Long =
    ((d(0) & 0xFFL) << 52) | ((d(1) & 0xFFL) << 44) | ((d(2) & 0xFFL) << 36) |
      ((d(3) & 0xFFL) << 28) | ((d(4) & 0xFFL) << 20) | ((d(5) & 0xFFL) << 12) |
      ((d(6) & 0xFFL) << 4) | ((d(7) & 0xF0L) >>> 4)

  /** h(seed, payload bytes) for one seed. */
  def hash60(seed: Int, payload: Array[Byte], len: Int): Long = {
    val md = digests.get()
    md.reset()
    md.update(java.lang.Integer.toString(seed).getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    md.update('|'.toByte)
    md.update(payload, 0, len)
    prefix60(md.digest())
  }

  /** Word boundaries of non-empty runs between ' ' bytes — exactly
    * `filter(split(text, " "), _ != "")` (TextOps.tokens; the space byte
    * cannot occur inside a UTF-8 multibyte sequence, so byte scanning is
    * correct for any input).
    */
  // THE word-boundary scanner of the native text-hash family — shared with
  // MinHashTextExpr.signature ([[wordSpans]] is `private[functions]` for
  // exactly that); SimHashTextExpr keeps a truly zero-allocation inline
  // scan (it hashes each word as it goes, no spans needed) that MUST stay
  // in sync. Primitive int arrays with doubling growth: the boxed-Integer
  // ArrayList this replaces allocated two objects per word per row on the
  // signature hot path.
  private[graft] def wordSpans(bytes: Array[Byte]): (Array[Int], Array[Int]) = {
    val n = bytes.length
    var cap = 16
    var starts = new Array[Int](cap); var ends = new Array[Int](cap)
    var count = 0
    var i = 0
    while (i < n) {
      while (i < n && bytes(i) == ' ') i += 1
      if (i < n) {
        if (count == cap) {
          cap *= 2
          starts = java.util.Arrays.copyOf(starts, cap)
          ends = java.util.Arrays.copyOf(ends, cap)
        }
        starts(count) = i
        while (i < n && bytes(i) != ' ') i += 1
        ends(count) = i
        count += 1
      }
    }
    (java.util.Arrays.copyOf(starts, count), java.util.Arrays.copyOf(ends, count))
  }

  /** MinHash signature: min over shingles of h(seed, shingle) for each
    * seed 0..k-1; shingles are word n-grams in canonical single-space
    * form, whole text's words when shorter than n (Dedup.shingles).
    */
  def minhashSignature(text: UTF8String, shingle: Int, k: Int): Array[Long] = {
    val bytes = text.getBytes
    val (starts, ends) = wordSpans(bytes)
    val words = starts.length
    val minima = Array.fill(k)(Long.MaxValue)
    val scratch = new Array[Byte](bytes.length)
    def fold(from: Int, untilWord: Int): Unit = {
      var len = 0
      var w = from
      while (w < untilWord) {
        if (len > 0) { scratch(len) = ' '; len += 1 }
        System.arraycopy(bytes, starts(w), scratch, len, ends(w) - starts(w))
        len += ends(w) - starts(w)
        w += 1
      }
      var j = 0
      while (j < k) {
        val v = hash60(j, scratch, len)
        if (v < minima(j)) minima(j) = v
        j += 1
      }
    }
    if (words < shingle) fold(0, words)
    else {
      var w = 0
      while (w <= words - shingle) { fold(w, w + shingle); w += 1 }
    }
    minima
  }

  /** 60-bit SimHash: per token h(0, token); bit j set iff more tokens have
    * bit j set than clear (sign of the Σ±1 vote). Frequency-weighted
    * (duplicate tokens vote repeatedly). 0L when token-less — callers drop
    * token-less docs, matching the column twin's filter.
    */
  def simhash(text: UTF8String): Long = {
    val bytes = text.getBytes
    val (starts, ends) = wordSpans(bytes)
    val votes = new Array[Int](60)
    val scratch = new Array[Byte](bytes.length)
    var w = 0
    while (w < starts.length) {
      val len = ends(w) - starts(w)
      System.arraycopy(bytes, starts(w), scratch, 0, len)
      val h = hash60(0, scratch, len)
      var j = 0
      while (j < 60) {
        votes(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1)
        j += 1
      }
      w += 1
    }
    var sig = 0L
    var j = 0
    while (j < 60) {
      if (votes(j) > 0) sig |= 1L << j
      j += 1
    }
    sig
  }

  /** Rolling fingerprint: min over every `window`-CODE-POINT substring
    * (the whole text when shorter) of h(0, window). Windows advance by
    * code point via UTF8String.substringSQL — Spark's length()/substr()
    * count code points, and a UTF-16 `String.substring` window would split
    * surrogate pairs on supplementary-plane text and break native ≡
    * algebra ≡ DuckDB parity.
    */
  def rollingMin(text: UTF8String, window: Int): Long = {
    val n = text.numChars()
    // last window start; 0 even for empty text (one hash of "") — matches
    // the column twin's sequence(1, greatest(1, len - (w-1)))
    val last = math.max(0, n - window)
    var best = Long.MaxValue
    var i = 0
    while (i <= last) {
      val b = text.substringSQL(i + 1, window).getBytes
      val v = hash60(0, b, b.length)
      if (v < best) best = v
      i += 1
    }
    best
  }
}

/** Fused md5-60 MinHash signature (oracle twin of [[MinHashTextExpr]]). */
case class Md5MinHashExpr(child: Expression, shingle: Int, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"md5 minhash signature expects a string, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(Md5Family60.minhashSignature(input.asInstanceOf[UTF8String], shingle, k))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = Md5Family60.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($cls.minhashSignature($c, $shingle, $k));")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5MinHashExpr {
  def md5Minhash(text: Column, shingle: Int = 3, k: Int = 8): Column =
    ColumnBridge.column(Md5MinHashExpr(ColumnBridge.expression(text), shingle, k))
}

/** Fused md5-60 SimHash (oracle twin of [[SimHashTextExpr]]). */
case class Md5SimHashExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"md5 simhash expects a string, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    Md5Family60.simhash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = Md5Family60.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.simhash($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5SimHashExpr {
  def md5Simhash(text: Column): Column =
    ColumnBridge.column(Md5SimHashExpr(ColumnBridge.expression(text)))
}

/** Fused md5-60 rolling-window fingerprint (oracle twin of
  * [[RollingMinHashExpr]]).
  */
case class Md5RollingMinExpr(child: Expression, window: Int)
    extends UnaryExpression {
  require(window > 0, "window must be positive")

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"md5 rolling fingerprint expects a string, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    Md5Family60.rollingMin(input.asInstanceOf[UTF8String], window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = Md5Family60.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.rollingMin($c, $window);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5RollingMinExpr {
  def md5RollingMin(text: Column, window: Int = 16): Column =
    ColumnBridge.column(Md5RollingMinExpr(ColumnBridge.expression(text), window))
}
