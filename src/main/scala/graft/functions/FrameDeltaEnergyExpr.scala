package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** Consecutive-frame difference energy of a video-like payload: the binary
  * is read as fixed-`frameBytes` frames (the [[graft.operators.Multimodal
  * .frameSample]] layout) and each adjacent pair (f−1, f) emits
  * Σ(b_f[i] − b_{f−1}[i])² over the pair's overlapping bytes — the
  * exact-integer inter-frame distance scene-cut detection thresholds on.
  * The video analog of the audio family's
  * [[graft.functions.PcmFrameEnergyExpr]]: a real container/codec
  * (fMP4/AV1) would swap in AT THIS EXPRESSION — the surrounding pipeline
  * (binary column, posexplode to pair rows, threshold flag, per-doc scene
  * aggregation, partitioning) is the production shape either way, and
  * sum-of-squared-differences over raw frame bytes is itself the real
  * SSD metric cut detectors use on decoded planes.
  *
  * Integer-exact by construction (no normalization — a monotone transform
  * the threshold absorbs), so the feature replays bit-identically in any
  * engine. Codegen emits one tight primitive loop per row inside
  * whole-stage codegen.
  */
case class FrameDeltaEnergyExpr(child: Expression, frameBytes: Int)
    extends UnaryExpression {
  require(frameBytes >= 1, s"frameBytes must be >= 1, got $frameBytes")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"frame_delta_energy expects BINARY, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      FrameDeltaEnergyExpr.frameDeltas(input.asInstanceOf[Array[Byte]], frameBytes))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = FrameDeltaEnergyExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val arr = ctx.freshName("frameDeltas")
    nullSafeCodeGen(ctx, ev, c =>
      s"""long[] $arr = $cls.frameDeltas($c, $frameBytes);
         ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($arr);""")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object FrameDeltaEnergyExpr {

  /** Element k (0-based) is the SSD between frames k and k+1. A payload
    * with fewer than 2 frames (including empty) → empty array. The LAST
    * frame may be ragged: the pair compares only its bytes (its
    * predecessor is complete by construction — a frame exists only if the
    * payload extends past its start). Max per-pair value is
    * frameBytes · 255² — overflow-free in a long for any sane frame.
    */
  def frameDeltas(bytes: Array[Byte], frameBytes: Int): Array[Long] = {
    val nFrames = (bytes.length + frameBytes - 1) / frameBytes
    val out = new Array[Long](math.max(nFrames - 1, 0))
    var f = 1
    while (f < nFrames) {
      val start = f * frameBytes
      val end = math.min(start + frameBytes, bytes.length)
      var acc = 0L
      var i = start
      while (i < end) {
        val d = (bytes(i) & 0xFF) - (bytes(i - frameBytes) & 0xFF)
        acc += d.toLong * d
        i += 1
      }
      out(f - 1) = acc
      f += 1
    }
    out
  }

  def frameDeltaEnergy(payload: Column, frameBytes: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(FrameDeltaEnergyExpr(ColumnBridge.expression(payload), frameBytes))
  }
}
