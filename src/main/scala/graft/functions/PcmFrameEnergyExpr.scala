package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** Per-frame energy of an unsigned-8-bit-PCM audio payload: the binary is
  * read as u8 samples centered at 128, and each length-`frameLen` frame
  * (last frame ragged) emits Σ(sample−128)² — the exact-integer energy
  * feature silence trimming / VAD gates on. The audio analog of the image
  * family's decode seam ([[graft.operators.Multimodal.decode]]): a real
  * audio codec (MP3/Opus) would swap in AT THIS EXPRESSION — everything
  * around it (binary column, posexplode to frame rows, threshold
  * aggregation, partitioning) is the production pipeline shape, and u8 PCM
  * is itself a real format (WAV/PCM_U8), so the arithmetic is not a stub.
  *
  * Integer-exact by construction (no sqrt/RMS — that's a monotone
  * transform the threshold can absorb), so the feature replays
  * bit-identically in any engine. Codegen emits one tight primitive loop
  * per row inside whole-stage codegen.
  */
case class PcmFrameEnergyExpr(child: Expression, frameLen: Int)
    extends UnaryExpression {
  require(frameLen >= 1, s"frameLen must be >= 1, got $frameLen")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"pcm_frame_energy expects BINARY, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      PcmFrameEnergyExpr.frameEnergies(input.asInstanceOf[Array[Byte]], frameLen))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = PcmFrameEnergyExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val arr = ctx.freshName("pcmEnergies")
    nullSafeCodeGen(ctx, ev, c =>
      s"""long[] $arr = $cls.frameEnergies($c, $frameLen);
         ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($arr);""")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PcmFrameEnergyExpr {

  /** Empty payload → empty array (a zero-length clip has zero frames, not
    * a null row). Max per-frame value is frameLen · 128² — overflow-free
    * in a long for any sane frame.
    */
  def frameEnergies(bytes: Array[Byte], frameLen: Int): Array[Long] = {
    val nFrames = (bytes.length + frameLen - 1) / frameLen
    val out = new Array[Long](nFrames)
    var f = 0
    while (f < nFrames) {
      val end = math.min((f + 1) * frameLen, bytes.length)
      var acc = 0L
      var i = f * frameLen
      while (i < end) {
        val d = (bytes(i) & 0xFF) - 128
        acc += d.toLong * d
        i += 1
      }
      out(f) = acc
      f += 1
    }
    out
  }

  def pcmFrameEnergy(payload: Column, frameLen: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(PcmFrameEnergyExpr(ColumnBridge.expression(payload), frameLen))
  }
}
