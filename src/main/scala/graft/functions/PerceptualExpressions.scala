package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Codegen'd perceptual-hash expressions over binary media columns
  * (K-series discipline, like [[HashExpressions.SimHashText]]): the
  * decode kernels live as static methods on
  * `graft.multimodal.MultimodalOps` and are invoked from BOTH
  * `nullSafeEval` and the generated code, so the hash rides inside
  * whole-stage codegen with no per-row Scala-UDF boxing of
  * `Array[Byte] -> java.lang.Long` (null result = undecodable bytes,
  * the fail-closed multimodal codec contract — hence the explicit
  * isNull branch in the generated block).
  */
object PerceptualExpressions {

  private def nullableKernelCode(
      ctx: CodegenContext,
      ev: ExprCode,
      input: String,
      kernelCall: String => String
  ): String = {
    val tmp = ctx.freshName("sig")
    s"""
       |java.lang.Long $tmp = ${kernelCall(input)};
       |if ($tmp == null) { ${ev.isNull} = true; }
       |else { ${ev.value} = $tmp.longValue(); }
     """.stripMargin
  }

  /** 64-bit perceptual dHash of encoded image bytes
    * ([[graft.multimodal.MultimodalOps.imageDHashKernel]]).
    */
  case class ImageDHash64(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def prettyName: String = "image_dhash64"
    override protected def withNewChildInternal(newChild: Expression): ImageDHash64 =
      copy(child = newChild)

    override def nullSafeEval(input: Any): Any =
      graft.multimodal.MultimodalOps.imageDHashKernel(input.asInstanceOf[Array[Byte]])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        nullableKernelCode(ctx, ev, a,
          in => s"graft.multimodal.MultimodalOps.imageDHashKernel($in)"))
  }

  /** 64-bit energy-envelope audio fingerprint of encoded audio bytes
    * ([[graft.multimodal.MultimodalOps.audioFingerprintKernel]]).
    */
  case class AudioFingerprint64(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def prettyName: String = "audio_fingerprint64"
    override protected def withNewChildInternal(newChild: Expression): AudioFingerprint64 =
      copy(child = newChild)

    override def nullSafeEval(input: Any): Any =
      graft.multimodal.MultimodalOps.audioFingerprintKernel(input.asInstanceOf[Array[Byte]])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        nullableKernelCode(ctx, ev, a,
          in => s"graft.multimodal.MultimodalOps.audioFingerprintKernel($in)"))
  }

  // ---- Column wrappers ----------------------------------------------------

  import org.apache.spark.sql.graftbridge.ColumnBridge

  def imageDHash64(bytes: Column): Column =
    ColumnBridge.column(ImageDHash64(ColumnBridge.expression(bytes)))

  def audioFingerprint64(bytes: Column): Column =
    ColumnBridge.column(AudioFingerprint64(ColumnBridge.expression(bytes)))
}
