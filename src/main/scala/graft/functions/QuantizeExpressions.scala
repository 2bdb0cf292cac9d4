package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Scalar helpers shared by interpreted + generated code. */
object QuantizeMath {
  /** Rust `f32::round` = round half AWAY from zero (not Java's
    * Math.round, which rounds half toward +inf), then Rust `as i8`
    * saturating cast (NaN → 0). Reference: vfs/src/vfs/vector.rs:94-125. */
  def quantizeLane(v: Float, scale: Float, clamp: Boolean): Byte = {
    val x0 = if (clamp) math.max(-1.0f, math.min(1.0f, v)) else v
    val scaled = x0.toDouble * scale.toDouble
    if (java.lang.Double.isNaN(scaled)) 0.toByte
    else {
      val r = java.lang.Math.floor(java.lang.Math.abs(scaled) + 0.5d) *
        java.lang.Math.signum(scaled)
      if (r > 127.0d) 127.toByte
      else if (r < -128.0d) (-128).toByte
      else r.toByte
    }
  }

  def dequantizeLane(q: Byte, scale: Float): Float = q.toFloat / scale
}

/** values ARRAY<FLOAT> × scale FLOAT → ARRAY<TINYINT>.
  * `q = saturating_i8(round_half_away(v * scale))`; the storage path
  * always uses scale=127 with NO clamping (vfs/src/vfs/vector.rs:188),
  * while user-level quantize with default scale clamps input to [-1,1]
  * first (vfs/src/vfs/vector.rs:104-106) — `clamp` selects the mode. */
case class QuantizeVec(left: Expression, right: Expression, clamp: Boolean)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graft.shims.AbstractDataType] =
    Seq(ArrayType(FloatType), FloatType)
  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vfs_quantize"

  override def nullSafeEval(av: Any, sv: Any): Any = {
    val x = av.asInstanceOf[ArrayData]
    val scale = sv.asInstanceOf[Float]
    val n = x.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      out(i) = QuantizeMath.quantizeLane(x.getFloat(i), scale, clamp)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, s) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val tmp = ctx.freshName("tmp")
      s"""
         |final int $n = $a.numElements();
         |final byte[] $tmp = new byte[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $tmp[$i] = graft.functions.QuantizeMath.quantizeLane(
         |    $a.getFloat($i), $s, $clamp);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($tmp);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** qvalues ARRAY<TINYINT> × scale FLOAT → ARRAY<FLOAT>:
  * `v = q / scale` (vfs/src/vfs/vector.rs:135-154). Lossy round-trip by
  * design (precision 1/scale per lane). */
case class DequantizeVec(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graft.shims.AbstractDataType] =
    Seq(ArrayType(ByteType), FloatType)
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vfs_dequantize"

  override def nullSafeEval(av: Any, sv: Any): Any = {
    val x = av.asInstanceOf[ArrayData]
    val scale = sv.asInstanceOf[Float]
    val n = x.numElements()
    val out = new Array[Float](n)
    var i = 0
    while (i < n) {
      out(i) = QuantizeMath.dequantizeLane(x.getByte(i), scale)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, s) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val tmp = ctx.freshName("tmp")
      s"""
         |final int $n = $a.numElements();
         |final float[] $tmp = new float[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $tmp[$i] = ((float)$a.getByte($i)) / $s;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($tmp);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
