package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Fused dequantize+distance over int8-quantized vectors: computes the
  * distance between `dequantize(qvalues, scale)` and a dense query
  * WITHOUT materializing the intermediate float array (one fewer
  * allocation + copy per row on the quantized-store hot path).
  * Lane math replicates the two-step path exactly: (float)(q/scale)
  * widened to double, so results are bit-identical to
  * vfs_<metric>(vfs_dequantize(q, s), query).
  */
abstract class QuantizedDistance extends TernaryExpression
    with ExpectsInputTypes {
  def qvalues: Expression
  def scale: Expression
  def query: Expression

  override def first: Expression = qvalues
  override def second: Expression = scale
  override def third: Expression = query
  override def inputTypes: Seq[org.apache.spark.sql.graft.shims.AbstractDataType] =
    Seq(ArrayType(ByteType), FloatType, ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  protected def kernel(q: ArrayData, s: Float, y: ArrayData, n: Int): Double
  protected def genKernel(ctx: CodegenContext, q: String, s: String,
      y: String, n: String, res: String): String

  override def nullSafeEval(qv: Any, sv: Any, yv: Any): Any = {
    val q = qv.asInstanceOf[ArrayData]
    val y = yv.asInstanceOf[ArrayData]
    val n = q.numElements()
    if (y.numElements() != n)
      throw VectorErrors.dimMismatch(n, y.numElements())
    kernel(q, sv.asInstanceOf[Float], y, n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, s, y) => {
      val n = ctx.freshName("n")
      val res = ctx.freshName("res")
      s"""
         |final int $n = $q.numElements();
         |if ($y.numElements() != $n) {
         |  throw graft.functions.VectorErrors.dimMismatch($n, $y.numElements());
         |}
         |double $res = 0.0;
         |${genKernel(ctx, q, s, y, n, res)}
         |${ev.value} = $res;
       """.stripMargin
    })
}

/** sqrt(Σ ((float)(q/scale) − y)²) over (int8, scale, float[]). */
case class QuantizedEuclideanDistance(qvalues: Expression,
    scale: Expression, query: Expression) extends QuantizedDistance {
  override def prettyName: String = "vfs_qeuclidean"

  protected def kernel(q: ArrayData, s: Float, y: ArrayData, n: Int): Double = {
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = (q.getByte(i) / s).toDouble - y.getFloat(i).toDouble
      acc += d * d
      i += 1
    }
    math.sqrt(acc)
  }

  protected def genKernel(ctx: CodegenContext, q: String, s: String,
      y: String, n: String, res: String): String = {
    val i = ctx.freshName("i")
    val d = ctx.freshName("d")
    s"""
       |for (int $i = 0; $i < $n; $i++) {
       |  final double $d =
       |    (double)((float)$q.getByte($i) / $s) - (double)$y.getFloat($i);
       |  $res += $d * $d;
       |}
       |$res = java.lang.Math.sqrt($res);
     """.stripMargin
  }

  override protected def withNewChildrenInternal(f: Expression,
      sec: Expression, t: Expression): Expression = copy(f, sec, t)
}

/** 1 − dot/(‖a‖‖b‖) over (int8, scale, float[]). */
case class QuantizedCosineDistance(qvalues: Expression,
    scale: Expression, query: Expression) extends QuantizedDistance {
  override def prettyName: String = "vfs_qcosine"

  protected def kernel(q: ArrayData, s: Float, y: ArrayData, n: Int): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = (q.getByte(i) / s).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    1.0 - dot / (math.sqrt(na) * math.sqrt(nb))
  }

  protected def genKernel(ctx: CodegenContext, q: String, s: String,
      y: String, n: String, res: String): String = {
    val i = ctx.freshName("i")
    val xi = ctx.freshName("xi")
    val yi = ctx.freshName("yi")
    val dot = ctx.freshName("dot")
    val na = ctx.freshName("na")
    val nb = ctx.freshName("nb")
    s"""
       |double $dot = 0.0, $na = 0.0, $nb = 0.0;
       |for (int $i = 0; $i < $n; $i++) {
       |  final double $xi = (double)((float)$q.getByte($i) / $s);
       |  final double $yi = (double)$y.getFloat($i);
       |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
       |}
       |$res = 1.0 - $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
     """.stripMargin
  }

  override protected def withNewChildrenInternal(f: Expression,
      sec: Expression, t: Expression): Expression = copy(f, sec, t)
}
