package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Scalar kernels shared by interpreted + generated code. */
object BinaryQuantMath {
  /** Sign-bit packing: bit (d % 64) of word (d / 64) is 1 iff
    * v[d] > 0 (strictly — zero and NaN both pack as 0, matching the
    * SQL predicate `v > 0` in every engine). Words beyond the last
    * populated bit stay 0, so equal-dimension vectors always compare
    * over identical padding. */
  def pack(x: ArrayData): Array[Long] = {
    val n = x.numElements()
    val out = new Array[Long]((n + 63) >>> 6)
    var i = 0
    while (i < n) {
      if (x.getFloat(i) > 0f) out(i >>> 6) |= 1L << (i & 63)
      i += 1
    }
    out
  }

  def hamming(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    val m = b.numElements()
    if (n != m) throw VectorErrors.dimMismatch(n, m)
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += java.lang.Long.bitCount(a.getLong(i) ^ b.getLong(i))
      i += 1
    }
    acc
  }
}

/** values ARRAY<FLOAT> → ARRAY<BIGINT>: 1-bit (sign) quantization, 64
  * dimensions per word — the 32x-compression binary-embedding codec.
  * Combined with [[HammingDist]] it gives a scan whose candidate
  * scoring is one XOR+popcount per 64 dims: the standard cheap
  * prefilter in front of an exact re-rank (see `q_binary_hamming_knn`
  * in [[graft.SparkEntry]]). No reference analog — the reference
  * stores only int8 quantization (vfs/src/vfs/vector.rs:94-154); this
  * extends the same storage-codec family one level coarser. */
case class BinaryQuantizeVec(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graft.shims.AbstractDataType] =
    Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vfs_binary_quantize"

  override def nullSafeEval(av: Any): Any =
    new GenericArrayData(BinaryQuantMath.pack(av.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"""
       |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
       |  graft.functions.BinaryQuantMath.pack($a));
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** packed ARRAY<BIGINT> × packed ARRAY<BIGINT> → BIGINT: Hamming
  * distance via XOR + popcount, one 64-bit word at a time. Word-count
  * mismatch throws the shared dimension guard (the per-dimension
  * guard lives at packing time — two equal-dim vectors always pack to
  * equal word counts with identical zero padding). */
case class HammingDist(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graft.shims.AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vfs_hamming"

  override def nullSafeEval(av: Any, bv: Any): Any =
    BinaryQuantMath.hamming(av.asInstanceOf[ArrayData],
      bv.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  throw graft.functions.VectorErrors.dimMismatch($n, $b.numElements());
         |}
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += java.lang.Long.bitCount($a.getLong($i) ^ $b.getLong($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
