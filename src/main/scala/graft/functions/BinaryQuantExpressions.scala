package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Scalar kernels shared by interpreted + generated code. */
object BinaryQuantMath {
  /** Sign-bit packing: bit (d % 64) of word (d / 64) is 1 iff
    * v[d] > 0 (strictly — zero and NaN both pack as 0 under Java
    * float comparison; note DuckDB's total order ranks NaN above all
    * floats, so a SQL oracle's `v > 0` predicate DIVERGES on
    * NaN-bearing inputs — the oracle-gated queries run on NaN-free
    * embeddings). Words beyond the last populated bit stay 0, so
    * equal-dimension vectors always compare over identical padding.
    * A null element returns null (the [[LongDot]] null-propagation
    * stance — unboxing it to a primitive would silently pack 0). */
  def pack(x: ArrayData): Array[Long] = {
    val n = x.numElements()
    val out = new Array[Long]((n + 63) >>> 6)
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      if (x.getFloat(i) > 0f) out(i >>> 6) |= 1L << (i & 63)
      i += 1
    }
    out
  }

  /** Driver-side twin of [[pack]] for query literals (primitive
    * floats — no null slots by construction). */
  def packFloats(v: Array[Float]): Array[Long] = {
    val out = new Array[Long]((v.length + 63) >>> 6)
    var i = 0
    while (i < v.length) {
      if (v(i) > 0f) out(i >>> 6) |= 1L << (i & 63)
      i += 1
    }
    out
  }

  /** Word-count mismatch throws (the Q7 dimension guard); a null
    * WORD returns null (same null-propagation stance as [[pack]]). */
  def hamming(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    val m = b.numElements()
    if (n != m) throw VectorErrors.dimMismatch(n, m)
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
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
  override def nullable: Boolean = true
  override def prettyName: String = "vfs_binary_quantize"

  override def nullSafeEval(av: Any): Any = {
    val r = BinaryQuantMath.pack(av.asInstanceOf[ArrayData])
    if (r == null) null else new GenericArrayData(r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val tmp = ctx.freshName("packed")
      s"""
         |long[] $tmp = graft.functions.BinaryQuantMath.pack($a);
         |${ev.isNull} = ($tmp == null);
         |if (!${ev.isNull}) {
         |  ${ev.value} =
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData($tmp);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** packed ARRAY<BIGINT> × packed ARRAY<BIGINT> → BIGINT: Hamming
  * distance via XOR + popcount, one 64-bit word at a time. Word-count
  * mismatch throws the shared dimension guard (the per-dimension
  * guard lives at packing time — two equal-dim vectors always pack to
  * equal word counts with identical zero padding); a null WORD
  * propagates NULL (the [[LongDot]] stance — unboxing it would
  * silently score 0). */
case class HammingDist(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graft.shims.AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def prettyName: String = "vfs_hamming"

  override def nullSafeEval(av: Any, bv: Any): Any =
    BinaryQuantMath.hamming(av.asInstanceOf[ArrayData],
      bv.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("bad")
      s"""
         |final int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  throw graft.functions.VectorErrors.dimMismatch($n, $b.numElements());
         |}
         |long $acc = 0L;
         |boolean $bad = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |  $acc += java.lang.Long.bitCount($a.getLong($i) ^ $b.getLong($i));
         |}
         |${ev.isNull} = $bad;
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
