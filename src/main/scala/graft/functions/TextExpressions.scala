package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Scalar kernels shared by interpreted + generated code. */
object TextHash {
  final val FnvOffset = 0xcbf29ce484222325L
  final val FnvPrime = 0x100000001b3L

  /** FNV-1a 64 over UTF-8 bytes — the document fingerprint. */
  def fnv1a(bytes: Array[Byte]): Long = {
    var h = FnvOffset
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= FnvPrime
      i += 1
    }
    h
  }

  /** Minimum FNV-1a hash over all k-byte shingles (winnowing-style
    * content signature; equal for byte-identical content, stable under
    * reordering of large blocks). Returns fnv1a(whole) when the text is
    * shorter than k. */
  def minShingle(bytes: Array[Byte], k: Int): Long = {
    if (bytes.length < k) return fnv1a(bytes)
    var min = Long.MaxValue
    var s = 0
    while (s + k <= bytes.length) {
      var h = FnvOffset
      var i = s
      while (i < s + k) {
        h ^= (bytes(i) & 0xffL)
        h *= FnvPrime
        i += 1
      }
      if (h < min) min = h
      s += 1
    }
    min
  }
}

/** STRING → BIGINT content fingerprint (FNV-1a 64). The Spark-side
  * analog of a dedup hash key: cheap, codegen'd, collision-negligible
  * for exact-dup grouping at 100 TB (vs md5: no string hex round-trip). */
case class Fingerprint(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graft.shims.AbstractDataType] =
    Seq(StringType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vfs_fingerprint"

  override def nullSafeEval(v: Any): Any =
    TextHash.fnv1a(v.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextHash.fnv1a($c.getBytes())")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** (STRING, k INT literal) → BIGINT min-shingle signature. */
case class MinShingleHash(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graft.shims.AbstractDataType] =
    Seq(StringType, IntegerType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vfs_min_shingle"

  override def nullSafeEval(v: Any, k: Any): Any =
    TextHash.minShingle(v.asInstanceOf[UTF8String].getBytes,
      k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c, k) =>
      s"graft.functions.TextHash.minShingle($c.getBytes(), $k)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
