package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Bit-interleave kernels for Z-order (Morton) codes. */
object ZOrderMath {
  /** Spread the low 32 bits of `v` into the even bit positions of a
    * long (the classic mask-shift cascade — O(log w), no loop). */
  def spread(v: Long): Long = {
    var x = v & 0xFFFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** 64-bit Morton code of (x, y): x in even bits, y in odd. Inputs
    * are taken mod 2^32 (callers bucket/offset into unsigned range —
    * z-ordering is a LAYOUT device, not arithmetic). */
  def interleave(x: Long, y: Long): Long =
    spread(x) | (spread(y) << 1)
}

/** (BIGINT, BIGINT) → BIGINT Morton code — the clustering key for
  * multi-dimensional data layout: sorting by it keeps rows close in
  * BOTH dimensions close on disk, so per-file/row-group min-max stats
  * on the ORIGINAL columns stay tight and a 2-d range predicate prunes
  * most of the data (the standard lakehouse OPTIMIZE ZORDER BY
  * technique; see [[graft.store.ZOrderLayout]]). */
case class MortonCode(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graft.shims.AbstractDataType] =
    Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vfs_zorder"

  override def nullSafeEval(x: Any, y: Any): Any =
    ZOrderMath.interleave(x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) =>
      s"graft.functions.ZOrderMath.interleave($x, $y)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
