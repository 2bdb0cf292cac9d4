package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DISTINCT character n-grams of a string in ONE byte walk — the
  * kernel form of the langid family's
  * `when(length(t) >= n, array_distinct(transform(sequence(1,
  * length(t) - (n-1)), i => substr(t, i, n)))).otherwise(array())`.
  *
  * Why a kernel: the column form is an INTERPRETED higher-order
  * function whose per-window `substr(t, i, n)` re-walks the string
  * from byte 0 to find codepoint i — O(len²) bytes touched per
  * document — and `array_distinct` then rehashes the full window
  * list. The r18 lap probe put the langid scoring stage at ~7-9
  * process-CPU-seconds at sf0.1 with this as the dominant term. The
  * kernel records every codepoint's byte offset in one pass, slices
  * each window directly, and dedups with an insertion-ordered hash
  * set — O(len·n) bytes touched.
  *
  * Exact-parity contract (spec-pinned in KernelParitySpec):
  *  - windows are CODEPOINT-indexed (UTF8String semantics, surrogate
  *    pairs are one codepoint) and slicing happens at the BYTE level
  *    exactly like `substringSQL` — ill-formed UTF-8 passes through
  *    untouched (no toString round trip, which would substitute
  *    U+FFFD);
  *  - dedup keeps FIRST occurrence order (what `array_distinct`
  *    does);
  *  - a NULL or shorter-than-n input yields the EMPTY array, not
  *    NULL (`when` with a NULL condition falls to `otherwise`). */
case class CharNGrams(child: Expression, n: Int)
    extends UnaryExpression {
  require(n > 0, "[GRAFT] vfs_char_ngrams: n must be positive")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "vfs_char_ngrams"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) CharNGrams.empty()
    else CharNGrams.grams(v.asInstanceOf[UTF8String], n)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        ${c.isNull} ? graft.functions.CharNGrams.empty()
          : graft.functions.CharNGrams.grams(${c.value}, $n);
      """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object CharNGrams {
  private val EmptyArray = new GenericArrayData(Array.empty[Any])

  /** the shared empty result (exposed for codegen) */
  def empty(): ArrayData = EmptyArray

  /** static entry for codegen: one codepoint-offset walk, byte-level
    * window slices, insertion-ordered dedup. */
  def grams(t: UTF8String, n: Int): ArrayData = {
    val numBytes = t.numBytes()
    // codepoint byte offsets (offsets(k) = first byte of codepoint k),
    // with a final sentinel at numBytes
    var cap = 16
    var offsets = new Array[Int](cap)
    var nChars = 0
    var i = 0
    while (i < numBytes) {
      if (nChars == cap) {
        cap <<= 1
        offsets = java.util.Arrays.copyOf(offsets, cap)
      }
      offsets(nChars) = i
      nChars += 1
      i += UTF8String.numBytesForFirstByte(t.getByte(i))
    }
    if (nChars < n) return EmptyArray
    if (nChars == cap) offsets = java.util.Arrays.copyOf(offsets, cap + 1)
    offsets(nChars) = numBytes
    val bytes = t.getBytes
    val seen = new java.util.LinkedHashSet[UTF8String](
      math.min(nChars, 1024))
    var k = 0
    val last = nChars - n
    while (k <= last) {
      seen.add(UTF8String.fromBytes(java.util.Arrays.copyOfRange(
        bytes, offsets(k), offsets(k + n))))
      k += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }
}
