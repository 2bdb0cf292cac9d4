package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** The 64-bit hashes of every k-word window of a text in ONE pass —
  * the kernel form of the gram family's
  * `when(size(w) >= k, transform(sequence(0, size(w) - k),
  * i => xxhash64(concat_ws(" ", slice(w, i + 1, k))))).otherwise([])`
  * with `w = split(trim(text), "\\s+")`.
  *
  * Why a kernel: the column form is an INTERPRETED higher-order
  * function whose per-window `slice` copies k array cells and whose
  * `concat_ws` allocates the joined string before hashing — the r18
  * profile put the substring-dedup and gram-index stages at 11–17
  * process-CPU-seconds at sf0.1 with this as the dominant term. The
  * kernel tokenizes once (the SAME `UTF8String.trim`/`split` library
  * calls the column form bottoms out in), reuses one byte buffer for
  * every window, and hashes with the same XXH64 (seed 42) that
  * `xxhash64` uses — bit-identical outputs.
  *
  * Parity contract (spec-pinned in KernelParitySpec): tokenization is
  * exactly `split(trim(text), "\\s+")` (trim strips ASCII spaces
  * only; split keeps leading/trailing empty tokens the way Java
  * regex split with limit -1 does); a NULL or shorter-than-k token
  * list yields the EMPTY array, not NULL. */
case class WordGramHashes(child: Expression, k: Int)
    extends UnaryExpression {
  require(k > 0, "[GRAFT] vfs_word_gram_hashes: k must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "vfs_word_gram_hashes"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) CharNGrams.empty()
    else WordGramHashes.grams(v.asInstanceOf[UTF8String], k)
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
          : graft.functions.WordGramHashes.grams(${c.value}, $k);
      """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Merge a SORTED array of duplicate-window start indices into
  * maximal [s, e) spans of window length `k` — the kernel form of
  * [[graft.operators.Dedup.foldSpans]]' interpreted `aggregate` HOF,
  * which rebuilt the whole accumulator array per element (O(spans²)
  * allocation per document; hyper-duplicated docs have one start per
  * token). Same rule, one pass: a start x with x ≤ the running span's
  * end extends it to max(end, x + k), otherwise opens [x, x + k). */
case class MergeSpans(child: Expression, k: Int)
    extends UnaryExpression with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  require(k > 0, "[GRAFT] vfs_merge_spans: k must be positive")

  override def inputTypes: Seq[org.apache.spark.sql.graft.shims.AbstractDataType] =
    Seq(ArrayType(org.apache.spark.sql.types.IntegerType))
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("s",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("e",
        org.apache.spark.sql.types.IntegerType, nullable = false))),
    containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def prettyName: String = "vfs_merge_spans"

  override def nullSafeEval(v: Any): Any =
    MergeSpans.merge(v.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MergeSpans.merge($c, $k)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object MergeSpans {
  /** static entry for codegen */
  def merge(starts: ArrayData, k: Int): ArrayData = {
    val n = starts.numElements()
    if (n == 0) return CharNGrams.empty()
    val ss = new Array[Int](n)
    val es = new Array[Int](n)
    var m = 0
    var i = 0
    while (i < n) {
      val x = starts.getInt(i)
      if (m == 0 || x > es(m - 1)) {
        ss(m) = x; es(m) = x + k; m += 1
      } else if (x + k > es(m - 1)) {
        es(m - 1) = x + k
      }
      i += 1
    }
    val out = new Array[Any](m)
    i = 0
    while (i < m) {
      out(i) = new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(Array[Any](ss(i), es(i)))
      i += 1
    }
    new GenericArrayData(out)
  }
}

object WordGramHashes {
  private val SplitRe = UTF8String.fromString("\\s+")

  /** static entry for codegen: tokenize once, hash each window from
    * a reused buffer with XXH64 seed 42 (`xxhash64` parity). */
  def grams(t: UTF8String, k: Int): ArrayData = {
    // the exact library calls the column form bottoms out in:
    // StringTrim -> UTF8String.trim, StringSplit -> UTF8String.split
    val w = t.trim().split(SplitRe, -1)
    val n = w.length
    if (n < k) return CharNGrams.empty()
    // max window byte size (sliding token-byte sum) for ONE reusable
    // buffer across all windows
    var winSum = 0L
    var maxWin = 0L
    var i = 0
    while (i < n) {
      winSum += w(i).numBytes()
      if (i >= k) winSum -= w(i - k).numBytes()
      if (i >= k - 1 && winSum > maxWin) maxWin = winSum
      i += 1
    }
    val maxBytes = maxWin + (k - 1)
    require(maxBytes <= Int.MaxValue,
      "[GRAFT] vfs_word_gram_hashes: window exceeds 2 GiB")
    val buf = new Array[Byte](maxBytes.toInt)
    val out = new Array[Long](n - k + 1)
    var s = 0
    while (s <= n - k) {
      var pos = 0
      var j = 0
      while (j < k) {
        if (j > 0) { buf(pos) = ' '; pos += 1 }
        val tok = w(s + j)
        tok.writeToMemory(buf, Platform.BYTE_ARRAY_OFFSET + pos)
        pos += tok.numBytes()
        j += 1
      }
      out(s) = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, pos, 42L)
      s += 1
    }
    new GenericArrayData(out)
  }
}
