package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Collected-model langid scoring table + the one-projection kernel
  * over it — the fold form of [[graft.operators.TextAnalysis.scoreLangId]]'s
  * explode → broadcast-join → per-doc aggregate shape.
  *
  * Why a kernel: the join shape ships one row per (doc, distinct
  * vocab trigram) into a doc-keyed hash aggregate with one sum lane
  * per language — the r18 lap probe put the langid stage at 5.9–6.6
  * process-CPU-seconds at sf0.1, almost all of it Generate + hash-agg
  * row traffic, NOT arithmetic. When the pivoted model fits the
  * driver collect budget (every trainLangId model does by
  * construction — vocab × L longs), the whole chain is a pure
  * per-row fold: walk the doc's trigrams once, probe the vocab table,
  * sum the matched grams' weight lanes, argmax. Zero shuffles, zero
  * joins, no Generate row flood. Over the collect budget the caller
  * keeps the broadcast-join shape (the gate decides from the same
  * counts either way — never from data values).
  *
  * Exact-parity contract (spec-pinned in KernelParitySpec against the
  * retained join form):
  *  - grams are the DISTINCT lowercased trigrams of
  *    [[CharNGrams]] (same codepoint walk, byte-level slices — the
  *    vocab probe hashes/compares raw UTF-8 bytes exactly like the
  *    join's UTF8String equality);
  *  - `matched` counts distinct vocab grams present (the join's
  *    count over the dense wide row per matched gram);
  *  - per-language evidence is the Long sum of the matched grams'
  *    weight lanes (addition commutes — order-free);
  *  - `score_milli` replicates the join path's
  *    `idiv(ev, m) = cast((ev - pmod(ev, m)) / m as long)` BIT-FOR-BIT
  *    including its double division (exact for every realistic model;
  *    replicated rather than floorDiv so even absurd magnitudes
  *    round identically);
  *  - argmax folds lanes in UTF-8-byte-ascending language order with
  *    STRICT replace-on-greater — ties keep the smaller code;
  *  - a doc with no matched gram (NULL text, < 3 codepoints, all
  *    OOV) yields ("und", 0, 500) — the join path's left-join miss. */
final class LangIdTable(
    val langs: Array[String],
    gramBytes: Array[Array[Byte]],
    flat: Array[Long]) extends Serializable {

  private val numLangs = langs.length
  require(numLangs > 0, "[GRAFT] LangIdTable: no languages")
  require(flat.length == gramBytes.length.toLong * numLangs,
    "[GRAFT] LangIdTable: weights are not vocab × L")

  // probe table, rebuilt lazily per deserialized instance (the task
  // binary is broadcast once per stage; the rebuild is O(vocab)).
  // Keys are RAW byte arrays probed by a shared murmur over the raw
  // bytes + explicit byte equality — the first cut wrapped every doc
  // window in UTF8String.fromBytes just to reuse its hashCode/equals,
  // and the r18 JFR profile showed those wrappers dominating the
  // kernel whenever the JIT had not yet scalar-replaced them (the
  // bimodal 1.4-vs-10 CPU-s langid reps in the full-suite bench).
  // Equality is byte equality either way, and the hash only routes
  // the probe (build and probe sides use the SAME function), so the
  // scored output is bit-identical.
  @transient @volatile private var built: Array[Int] = _ // slotIdx
  @transient private var hashes: Array[Int] = _
  @transient private var mask: Int = 0
  @transient private var langsU8: Array[UTF8String] = _

  private def gramHash(base: Array[Byte], off: Int, len: Int): Int =
    org.apache.spark.unsafe.hash.Murmur3_x86_32.hashUnsafeBytes(
      base, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + off,
      len, 42)

  private def gramEquals(idx: Int, base: Array[Byte], off: Int,
      len: Int): Boolean = {
    val g = gramBytes(idx)
    g.length == len &&
      org.apache.spark.unsafe.array.ByteArrayMethods.arrayEquals(
        g, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
        base, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + off,
        len)
  }

  private def ensureBuilt(): Unit = {
    if (built != null) return
    synchronized {
      if (built != null) return
      val n = gramBytes.length
      var cap = 8
      while (cap < n * 2) cap <<= 1
      val hs = new Array[Int](cap)
      val si = new Array[Int](cap)
      java.util.Arrays.fill(si, -1)
      val m = cap - 1
      var i = 0
      while (i < n) {
        val gb = gramBytes(i)
        val h = gramHash(gb, 0, gb.length)
        var p = h & 0x7fffffff & m
        var done = false
        while (!done) {
          if (si(p) < 0) { hs(p) = h; si(p) = i; done = true }
          else if (hs(p) == h && gramEquals(si(p), gb, 0, gb.length))
            done = true // dup gram: first wins (groupBy(gram) makes dups impossible upstream)
          else p = (p + 1) & m
        }
        i += 1
      }
      langsU8 = langs.map(UTF8String.fromString)
      hashes = hs; mask = m
      built = si // last: the publication guard ensureBuilt checks
    }
  }

  /** pmod-then-double-divide — the Column `idiv`'s exact arithmetic. */
  private def idivLike(a: Long, b: Long): Long = {
    var r = a % b
    if (r < 0) r += b
    ((a - r).toDouble / b.toDouble).toLong
  }

  private def undRow(): InternalRow =
    new GenericInternalRow(Array[Any](LangIdTable.Und, 0L, 500L))

  /** Score one document: (lang_pred, matched, score_milli). */
  def score(text: UTF8String): InternalRow = {
    if (text == null) return undRow()
    ensureBuilt()
    val t = text.toLowerCase
    val numBytes = t.numBytes()
    // codepoint offsets walk (CharNGrams' exact window semantics)
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
    if (nChars < 3) return undRow()
    if (nChars == cap) offsets = java.util.Arrays.copyOf(offsets, cap + 1)
    offsets(nChars) = numBytes
    val bytes = t.getBytes
    // matched-vocab-index dedup set (open addressing over ints);
    // sized for the doc's window count, grown never (hits ≤ windows)
    var scap = 8
    while (scap < (nChars - 2) * 2) scap <<= 1
    val seenIdx = new Array[Int](scap)
    java.util.Arrays.fill(seenIdx, -1)
    val smask = scap - 1
    val ev = new Array[Long](numLangs)
    var matched = 0L
    val slotIdx = built
    var k = 0
    val last = nChars - 3
    while (k <= last) {
      val off = offsets(k)
      val len = offsets(k + 3) - off
      val h = gramHash(bytes, off, len)
      var p = h & 0x7fffffff & mask
      var idx = -1
      var done = false
      while (!done) {
        if (slotIdx(p) < 0) done = true
        else if (hashes(p) == h && gramEquals(slotIdx(p), bytes, off, len)) {
          idx = slotIdx(p); done = true
        } else p = (p + 1) & mask
      }
      if (idx >= 0) {
        // dedup on the vocab index — each distinct vocab gram once
        var q = idx & smask
        var fresh = false
        var d2 = false
        while (!d2) {
          if (seenIdx(q) < 0) { seenIdx(q) = idx; fresh = true; d2 = true }
          else if (seenIdx(q) == idx) d2 = true
          else q = (q + 1) & smask
        }
        if (fresh) {
          matched += 1L
          val base = idx * numLangs
          var l = 0
          while (l < numLangs) {
            ev(l) += flat(base + l)
            l += 1
          }
        }
      }
      k += 1
    }
    if (matched == 0L) return undRow()
    var bestLang = 0
    var bestScore = idivLike(ev(0), matched)
    var l = 1
    while (l < numLangs) {
      val s = idivLike(ev(l), matched)
      if (s > bestScore) { bestScore = s; bestLang = l }
      l += 1
    }
    new GenericInternalRow(
      Array[Any](langsU8(bestLang), matched, bestScore))
  }
}

object LangIdTable {
  private val Und = UTF8String.fromString("und")

  val schema: StructType = StructType(Seq(
    StructField("lang_pred", StringType, nullable = false),
    StructField("matched", LongType, nullable = false),
    StructField("score_milli", LongType, nullable = false)))
}

/** The kernel projection: text → (lang_pred, matched, score_milli)
  * under a collected [[LangIdTable]]. NULL input scores like any
  * unmatched doc — ("und", 0, 500) — so the output struct is never
  * null (the join path's coalesce defaults). */
case class LangIdScoreOf(child: Expression, table: LangIdTable)
    extends UnaryExpression {

  override def dataType: DataType = LangIdTable.schema
  override def nullable: Boolean = false
  override def prettyName: String = "vfs_langid_score"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    table.score(if (v == null) null else v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val ref = ctx.addReferenceObj("langIdTable", table,
      classOf[LangIdTable].getName)
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      org.apache.spark.sql.catalyst.InternalRow ${ev.value} =
        $ref.score(${c.isNull} ? null : ${c.value});
      """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
