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

/** Hashed bag-of-words kernel shared by interpreted + generated code
  * (the "hashing trick", Weinberger et al. 2009, as in scikit-learn's
  * HashingVectorizer): token → bucket `wordHash60(token) mod dim`,
  * count, L2-normalize. One MD5 per token (reused digest instance),
  * one pass — the HOF phrasing re-walked the counts array inside
  * interpreted lambdas (no codegen, no CSE) and recomputed the norm
  * per element. The hash is the same md5-fold as
  * [[graft.operators.Dedup.portableWordHash]], so the DuckDB oracle
  * derives identical vectors. */
object HashedBow {
  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Dedup.portableWordHash twin in the JVM: the first 15 hex chars of
    * md5 parsed base-16 == the top 60 bits of the digest. */
  def wordHash60(w: String): Long = {
    val md = mdLocal.get()
    md.reset()
    val d = md.digest(w.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var x = 0L
    var i = 0
    while (i < 8) { x = (x << 8) | (d(i) & 0xffL); i += 1 }
    x >>> 4
  }

  /** EXACTLY the Column-side token model (`tokens(lower(trim(text)))`):
    * lower via Locale.ROOT, trim U+0020 only, split `\s+` limit -1.
    * Shared with [[TermCount]] so the bm25 kernel can't drift from
    * the hashed-BoW tokenizer. */
  private val wsPattern = java.util.regex.Pattern.compile("\\s+")

  private[functions] def tokensOf(text: UTF8String): Array[String] = {
    val lowered = text.toString.toLowerCase(java.util.Locale.ROOT)
    var lo = 0
    var hi = lowered.length
    while (lo < hi && lowered.charAt(lo) == ' ') lo += 1
    while (hi > lo && lowered.charAt(hi - 1) == ' ') hi -= 1
    wsPattern.split(lowered.substring(lo, hi), -1)
  }

  /** The DISTINCT token set under the same model — the one
    * tokenization every dedup kernel ([[MinHashSig]], [[SimHash]])
    * shares; a drift here would band on different tokens than the
    * jaccard verify step and break the DuckDB oracle match, so there
    * is exactly ONE copy of the lower/trim/split block. */
  private[functions] def wordSetOf(
      text: UTF8String): java.util.HashSet[String] = {
    val set = new java.util.HashSet[String]()
    val ts = tokensOf(text)
    var i = 0
    while (i < ts.length) { set.add(ts(i)); i += 1 }
    set
  }

  private def counts(text: UTF8String, dim: Int): (Array[Double], Double) = {
    val c = new Array[Double](dim)
    tokensOf(text).foreach { t =>
      c((wordHash60(t) % dim).toInt) += 1.0
    }
    var ss = 0.0
    var i = 0
    while (i < dim) { ss += c(i) * c(i); i += 1 }
    (c, math.sqrt(ss))
  }

  /** static entry for codegen: unit-L2 ARRAY<FLOAT> (all-zero when the
    * text has no tokens). */
  def unitVec(text: UTF8String, dim: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val (c, norm) = counts(text, dim)
    val out = new Array[Float](dim)
    if (norm > 0) {
      var i = 0
      while (i < dim) { out(i) = (c(i) / norm).toFloat; i += 1 }
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  /** static entry for codegen: milli-rounded ARRAY<BIGINT> — the
    * bit-exact cross-engine form the oracle pins. */
  def milliVec(text: UTF8String, dim: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val (c, norm) = counts(text, dim)
    val out = new Array[Long](dim)
    if (norm > 0) {
      var i = 0
      while (i < dim) {
        out(i) = Math.round(c(i) / norm * 1000.0)
        i += 1
      }
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }
}

/** STRING → ARRAY<BIGINT> hashed word-n-gram buckets, one per
  * CONSECUTIVE n-token window (duplicates kept, text order): tokens
  * under the shared [[HashedBow.tokensOf]] model with empties
  * dropped, each n-gram joined with a single space and bucketed
  * `wordHash60(gram) mod buckets` — the hashed n-gram feature space
  * of DSIR (Xie et al. 2023 use hashed n-grams, not raw unigrams;
  * the hash is [[graft.operators.Dedup.portableWordHash]]'s md5
  * fold, so the DuckDB oracle derives identical buckets). Texts with
  * fewer than n tokens produce an EMPTY array — exploding callers
  * drop them, matching the unigram path's "no words, no row" stance.
  *
  * One JVM pass per row (tokenize once, one md5 per gram via the
  * reused digest instance) inside whole-stage codegen. The HOF
  * phrasing was rejected up front: `transform(sequence(...))` over a
  * slice/concat lambda runs interpreted with no CSE, and
  * `sequence(lo, hi)` DESCENDS when hi < lo — the short-text guard
  * alone has produced two prior rounds of bugs. */
case class NgramBuckets(child: Expression, n: Int, buckets: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1 && n <= 8, "[GRAFT] vfs_ngram_buckets: n must be in [1, 8]")
  require(buckets >= 2 && buckets <= (1 << 24),
    "[GRAFT] vfs_ngram_buckets: buckets must be in [2, 2^24]")
  override def inputTypes: Seq[org.apache.spark.sql.graft.shims.AbstractDataType] =
    Seq(StringType)
  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vfs_ngram_buckets"

  override def nullSafeEval(v: Any): Any =
    NgramBuckets.grams(v.asInstanceOf[UTF8String], n, buckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NgramBuckets.grams($c, $n, $buckets)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object NgramBuckets {
  /** static entry for codegen */
  def grams(text: UTF8String, n: Int,
      buckets: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val toks = HashedBow.tokensOf(text).filter(_.nonEmpty)
    val m = toks.length - n + 1
    val out = new Array[Long](math.max(0, m))
    var i = 0
    while (i < m) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
      out(i) = HashedBow.wordHash60(sb.toString) % buckets
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }
}

/** STRING → hashed bag-of-words embedding; `milli = false` gives the
  * unit-L2 ARRAY<FLOAT> that feeds the vector operators (semantic
  * dedup / kNN / IVF over raw text), `milli = true` the rounded
  * ARRAY<BIGINT> oracle form. */
case class HashEmbedding(child: Expression, dim: Int, milli: Boolean)
    extends UnaryExpression with ExpectsInputTypes {
  require(dim > 0 && dim <= 4096,
    "[GRAFT] vfs_hash_embedding: dim must be in [1, 4096]")
  override def inputTypes: Seq[org.apache.spark.sql.graft.shims.AbstractDataType] =
    Seq(StringType)
  override def dataType: DataType =
    if (milli) ArrayType(LongType, containsNull = false)
    else ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vfs_hash_embedding"

  override def nullSafeEval(v: Any): Any =
    if (milli) HashedBow.milliVec(v.asInstanceOf[UTF8String], dim)
    else HashedBow.unitVec(v.asInstanceOf[UTF8String], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HashedBow.${if (milli) "milliVec" else "unitVec"}($c, $dim)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** (STRING text, STRING term literal) → BIGINT occurrence count of
  * `term` among the text's whitespace tokens — the BM25 tf kernel.
  * One tokenizer pass per row inside whole-stage codegen; replaces
  * the `size(filter(split(...), x -> x = t))` higher-order-function
  * phrasing, which is interpreted (no codegen, and re-splits the text
  * once per query term). Token model shared with [[HashedBow]]
  * (lower via Locale.ROOT, trim U+0020 only, split `\s+` limit -1),
  * so lexical and vector retrieval tokenize identically. */
case class TermCount(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graft.shims.AbstractDataType] =
    Seq(StringType, StringType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vfs_term_count"

  override def nullSafeEval(text: Any, term: Any): Any =
    TermCount.count(text.asInstanceOf[UTF8String],
      term.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, w) =>
      s"graft.functions.TermCount.count($t, $w)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object TermCount {
  /** static entry for codegen */
  def count(text: UTF8String, term: UTF8String): Long = {
    val w = term.toString
    var n = 0L
    HashedBow.tokensOf(text).foreach { t => if (t == w) n += 1 }
    n
  }
}

/** STRING text → ARRAY<BIGINT> occurrence counts of ALL `terms`
  * (fixed at plan time) among the text's whitespace tokens, in terms
  * order — the multi-term BM25 tf kernel. ONE tokenizer pass per row
  * regardless of |terms| (each token is resolved against a hash map
  * built once per executor), vs one full [[TermCount]] retokenize per
  * term — O(|text| + |tokens|) instead of O(|terms|·|text|) per row.
  * Token model shared with [[HashedBow.tokensOf]], and each count is
  * bit-identical to the corresponding `TermCount(text, term)`, so
  * swapping kernels cannot move an oracle hash. */
case class TermCounts(child: Expression, terms: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {
  require(terms.nonEmpty, "[GRAFT] vfs_term_counts: no terms")
  require(terms.distinct == terms,
    "[GRAFT] vfs_term_counts: duplicate terms")
  // built on the driver, shipped to executors inside the expression;
  // the per-executor lazy index makes per-row cost hash-map lookups
  private val lookup = new TermCounts.Lookup(terms.toArray)
  override def inputTypes: Seq[org.apache.spark.sql.graft.shims.AbstractDataType] =
    Seq(StringType)
  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vfs_term_counts"

  override def nullSafeEval(text: Any): Any =
    TermCounts.counts(text.asInstanceOf[UTF8String], lookup)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("termLookup", lookup,
      classOf[TermCounts.Lookup].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TermCounts.counts($c, $ref)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object TermCounts {
  /** Serializable term table with a transient lazily-built index —
    * deserialization on each executor rebuilds the map once, not per
    * row. */
  final class Lookup(val terms: Array[String]) extends Serializable {
    @transient private var idx: java.util.HashMap[String, Integer] = _
    private[TermCounts] def index: java.util.HashMap[String, Integer] = {
      var m = idx
      if (m == null) {
        m = new java.util.HashMap[String, Integer](terms.length * 2)
        var i = 0
        while (i < terms.length) {
          m.put(terms(i), Integer.valueOf(i)); i += 1
        }
        idx = m
      }
      m
    }
  }

  /** static entry for codegen: one tokenize, one map probe per token */
  def counts(text: UTF8String,
      lk: Lookup): org.apache.spark.sql.catalyst.util.ArrayData = {
    val out = new Array[Long](lk.terms.length)
    val ix = lk.index
    HashedBow.tokensOf(text).foreach { t =>
      val i = ix.get(t)
      if (i != null) out(i.intValue()) += 1L
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }
}

/** STRING → ARRAY<BIGINT> minhash signature computed in one tight JVM
  * pass: tokenize on whitespace, FNV-1a each distinct word ONCE, then
  * derive the `numHashes` hash family affinely (g_i = a_i·h + b_i over
  * the 2^64 ring — the standard one-hash minhash construction, cf.
  * the affine family in [[graft.operators.Dedup.minHashPortableSig]]).
  * Replaces the interpreted higher-order-function pipeline (aggregate/
  * zip_with/transform), which allocated per-word arrays and re-hashed
  * every word `numHashes` times — measured ~4× slower on the sf0.1
  * documents corpus. `defineCodeGen` keeps the projection inside
  * whole-stage codegen (one static call per row).
  *
  * Empty/whitespace-only text hashes the single empty token, matching
  * the HOF variant's `split` behavior.
  */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(numHashes > 0, "numHashes must be positive")
  override def inputTypes: Seq[org.apache.spark.sql.graft.shims.AbstractDataType] =
    Seq(StringType)
  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vfs_minhash_sig"

  override def nullSafeEval(v: Any): Any =
    MinHashSig.sig(v.asInstanceOf[UTF8String], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinHashSig.sig($c, $numHashes)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object MinHashSig {
  private val MaxHashes = 256
  // fixed seed: same signatures on every cluster/run (U2 determinism)
  private val (as, bs) = {
    val r = new java.util.Random(42L)
    (Array.fill(MaxHashes)(r.nextLong() | 1L), // odd multipliers
      Array.fill(MaxHashes)(r.nextLong()))
  }

  /** The affine coefficients (a_i, b_i), exposed so an oracle can
    * reproduce the signatures bit-exactly in another engine. */
  def coefficients(n: Int): Seq[(Long, Long)] = {
    require(n <= MaxHashes)
    (0 until n).map(i => (as(i), bs(i)))
  }

  /** static entry for codegen */
  def sig(text: UTF8String, numHashes: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    require(numHashes <= MaxHashes, s"numHashes > $MaxHashes")
    // EXACTLY Dedup.wordSet's token model — lower via Locale.ROOT,
    // trim SPACES ONLY (Spark's trim strips U+0020, not \t/\n; Java
    // String.trim would strip more and change the token set), then
    // regex \s+ split with limit -1 (keeps the leading/trailing empty
    // tokens Spark's split produces) — one shared copy in
    // [[HashedBow.wordSetOf]].
    val words = HashedBow.wordSetOf(text)
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val it = words.iterator()
    while (it.hasNext) {
      val h = TextHash.fnv1a(
        it.next().getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var j = 0
      while (j < numHashes) {
        val g = as(j) * h + bs(j)
        if (g < mins(j)) mins(j) = g
        j += 1
      }
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(mins)
  }
}

/** Native 64/60-bit SimHash — the codegen replacement for the
  * HOF-composed [[graft.operators.Dedup.simHashSig]] hot path
  * (interpreted lambdas allocate two per-word bit arrays and, before
  * the hash hoist, re-ran the word hash once per BIT; this kernel is
  * one compiled two-level loop — measured whole-pipeline 96 s → 50 s
  * from the hoist alone and far past that from the kernel). Token
  * model is EXACTLY `array_distinct(split(trim(lower(text)), "\s+"))`
  * (the [[MinHashSig]] note applies verbatim: U+0020-only trim,
  * limit -1 split). `portable = true` hashes words with the md5-top-60
  * [[HashedBow.wordHash60]] (bit-for-bit the DuckDB-reproducible
  * `Dedup.portableWordHash`); `portable = false` uses Spark's own
  * xxhash64 (seed 42) via [[XxHash64Function]], bit-for-bit the
  * `xxhash64()` SQL function. Bit j of the signature is the sign of
  * Σ_words (bit j of hash set ? +1 : −1), over the low `nBits` bits. */
case class SimHash(child: Expression, nBits: Int, portable: Boolean)
    extends UnaryExpression with ExpectsInputTypes {
  require(nBits > 0 && nBits <= 64, "nBits must be in [1, 64]")
  override def inputTypes: Seq[org.apache.spark.sql.graft.shims.AbstractDataType] =
    Seq(StringType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vfs_simhash"

  override def nullSafeEval(v: Any): Any =
    SimHash.sig(v.asInstanceOf[UTF8String], nBits, portable)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SimHash.sig($c, $nBits, $portable)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object SimHash {
  /** static entry for codegen */
  def sig(text: UTF8String, nBits: Int, portable: Boolean): Long = {
    val words = HashedBow.wordSetOf(text)
    val counts = new Array[Int](nBits)
    val it = words.iterator()
    while (it.hasNext) {
      val w = it.next()
      val h =
        if (portable) HashedBow.wordHash60(w)
        else org.apache.spark.sql.catalyst.expressions.XxHash64Function
          .hash(UTF8String.fromString(w), StringType, 42L)
      var j = 0
      while (j < nBits) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
    }
    var sig = 0L
    var j = 0
    while (j < nBits) {
      if (counts(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }
}
