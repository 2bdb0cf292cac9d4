package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training and encoding — the
  * "train a tokenizer on the corpus" stage of an LLM data pipeline,
  * with the standard two-level architecture used by production BPE
  * trainers (GPT-2's trainer, HF `tokenizers`):
  *
  *   1. the CORPUS-SCALE part is one distributed word-count
  *      aggregate (hash agg with map-side partials keyed by word —
  *      the only pass over the data), optionally capped to the top
  *      `maxWords` forms by (count desc, word asc);
  *   2. the MERGE LOOP runs on the driver over that word-count
  *      dict — the dict is vocabulary-sized (≪ corpus; bounded by
  *      `maxWords`), which is exactly how reference trainers
  *      operate: merge selection needs global pair counts, so it is
  *      inherently sequential, and the input it needs is the
  *      aggregate, not the corpus.
  *
  * Determinism: pair selection breaks count ties by (left, right)
  * lexicographic order, so the same corpus always yields the same
  * merge table — no RNG anywhere.
  *
  * Word model: lowercased whitespace tokens (the corpus tokenizer
  * used across `TextAnalysis`), each word split into single-char
  * symbols with an explicit `</w>` end-of-word symbol appended, so
  * merges can capture whole words and decoding restores word
  * boundaries exactly.
  */
object Bpe {

  /** End-of-word marker symbol (its own symbol, never merged away
    * into a cross-word bridge). */
  val Eow = "</w>"

  /** A trained BPE model: `merges(r)` is the r-th learned pair.
    * Persist via [[toDF]] / rebuild via [[fromDF]]. */
  final case class BpeModel(merges: IndexedSeq[(String, String)]) {
    /** rank lookup used by the encoder: lower rank merges first */
    lazy val ranks: Map[(String, String), Int] = merges.zipWithIndex.toMap
    def toDF(spark: SparkSession): DataFrame = {
      import spark.implicits._
      merges.zipWithIndex
        .map { case ((a, b), r) => (r.toLong, a, b) }
        .toDF("rank", "left", "right")
    }
  }

  object BpeModel {
    /** Rebuild a model from its [[BpeModel.toDF]] frame (any row
      * order — ranks define the sequence). */
    def fromDF(df: DataFrame): BpeModel = {
      val rows = df.select(col("rank").cast("long"), col("left"),
          col("right"))
        .collect()
        .map(r => (r.getLong(0), (r.getString(1), r.getString(2))))
        .sortBy(_._1)
      BpeModel(rows.map(_._2).toIndexedSeq)
    }
  }

  private def toSymbols(word: String): Vector[String] =
    word.map(_.toString).toVector :+ Eow

  /** Train `nMerges` BPE merges on the corpus. One distributed
    * word-count aggregate (top-`maxWords` forms kept, ties broken by
    * word), then the driver merge loop described above. Training may
    * stop early when no pair occurs twice — merges that fire once
    * generalize to nothing. */
  def trainBpe(docs: DataFrame, nMerges: Int, maxWords: Int = 65536,
      textCol: String = "text"): BpeModel = {
    require(nMerges > 0, "[GRAFT] trainBpe: nMerges must be positive")
    require(maxWords > 0, "[GRAFT] trainBpe: maxWords must be positive")
    WorkCols.requireFree(docs, "__w", "__cnt")
    val counts = docs
      .select(explode(split(trim(lower(col(textCol))), "\\s+")).as("__w"))
      .filter(length(col("__w")) > 0)
      .groupBy(col("__w")).agg(count(lit(1)).as("__cnt"))
      .orderBy(col("__cnt").desc, col("__w").asc)
      .limit(maxWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    // driver dict: symbol sequence per surviving word form. Pair
    // counts are maintained INCREMENTALLY (the classic fast-trainer
    // structure): a merge touches only the words that contain the
    // merged pair (tracked by an inverted pair → word-ids index), so
    // each iteration costs O(affected words · word length) + one
    // selection scan over the live pairs — not a full dict recount.
    // Counts after every step equal the naive recount, so the merge
    // sequence (and its tiebreaks) is unchanged.
    val syms: Array[Vector[String]] = counts.map(c => toSymbols(c._1))
    val wcnt: Array[Long] = counts.map(_._2)
    val pairCounts = collection.mutable.HashMap
      .empty[(String, String), Long]
    val pairWords = collection.mutable.HashMap
      .empty[(String, String), collection.mutable.Set[Int]]
    def pairsOf(v: Vector[String]): Seq[(String, String)] =
      if (v.length < 2) Nil
      else (0 until v.length - 1).map(i => (v(i), v(i + 1)))
    var w = 0
    while (w < syms.length) {
      pairsOf(syms(w)).foreach { p =>
        pairCounts.update(p, pairCounts.getOrElse(p, 0L) + wcnt(w))
        pairWords.getOrElseUpdate(p,
          collection.mutable.Set.empty[Int]) += w
      }
      w += 1
    }
    val merges = Vector.newBuilder[(String, String)]
    var learned = 0
    var exhausted = false
    while (learned < nMerges && !exhausted) {
      // a pair seen once compresses nothing it can generalize to
      var best: (String, String) = null
      var bestC = 1L
      pairCounts.foreach { case (p, c) =>
        if (c > bestC || (c == bestC && best != null &&
            (p._1 < best._1 || (p._1 == best._1 && p._2 < best._2)))) {
          best = p; bestC = c
        }
      }
      if (best == null) exhausted = true
      else {
        merges += best
        learned += 1
        val joined = best._1 + best._2
        pairWords.getOrElse(best, collection.mutable.Set.empty[Int])
          .toArray.sorted.foreach { idx =>
          val before = syms(idx)
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < before.length) {
            if (i < before.length - 1 && before(i) == best._1 &&
                before(i + 1) == best._2) {
              out += joined; i += 2
            } else { out += before(i); i += 1 }
          }
          val after = out.result()
          syms(idx) = after
          val c = wcnt(idx)
          // count diff: retract the old adjacency multiset, add the
          // new one; membership in the inverted index follows
          pairsOf(before).foreach { p =>
            val left = pairCounts(p) - c
            if (left == 0L) { pairCounts.remove(p); pairWords.remove(p) }
            else pairCounts(p) = left
          }
          pairsOf(after).foreach { p =>
            pairCounts.update(p, pairCounts.getOrElse(p, 0L) + c)
            pairWords.getOrElseUpdate(p,
              collection.mutable.Set.empty[Int]) += idx
          }
          // the old pairs may survive in OTHER words; drop this
          // word's membership only where it no longer holds the pair
          val afterSet = pairsOf(after).toSet
          pairsOf(before).toSet.diff(afterSet).foreach { p =>
            pairWords.get(p).foreach { s =>
              s -= idx; if (s.isEmpty && !pairCounts.contains(p))
                pairWords.remove(p)
            }
          }
        }
      }
    }
    BpeModel(merges.result())
  }

  /** Encode one word with the trained merges — the standard
    * rank-priority greedy: repeatedly merge the LOWEST-rank adjacent
    * pair present (leftmost occurrence on rank ties by construction
    * of the scan) until no learned pair remains. */
  private[graft] def encodeWord(word: String,
      ranks: Map[(String, String), Int]): Vector[String] = {
    var syms = toSymbols(word)
    var done = false
    while (!done && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bestAt = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestAt = i }
        i += 1
      }
      if (bestAt < 0) done = true
      else syms = (syms.take(bestAt) :+ (syms(bestAt) + syms(bestAt + 1))) ++
        syms.drop(bestAt + 2)
    }
    syms
  }

  /** Tokenize every document with a trained model. Embarrassingly
    * parallel: the merge table is broadcast (model size ∝ nMerges),
    * each partition memoizes word → tokens (Zipf repetition makes the
    * cache hit rate high), no shuffle. The memo is a true LRU
    * (access-ordered LinkedHashMap, one eviction per insert past
    * `memoCap`) — a clear-the-world flush would give Zipf-heavy
    * partitions periodic cold restarts on exactly the words that
    * repeat most. The memo is pure caching: eviction can never change
    * output (PropertySpec pins cap=2 ≡ unbounded). Output:
    * (idCol, tokens ARRAY&lt;STRING&gt;, n_tokens). */
  def bpeEncode(docs: DataFrame, model: BpeModel,
      idCol: String = "doc_id", textCol: String = "text",
      memoCap: Int = 100000): DataFrame = {
    require(memoCap > 0, "[GRAFT] bpeEncode: memoCap must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model.ranks)
    docs.select(col(idCol).cast("long"),
        split(trim(lower(col(textCol))), "\\s+").as("__words"))
      .as[(Long, Seq[String])]
      .mapPartitions { it =>
        val ranks = bc.value
        val memo = new java.util.LinkedHashMap[String, Vector[String]](
            1024, 0.75f, /* accessOrder = */ true) {
          override def removeEldestEntry(
              e: java.util.Map.Entry[String, Vector[String]]): Boolean =
            size() > memoCap
        }
        it.map { case (id, ws) =>
          val toks = ws.iterator.filter(_.nonEmpty).flatMap { w =>
            val hit = memo.get(w)
            if (hit != null) hit
            else {
              val t = encodeWord(w, ranks)
              memo.put(w, t)
              t
            }
          }.toArray
          (id, toks, toks.length.toLong)
        }
      }
      .toDF(idCol, "tokens", "n_tokens")
  }

  /** Invert [[bpeEncode]]: concatenate symbols, turn each `</w>`
    * back into a word boundary. For any input, decode(encode(text))
    * equals the tokenizer's normal form of `text` (lowercased,
    * whitespace collapsed to single spaces). */
  def bpeDecode(tokens: Seq[String]): String =
    tokens.mkString("").replace(Eow, " ").trim

  /** Column form of [[bpeDecode]] for frame-level roundtrips. */
  def bpeDecodeCol(tokens: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    trim(regexp_replace(concat_ws("", tokens), java.util.regex.Pattern
      .quote(Eow), " "))
}
