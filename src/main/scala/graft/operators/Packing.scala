package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the "concat and chop" batch-preparation step of
  * every LLM pretraining pipeline: documents are concatenated in a
  * deterministic order and the token stream is cut into fixed-length
  * training sequences (documents may straddle a cut; the attention
  * mask handles the boundary downstream). This operator computes WHERE
  * each document lands: its token offset in the stream and the
  * sequence ids it spans.
  *
  * 100 TB shape: a single GLOBAL concatenation order would funnel the
  * running-total window through one partition — the classic global-
  * window scalability cliff. Real pipelines shard first (each shard is
  * an independent stream feeding its own data-loader workers), so the
  * shard column is a REQUIRED argument: one shuffle by shard, then a
  * per-shard sort + running sum inside each partition. Shard count
  * scales with the cluster; per-shard state is one long.
  *
  * Deterministic: shard and order come from the caller's columns (use
  * a hash shard for balance, id order for stability — both
  * append-stable), never from an RNG.
  */
object Packing {

  /** Assign every document its position in the packed token stream of
    * its shard. Output columns: idCol, `shard`, `n_tokens`,
    * `tok_offset` (tokens before this doc in its shard's stream),
    * `seq_id` (`tok_offset div seqLen` — first training sequence this
    * doc appears in), `seq_off` (offset within that sequence),
    * `seq_id_last` (last sequence this doc reaches — equal to `seq_id`
    * unless the doc straddles a cut).
    *
    * `orderBy` must be unique per shard for a well-defined stream
    * order; ties are broken by `idCol` so the result is total anyway.
    * Empty documents (0 tokens) keep their slot (offset advances 0).
    */
  def packSequences(docs: DataFrame, shard: Column, orderBy: Column,
      nTokens: Column, seqLen: Int,
      idCol: String = "doc_id"): DataFrame = {
    require(seqLen > 0, "[GRAFT] seqLen must be positive")
    WorkCols.requireFree(docs, "__shard", "__ord", "__n")
    val before = Window.partitionBy(col("__shard"))
      .orderBy(col("__ord"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs.select(col(idCol), shard.cast("long").as("__shard"),
        orderBy.as("__ord"), nTokens.cast("long").as("__n"))
      .withColumn("tok_offset",
        coalesce(sum(col("__n")).over(before), lit(0L)))
      .select(col(idCol),
        col("__shard").as("shard"),
        col("__n").as("n_tokens"),
        col("tok_offset"),
        expr(s"tok_offset div $seqLen").as("seq_id"),
        pmod(col("tok_offset"), lit(seqLen.toLong)).as("seq_off"),
        expr(s"(tok_offset + greatest(__n - 1, 0)) div $seqLen")
          .as("seq_id_last"))
  }

  /** NO-STRADDLE packing — the SFT/fine-tuning variant of
    * [[packSequences]]: documents are placed whole into fixed-capacity
    * bins (training sequences), never cut at a boundary. Placement is
    * NEXT-FIT in the same deterministic per-shard stream order: if the
    * document fits in the shard's current bin it goes there, otherwise
    * a new bin opens. Next-fit (not first-fit-decreasing) is the
    * deliberate choice at scale: it needs O(1) state per shard and
    * preserves the caller's curriculum/order, where FFD's global sort
    * by length both reorders the stream and needs an open-bin search
    * structure; its worst-case waste (2× bins) is the textbook bound,
    * and real corpora sit far inside it.
    *
    * A document LONGER than `binCapacity` is handled per
    * `onOversize`: `"flag"` (default) gives it a bin of its own with
    * `overflow = 1` (the caller truncates or drops — a 100 TB job
    * must not crash on one long document), and the next document
    * always opens a fresh bin after it; `"fail"` throws LOUDLY with
    * the offending document's id and size — for pipelines where a
    * sequence that silently exceeds the model's context would be
    * truncated into corrupt training data (the repo's fail-loud
    * stance, opt-in because the right default at scale is to keep
    * the job alive and let the flag drive policy).
    *
    * Output: (idCol, `shard`, `n_tokens`, `bin_id` 0-based per shard,
    * `bin_off` token offset inside the bin, `overflow`). `idCol` must
    * be integral (it rides through the typed per-partition pass as a
    * long; a non-castable id fails the plan loudly).
    *
    * 100 TB shape: one hash shuffle by shard + one within-partition
    * sort, then a single sequential pass with one counter — the same
    * shard-parallel stance as [[packSequences]] (shard count scales
    * with the cluster; a global packing order would serialize). The
    * pass is mapPartitions (not a window): next-fit's bin boundary is
    * a running RECURRENCE (reset on overflow), which no window frame
    * expresses. */
  def packBinsNextFit(docs: DataFrame, shard: Column, orderBy: Column,
      nTokens: Column, binCapacity: Int,
      idCol: String = "doc_id", onOversize: String = "flag"): DataFrame = {
    require(binCapacity > 0, "[GRAFT] binCapacity must be positive")
    require(onOversize == "flag" || onOversize == "fail",
      s"[GRAFT] onOversize must be 'flag' or 'fail', got '$onOversize'")
    val failOnOversize = onOversize == "fail"
    WorkCols.requireFree(docs, "__shard", "__ord", "__n")
    val cap = binCapacity.toLong
    val spark = docs.sparkSession
    import spark.implicits._
    val packed = docs
      .select(shard.cast("long").as("__shard"), orderBy.as("__ord"),
        col(idCol).cast("long").as("__id"),
        nTokens.cast("long").as("__n"))
      .repartition(col("__shard"))
      .sortWithinPartitions(col("__shard"), col("__ord"), col("__id"))
      .select(col("__shard"), col("__id"), col("__n"))
      .as[(Long, Long, Long)]
      .mapPartitions { rows =>
        // several shards share a partition (hash-partitioned, sorted
        // by shard first) — counters reset at each shard change
        var curShard = 0L
        var started = false
        var used = 0L
        var bin = -1L
        rows.map { case (sh, id, n) =>
          if (failOnOversize && n > cap)
            throw new IllegalArgumentException(
              s"[GRAFT] packBinsNextFit(onOversize=fail): document " +
                s"$idCol=$id has $n tokens > binCapacity $cap — it " +
                "cannot be placed whole; truncate/split it upstream " +
                "or use onOversize=flag to keep the job alive")
          if (!started || sh != curShard) {
            curShard = sh; started = true; used = 0L; bin = -1L
          }
          val fits = bin >= 0L && used + n <= cap
          if (!fits) { bin += 1L; used = 0L }
          val off = used
          used += n
          (id, sh, n, bin, off, if (n > cap) 1L else 0L)
        }
      }
      .toDF(idCol, "shard", "n_tokens", "bin_id", "bin_off", "overflow")
    packed
  }
}
