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
}
