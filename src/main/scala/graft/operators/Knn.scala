package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{vfs_cosine, vfs_euclidean}
import graft.store.VfsStore

/** Distance metric dispatch — the reference's `DistanceMethod` enum
  * incl. the `simd_*` aliases (vfs/src/vfs/rank.rs:61-72; parsed at
  * tcp.rs:388-394). SIMD variants are numerically identical to their
  * scalar twins (SURVEY §1.7), so both parse to the same expression —
  * Spark's whole-stage codegen is the vectorization.
  */
sealed trait Metric {
  def dist(a: Column, b: Column): Column
}
object Metric {
  case object Euclidean extends Metric {
    def dist(a: Column, b: Column): Column = vfs_euclidean(a, b)
  }
  case object Cosine extends Metric {
    def dist(a: Column, b: Column): Column = vfs_cosine(a, b)
  }
  /** default euclidean, matching tcp.rs:388-394 */
  def parse(s: String): Metric = s.toLowerCase match {
    case "euclidean" | "simd_euclidean" | "" => Euclidean
    case "cosine" | "simd_cosine" => Cosine
    case other =>
      throw new IllegalArgumentException(s"[GRAFT] unknown distance method: $other")
  }
}

/** Exact and batched k-NN — the reference's core query surface
  * (`Ranker::exact_search`, vfs/src/vfs/rank.rs:119-186), re-planned as
  * declarative DataFrame programs so Catalyst chooses the physical
  * strategy:
  *
  *   - single query → scan → score (codegen'd distance) →
  *     `TakeOrderedAndProject` (per-partition top-k + driver merge —
  *     exactly the reference's cross-batch prune, parallelized)
  *   - many queries → broadcast the query set, score, then the
  *     [[TopKByDistance]] partial aggregate (shuffles ≤ k rows per
  *     query per partition)
  */
object Knn {

  /** Single-query exact k-NN over any DataFrame with an id + vector
    * column. Ties break by id asc (deterministic; reproduces the
    * reference's file-order for its sequential ids, SURVEY §7.3).
    * NaN distances (zero-norm cosine) sort LAST under Spark's double
    * ordering, so they never reach the top-k unless fewer than k finite
    * candidates exist — same contract as [[TopKByDistance]]; an
    * explicit isnan filter would make Catalyst evaluate the distance
    * twice per row (once in Filter, once in Project). */
  def exact(base: DataFrame, query: Array[Float], k: Int,
      metric: Metric = Metric.Euclidean, vecCol: String = "values",
      idCol: String = "id"): DataFrame = {
    base
      .withColumn("distance", metric.dist(col(vecCol), typedLit(query)))
      .orderBy(col("distance").asc, col(idCol).asc)
      .limit(k)
  }

  /** Store-level search with result hydration (J1: the top-k ids carry
    * their full records — free here because scoring projects over the
    * full row, tcp.rs:408-427).
    *
    * Quantized stores score on the raw int8 columns via the fused
    * dequantize+distance expressions (no float-array materialization in
    * the scan loop) and dequantize only the k winners. Falls back to
    * the dense view when unflushed memtable rows exist. */
  def search(store: VfsStore, query: Array[Float], k: Int,
      metric: Metric = Metric.Euclidean): DataFrame = {
    if (query.length != store.dim)
      throw new graft.store.InvalidVectorException(
        s"[GRAFT] vector dimension mismatch: expected ${store.dim}, got ${query.length}")
    if (store.quantized && !store.hasUnflushed) {
      val raw = store.readRaw()
      import graft.functions.{vfs_dequantize, vfs_qcosine, vfs_qeuclidean}
      val fused = metric match {
        case Metric.Euclidean =>
          vfs_qeuclidean(col("qvalues"), col("scale_factor"), typedLit(query))
        case Metric.Cosine =>
          vfs_qcosine(col("qvalues"), col("scale_factor"), typedLit(query))
      }
      VfsStore.denseView(
        raw.withColumn("distance", fused)
          .orderBy(col("distance").asc, col("id").asc)
          .limit(k),
        quantized = true)
    } else exact(store.read(), query, k, metric)
  }

  /** Multi-query exact k-NN: queries (qidCol, qvecCol) × base.
    * Physical shape: broadcast nested-loop join (queries are tiny) →
    * codegen'd scoring → TopKByDistance partial agg → explode.
    * Output: (qid, id, distance, rank). */
  def exactBatch(base: DataFrame, queries: DataFrame, k: Int,
      metric: Metric = Metric.Euclidean, vecCol: String = "values",
      idCol: String = "id", qidCol: String = "qid",
      qvecCol: String = "qvalues"): DataFrame = {
    import TopKByDistance.topk
    val scored = base.join(broadcast(queries))
      .select(col(qidCol),
        col(idCol),
        metric.dist(col(vecCol), col(qvecCol)).as("distance"))
    scored
      .groupBy(col(qidCol))
      .agg(topk(col("distance"), col(idCol), k).as("topk"))
      .select(col(qidCol), posexplode(col("topk")).as(Seq("pos", "r")))
      .select(col(qidCol), col("r.id").as(idCol),
        col("r.distance").as("distance"), (col("pos") + 1).as("rank"))
  }
}
