package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.vfs_fingerprint

/** Deterministic sampling and dataset splitting for training-data
  * pipelines. `df.sample()` draws from a per-partition RNG stream, so
  * the selected rows change with partitioning, task retries, and
  * cluster size — useless for reproducible train/val/test membership
  * at 100 TB where stragglers WILL be retried. Hash-based sampling
  * decides membership per ROW from a content/key hash (FNV-1a via
  * [[graft.functions.Fingerprint]]): the same row lands in the same
  * split on any cluster, any partitioning, any engine (the DuckDB
  * oracle reproduces the hash bit-exactly), and membership is stable
  * under appends — new data never reshuffles old rows between splits.
  *
  * All three operators are narrow (filter / project) — zero shuffle,
  * fully pushed into the scan stage — except the stratified variant,
  * which shuffles once on the stratum key like any windowed top-n.
  */
object Sampling {

  /** Hash of `key` mapped uniformly onto buckets 0..nBuckets-1.
    * pmod (not %) so the signed hash still lands in [0, n). */
  def hashBucket(key: Column, nBuckets: Int): Column =
    pmod(vfs_fingerprint(key), lit(nBuckets)).cast("int")

  /** Keep rows whose key hashes into the first `pct` of 100 buckets —
    * a deterministic ~pct% sample (exact fraction depends on the key
    * distribution over buckets, not on an RNG). */
  def hashSample(df: DataFrame, key: Column, pct: Int): DataFrame = {
    require(pct >= 0 && pct <= 100, "pct must be in [0, 100]")
    df.filter(hashBucket(key, 100) < pct)
  }

  /** Assign each row a split label by hash bucket: cuts are
    * cumulative upper bounds in percent, e.g. Seq(("train", 80),
    * ("val", 90), ("test", 100)). A row's split never changes as the
    * dataset grows — the property random splits can't give you. */
  def splitAssign(df: DataFrame, key: Column,
      cuts: Seq[(String, Int)], as: String = "split"): DataFrame = {
    require(cuts.nonEmpty && cuts.last._2 == 100,
      "cuts must end at 100 (cumulative percents)")
    require(cuts.map(_._2) == cuts.map(_._2).sorted,
      "cuts must be non-decreasing")
    val b = hashBucket(key, 100)
    val expr = cuts.init.foldRight(lit(cuts.last._1): Column) {
      case ((name, hi), rest) => when(b < hi, name).otherwise(rest)
    }
    df.withColumn(as, expr)
  }

  /** Per-row uniform deviate of `key` — the shared hash-to-unit-
    * interval mapping ([[graft.functions.vfs_hash_uniform]]; see its
    * note on the 1.0 boundary under double rounding). */
  def hashUniform(key: Column): Column =
    graft.functions.vfs_hash_uniform(vfs_fingerprint(key))

  /** Deterministic WEIGHTED Bernoulli sample: keep a row iff its
    * uniform hash deviate < `weight` (a [0,1] column) — e.g. sample
    * documents proportionally to a quality score, the standard
    * quality-weighted corpus subsampling. Same properties as
    * [[hashSample]]: zero shuffle, reproducible on any cluster, and
    * membership is stable under appends and under weight changes of
    * OTHER rows. */
  def weightedHashSample(df: DataFrame, key: Column,
      weight: Column): DataFrame =
    df.filter(hashUniform(key) < weight)

  /** Deterministic stratified sample: the `n` rows of each stratum
    * with the smallest (hash, tiebreak) — every engine picks the same
    * rows. One shuffle on the stratum key; the window keeps only
    * row_number ≤ n so the post-shuffle state is a streaming top-n per
    * group, not a full sort of the stratum. */
  def stratifiedTopN(df: DataFrame, stratum: Column, key: Column,
      tiebreak: Column, n: Int): DataFrame = {
    WorkCols.requireFree(df, "__rn")
    val w = Window.partitionBy(stratum)
      .orderBy(vfs_fingerprint(key).asc, tiebreak.asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }

  /** Deterministic source-mixture sampling — domain reweighting for a
    * training mix: keep the LARGEST subsample whose per-source
    * composition matches the target `weights` (normalized). The
    * binding source is the one with the least data relative to its
    * weight: N* = min_s ⌊n_s / w_s⌋, quota_s = ⌊w_s · N*⌋; each
    * source keeps its quota rows with the smallest (hash, tiebreak),
    * so the pick is engine-portable and append-stable in the same
    * sense as [[stratifiedTopN]].
    *
    * Cost: one count aggregation (|sources| rows to the driver — a
    * mixture spec is always human-sized) + one stratified window
    * pass. Sources absent from `weights` are dropped — the mixture
    * defines the corpus. */
  def mixtureSample(df: DataFrame, source: Column, key: Column,
      tiebreak: Column, weights: Map[String, Double]): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "[GRAFT] mixture weights must be positive")
    WorkCols.requireFree(df, "__rn")
    val norm = weights.values.sum
    val w = weights.map { case (s, x) => s -> x / norm }
    val counts = df.filter(source.isInCollection(w.keys.toSeq))
      .groupBy(source.as("__src")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val nStar = w.map { case (s, ws) =>
      math.floor(counts.getOrElse(s, 0L) / ws).toLong
    }.min
    val quotas = w.map { case (s, ws) =>
      s -> math.floor(ws * nStar).toLong }
    val quotaCol = quotas.foldLeft(lit(0L)) { case (acc, (s, q)) =>
      when(source === s, lit(q)).otherwise(acc)
    }
    val win = Window.partitionBy(source)
      .orderBy(vfs_fingerprint(key).asc, tiebreak.asc)
    df.filter(source.isInCollection(w.keys.toSeq))
      .withColumn("__rn", row_number().over(win))
      .filter(col("__rn") <= quotaCol)
      .drop("__rn")
  }

  /** Temperature-based source rebalancing (the multilingual α-smoothing
    * of mBERT/XLM: target share ∝ n_s^α, α ∈ (0,1] — α=1 keeps the
    * natural skew, α→0 approaches uniform): derive the weights from
    * the observed per-source counts, then take the largest matching
    * subsample via [[mixtureSample]]. α = 0.5 (the common default)
    * goes through `sqrt`, which is CORRECTLY-ROUNDED IEEE in every
    * engine — and the weight normalization folds in sorted-source
    * order — so the derived quotas, and therefore the hash-picked
    * rows, are engine-portable (other α use `pow`, which is only
    * 1-ulp-accurate and not oracle-pinnable). Count collection is
    * |sources| rows — a mixture spec is always human-sized. */
  def temperatureSample(df: DataFrame, source: Column, key: Column,
      tiebreak: Column, alpha: Double = 0.5): DataFrame = {
    require(alpha > 0 && alpha <= 1,
      "[GRAFT] temperatureSample: alpha must be in (0, 1]")
    val counts = df.groupBy(source.as("__src")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
    require(counts.nonEmpty, "[GRAFT] temperatureSample: empty input")
    def powA(x: Double): Double =
      if (alpha == 0.5) math.sqrt(x) else math.pow(x, alpha)
    // ListMap: normalization inside mixtureSample folds the weights in
    // THIS (sorted) order — the property the oracle mirror relies on
    mixtureSample(df, source, key, tiebreak,
      scala.collection.immutable.ListMap(
        counts.map { case (s, n) => s -> powA(n.toDouble) }: _*))
  }

  /** Deterministic negative-pair mining for contrastive training: for
    * each anchor, up to `k` pseudo-random partner ids drawn as
    * `portableWordHash(anchor ":" j) mod n` over a DENSE id domain
    * [0, n) — no RNG, reproducible on any engine/cluster, and a pure
    * projection (the caller joins partner payloads back by id, which
    * Catalyst plans as a hash join on the slim pair list). Draws that
    * hit the anchor itself are dropped (hence "up to" k; callers
    * needing exactly k over-draw and window-trim), and distinct j's
    * can collide on the same partner — harmless for contrastive use.
    * Near-duplicate anchors make FALSE negatives: anti-join the pair
    * list against a dedup pair list (exactGroups / minHashLsh /
    * semanticDedup output) before training. Non-dense id spaces:
    * remap through `row_number() - 1` first. Output:
    * (anchor, j, negative). */
  def negativePairs(df: DataFrame, k: Int, n: Long,
      idCol: String = "doc_id"): DataFrame = {
    require(k >= 1 && n >= 2,
      "[GRAFT] negativePairs: need k >= 1 and an id domain of >= 2")
    df.select(col(idCol).as("anchor"))
      .select(col("anchor"),
        explode(sequence(lit(0L), lit(k - 1L))).as("j"))
      .select(col("anchor"), col("j"),
        pmod(Dedup.portableWordHash(
            concat_ws(":", col("anchor").cast("string"),
              col("j").cast("string"))),
          lit(n)).as("negative"))
      .filter(col("negative") =!= col("anchor"))
  }

  /** Deterministic curriculum interleave for a training order: within
    * each source, rows rank by `score` DESC (best first, `tiebreak`
    * ASC breaks exactly); the output sorts by (rank, source,
    * tiebreak), so ANY prefix of the training stream is
    * simultaneously quality-leaning and source-balanced — the usual
    * curriculum + domain-mixing requirement. Deliberately NO global
    * row_number: a global window is a single-partition cliff, while
    * the (rank, source) sort is a range-partitioned global sort —
    * exactly the shuffle the output ordering requires and nothing
    * more. Output: input columns + `rank` (1-based within source). */
  def curriculumInterleave(df: DataFrame, source: Column, score: Column,
      tiebreak: Column): DataFrame = {
    WorkCols.requireFree(df, "rank")
    val w = Window.partitionBy(source).orderBy(score.desc, tiebreak.asc)
    df.withColumn("rank", row_number().over(w).cast("long"))
      .orderBy(col("rank").asc, source.asc, tiebreak.asc)
  }
}
