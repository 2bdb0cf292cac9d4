package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.vfs_fingerprint

/** Cardinality / quantile sketches — the 100 TB substitutes for exact
  * `COUNT(DISTINCT)` and exact percentiles, whose full shuffles on a
  * high-cardinality key are often the single most expensive stage of
  * an analytics job.
  *
  * Two kinds here:
  *
  *  - Spark built-ins ([[approxDistinct]] HyperLogLog++,
  *    [[approxQuantiles]] Greenwald-Khanna): mergeable partial sketches,
  *    map-side combined, shuffling O(sketch) not O(distinct). Their
  *    estimates are engine-specific, so specs bound the error vs exact.
  *  - [[kmvDistinct]], a K-Minimum-Values estimator over the portable
  *    FNV-1a row hash: keep the k smallest distinct hash values,
  *    estimate distinct ≈ (k-1)/U(k) with U(k) the k-th smallest hash
  *    mapped to [0,1). Fully DETERMINISTIC given the hash — the DuckDB
  *    oracle reproduces it bit-for-bit, which no HLL can — while still
  *    scaling like a sketch: the plan is a distinct on the hash + a
  *    distributed top-k (TakeOrdered, k rows per partition shuffled).
  */
object Sketches {

  /** HyperLogLog++ distinct count (relative error `rsd`). */
  def approxDistinct(df: DataFrame, key: Column, rsd: Double = 0.05): DataFrame =
    df.agg(approx_count_distinct(key, rsd).as("approx_distinct"))

  /** Greenwald-Khanna approximate percentiles at `accuracy`. */
  def approxQuantiles(df: DataFrame, value: Column, probs: Seq[Double],
      accuracy: Int = 10000): DataFrame =
    df.agg(percentile_approx(value,
      array(probs.map(lit): _*), lit(accuracy)).as("quantiles"))

  /** Deterministic KMV distinct-count estimate of `key` (a string
    * column). Returns one row `(est BIGINT)`. Exact below k distinct
    * values, (k-1)/U(k) above; signed hashes map monotonically onto
    * [0,1) via h/2^64 + 1/2, so "k smallest signed" = "k smallest
    * uniforms". */
  def kmvDistinct(df: DataFrame, key: Column, k: Int = 64): DataFrame = {
    require(k >= 2, "k must be >= 2")
    // NULL keys hash to NULL, which sorts FIRST under asc — it would
    // consume a top-k slot (inflating n, biasing hk) and diverge from
    // the oracle's nulls-last; a null key is "no value", not a value
    val tops = df.select(vfs_fingerprint(key).as("h"))
      .filter(col("h").isNotNull)
      .distinct()
      .orderBy(col("h").asc).limit(k)
    tops.agg(count(lit(1)).as("n"), max(col("h")).as("hk"))
      .select(
        when(col("n") < k, col("n"))
          .otherwise(round(lit(k - 1.0) /
            (col("hk").cast("double") / lit(1.8446744073709552e19) + 0.5))
            .cast("long"))
          .as("est"))
  }
}
