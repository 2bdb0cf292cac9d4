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

  /** Deterministic count-min sketch of `key` frequencies: a depth×width
    * count matrix where row r increments cell (r, h_r(key)), with
    * h_r = portable FNV of the key salted by r. Build is ONE
    * hash-groupBy over (r, c) — d·|rows| slim pairs shuffle, the
    * result is d·w cells regardless of data size, and two sketches
    * merge by adding cells (the streaming/heavy-hitter workhorse).
    * Estimate = min over rows of the key's cells — always ≥ the true
    * count (collisions only inflate), within ~2N/w with probability
    * 1−2^−d. Deterministic given the hash, so the DuckDB oracle
    * reproduces the whole sketch AND the estimates bit-for-bit.
    * Output: (r, c, cnt). */
  def countMinSketch(df: DataFrame, key: Column, depth: Int = 4,
      width: Int = 64): DataFrame = {
    require(depth > 0 && width > 0, "depth and width must be positive")
    // NULL keys are "no value", same stance as [[kmvDistinct]] —
    // concat_ws would otherwise silently fold them into the phantom
    // key "r", inflating real cells and diverging from the oracle
    df.select(key.as("__k"))
      .filter(col("__k").isNotNull)
      .select(col("__k"),
        explode(sequence(lit(0), lit(depth - 1))).as("r"))
      .select(col("r"),
        pmod(vfs_fingerprint(concat_ws("#", col("__k"), col("r"))),
          lit(width)).cast("int").as("c"))
      .groupBy(col("r"), col("c"))
      .agg(count(lit(1)).as("cnt"))
      // build parameters ride WITH the sketch so an estimate against
      // mismatched (depth, width) fails loudly instead of silently
      // underestimating (probes would hash to absent cells -> est 0)
      .withColumn("depth", lit(depth))
      .withColumn("width", lit(width))
  }

  /** Frequency estimates for `keys` (one column named like `key`)
    * against a built sketch: min over depth rows of the matching
    * cells. Output: key column ++ (est BIGINT). */
  def countMinEstimate(sketch: DataFrame, keys: DataFrame, key: Column,
      depth: Int = 4, width: Int = 64): DataFrame = {
    // a sketch built from empty/all-null input has zero cells: every
    // count is genuinely 0 — return 0-estimates instead of letting a
    // bare head() throw (and skip the dims check: there is no row to
    // carry the build parameters)
    sketch.select(col("depth"), col("width")).take(1).headOption match {
      case None =>
        return keys.select(key.as("__k"))
          .filter(col("__k").isNotNull)
          .distinct()
          .withColumn("est", lit(0L))
      case Some(dims) =>
        require(dims.getInt(0) == depth && dims.getInt(1) == width,
          s"[GRAFT] sketch was built with (depth=${dims.getInt(0)}, " +
            s"width=${dims.getInt(1)}), estimate called with ($depth, $width)")
    }
    val probes = keys.select(key.as("__k"))
      .filter(col("__k").isNotNull)
      .select(col("__k"),
        explode(sequence(lit(0), lit(depth - 1))).as("r"))
      .select(col("__k"), col("r"),
        pmod(vfs_fingerprint(concat_ws("#", col("__k"), col("r"))),
          lit(width)).cast("int").as("c"))
    probes.join(sketch.select(col("r"), col("c"), col("cnt")),
        Seq("r", "c"), "left")
      .groupBy(col("__k"))
      // a missing cell means count 0 (key never hashed there)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

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
            graft.functions.vfs_hash_uniform(col("hk")))
            .cast("long"))
          .as("est"))
  }

  /** PORTABLE HyperLogLog register table (Flajolet et al. 2007): the
    * deterministic twin of [[approxDistinct]]'s engine-opaque HLL++.
    * Hash = the 60-bit md5-derived [[Dedup.portableWordHash]]; bucket =
    * low `p` bits; rho = position of the highest set bit of the next
    * 32 bits (1-based from the MSB of that 32-bit window, 33 when the
    * window is zero) — all integer/string ops (`bin` + length) that
    * any engine computes bit-identically, so the DuckDB oracle pins
    * every register. Build is one hash-groupBy of slim (bucket, rho)
    * pairs with map-side partial `max` — O(2^p) result regardless of
    * input size — and two register tables merge by `max` per bucket
    * (the HLL merge). Output: (bucket, max_rho), observed buckets
    * only; [[hllEstimate]] treats absent buckets as rho 0. */
  def hllRegisters(df: DataFrame, key: Column, p: Int = 6): DataFrame = {
    require(p >= 4 && p <= 16, "[GRAFT] hllRegisters: p must be in [4,16]")
    val h = Dedup.portableWordHash(key)
    val bucket = pmod(h, lit(1L << p)).as("bucket")
    val w = shiftright(h, p).bitwiseAND(lit(4294967295L))
    val rho = when(w === 0L, lit(33))
      .otherwise(lit(33) - length(bin(w))).cast("int")
    df.filter(key.isNotNull)
      .select(bucket, rho.as("rho"))
      .groupBy(col("bucket"))
      .agg(max(col("rho")).as("max_rho"))
  }

  /** Standard HLL estimate from a [[hllRegisters]] table: alpha_m ·
    * m² / Σ 2^−rho (absent buckets contribute 2^0), with the
    * small-range linear-counting correction when E ≤ 2.5m and empty
    * buckets exist. Register table is ≤ 2^p rows — driver-side math
    * on the collected registers, same stance as the k-sized collects
    * elsewhere. */
  def hllEstimate(registers: DataFrame, p: Int): Double = {
    val m = 1 << p
    val regs = registers.select(col("bucket").cast("long"),
        col("max_rho").cast("int"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    val sum = (0 until m).map(b =>
      math.pow(2.0, -regs.getOrElse(b.toLong, 0).toDouble)).sum
    val e = alpha * m * m / sum
    val zeros = m - regs.size
    if (e <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) else e
  }

  /** Deterministic RELATIONAL Bloom filter build: `k` salted portable
    * FNV positions per key over an `nBits`-bit filter, materialized as
    * `nBits/32` 32-bit words (`(w, bits)` rows, bits in a BIGINT so
    * both engines shift without sign traps). One hash aggregation with
    * map-side partial OR — and because the filter is a TABLE, not a
    * driver-held byte array, a decontamination-scale bloom (GBs for
    * billions of reference n-grams) shards across executors instead of
    * dying on the driver; two blooms merge by `bit_or` on `w`.
    * Deterministic given the hash, so the DuckDB oracle reproduces
    * every word bit-for-bit. */
  def bloomBuild(df: DataFrame, key: Column, nBits: Int = 4096,
      k: Int = 3): DataFrame = {
    require(k > 0 && nBits > 0 && nBits % 32 == 0,
      "[GRAFT] need k > 0 and nBits a positive multiple of 32")
    df.select(key.as("__k"))
      .filter(col("__k").isNotNull)
      .select(col("__k"), explode(sequence(lit(0), lit(k - 1))).as("r"))
      .select(pmod(vfs_fingerprint(concat_ws("#", col("__k"), col("r"))),
        lit(nBits)).cast("int").as("pos"))
      .select((col("pos") / 32).cast("int").as("w"),
        expr("shiftleft(CAST(1 AS BIGINT), pos % 32)").as("m"))
      .groupBy(col("w")).agg(bit_or(col("m")).as("bits"))
      // build parameters ride with the filter (same stance as
      // count-min): probing with mismatched dims fails loudly
      .withColumn("n_bits", lit(nBits))
      .withColumn("k", lit(k))
  }

  /** Membership probe against a built bloom: a key MIGHT be present iff
    * all `k` of its bit positions are set (false positives possible,
    * false negatives not). Output: (key, hit 0/1). The filter side of
    * the join is word-keyed and usually tiny relative to the probe
    * corpus — AQE broadcasts it; at decontamination scale it shuffles
    * like any co-keyed join. */
  def bloomMightContain(bloom: DataFrame, keys: DataFrame, key: Column,
      nBits: Int = 4096, k: Int = 3): DataFrame = {
    bloom.select(col("n_bits"), col("k")).take(1).headOption match {
      case None => // empty build input: every probe is a clean miss
        return keys.select(key.as("key")).filter(col("key").isNotNull)
          .distinct().withColumn("hit", lit(0L))
      case Some(dims) =>
        require(dims.getInt(0) == nBits && dims.getInt(1) == k,
          s"[GRAFT] bloom was built with (nBits=${dims.getInt(0)}, " +
            s"k=${dims.getInt(1)}), probed with ($nBits, $k)")
    }
    val probes = keys.select(key.as("__k"))
      .filter(col("__k").isNotNull)
      .select(col("__k"), explode(sequence(lit(0), lit(k - 1))).as("r"))
      .select(col("__k"),
        pmod(vfs_fingerprint(concat_ws("#", col("__k"), col("r"))),
          lit(nBits)).cast("int").as("pos"))
      .select(col("__k"), (col("pos") / 32).cast("int").as("w"),
        expr("shiftleft(CAST(1 AS BIGINT), pos % 32)").as("m"))
    probes.join(bloom.select(col("w"), col("bits")), Seq("w"), "left")
      .groupBy(col("__k"))
      .agg(min(when((coalesce(col("bits"), lit(0L))
        .bitwiseAND(col("m"))) === col("m"), lit(1L)).otherwise(lit(0L)))
        .as("hit"))
      .select(col("__k").as("key"), col("hit"))
  }
}
