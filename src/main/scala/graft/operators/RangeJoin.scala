package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join — an operator Spark has no native physical
  * strategy for: a plain `l.join(r, point >= lo && point < hi)` theta
  * join plans as BroadcastNestedLoopJoin, which is O(|L|·|R|) work and
  * requires one side to fit in memory — a non-starter at 100 TB.
  *
  * Scale design (the standard bin/bucket decomposition, cf. interval
  * joins in streaming engines): pick a bin width, explode each interval
  * into the fixed-width bins it covers, and equi-join on the bin id
  * with a residual range filter. Shuffle volume is |L| + Σ interval
  * spans/binWidth, both sides hash-partition cleanly, and AQE handles
  * bin skew like any other equi-join key. Bin width tunes the explode
  * factor vs bucket selectivity trade (≈ median interval length is a
  * good default).
  *
  * The reference has no join surface at all (SURVEY §2.6: only the
  * hydration lookup join J1); this is a north-star general-surface
  * addition alongside [[AsOfJoin]].
  */
object RangeJoin {

  /** Per-row explode-factor cap: one interval whose span is huge
    * relative to `binWidth` would generate span/binWidth bin ids —
    * silently OOMing or hitting Spark's max array length deep inside
    * a shuffle. Fail loudly at the offending ROW instead, naming the
    * fix (a larger binWidth / a saner interval). 2^16 bins ≈ a 64k×
    * span-to-bin ratio — far past the point where the bin join has
    * stopped being selective, so a legitimate workload never hits it. */
  val MaxBinsPerRow: Long = 65536L

  /** `sequence(binLo, binHi)` with the [[MaxBinsPerRow]] guard: rows
    * within the cap explode normally; a wider row raises a runtime
    * error carrying the offending span and the remedy. */
  private def guardedBins(binLo: Column, binHi: Column,
      op: String): Column = {
    val span = binHi - binLo + 1L
    explode(sequence(binLo,
      when(span <= MaxBinsPerRow, binHi).otherwise(raise_error(concat(
        lit(s"[GRAFT] $op: an interval spans "), span.cast("string"),
        lit(s" bins (cap $MaxBinsPerRow) — use a larger binWidth or " +
          "filter outlier intervals"))))))
  }

  /** Join left rows carrying scalar `pointCol` to right rows carrying
    * [`loCol`, `hiCol`) half-open intervals, on point ∈ interval.
    * Output: left columns ++ right columns. Each qualifying (row,
    * interval) pair appears exactly once (the pair meets only in the
    * point's own bin — no post-join dedup needed). Intervals wider
    * than [[MaxBinsPerRow]] bins fail loudly (see above); degenerate
    * or inverted intervals (hi <= lo) are dropped up front — they
    * contain no point under half-open semantics, and an inverted pair
    * would otherwise slip past the span guard as a NEGATIVE span and
    * make `sequence` descend through ~|span| bins (the exact silent
    * blowup the guard exists to prevent). */
  def pointInInterval(left: DataFrame, right: DataFrame,
      pointCol: String, loCol: String, hiCol: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    WorkCols.requireFree(left, "__bin")
    WorkCols.requireFree(right, "__bin")
    val bin = (c: Column) => floor(c / binWidth).cast("long")
    val l = left.withColumn("__bin", bin(col(pointCol)))
    // a [lo, hi) interval covers bins floor(lo/w) .. floor(hi/w), the
    // last one only when hi is not exactly on a bin edge — harmless to
    // include (the residual filter rejects point == hi)
    val r = right.filter(col(hiCol) > col(loCol)).withColumn("__bin",
      guardedBins(bin(col(loCol)), bin(col(hiCol)), "pointInInterval"))
    l.join(r, Seq("__bin"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__bin")
  }

  /** Interval × interval OVERLAP join: left [lo1, hi1) rows joined to
    * right [lo2, hi2) rows iff the half-open intervals intersect
    * (`lo1 < hi2 && lo2 < hi1` — touching endpoints do NOT overlap).
    * Same bin decomposition as [[pointInInterval]], with BOTH sides
    * exploded; a pair that shares several bins is emitted exactly once
    * WITHOUT a dedup shuffle — it is kept only in the FIRST bin the
    * two intervals share, `max(bin(lo1), bin(lo2))` (every overlapping
    * pair shares that bin by construction). Degenerate (empty)
    * intervals are dropped up front: they can't overlap anything, and
    * a reversed `sequence(bin(hi)..bin(lo))` would mis-bin them.
    *
    * Shuffle volume: Σ span/binWidth per side, hash-partitioned on the
    * bin id — no BroadcastNestedLoopJoin, no |L|·|R| blow-up; AQE
    * handles hot bins. Output: left columns ++ right columns (caller
    * disambiguates shared names). */
  def intervalOverlap(left: DataFrame, right: DataFrame,
      lo1: String, hi1: String, lo2: String, hi2: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    WorkCols.requireFree(left, "__bin")
    WorkCols.requireFree(right, "__bin")
    val bin = (c: Column) => floor(c / binWidth).cast("long")
    val l = left.filter(col(hi1) > col(lo1))
      .withColumn("__bin",
        guardedBins(bin(col(lo1)), bin(col(hi1)), "intervalOverlap"))
    val r = right.filter(col(hi2) > col(lo2))
      .withColumn("__bin",
        guardedBins(bin(col(lo2)), bin(col(hi2)), "intervalOverlap"))
    l.join(r, Seq("__bin"))
      .filter(col(lo1) < col(hi2) && col(lo2) < col(hi1))
      .filter(col("__bin") === greatest(bin(col(lo1)), bin(col(lo2))))
      .drop("__bin")
  }
}
