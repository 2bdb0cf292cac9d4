package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resampling — the gap-free fixed-step series that
  * downstream window/as-of/forecast operators assume. Beyond the
  * reference's surface (it has no time ops); composes with the
  * streaming window aggregates in [[graft.streaming.Ingest]].
  */
object TimeSeries {

  /** Fixed-step resample with dense gap-fill and LOCF: aggregate
    * (key, bucket) sums/counts, expand each key's OWN [first, last]
    * bucket span to a dense sequence (sequence + explode — no global
    * calendar table, a key materializes only its own span), left-join
    * the aggregates back, zero-fill counts, and carry the last
    * observed value forward into empty buckets (`last(..., ignoreNulls)`
    * over an unbounded-preceding window — the first bucket of a span
    * is always observed, so no leading nulls). Bucketing is
    * epoch-micros minus the TRUNCATED remainder (`%`, matching SQL
    * engines' `%` — pmod's floored semantics would disagree with them
    * on pre-1970 timestamps), then an exact /1e6: the intermediate is
    * a whole multiple of 10^6 with |value| < 2^53 for any timestamp
    * within ±250k years, so the division is exact and engines land
    * rows in identical buckets. Shuffle profile: one hash-agg by
    * (key, bucket) over slim triples, then a span agg + window by key.
    *
    * Output: (key, bucket BIGINT epoch-seconds, n BIGINT observed
    * rows, value_c BIGINT = LOCF of round(sum(value)·100)). */
  def resampleLocf(events: DataFrame, key: Column, ts: Column,
      value: Column, stepSec: Long = 60L): DataFrame = {
    require(stepSec > 0, "[GRAFT] resampleLocf: stepSec must be positive")
    val stepUs = stepSec * 1000000L
    // epochMicros, not bare unix_micros: accepts TIMESTAMP_NTZ inputs
    val us = TimeNorm.epochMicros(ts)
    val bucket = ((us - us % lit(stepUs)) / 1000000L).cast("long")
    // round each value to centi-units BEFORE summing and aggregate
    // LONGS: a double sum's rounding depends on Spark's partial-agg
    // accumulation order (partition layout), so round(sum(double))
    // could flip at a .5 boundary between runs/engines — the integer
    // sum is associative-commutative-exact and order-independent
    val agg = events
      .select(key.as("k"), bucket.as("bucket"),
        round(value * 100).cast("long").as("v"))
      .groupBy(col("k"), col("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("vc"))
    val dense = agg.groupBy(col("k"))
      .agg(min(col("bucket")).as("lo"), max(col("bucket")).as("hi"))
      .select(col("k"),
        explode(sequence(col("lo"), col("hi"), lit(stepSec)))
          .as("bucket"))
    val w = Window.partitionBy(col("k")).orderBy(col("bucket").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dense.join(agg, Seq("k", "bucket"), "left")
      .select(col("k"), col("bucket"),
        coalesce(col("n"), lit(0L)).as("n"),
        last(col("vc"), ignoreNulls = true).over(w).as("value_c"))
  }
}
