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

  /** OHLC bucketed downsample — per (key, bucket): count, open (value
    * at the earliest event), high, low, close (value at the latest
    * event). The financial-bar shape, and the right lossy summary for
    * any metric stream before long-horizon storage.
    *
    * Determinism: open/close are `min`/`max` over `struct(us, v)` —
    * lexicographic struct ordering, so a timestamp tie resolves to the
    * smallest (open) / largest (close) centi-value rather than an
    * arbitrary row; engines agree bit-for-bit (DuckDB's
    * `min(struct_pack(...))` orders the same way, unlike `arg_min`,
    * whose tie choice is unspecified). Values are rounded to
    * centi-units BEFORE aggregating — min/max/struct-min over longs
    * are order-independent, so the result is partition-layout-free.
    *
    * 100 TB shape: ONE hash aggregate keyed (key, bucket) over slim
    * (k, bucket, us, v) quadruples, map-side partials (min/max of
    * structs combine associatively) — no window, no join, no second
    * exchange. Accepts TIMESTAMP / TIMESTAMP_NTZ time columns
    * ([[TimeNorm.epochMicros]]).
    *
    * Output: (key, bucket BIGINT epoch-seconds, n, open_c, high_c,
    * low_c, close_c — BIGINT centi-units). */
  def ohlc(events: DataFrame, key: Column, ts: Column, value: Column,
      stepSec: Long = 60L): DataFrame = {
    require(stepSec > 0, "[GRAFT] ohlc: stepSec must be positive")
    val stepUs = stepSec * 1000000L
    val us = TimeNorm.epochMicros(ts)
    val bucket = ((us - us % lit(stepUs)) / 1000000L).cast("long")
    events
      .select(key.as("k"), bucket.as("bucket"), us.as("us"),
        round(value * 100).cast("long").as("v"))
      .groupBy(col("k"), col("bucket"))
      .agg(count(lit(1)).as("n"),
        min(struct(col("us"), col("v"))).getField("v").as("open_c"),
        max(col("v")).as("high_c"),
        min(col("v")).as("low_c"),
        max(struct(col("us"), col("v"))).getField("v").as("close_c"))
  }

  /** Cohort retention: bucket time into `bucketSec` periods, assign
    * each key (user) to the cohort of its FIRST active bucket, and
    * count distinct keys per (cohort, offset) — the "of users who
    * arrived in week W, how many were back N weeks later" table.
    *
    * 100 TB shape: (1) one hash agg to distinct (key, bucket) pairs —
    * the only pass over the raw events; (2) a key-grouped min for the
    * cohort (slim pairs); (3) a broadcast-friendly join back and one
    * final count agg keyed (cohort, offset). Everything downstream of
    * step 1 is bounded by |keys| · |active buckets per key|, not by
    * event volume. All-integer outputs. Accepts TIMESTAMP /
    * TIMESTAMP_NTZ ([[TimeNorm.epochMicros]]).
    *
    * Output: (cohort BIGINT epoch-sec bucket, bucket_offset BIGINT
    * buckets since cohort, n_keys BIGINT); bucket_offset 0 rows give
    * cohort sizes. ("offset" itself is an ANSI reserved word.) */
  def retention(events: DataFrame, key: Column, ts: Column,
      bucketSec: Long): DataFrame = {
    require(bucketSec > 0, "[GRAFT] retention: bucketSec must be positive")
    val stepUs = bucketSec * 1000000L
    val us = TimeNorm.epochMicros(ts)
    val bucket = ((us - us % lit(stepUs)) / 1000000L).cast("long")
    val active = events.select(key.as("k"), bucket.as("bucket")).distinct()
    val cohorts = active.groupBy(col("k"))
      .agg(min(col("bucket")).as("cohort"))
    // bucket and cohort are both multiples of bucketSec by
    // construction, so the division is exact as-is
    active.join(cohorts, Seq("k"))
      .groupBy(col("cohort"),
        ((col("bucket") - col("cohort")) / bucketSec).cast("long")
          .as("bucket_offset"))
      .agg(count(lit(1)).as("n_keys"))
  }

  /** Ordered funnel: how many keys (users) complete each PREFIX of
    * `steps` in order — step i counts only events at-or-after the
    * key's earliest completion of step i-1 (simultaneous events
    * count; "signup at the same instant as the view" is a
    * completion). Completion times are `min` aggregates, so the
    * result is tie-order-free.
    *
    * 100 TB shape: the raw events are touched once per step but each
    * pass is a FILTERED scan (one event type) into a key-grouped min;
    * the step-to-step joins are over key-sized slim frames that
    * shrink monotonically (AQE broadcasts them as they fall under the
    * threshold). No windows, no per-key sequence materialization —
    * the classic alternative (collect events per key and walk the
    * sequence) ships the whole event log through one shuffle.
    * Accepts TIMESTAMP / TIMESTAMP_NTZ ([[TimeNorm.epochMicros]]).
    *
    * Output: (step BIGINT 0-based, event_type STRING, n_keys BIGINT)
    * — one row per step, n_keys non-increasing. */
  def funnel(events: DataFrame, key: Column, ts: Column,
      stepCol: Column, steps: Seq[String]): DataFrame =
    countFrames(funnelFrames(events, key, ts, stepCol, steps))

  /** [[funnel]] with a CONVERSION WINDOW: step i counts only events
    * within `maxStepGapSec` of the key's step-(i−1) completion — the
    * real-world funnel shape ("purchase within 24 h of the click"),
    * where an eventual-but-stale completion is a non-conversion. The
    * bound is INCLUSIVE: an event at exactly `su + maxStepGapSec`
    * converts (simultaneity already counts at gap 0, so the window
    * edge behaves the same way). Step 0 has no predecessor and is
    * unbounded. Same scale shape as [[funnel]] — the window is one
    * extra filter on the already-joined (us, su) pair, no new
    * shuffle. Output: (step, event_type, n_keys). */
  def funnelWindowed(events: DataFrame, key: Column, ts: Column,
      stepCol: Column, steps: Seq[String],
      maxStepGapSec: Long): DataFrame = {
    require(maxStepGapSec > 0,
      "[GRAFT] funnelWindowed: maxStepGapSec must be positive")
    countFrames(funnelFrames(events, key, ts, stepCol, steps,
      maxStepGapUs = Some(maxStepGapSec * 1000000L)))
  }

  /** [[funnel]] plus CONVERSION LATENCY: for each step, the median
    * lag from the key's funnel START (its step-0 completion) to that
    * step's completion, over the keys that reached it.
    *
    * The lag is FLOOR-BUCKETED to centi-seconds BEFORE the
    * percentile — that is what bounds the aggregation state. An exact
    * percentile buffers every distinct input value; micros-resolution
    * lags are nearly all distinct, so the unbucketed buffer grows
    * with reached-KEY cardinality (unbounded at billions of users).
    * Centi-bucketed lags have at most `funnel duration in
    * centi-seconds` distinct values (≤ 7.8M for a 90-day funnel, a
    * few MB of buffer) — the state is bounded by the TIME RANGE, a
    * constant of the analysis, not by the data volume.
    *
    * The reported median is `2 × percentile(lag_c, 0.5)` cast to
    * BIGINT: over integer inputs the 0.5-interpolated percentile is
    * always a whole- or half-integer, so the doubled value is exactly
    * representable and the cast never sees a fractional part — no
    * round-half-up vs round-half-even divergence between engines at a
    * `.5` boundary.
    *
    * Output: (step, event_type, n_keys, p50_lag_c2 BIGINT — median
    * lag in HALF-centi-seconds, units of 5 ms; divide by 2.0 for
    * centi-seconds); step 0's lag is 0 by definition. */
  def funnelLatency(events: DataFrame, key: Column, ts: Column,
      stepCol: Column, steps: Seq[String]): DataFrame =
    funnelFrames(events, key, ts, stepCol, steps).zipWithIndex.map {
      case ((name, reached), i) =>
        val lagUs = col("su") - col("su0")
        // floor to centi-seconds: su >= su0 so the truncating % IS
        // floor, and the division is exact (whole multiple of 10^4
        // below 2^53)
        val lagC = ((lagUs - lagUs % 10000L) / 10000L).cast("long")
        reached.select(lagC.as("lag_c"))
          .agg(count(lit(1)).as("n_keys"),
            coalesce((expr("percentile(lag_c, 0.5)") * 2).cast("long"),
              lit(0L)).as("p50_lag_c2"))
          .select(lit(i.toLong).as("step"), lit(name).as("event_type"),
            col("n_keys"), col("p50_lag_c2"))
    }.reduce(_ unionByName _)

  private def countFrames(
      frames: Seq[(String, DataFrame)]): DataFrame =
    frames.zipWithIndex.map { case ((name, reached), i) =>
      reached.agg(count(lit(1)).as("n_keys"))
        .select(lit(i.toLong).as("step"), lit(name).as("event_type"),
          col("n_keys"))
    }.reduce(_ unionByName _)

  /** Shared step iteration: for each funnel prefix, the frame of keys
    * that completed it — (k, su = this step's earliest in-order
    * completion micros, su0 = the key's step-0 completion micros).
    * `maxStepGapUs` bounds each step to within that many micros of
    * the previous step's completion (inclusive). */
  private def funnelFrames(events: DataFrame, key: Column, ts: Column,
      stepCol: Column, steps: Seq[String],
      maxStepGapUs: Option[Long] = None): Seq[(String, DataFrame)] = {
    require(steps.nonEmpty, "[GRAFT] funnel: steps must be non-empty")
    require(steps.distinct.length == steps.length,
      "[GRAFT] funnel: steps must be distinct")
    val base = events.select(key.as("k"),
      TimeNorm.epochMicros(ts).as("us"), stepCol.as("t"))
    var reached = base.filter(col("t") === steps.head)
      .groupBy(col("k")).agg(min(col("us")).as("su"))
      .withColumn("su0", col("su"))
    val out = Seq.newBuilder[(String, DataFrame)]
    out += steps.head -> reached
    for (s <- steps.tail) {
      // min(su0) is exact: su0 is unique per key by construction
      reached = base.filter(col("t") === s)
        .join(reached.select(col("k"), col("su"), col("su0")), Seq("k"))
        .filter(col("us") >= col("su") &&
          maxStepGapUs.map(g => col("us") <= col("su") + g)
            .getOrElse(lit(true)))
        .groupBy(col("k"))
        .agg(min(col("us")).as("su"), min(col("su0")).as("su0"))
      out += s -> reached
    }
    out.result()
  }

  /** Rolling event-time window aggregate: for EVERY event, the count
    * and centi-unit sum of the same key's events inside the trailing
    * `windowSec` (inclusive of the current row and its timestamp
    * peers). The per-event trailing-exposure shape ("purchases in the
    * hour before this click") that bucketed aggregation can't express.
    *
    * Determinism under duplicate timestamps: the frame is RANGE-based
    * on epoch-micros, so tied rows are PEERS and share one frame —
    * unlike a ROWS frame, whose tie order would leak into results.
    * Values are centi-rounded before the integer sum (order-free).
    *
    * 100 TB shape: one hash exchange by key + per-partition sort; the
    * running frame is computed in a single pass per partition. Accepts
    * TIMESTAMP / TIMESTAMP_NTZ ([[TimeNorm.epochMicros]]).
    *
    * Output: (id, key, n_win, sum_win_c). */
  def rolling(events: DataFrame, id: Column, key: Column, ts: Column,
      value: Column, windowSec: Long): DataFrame = {
    require(windowSec > 0, "[GRAFT] rolling: windowSec must be positive")
    val us = TimeNorm.epochMicros(ts)
    val w = Window.partitionBy(col("k")).orderBy(col("us").asc)
      .rangeBetween(-windowSec * 1000000L, 0L)
    events
      .select(id.as("id"), key.as("k"), us.as("us"),
        round(value * 100).cast("long").as("v"))
      .select(col("id"), col("k"),
        count(lit(1)).over(w).as("n_win"),
        sum(col("v")).over(w).as("sum_win_c"))
  }

  /** Per-key event-time gap detection: every consecutive pair within a
    * key whose silence exceeds `minGapSec` — the monitoring twin of
    * sessionization (a session BOUNDARY is exactly a reported gap).
    *
    * `gap_sec` uses the remainder-subtract-then-divide trick (exact
    * integer division — the numerator is a whole multiple of 10^6
    * under 2^53, see [[resampleLocf]]'s bucket note) so engines agree.
    * Duplicate timestamps within a key are harmless: the lag pair has
    * gap 0 and is filtered, and rows after a tie see the same `us`
    * value whichever tied row the window order picked — values, not
    * row identities, determine the output.
    *
    * 100 TB shape: one exchange (hash by key) + per-partition sort for
    * the lag window over slim (k, us) pairs; the filter drops
    * everything below threshold before any further stage. Accepts
    * TIMESTAMP / TIMESTAMP_NTZ ([[TimeNorm.epochMicros]]).
    *
    * Output: (key, gap_start_us, gap_end_us, gap_sec — BIGINT). */
  def gaps(events: DataFrame, key: Column, ts: Column,
      minGapSec: Long): DataFrame = {
    require(minGapSec > 0, "[GRAFT] gaps: minGapSec must be positive")
    val us = TimeNorm.epochMicros(ts)
    val w = Window.partitionBy(col("k")).orderBy(col("us").asc)
    val diff = col("us") - col("prev_us")
    events.select(key.as("k"), us.as("us"))
      .withColumn("prev_us", lag(col("us"), 1).over(w))
      .filter(col("prev_us").isNotNull &&
        diff > minGapSec * 1000000L)
      .select(col("k"), col("prev_us").as("gap_start_us"),
        col("us").as("gap_end_us"),
        ((diff - diff % 1000000L) / 1000000L).cast("long").as("gap_sec"))
  }
}
