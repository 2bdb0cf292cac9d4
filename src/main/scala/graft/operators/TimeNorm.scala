package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, LongType, TimestampNTZType, TimestampType}

/** Time-column normalization shared by every operator that takes a
  * timestamp input ([[AsOfJoin]], [[TimeSeries]], sessionization, the
  * range/interval joins).
  *
  * The harness's `events.parquet` time column has changed logical type
  * between rounds: first parquet `TIMESTAMP(NANOS)` (which Spark 4 only
  * reads as LONG under `spark.sql.legacy.parquet.nanosAsLong`), then
  * `TIMESTAMP(MICROS, isAdjustedToUTC=false)` (which Spark reads as
  * `TIMESTAMP_NTZ` — and `unix_micros` REJECTS NTZ with
  * DATATYPE_MISMATCH). Rather than per-call-site shims, every time
  * input funnels through here and tolerates all three flavors:
  * LONG epoch-nanos, TIMESTAMP_NTZ, TIMESTAMP.
  */
object TimeNorm {

  /** Normalize `colName` to a plain `TIMESTAMP` column in place.
    *
    *  - LONG is interpreted as epoch NANOS (the legacy `nanosAsLong`
    *    parquet read). Integer `div`, NOT `/`: `/` is double division
    *    and loses microsecond precision beyond 2^53 ns.
    *  - TIMESTAMP_NTZ is reinterpreted in the session time zone —
    *    Verify/Bench/tests pin it to UTC, so the instant the writer
    *    encoded is preserved exactly.
    *  - TIMESTAMP passes through; DATE becomes that day's midnight in
    *    the session time zone (the cast's standard meaning).
    *
    * Any other type — including STRING — is a hard error: silently
    * treating e.g. an INT seconds column as one of the above would
    * corrupt results, and a string's format is anybody's guess. This
    * is deliberately STRICTER than the implicit casts `date_trunc`/
    * `window` would perform; operators funneling through here trade
    * string leniency for a loud error. Callers with string time
    * columns should `to_timestamp` them explicitly first. */
  def normalize(df: DataFrame, colName: String): DataFrame =
    df.schema(colName).dataType match {
      case LongType =>
        df.withColumn(colName,
          timestamp_micros(expr(s"`$colName` div 1000")))
      case TimestampNTZType | DateType =>
        df.withColumn(colName, col(colName).cast(TimestampType))
      case TimestampType => df
      case other => throw new IllegalArgumentException(
        s"[GRAFT] TimeNorm: unsupported time column type $other for " +
          s"`$colName` (expected TIMESTAMP, TIMESTAMP_NTZ, DATE, or " +
          "LONG epoch-nanos; cast strings with to_timestamp first)")
    }

  /** Epoch-micros of a timestamp column, accepting BOTH timestamp
    * flavors: TIMESTAMP passes through the cast unchanged;
    * TIMESTAMP_NTZ is reinterpreted in the session time zone (pinned
    * UTC by Verify/Bench/tests). Use this instead of a bare
    * `unix_micros` at every operator call site.
    *
    * LONG inputs are NOT accepted here (a Column can't see its own
    * type; `cast` would misread a long as epoch-SECONDS) — normalize
    * the frame with [[normalize]] first. */
  def epochMicros(c: Column): Column = unix_micros(c.cast(TimestampType))
}
