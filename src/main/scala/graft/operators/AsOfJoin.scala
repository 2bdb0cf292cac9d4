package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of joins — for each left row, attach the nearest right row at or
  * before (backward) / at or after (forward) its timestamp within the
  * same key. Spark has no built-in as-of join (pandas-on-Spark's
  * merge_asof exists, but not in the Scala DataFrame API); the
  * idiomatic distributed shape is the union + windowed last_value
  * trick:
  *
  *   1. tag both sides and union (right sorts before left on ts ties,
  *      so an exactly-simultaneous right row IS visible to the left row)
  *   2. one shuffle: window partitioned by key, ordered by (ts, side) —
  *      ascending for backward, descending ts for forward
  *   3. `last(value, ignoreNulls)` over the unbounded-preceding frame
  *      carries the nearest right payload to each left row
  *   4. keep only left rows
  *
  * Cost: a single hash shuffle of |L|+|R| rows + a per-partition sort —
  * no per-key loops, no broadcast of either side; AQE handles key skew.
  * Right-side (key, ts) duplicates should be pre-aggregated by the
  * caller for deterministic results.
  *
  * Tolerance joins ("within 1 hour") compose on top: pass
  * `matchedTsAs` to surface the matched right timestamp and null out
  * payloads whose gap exceeds the bound (see `asof_join_tolerance` in
  * [[graft.SparkEntry]]).
  */
object AsOfJoin {

  /** Latest right row with `rightTs <= leftTs` per key. */
  def backward(left: DataFrame, right: DataFrame, keyCol: String,
      leftTsCol: String, rightTsCol: String, payload: Seq[String],
      matchedTsAs: Option[String] = None): DataFrame =
    carry(left, right, keyCol, leftTsCol, rightTsCol, payload,
      matchedTsAs, descending = false)

  /** Earliest right row with `rightTs >= leftTs` per key. */
  def forward(left: DataFrame, right: DataFrame, keyCol: String,
      leftTsCol: String, rightTsCol: String, payload: Seq[String],
      matchedTsAs: Option[String] = None): DataFrame =
    carry(left, right, keyCol, leftTsCol, rightTsCol, payload,
      matchedTsAs, descending = true)

  /** Nearest right row in EITHER direction per key (pandas
    * `merge_asof(direction='nearest')`): the backward and forward
    * carries compose — two single-shuffle passes — and each left row
    * keeps whichever matched right row is closer in time; an exact
    * tie (equidistant matches, or a simultaneous right row visible to
    * both passes) resolves to the BACKWARD match, and a row with only
    * one side matched keeps that side. Time columns may be TIMESTAMP,
    * TIMESTAMP_NTZ (compared via [[TimeNorm.epochMicros]]) or any
    * numeric type (compared raw — as-of over sequence numbers works),
    * but BOTH sides must use the same flavor (both time-like or both
    * numeric): the gap arithmetic compares the left ts against the
    * matched RIGHT ts, and a mixed pair (say left TIMESTAMP, right
    * LONG sequence numbers) has no meaningful distance.
    *
    * `toleranceUs`: a side's match only counts when its gap is within
    * the bound (inclusive) — pandas `merge_asof(tolerance=...)`. For
    * numeric ts columns the bound is in the column's own units. A
    * left row with neither side in tolerance gets NULL payload (and
    * NULL `matchedTsAs`).
    *
    * Cost: exactly the two carries' shuffles (2 hash exchanges of
    * |L|+|R| slim rows + per-partition sorts); the choice between
    * sides is a pure projection. */
  def nearest(left: DataFrame, right: DataFrame, keyCol: String,
      leftTsCol: String, rightTsCol: String, payload: Seq[String],
      matchedTsAs: Option[String] = None,
      toleranceUs: Option[Long] = None): DataFrame = {
    val work = "__bts" +: "__fts" +: payload.flatMap(p =>
      Seq(s"__b_$p", s"__f_$p"))
    WorkCols.requireFree(left, work: _*)
    def isTime(dt: org.apache.spark.sql.types.DataType): Boolean =
      dt == org.apache.spark.sql.types.TimestampType ||
        dt == org.apache.spark.sql.types.TimestampNTZType
    val lTime = isTime(left.schema(leftTsCol).dataType)
    val rTime = isTime(right.schema(rightTsCol).dataType)
    // a mixed pair would silently mis-convert: __bts/__fts carry the
    // RIGHT frame's type, and casting a LONG sequence number through
    // epochMicros reads it as epoch-seconds
    require(lTime == rTime,
      s"[GRAFT] AsOfJoin.nearest: left `$leftTsCol` " +
        s"(${left.schema(leftTsCol).dataType.simpleString}) and right " +
        s"`$rightTsCol` (${right.schema(rightTsCol).dataType.simpleString}) " +
        "must both be timestamps or both numeric — the nearest-side " +
        "choice compares their distance")
    toleranceUs.foreach(t => require(t >= 0,
      "[GRAFT] AsOfJoin.nearest: tolerance must be non-negative"))
    val leftCols = left.columns.toSeq
    def renamed(df: DataFrame, tag: String): DataFrame =
      payload.foldLeft(df)((d, p) => d.withColumnRenamed(p, s"__${tag}_$p"))
    val b = renamed(backward(left, right, keyCol, leftTsCol, rightTsCol,
      payload, Some("__bts")), "b")
    val f = renamed(forward(b, right, keyCol, leftTsCol, rightTsCol,
      payload, Some("__fts")), "f")
    // numeric epoch for gap comparison; raw for numeric ts columns.
    // __bts/__fts carry the RIGHT frame's ts type — convert per side.
    def tl(c: Column): Column = if (lTime) TimeNorm.epochMicros(c) else c
    def tr(c: Column): Column = if (rTime) TimeNorm.epochMicros(c) else c
    val lts = tl(col(leftTsCol))
    val bGap = lts - tr(col("__bts"))
    val fGap = tr(col("__fts")) - lts
    def inTol(gap: Column): Column =
      toleranceUs.map(t => gap <= t).getOrElse(lit(true))
    val bValid = col("__bts").isNotNull && inTol(bGap)
    val fValid = col("__fts").isNotNull && inTol(fGap)
    val useBackward = bValid && (!fValid || bGap <= fGap)
    f.select((leftCols.map(col) ++:
      matchedTsAs.map(a => when(useBackward, col("__bts"))
        .when(fValid, col("__fts")).as(a)).toSeq ++:
      payload.map(p => when(useBackward, col(s"__b_$p"))
        .when(fValid, col(s"__f_$p")).as(p))): _*)
  }

  private def carry(left: DataFrame, right: DataFrame, keyCol: String,
      leftTsCol: String, rightTsCol: String, payload: Seq[String],
      matchedTsAs: Option[String], descending: Boolean): DataFrame = {
    WorkCols.requireFree(left, "__key", "__ts", "__side", "__p", "__latest")
    WorkCols.requireFree(right, "__key", "__ts", "__side", "__p", "__latest")
    val leftCols = left.columns.toSeq
    // the payload rides in ONE struct that is non-null exactly for right
    // rows: last(_, ignoreNulls) then tracks the nearest right ROW, not
    // the nearest non-null value per field — a right row whose payload
    // field is legitimately NULL still wins over a farther row. The
    // matched right ts always rides along for tolerance composition.
    val structType = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("__rts",
        right.schema(rightTsCol).dataType) +:
      payload.map(p => right.schema(p)))
    val lTagged = left.select(
      (col(keyCol).as("__key") +: col(leftTsCol).as("__ts") +:
        lit(1).as("__side") +:
        leftCols.map(c => col(c)) ++:
        Seq(lit(null).cast(structType).as("__p"))): _*)
    val rTagged = right.select(
      (col(keyCol).as("__key") +: col(rightTsCol).as("__ts") +:
        lit(0).as("__side") +:
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++:
        Seq(struct((col(rightTsCol).as("__rts") +:
          payload.map(col)): _*).as("__p"))): _*)
    val tsOrder = if (descending) col("__ts").desc else col("__ts").asc
    val w = Window.partitionBy(col("__key"))
      .orderBy(tsOrder, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = lTagged.unionByName(rTagged)
      .withColumn("__latest", last(col("__p"), ignoreNulls = true).over(w))
    carried.filter(col("__side") === 1)
      .select((leftCols.map(col) ++:
        matchedTsAs.map(a => col("__latest.__rts").as(a)).toSeq ++:
        payload.map(p => col(s"__latest.$p").as(p))): _*)
  }
}
