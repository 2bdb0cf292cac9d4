package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join — for each left row, attach the latest right
  * row with `rightTs <= leftTs` within the same key. Spark has no
  * built-in as-of join (pandas-on-Spark's merge_asof exists, but not in
  * the Scala DataFrame API); the idiomatic distributed shape is the
  * union + windowed last_value trick:
  *
  *   1. tag both sides and union (right sorts before left on ts ties,
  *      so an exactly-simultaneous right row IS visible to the left row)
  *   2. one shuffle: window partitioned by key, ordered by (ts, side)
  *   3. `last(value, ignoreNulls)` over the unbounded-preceding frame
  *      carries the most recent right payload forward
  *   4. keep only left rows
  *
  * Cost: a single hash shuffle of |L|+|R| rows + a per-partition sort —
  * no per-key loops, no broadcast of either side; AQE handles key skew.
  * Right-side (key, ts) duplicates should be pre-aggregated by the
  * caller for deterministic results.
  */
object AsOfJoin {

  /** @param left       left rows (kept)
    * @param right      right rows (payload lookup)
    * @param keyCol     equality key present on both sides
    * @param leftTsCol  left event-time column
    * @param rightTsCol right event-time column
    * @param payload    right-side columns to attach (renamed as given)
    */
  def backward(left: DataFrame, right: DataFrame, keyCol: String,
      leftTsCol: String, rightTsCol: String,
      payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // the payload rides in ONE struct that is non-null exactly for right
    // rows: last(_, ignoreNulls) then tracks the latest right ROW, not
    // the latest non-null value per field — a right row whose payload
    // field is legitimately NULL still wins over an older row
    val structType = org.apache.spark.sql.types.StructType(
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
        Seq(struct(payload.map(col): _*).as("__p"))): _*)
    val w = Window.partitionBy(col("__key"))
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = lTagged.unionByName(rTagged)
      .withColumn("__latest", last(col("__p"), ignoreNulls = true).over(w))
    carried.filter(col("__side") === 1)
      .select((leftCols.map(col) ++:
        payload.map(p => col(s"__latest.$p").as(p))): _*)
  }
}
