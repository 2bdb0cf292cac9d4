package graft.store

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.shims

/** Z-order (Morton) data layout — multi-dimensional clustering for
  * scan pruning, the lakehouse OPTIMIZE ZORDER BY technique: sort by
  * the interleaved code of two range-queried columns and each file /
  * row group covers a compact RECTANGLE of the 2-d domain. Parquet
  * min-max stats on BOTH original columns then stay tight per row
  * group, so a range predicate on either (or both) dimensions skips
  * most row groups — a single-column sort gives tight stats on one
  * dimension only.
  *
  * At 100 TB this is the difference between "time-range queries are
  * fast OR key-range queries are fast" and both being fast from one
  * layout. ZOrderSpec measures it: the scan's numOutputRows under a
  * 2-d box predicate drops by >2× vs a linear sort of the same data.
  */
object ZOrderLayout {

  /** Morton code column of two BIGINT dimensions (values taken mod
    * 2^32; offset/bucket negative or wide domains first). */
  def zorder(x: Column, y: Column): Column =
    shims.column(graft.functions.MortonCode(
      shims.expression(x.cast("long")), shims.expression(y.cast("long"))))

  /** Write `df` z-ordered on (xCol, yCol): range-partition then sort
    * within partitions by the Morton code — total z-order across
    * files, clustered row groups within. */
  def writeZOrdered(df: DataFrame, path: String, xCol: String,
      yCol: String, nFiles: Int = 16,
      options: Map[String, String] = Map.empty): Unit = {
    require(!df.columns.contains("__z"),
      "[GRAFT] input already has a __z column — it would be " +
        "silently overwritten and dropped from the written output")
    df.withColumn("__z", zorder(col(xCol), col(yCol)))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").options(options).parquet(path)
  }
}
