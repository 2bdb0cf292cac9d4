package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One-pass data profiling — the ingest health check every training
  * pipeline runs before (and after) a transformation: per-column row
  * counts, null counts, distinct counts and min/max, computed in a
  * SINGLE aggregate pass over the input (one scan; Catalyst expands
  * the count-distincts into its multi-aggregate plan). The result is
  * |cols| rows — driver-sized regardless of input size.
  *
  * `exact = false` swaps exact count-distinct for HLL++
  * (`approx_count_distinct`), the 100 TB operating point: one pass,
  * no expand, mergeable partials. Min/max are emitted as strings of
  * the column's values (stable for integer and string columns — the
  * oracle-checkable subset; floats would be format-sensitive across
  * engines).
  */
object Profile {

  /** Profile `cols` of `df` in one aggregate pass. Output schema:
    * (column STRING, n_rows BIGINT, n_null BIGINT, n_distinct BIGINT,
    * min_s STRING, max_s STRING), one row per requested column,
    * ordered as given. */
  /** The single un-executed aggregate [[profile]] runs — one row, all
    * stats; exposed so plan dumps can show the one-scan shape. */
  private[graft] def aggFrame(df: DataFrame, cols: Seq[String],
      exact: Boolean): DataFrame = {
    require(cols.nonEmpty, "[GRAFT] profile: no columns requested")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty,
      s"[GRAFT] profile: no such column(s): ${missing.mkString(", ")}")
    val aggs = count(lit(1)).as("__n") +: cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__null_$c"),
        (if (exact) countDistinct(col(c))
         else approx_count_distinct(col(c))).as(s"__dist_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    df.agg(aggs.head, aggs.tail: _*)
  }

  def profile(df: DataFrame, cols: Seq[String],
      exact: Boolean = true): DataFrame = {
    val r = aggFrame(df, cols, exact).head()
    val spark = df.sparkSession
    val out = cols.map { c =>
      Row(c, r.getAs[Long]("__n"), r.getAs[Long](s"__null_$c"),
        r.getAs[Long](s"__dist_$c"), r.getAs[String](s"__min_$c"),
        r.getAs[String](s"__max_$c"))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(out, 1),
      StructType(Seq(
        StructField("column", StringType, nullable = false),
        StructField("n_rows", LongType, nullable = false),
        StructField("n_null", LongType, nullable = false),
        StructField("n_distinct", LongType, nullable = false),
        StructField("min_s", StringType, nullable = true),
        StructField("max_s", StringType, nullable = true))))
  }
}
