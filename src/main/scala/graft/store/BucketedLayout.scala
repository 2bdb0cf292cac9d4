package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Bucketed table layout for co-located joins — the 100 TB answer to
  * "this join shuffles both sides every night": write both tables
  * bucketed (hash-partitioned into files) and sorted by the join key
  * with the SAME bucket count, and Catalyst plans the equi-join with
  * NO Exchange on either side — each task sort-merge-joins bucket i of
  * the left with bucket i of the right straight off storage.
  *
  * This is the persistent-layout generalization of the reference's
  * B-tree id index (storage_manager.rs:61-62 — its only physical
  * layout choice): instead of accelerating one lookup path, the layout
  * pre-pays the partitioning for every future join/aggregation on the
  * bucket key. */
object BucketedLayout {

  /** Write `df` as a managed parquet table bucketed and sorted by
    * `key` into `nBuckets` files per partition. Bucket count is the
    * knob that must match across co-joined tables.
    *
    * A stale warehouse directory can survive from a previous JVM whose
    * metastore is gone; `mode(overwrite)` only cleans locations the
    * CURRENT catalog knows about, so drop + delete the location first
    * or `saveAsTable` fails with LOCATION_ALREADY_EXISTS. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      nBuckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    // the catalog's own default location handles the current database
    // and db-qualified names (<warehouse>/<db>.db/<tbl>) — deriving it
    // by string concat from warehouse.dir would miss both
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.defaultTablePath(ident))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode("overwrite").format("parquet")
      .bucketBy(nBuckets, key).sortBy(key)
      .saveAsTable(table)
  }

  /** Equi-join two co-bucketed tables (key columns may share a name —
    * both sides are qualified). With matching bucket counts the
    * physical plan contains no ShuffleExchange (asserted in
    * BucketedLayoutSpec). */
  def coLocatedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, leftKey: String, rightKey: String): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, l(leftKey) === r(rightKey))
  }
}
