package graft.operators

import org.apache.spark.sql.DataFrame

/** Internal-column hygiene for operators that inject `__`-prefixed
  * working columns (`__bin`, `__salt`, `__rn`, …): if the input already
  * carries one of those names the operator would silently overwrite it
  * and drop the user's column from the output — fail loudly instead
  * (same stance as [[graft.store.ZOrderLayout]]'s `__z` guard). */
private[graft] object WorkCols {
  def requireFree(df: DataFrame, names: String*): Unit = {
    val clash = df.columns.toSet.intersect(names.toSet)
    require(clash.isEmpty,
      s"[GRAFT] input already contains reserved working column(s) " +
        s"${clash.mkString(", ")} — rename before calling this operator")
  }

  /** Widen a few-file input to the session's parallelism before a
    * compute-bound per-row kernel: a corpus read as one or two big
    * files would otherwise run the kernel on as few cores (measured
    * 2.2 s single-threaded vs 0.3 s spread for one 5k-doc signature
    * pass). The tiny up-front shuffle is irrelevant at any scale where
    * it triggers — real 100 TB inputs arrive in many files and skip
    * this branch entirely.
    *
    * Only SCAN-SHAPED plans (leaf + projections/filters) are
    * inspected: `.rdd` under AQE EXECUTES every query stage in a
    * shuffle-bearing plan just to report its final partitioning —
    * r18 measured a curate composition running its whole upstream
    * (pair fold + anti-join) TWICE, 2× whole-operator CPU, from one
    * spread() over an un-persisted anti-join. A plan that already
    * contains a shuffle is post-exchange wide (shuffle.partitions)
    * and needs no spreading — return it untouched, and pay the
    * `.rdd` partition probe only where it is free (narrow lineage
    * has no AQE wrapper and no jobs to run). */
  def spread(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (scanShaped(df.queryExecution.optimizedPlan) &&
      df.rdd.getNumPartitions < p) df.repartition(p)
    else df
  }

  private def scanShaped(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical._
    plan match {
      case _: LeafNode => true
      case n: Project => scanShaped(n.child)
      case n: Filter => scanShaped(n.child)
      case n: SubqueryAlias => scanShaped(n.child)
      case _ => false
    }
  }
}
