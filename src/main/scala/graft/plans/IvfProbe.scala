package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, LogicalPlan, Statistics}
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.col

import graft.operators.IvfIndex

/** Logical IVF probe — the DEFERRED form of an index-routed
  * [[KnnSearch]]. [[RouteKnnToIvf]] plants this leaf instead of
  * expanding the probe at analysis time, so the expensive/stateful
  * parts (centroid top-k, cluster-directory listing) run at EXECUTION
  * time in [[IvfProbeExec]]: a cached/reused Dataset re-probes on every
  * action and therefore SEES clusters appended after the plan was
  * analyzed — the footgun the analysis-time expansion had.
  *
  * `output` carries the original KnnSearch node's attributes (same
  * exprIds), so references above the routed node stay valid without a
  * stitching Project. */
case class IvfProbe(
    indexPath: String,
    query: Seq[Float],
    k: Int,
    nProbe: Int,
    idCol: String,
    vecCol: String,
    override val output: Seq[Attribute])
  extends LeafNode {
  // k rows of (id, vector, distance) — tiny; lets the optimizer treat
  // a routed probe as broadcastable if it feeds a join
  override def computeStats(): Statistics =
    Statistics(sizeInBytes = math.max(1L, k.toLong) * 512L)
}

/** Physical probe: per EXECUTION, pick the nProbe nearest clusters
  * (centroid table is tiny), list only those directories, and run the
  * pruned exact top-k — then hand back that plan's row RDD aligned to
  * this node's output attributes. */
case class IvfProbeExec(
    indexPath: String,
    query: Seq[Float],
    k: Int,
    nProbe: Int,
    idCol: String,
    vecCol: String,
    override val output: Seq[Attribute])
  extends LeafExecNode {

  override protected def doExecute(): RDD[InternalRow] = {
    val spark = SparkSession.active
    val probe = IvfIndex.searchHydrated(spark, indexPath,
      query.toArray, k, nProbe)
    // align to the routed node's column ORDER and types (the probe
    // plan's columns are named id/values/distance)
    val aligned = probe.select(output.map { a =>
      val src =
        if (a.name == "distance") "distance"
        else if (a.name == idCol) "id"
        else "values"
      col(src).cast(a.dataType).as(a.name)
    }: _*)
    aligned.queryExecution.toRdd
  }
}

/** Plans [[IvfProbe]] → [[IvfProbeExec]]; injected via
  * [[graft.GraftExtensions]]. */
object GraftStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: IvfProbe =>
      IvfProbeExec(p.indexPath, p.query, p.k, p.nProbe, p.idCol, p.vecCol,
        p.output) :: Nil
    case _ => Nil
  }
}
