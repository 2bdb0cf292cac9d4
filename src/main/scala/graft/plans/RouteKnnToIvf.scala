package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

import graft.operators.IvfIndex

/** Registry of persisted IVF indexes keyed by the DATA location they
  * were built from — the engine's analog of a database's index catalog.
  * Registering `(dataPath → indexPath)` lets [[RouteKnnToIvf]] rewrite
  * a [[KnnSearch]] over that parquet location into an index probe, the
  * way a B-tree turns a table scan into an index scan. */
object IndexRegistry {
  private val reg =
    scala.collection.concurrent.TrieMap.empty[String, String]

  private def normalize(p: String): String =
    new org.apache.hadoop.fs.Path(p).toUri.getPath

  def register(dataPath: String, indexPath: String): Unit =
    reg.put(normalize(dataPath), indexPath)

  def unregister(dataPath: String): Unit = reg.remove(normalize(dataPath))
  def clear(): Unit = reg.clear()

  /** Index path if SOME leaf relation of `plan` scans a registered
    * location. */
  def lookupFor(plan: LogicalPlan): Option[String] =
    plan.collectLeaves().flatMap {
      case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
        fs.location.rootPaths.flatMap(p => reg.get(normalize(p.toString)))
      case _ => Nil
    }.headOption
}

/** Optimizer routing: rewrite [[KnnSearch]] into an IVF index probe
  * when the scanned location has a registered index of the same metric
  * — the caller keeps writing `knn(df, q, k)` and deploys an index as
  * a pure config/registry change, exactly how a relational optimizer
  * picks an index scan. Must run BEFORE [[ResolveKnnSearch]] (it is
  * injected first in [[graft.GraftExtensions]]); unrouted nodes fall
  * through to the exact rewrite.
  *
  * Routing guards (all must hold, otherwise exact semantics win):
  *  - the node's child is exactly an (idCol, vecCol) projection — any
  *    extra column could not be served from the index layout
  *  - the index metric equals the node's metric (simd_* aliases fold)
  *
  * Routed output is APPROXIMATE top-k (recall follows nProbe — set
  * `spark.graft.knn.nprobe`, default 4), and for cosine indexes the
  * returned vector is the index's stored representation (normalized).
  * The rewrite projects the probe plan's columns onto the node's
  * original exprIds, so references above the node stay valid.
  */
object RouteKnnToIvf extends Rule[LogicalPlan] {

  private def canonMetric(m: String): String = m match {
    case "simd_cosine" => "cosine"
    case "simd_euclidean" | "" => "euclidean"
    case other => other
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case node @ KnnSearch(child, query, k, metric, vecCol, idCol, _)
        if child.resolved &&
          child.output.map(_.name).toSet == Set(idCol, vecCol) =>
      IndexRegistry.lookupFor(child) match {
        case Some(ivfPath)
            if IvfIndex.metricOf(ivfPath) == canonMetric(metric) =>
          val spark = SparkSession.active
          val nProbe = spark.conf
            .get("spark.graft.knn.nprobe", "4").toInt
          val probed = IvfIndex.searchHydrated(spark, ivfPath,
            query.toArray, k, nProbe).queryExecution.analyzed
          val byName = probed.output.map(a => a.name -> a).toMap
          // stitch: same column names, the node's original exprIds
          val projList = node.output.map { o =>
            val src = byName.getOrElse(
              if (o.name == "distance") "distance"
              else if (o.name == idCol) "id"
              else "values",
              throw new IllegalStateException(
                s"[GRAFT] index probe lacks column for ${o.name}"))
            Alias(src, o.name)(exprId = o.exprId)
          }
          Project(projList, probed)
        case _ => node
      }
  }
}
