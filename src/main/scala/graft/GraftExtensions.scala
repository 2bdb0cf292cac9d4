package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions._
import graft.operators.TopKByDistance

/** Session-extension hook: registers every graft function at session
  * build time, so a cluster deploy needs only
  * `--conf spark.sql.extensions=graft.GraftExtensions` — no driver code.
  * (`functions.registerAll(spark)` remains the programmatic twin for an
  * already-built session.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // routing first: an indexed KnnSearch becomes a deferred IVF probe
    // leaf; only unrouted nodes reach the exact rewrite
    ext.injectResolutionRule(_ => graft.plans.RouteKnnToIvf)
    ext.injectResolutionRule(_ => graft.plans.ResolveKnnSearch)
    // plans the deferred probe leaf (execution-time cluster selection)
    ext.injectPlannerStrategy(_ => graft.plans.GraftStrategy)
    // SQL-text surface: SELECT * FROM vfs_knn(path, k, metric, query)
    ext.injectTableFunction((FunctionIdentifier("vfs_knn"),
      new ExpressionInfo("graft", "vfs_knn"),
      graft.plans.SqlSurface.vfsKnnBuilder _))
    ext.injectTableFunction((FunctionIdentifier("vfs_bm25"),
      new ExpressionInfo("graft", "vfs_bm25"),
      graft.plans.SqlSurface.vfsBm25Builder _))
    ext.injectTableFunction((FunctionIdentifier("vfs_lm_score"),
      new ExpressionInfo("graft", "vfs_lm_score"),
      graft.plans.SqlSurface.vfsLmScoreBuilder _))
    ext.injectTableFunction((FunctionIdentifier("vfs_ohlc"),
      new ExpressionInfo("graft", "vfs_ohlc"),
      graft.plans.SqlSurface.vfsOhlcBuilder _))
    ext.injectTableFunction((FunctionIdentifier("vfs_dup_spans"),
      new ExpressionInfo("graft", "vfs_dup_spans"),
      graft.plans.SqlSurface.vfsDupSpansBuilder _))
    ext.injectTableFunction((FunctionIdentifier("vfs_binary_knn"),
      new ExpressionInfo("graft", "vfs_binary_knn"),
      graft.plans.SqlSurface.vfsBinaryKnnBuilder _))
    ext.injectTableFunction((FunctionIdentifier("vfs_minhash_pairs"),
      new ExpressionInfo("graft", "vfs_minhash_pairs"),
      graft.plans.SqlSurface.vfsMinhashPairsBuilder _))
    ext.injectTableFunction((FunctionIdentifier("vfs_quality_gate"),
      new ExpressionInfo("graft", "vfs_quality_gate"),
      graft.plans.SqlSurface.vfsQualityGateBuilder _))
    ext.injectTableFunction((FunctionIdentifier("vfs_langid"),
      new ExpressionInfo("graft", "vfs_langid"),
      graft.plans.SqlSurface.vfsLangIdBuilder _))
    ext.injectTableFunction((FunctionIdentifier("vfs_dsir"),
      new ExpressionInfo("graft", "vfs_dsir"),
      graft.plans.SqlSurface.vfsDsirBuilder _))
    ext.injectTableFunction((FunctionIdentifier("vfs_sig_pairs"),
      new ExpressionInfo("graft", "vfs_sig_pairs"),
      graft.plans.SqlSurface.vfsSigPairsBuilder _))
    ext.injectTableFunction((FunctionIdentifier("vfs_margin_pairs"),
      new ExpressionInfo("graft", "vfs_margin_pairs"),
      graft.plans.SqlSurface.vfsMarginPairsBuilder _))
    ext.injectTableFunction((FunctionIdentifier("vfs_curate"),
      new ExpressionInfo("graft", "vfs_curate"),
      graft.plans.SqlSurface.vfsCurateBuilder _))
    ext.injectTableFunction((FunctionIdentifier("vfs_boilerplate"),
      new ExpressionInfo("graft", "vfs_boilerplate"),
      graft.plans.SqlSurface.vfsBoilerplateBuilder _))
    ext.injectTableFunction((FunctionIdentifier("vfs_budget_sample"),
      new ExpressionInfo("graft", "vfs_budget_sample"),
      graft.plans.SqlSurface.vfsBudgetSampleBuilder _))
    ext.injectTableFunction((FunctionIdentifier("vfs_mixture"),
      new ExpressionInfo("graft", "vfs_mixture"),
      graft.plans.SqlSurface.vfsMixtureBuilder _))
    ext.injectTableFunction((FunctionIdentifier("vfs_stratified_sample"),
      new ExpressionInfo("graft", "vfs_stratified_sample"),
      graft.plans.SqlSurface.vfsStratifiedSampleBuilder _))
    ext.injectTableFunction((FunctionIdentifier("vfs_temperature_sample"),
      new ExpressionInfo("graft", "vfs_temperature_sample"),
      graft.plans.SqlSurface.vfsTemperatureSampleBuilder _))
    ext.injectTableFunction((FunctionIdentifier("vfs_domain_cap"),
      new ExpressionInfo("graft", "vfs_domain_cap"),
      graft.plans.SqlSurface.vfsDomainCapBuilder _))
    def inject(name: String, builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", name), builder))
    inject("vfs_euclidean", es => EuclideanDistance(es(0), es(1)))
    inject("vfs_cosine", es => CosineDistance(es(0), es(1)))
    inject("simd_euclidean", es => EuclideanDistance(es(0), es(1)))
    inject("simd_cosine", es => CosineDistance(es(0), es(1)))
    inject("vfs_dot", es => DotProduct(es(0), es(1)))
    inject("vfs_long_dot", es => LongDot(es(0), es(1)))
    inject("vfs_norm", es => L2Norm(es(0)))
    inject("vfs_quantize", es => QuantizeVec(es(0), es(1), clamp = false))
    inject("vfs_dequantize", es => DequantizeVec(es(0), es(1)))
    inject("vfs_fingerprint", es => Fingerprint(es(0)))
    inject("vfs_media_format", es => MediaFormat(es(0)))
    inject("vfs_html_text", es => HtmlText(es(0)))
    inject("vfs_html_title", es => HtmlTitle(es(0)))
    inject("vfs_html_links", es => HtmlLinks(es(0)))
    inject("vfs_robots_allowed", es => RobotsAllowed(es(0), es(1), es(2)))
    inject("vfs_min_shingle", es => MinShingleHash(es(0), es(1)))
    inject("vfs_topk", es => TopKByDistance(es(0), es(1),
      es(2).eval().asInstanceOf[Int]).toAggregateExpression())
    inject("vfs_vec_mean", es =>
      graft.operators.VectorMean(es(0)).toAggregateExpression())
  }
}
