package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graft.{shims => ExpressionUtils}

/** Column-level API over the graft Catalyst expressions, plus SQL
  * registration. Mirrors the reference's query surface: distance
  * metrics euclidean/cosine with `simd_*` aliases
  * (vfs/src/vfs/rank.rs:61-67) and quantize/dequantize
  * (vfs/src/vfs/vector.rs:94-154).
  */
package object functions {
  private def col(e: Expression): Column = ExpressionUtils.column(e)
  private def ex(c: Column): Expression = ExpressionUtils.expression(c)

  def vfs_euclidean(a: Column, b: Column): Column =
    col(EuclideanDistance(ex(a), ex(b)))
  def vfs_cosine(a: Column, b: Column): Column =
    col(CosineDistance(ex(a), ex(b)))
  def vfs_dot(a: Column, b: Column): Column =
    col(DotProduct(ex(a), ex(b)))
  /** exact-integer dot over ARRAY<BIGINT> (codegen'd HOF replacement) */
  def vfs_long_dot(a: Column, b: Column): Column =
    col(LongDot(ex(a), ex(b)))
  def vfs_norm(a: Column): Column = col(L2Norm(ex(a)))

  /** storage-path quantization: scale given explicitly, no clamp
    * (vfs/src/vfs/vector.rs:188 always passes Some(127.0)) */
  def vfs_quantize(v: Column, scale: Column): Column =
    col(QuantizeVec(ex(v), ex(scale), clamp = false))
  /** user-path quantization with default scale: clamp to [-1,1], scale 127
    * (vfs/src/vfs/vector.rs:104-106) */
  def vfs_quantize_default(v: Column): Column =
    col(QuantizeVec(ex(v),
      org.apache.spark.sql.catalyst.expressions.Literal(127.0f), clamp = true))
  def vfs_dequantize(q: Column, scale: Column): Column =
    col(DequantizeVec(ex(q), ex(scale)))

  /** fused dequantize+distance over a quantized store's raw columns */
  def vfs_qeuclidean(q: Column, scale: Column, query: Column): Column =
    col(QuantizedEuclideanDistance(ex(q), ex(scale), ex(query)))
  def vfs_qcosine(q: Column, scale: Column, query: Column): Column =
    col(QuantizedCosineDistance(ex(q), ex(scale), ex(query)))

  /** 1-bit sign quantization: ARRAY<FLOAT> → packed ARRAY<BIGINT>
    * (64 dims per word) — the 32x-compression binary-embedding codec */
  def vfs_binary_quantize(v: Column): Column = col(BinaryQuantizeVec(ex(v)))
  /** Hamming distance over packed sign-bit words (XOR + popcount) */
  def vfs_hamming(a: Column, b: Column): Column =
    col(HammingDist(ex(a), ex(b)))

  /** FNV-1a 64 content fingerprint (dedup hash key) */
  def vfs_fingerprint(text: Column): Column = col(Fingerprint(ex(text)))
  def vfs_media_format(bin: Column): Column = col(MediaFormat(ex(bin)))

  /** native SimHash over the distinct whitespace tokens —
    * `portable = true` is the md5-top-60 DuckDB-reproducible hash,
    * `false` Spark's xxhash64 (see [[SimHash]]) */
  def vfs_simhash(text: Column, nBits: Int, portable: Boolean): Column =
    col(SimHash(ex(text), nBits, portable))

  /** Signed 64-bit hash value mapped monotonically onto the unit
    * interval: h/2^64 + 1/2. Shared by every deterministic sampler and
    * sketch (one copy of the 2^64 constant — divergent copies would
    * silently break oracle parity). NOTE: double rounding maps the top
    * ~512 hash values to exactly 1.0, so the range is [0, 1] with
    * P(=1.0) ≈ 2.8e-17 — callers comparing `< w` at w = 1.0 can in
    * principle drop such a row. */
  def vfs_hash_uniform(h: Column): Column =
    h.cast("double") / org.apache.spark.sql.functions.lit(1.8446744073709552e19) +
      org.apache.spark.sql.functions.lit(0.5)
  /** min FNV-1a over k-byte shingles (near-dup signature) */
  def vfs_min_shingle(text: Column, k: Int): Column =
    col(MinShingleHash(ex(text),
      org.apache.spark.sql.catalyst.expressions.Literal(k)))

  /** whitespace-token occurrence count of a term (BM25 tf kernel) */
  def vfs_term_count(text: Column, term: Column): Column =
    col(TermCount(ex(text), ex(term)))

  /** one-pass occurrence counts of ALL terms → ARRAY<BIGINT> in terms
    * order (multi-term BM25 tf kernel; tokenizes once per row) */
  def vfs_term_counts(text: Column, terms: Seq[String]): Column =
    col(TermCounts(ex(text), terms))

  /** extracted prose of an HTML page (markup dropped, entities
    * decoded, whitespace normalized — the WET-style step) */
  def vfs_html_text(html: Column): Column = col(HtmlText(ex(html)))
  /** main-content prose: chrome containers (nav/aside/header/footer/
    * form) suppressed — the curation-default extraction */
  def vfs_html_main_text(html: Column): Column = col(HtmlMainText(ex(html)))
  /** first <title> content, NULL when absent */
  def vfs_html_title(html: Column): Column = col(HtmlTitle(ex(html)))
  /** every <a href> value in document order → ARRAY<STRING> */
  def vfs_html_links(html: Column): Column = col(HtmlLinks(ex(html)))
  /** first <meta name=… content=…> value for a name, NULL absent —
    * the robots/noai opt-out directives, description, generator */
  def vfs_html_meta(html: Column, name: Column): Column =
    col(HtmlMeta(ex(html), ex(name)))
  /** first <link rel=canonical> href, NULL absent — the
    * author-declared page identity (canonical consolidation) */
  def vfs_html_canonical(html: Column): Column =
    col(HtmlCanonical(ex(html)))

  /** extracted text of a PDF (raw/Flate content streams, BT…ET
    * text operators — see [[PdfKernel]]'s scope stance) */
  def vfs_pdf_text(pdf: Column): Column = col(PdfText(ex(pdf)))

  /** robots.txt fetchability (RFC 9309 longest-match semantics) */
  def vfs_robots_allowed(robots: Column, userAgent: Column,
      path: Column): Column =
    col(RobotsAllowed(ex(robots), ex(userAgent), ex(path)))
  /** group-scoped Crawl-delay in milliseconds, NULL when absent */
  def vfs_robots_crawl_delay(robots: Column, userAgent: Column): Column =
    col(RobotsCrawlDelay(ex(robots), ex(userAgent)))
  /** global `Sitemap:` URLs in document order → ARRAY<STRING> */
  def vfs_robots_sitemaps(robots: Column): Column =
    col(RobotsSitemaps(ex(robots)))
  /** `<loc>` URLs of a sitemap/sitemapindex XML → ARRAY<STRING> */
  def vfs_sitemap_locs(xml: Column): Column =
    col(SitemapLocs(ex(xml)))
  /** `<lastmod>` values positionally aligned with vfs_sitemap_locs
    * ("" when absent) — the recrawl scheduler's change signal */
  def vfs_sitemap_lastmods(xml: Column): Column =
    col(SitemapLastmods(ex(xml)))
  /** RFC 3986 §5 reference resolution: (base, href-as-written) →
    * absolute URL — the step between vfs_html_links and the frontier */
  def vfs_url_resolve(base: Column, ref: Column): Column =
    col(UrlResolve(ex(base), ex(ref)))

  /** WHATWG charset sniff (BOM → Content-Type → meta prescan →
    * windows-1252): the canonical charset name [[vfs_charset_decode]]
    * will use; a NULL content type reads as absent */
  def vfs_charset_detect(body: Column, contentType: Column): Column =
    col(CharsetDetect(ex(body),
      ex(org.apache.spark.sql.functions.coalesce(contentType,
        org.apache.spark.sql.functions.lit("")))))
  /** page body bytes → STRING through the sniffed charset (BOM
    * stripped, malformed bytes → U+FFFD — a crawl payload never
    * fails a stage); a NULL content type reads as absent */
  def vfs_charset_decode(body: Column, contentType: Column): Column =
    col(CharsetDecode(ex(body),
      ex(org.apache.spark.sql.functions.coalesce(contentType,
        org.apache.spark.sql.functions.lit("")))))
  /** encoder twin: STRING → bytes in the labeled charset (fixture
    * synthesis / corpus export; unknown labels fail loudly) */
  def vfs_charset_encode(text: Column, label: Column): Column =
    col(CharsetEncode(ex(text), ex(label)))

  def vfs_hash_embedding(text: Column, dim: Int): Column =
    col(HashEmbedding(ex(text), dim, milli = false))
  def vfs_hash_embedding_milli(text: Column, dim: Int): Column =
    col(HashEmbedding(ex(text), dim, milli = true))

  /** Registers all functions for SQL use, including the `simd_*`
    * aliases (numerically identical — the reference's SIMD kernels
    * compute the same formula, vfs/src/vfs/rank.rs:14-56; Spark's
    * analog of SIMD is whole-stage codegen, which these use). */
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def r1(name: String, b: Seq[Expression] => Expression): Unit =
      reg.createOrReplaceTempFunction(name, b, "built-in")
    r1("vfs_euclidean", es => EuclideanDistance(es(0), es(1)))
    r1("vfs_cosine", es => CosineDistance(es(0), es(1)))
    r1("simd_euclidean", es => EuclideanDistance(es(0), es(1)))
    r1("simd_cosine", es => CosineDistance(es(0), es(1)))
    r1("vfs_dot", es => DotProduct(es(0), es(1)))
    r1("vfs_long_dot", es => LongDot(es(0), es(1)))
    r1("vfs_norm", es => L2Norm(es(0)))
    r1("vfs_quantize", es => QuantizeVec(es(0), es(1), clamp = false))
    r1("vfs_dequantize", es => DequantizeVec(es(0), es(1)))
    r1("vfs_binary_quantize", es => BinaryQuantizeVec(es(0)))
    r1("vfs_hamming", es => HammingDist(es(0), es(1)))
    r1("vfs_fingerprint", es => Fingerprint(es(0)))
    r1("vfs_media_format", es => MediaFormat(es(0)))
    r1("vfs_html_text", es => HtmlText(es(0)))
    r1("vfs_html_main_text", es => HtmlMainText(es(0)))
    r1("vfs_pdf_text", es => PdfText(es(0)))
    r1("vfs_html_title", es => HtmlTitle(es(0)))
    r1("vfs_html_links", es => HtmlLinks(es(0)))
    r1("vfs_html_meta", es => HtmlMeta(es(0), es(1)))
    r1("vfs_html_canonical", es => HtmlCanonical(es(0)))
    r1("vfs_robots_allowed", es => RobotsAllowed(es(0), es(1), es(2)))
    r1("vfs_robots_crawl_delay", es => RobotsCrawlDelay(es(0), es(1)))
    r1("vfs_robots_sitemaps", es => RobotsSitemaps(es(0)))
    r1("vfs_sitemap_locs", es => SitemapLocs(es(0)))
    r1("vfs_sitemap_lastmods", es => SitemapLastmods(es(0)))
    r1("vfs_url_resolve", es => UrlResolve(es(0), es(1)))
    // the SQL forms coalesce a NULL content type to '' (absent) —
    // same null tolerance as the Column builders
    def ctOrEmpty(e: Expression): Expression =
      org.apache.spark.sql.catalyst.expressions.Coalesce(Seq(e,
        org.apache.spark.sql.catalyst.expressions.Literal
          .create("", org.apache.spark.sql.types.StringType)))
    r1("vfs_charset_detect", es => CharsetDetect(es(0), ctOrEmpty(es(1))))
    r1("vfs_charset_decode", es => CharsetDecode(es(0), ctOrEmpty(es(1))))
    r1("vfs_charset_encode", es => CharsetEncode(es(0), es(1)))
    r1("vfs_min_shingle", es => MinShingleHash(es(0), es(1)))
    r1("vfs_term_count", es => TermCount(es(0), es(1)))
    // varargs: vfs_term_counts(text, 'a', 'b', ...) — terms must be
    // string literals (they parameterize the kernel at plan time)
    r1("vfs_term_counts", es => TermCounts(es(0), es.drop(1).map {
      case org.apache.spark.sql.catalyst.expressions.Literal(
        s: org.apache.spark.unsafe.types.UTF8String,
        org.apache.spark.sql.types.StringType) =>
        s.toString
      case other => throw new IllegalArgumentException(
        "[GRAFT] vfs_term_counts(text, term...): terms must be " +
          s"string literals, got $other")
    }))
    r1("vfs_vec_mean", es =>
      graft.operators.VectorMean(es(0)).toAggregateExpression())
    def intLit(e: Expression, what: String): Int = e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"[GRAFT] $what must be an integer literal, got $other")
    }
    r1("vfs_heavy_hitters", es =>
      graft.operators.HeavyHitters(es(0),
        intLit(es(1), "vfs_heavy_hitters(col, capacity): capacity"))
        .toAggregateExpression())
    // text-analysis surface: the pipeline functions reachable from pure
    // SQL. Each is a composed Column program, converted EAGERLY to an
    // expression tree (the lazy Column placeholder never resolves when
    // returned from a registry builder — shims.convertedExpression).
    import graft.operators.{TextAnalysis => TA}
    def cx(c: Column): Expression = ExpressionUtils.convertedExpression(c)
    r1("vfs_tokens", es => cx(TA.tokens(col(es(0)))))
    r1("vfs_token_count", es => cx(TA.tokenCount(col(es(0)))))
    r1("vfs_token_count_bpeish", es => cx(TA.tokenCountBpeIsh(col(es(0)))))
    r1("vfs_lang_id", es => cx(TA.langId(col(es(0)))))
    r1("vfs_quality_milli", es => cx(TA.qualityMilli(col(es(0)))))
    r1("vfs_normalize_text", es => cx(TA.normalizeText(col(es(0)))))
    r1("vfs_redact_pii", es => cx(TA.redactPii(col(es(0)))))
    // URL curation surface (WebCuration): canonical dedup key, host,
    // registered domain from pure SQL
    import graft.operators.{WebCuration => WC}
    r1("vfs_url_normalize", es => cx(WC.normalizeUrl(col(es(0)))))
    r1("vfs_url_host", es => cx(WC.urlHost(col(es(0)))))
    r1("vfs_url_domain", es => cx(WC.urlDomain(col(es(0)))))
    // varargs PSL form: vfs_psl_domain(host, 'com', 'co.uk',
    // 'github.io', ...) — snapshot entries as string literals (they
    // parameterize the hash-set kernel at plan time, the
    // vfs_term_counts convention); programmatic callers with a full
    // 10k-entry list use WebCuration.registeredDomainPsl directly
    r1("vfs_psl_domain", es => PslDomain(es(0), es.drop(1).map {
      case org.apache.spark.sql.catalyst.expressions.Literal(
        s: org.apache.spark.unsafe.types.UTF8String,
        org.apache.spark.sql.types.StringType) =>
        s.toString
      case other => throw new IllegalArgumentException(
        "[GRAFT] vfs_psl_domain(host, suffix...): suffixes must be " +
          s"string literals, got $other")
    }))
    // TABLE-backed PSL form: vfs_psl_domain_table(host, source) —
    // `source` is a string literal naming either a parquet path
    // (contains '/') or a registered table, with one `suffix` column
    // (the parsed public_suffix_list.dat). The snapshot loads through
    // WebCuration.pslFromTable's gated collect and is CACHED per JVM
    // by source string — the builder re-runs on every resolution of
    // every occurrence of the function, and N uncached loads per
    // planning pass would hammer the driver for the same slow-moving
    // ~10k-row list (refresh = a new path, or restart the session).
    // The full list — unreachable through vfs_psl_domain's literal
    // varargs — is thereby available from pure SQL; the built
    // expression is the same per-executor hash-set kernel.
    r1("vfs_psl_domain_table", es => {
      val src = es(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(
          s: org.apache.spark.unsafe.types.UTF8String,
          org.apache.spark.sql.types.StringType) =>
          s.toString
        case other => throw new IllegalArgumentException(
          "[GRAFT] vfs_psl_domain_table(host, source): source must " +
            s"be a string literal (parquet path or table name), got $other")
      }
      val snap = PslTableCache.load(src, () => {
        val session = SparkSession.getActiveSession.getOrElse(spark)
        val df =
          if (src.contains("/")) session.read.parquet(src)
          else session.table(src)
        graft.operators.WebCuration.pslFromTable(df)
      })
      PslDomain(es(0), snap)
    })
    r1("vfs_hash_embedding", es => HashEmbedding(es(0),
      intLit(es(1), "vfs_hash_embedding(text, dim): dim"), milli = false))
    r1("vfs_hash_embedding_milli", es => HashEmbedding(es(0),
      intLit(es(1), "vfs_hash_embedding_milli(text, dim): dim"),
      milli = true))
    r1("vfs_chunk_text", es => cx(TA.chunkText(col(es(0)),
      intLit(es(1), "vfs_chunk_text(text, size, overlap): size"),
      intLit(es(2), "vfs_chunk_text(text, size, overlap): overlap"))))
    // table-level SQL surface: SELECT * FROM vfs_knn(path, k, metric,
    // query[, vecCol, idCol]) — same registration GraftExtensions does
    // at session build, available here for already-built sessions. The
    // builder pre-applies routing + the exact rewrite, so the plan
    // resolves in sessions without the injected rules; the deferred
    // IVF probe leaf still needs its strategy, added idempotently.
    ExpressionUtils.registerTableFunction(spark, "vfs_knn",
      graft.plans.SqlSurface.vfsKnnBuilder _)
    // SELECT * FROM vfs_bm25(path, 'terms ...'[, textCol, idCol])
    ExpressionUtils.registerTableFunction(spark, "vfs_bm25",
      graft.plans.SqlSurface.vfsBm25Builder _)
    // SELECT * FROM vfs_lm_score(docsPath[, modelPath, textCol, idCol])
    ExpressionUtils.registerTableFunction(spark, "vfs_lm_score",
      graft.plans.SqlSurface.vfsLmScoreBuilder _)
    // SELECT * FROM vfs_ohlc(path, stepSec[, keyCol, tsCol, valueCol])
    ExpressionUtils.registerTableFunction(spark, "vfs_ohlc",
      graft.plans.SqlSurface.vfsOhlcBuilder _)
    // SELECT * FROM vfs_dup_spans(path, k[, textCol, idCol])
    ExpressionUtils.registerTableFunction(spark, "vfs_dup_spans",
      graft.plans.SqlSurface.vfsDupSpansBuilder _)
    // SELECT * FROM vfs_binary_knn(path, query, candidates[, vecCol, idCol])
    ExpressionUtils.registerTableFunction(spark, "vfs_binary_knn",
      graft.plans.SqlSurface.vfsBinaryKnnBuilder _)
    // SELECT * FROM vfs_minhash_pairs(path, threshold[, textCol, idCol])
    ExpressionUtils.registerTableFunction(spark, "vfs_minhash_pairs",
      graft.plans.SqlSurface.vfsMinhashPairsBuilder _)
    // SELECT * FROM vfs_quality_gate(path[, minWords, textCol, idCol])
    ExpressionUtils.registerTableFunction(spark, "vfs_quality_gate",
      graft.plans.SqlSurface.vfsQualityGateBuilder _)
    // SELECT * FROM vfs_langid(docsPath[, modelPath, textCol, idCol])
    ExpressionUtils.registerTableFunction(spark, "vfs_langid",
      graft.plans.SqlSurface.vfsLangIdBuilder _)
    // SELECT * FROM vfs_dsir(docsPath, targetPath[, rawPath, textCol,
    // idCol]) — DSIR importance scores; paths accept docs parquet or
    // saveWordModel artifacts
    ExpressionUtils.registerTableFunction(spark, "vfs_dsir",
      graft.plans.SqlSurface.vfsDsirBuilder _)
    // SELECT * FROM vfs_sig_pairs(path, maxHamming[, maxBucket, idCol, sigCol])
    ExpressionUtils.registerTableFunction(spark, "vfs_sig_pairs",
      graft.plans.SqlSurface.vfsSigPairsBuilder _)
    // SELECT * FROM vfs_margin_pairs(srcPath, tgtPath[, k,
    //   minMarginMilli, idCol, vecCol]) — margin-based pair mining
    ExpressionUtils.registerTableFunction(spark, "vfs_margin_pairs",
      graft.plans.SqlSurface.vfsMarginPairsBuilder _)
    // SELECT * FROM vfs_curate(docsPath[, modelPath, minQuality,
    //   minTokens, maxTokens, binCapacity])
    ExpressionUtils.registerTableFunction(spark, "vfs_curate",
      graft.plans.SqlSurface.vfsCurateBuilder _)
    // SELECT * FROM vfs_boilerplate(path[, minDocFreq, textCol, idCol])
    ExpressionUtils.registerTableFunction(spark, "vfs_boilerplate",
      graft.plans.SqlSurface.vfsBoilerplateBuilder _)
    // SELECT * FROM vfs_budget_sample(path, stratumCol, weightCol,
    //   keyCol, tiebreakCol, map('src', 10000, ...)[, bandCap])
    ExpressionUtils.registerTableFunction(spark, "vfs_budget_sample",
      graft.plans.SqlSurface.vfsBudgetSampleBuilder _)
    // SELECT * FROM vfs_mixture(path, sourceCol, keyCol, tiebreakCol,
    //   map('src', 7, ...)[, bandCap])
    ExpressionUtils.registerTableFunction(spark, "vfs_mixture",
      graft.plans.SqlSurface.vfsMixtureBuilder _)
    // SELECT * FROM vfs_stratified_sample(path, stratumCol, keyCol,
    //   tiebreakCol, n[, bandCap])
    ExpressionUtils.registerTableFunction(spark, "vfs_stratified_sample",
      graft.plans.SqlSurface.vfsStratifiedSampleBuilder _)
    // SELECT * FROM vfs_temperature_sample(path, sourceCol, keyCol,
    //   tiebreakCol[, alpha, bandCap])
    ExpressionUtils.registerTableFunction(spark, "vfs_temperature_sample",
      graft.plans.SqlSurface.vfsTemperatureSampleBuilder _)
    // SELECT * FROM vfs_domain_cap(path, n, rankCol[, urlCol, idCol,
    //   bandCap, pslSource]) — per-registered-domain cap; pslSource
    //   switches to the full public-suffix eTLD+1 (snapshot cached)
    ExpressionUtils.registerTableFunction(spark, "vfs_domain_cap",
      graft.plans.SqlSurface.vfsDomainCapBuilder _)
    val exp = spark.experimental
    if (!exp.extraStrategies.contains(graft.plans.GraftStrategy))
      exp.extraStrategies = exp.extraStrategies :+ graft.plans.GraftStrategy
  }
}
