package graft.tools

import java.io.{File, FileOutputStream, PrintStream}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-18 optimization-evidence dumper: writes
  * `.explain("formatted")` for every bench-backed query/operator shape
  * to `plans/r18/<name>_<suffix>.txt` (suffix = args(1), "before" or
  * "after"), so plan-shape claims in OPTIMIZATION_r18.md are checkable
  * without running Spark. Mirrors the EXACT shapes Bench.scala times
  * (same fixtures, same operator arguments) — a plan for a different
  * shape would be evidence of nothing.
  *
  * Usage: sbt "runMain graft.tools.PlanDumpR18 [sfDir] [suffix] [outDir]"
  * (outDir defaults to plans/r18; round 19 passes plans/r19 so the
  * r18 evidence files are never overwritten)
  */
object PlanDumpR18 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val suffix = if (args.length > 1) args(1) else "before"
    val outDirName = if (args.length > 2) args(2) else "plans/r18"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.registerAll(spark)

    val outDir = new File(outDirName)
    outDir.mkdirs()

    def dump(name: String)(df: => DataFrame): Unit = {
      val f = new File(outDir, s"${name}_$suffix.txt")
      val ps = new PrintStream(new FileOutputStream(f), true, "UTF-8")
      try {
        Console.withOut(ps) {
          try df.explain("formatted")
          catch { case e: Throwable =>
            println(s"EXPLAIN FAILED: ${graft.Verify.errHead(e)}")
          }
        }
      } finally ps.close()
      System.err.println(s"[plandump] wrote ${f.getPath}")
    }

    // ---- SparkEntry-backed bench entries (the query IS the shape) ----
    val entryQueries = Seq(
      "q1_agg" -> "q1_agg",
      "join_topk" -> "q3_join_topk",
      "media_decode" -> "multimodal_features",
      "jpeg_decode" -> "multimodal_jpeg_color",
      "gif_decode" -> "multimodal_gif",
      "tiff_decode" -> "multimodal_tiff_packbits",
      "webp_decode" -> "multimodal_webp",
      "flac_decode" -> "multimodal_flac",
      "html_extract" -> "web_html_extract",
      "warc_extract" -> "web_warc_extract",
      "html_extract_main" -> "web_html_extract_main",
      "warc_coded_extract" -> "web_warc_transfer_codings",
      "charset_decode" -> "web_charset_decode",
      "warc_quarantine" -> "web_warc_quarantine",
      "politeness_schedule" -> "web_politeness_schedule",
      "pdf_extract" -> "web_pdf_extract",
      "mp4_box_walk" -> "multimodal_mp4_meta",
      "media_resize" -> "multimodal_resize",
      "frame_sample" -> "multimodal_frames",
      "bm25_score" -> "text_bm25",
      "hybrid_rrf_batch" -> "q_hybrid_rrf_batch",
      "sessionize" -> "w_sessionize",
      "time_rolling" -> "q_time_rolling",
      "window_agg" -> "stream_window_agg",
      "profile" -> "q_profile",
      "quality_filter_gopher" -> "text_gopher",
      "quality_filter_c4" -> "text_c4_clean",
      "boilerplate_strip" -> "dedup_boilerplate_lines",
      "pipeline_curate" -> "pipeline_curate_e2e",
      "pipeline_warc_curate" -> "pipeline_warc_curate",
      "lm_score" -> "text_lm_score")
    entryQueries.foreach { case (entry, qname) =>
      dump(entry) { graft.SparkEntry.queries(qname)(spark, sfDir) }
    }

    // ---- operator-shape entries (bench fixtures replicated) ----
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val embR = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val emb = embR.select(col("vec_id").as("id"),
      col("embedding").as("values"))

    dump("minhash_dedup") {
      graft.operators.Dedup.minHashLsh(docs, threshold = 0.8)
    }
    dump("substring_dedup") {
      graft.operators.Dedup.stripDuplicateSpans(docs, k = 4)
        .agg(sum(col("dup_tokens")))
    }
    dump("semantic_dedup") {
      graft.operators.Dedup.semanticDedup(embR,
        graft.operators.Dedup.seedCentroids(embR, 8), tauMilli = 600L)
    }
    dump("margin_mining") {
      graft.operators.Mining.marginPairs(spark,
        emb.filter(col("id") % 2 === 0),
        emb.filter(col("id") % 2 === 1), k = 4)
    }
    dump("knn_batch_100") {
      val queries = emb.limit(100)
        .select(col("id").as("qid"), col("values").as("qvalues"))
      graft.operators.Knn.exactBatch(emb, queries, 10,
        graft.operators.Metric.Cosine)
    }
    dump("hll_distinct") {
      graft.operators.Sketches.hllRegisters(
        spark.read.parquet(s"$sfDir/events.parquet"),
        col("user_id").cast("string"), p = 12)
    }
    dump("mixture_sample") {
      graft.operators.Sampling.mixtureSample(docs, col("source"),
        col("text"), col("doc_id"),
        Map("src0" -> 0.5, "src1" -> 0.25, "src2" -> 0.15,
          "src3" -> 0.10))
    }
    dump("audio_neardup") {
      val aud = graft.operators.Multimodal.synthesizeMedia(
        docs.select((col("doc_id") * 3).as("doc_id"), col("text")))
      graft.operators.Multimodal.audioNearDupPairs(spark, aud,
        maxHamming = 3, window = 4)
    }
    dump("video_neardup") {
      val vid = graft.operators.Multimodal.synthesizeVideo(
        docs.select(col("doc_id"), col("text")), frameRows = 2)
      graft.operators.Multimodal.videoNearDupPairs(spark, vid,
        maxHamming = 3)
    }
    dump("image_neardup") {
      val img = graft.operators.Multimodal.synthesizeMedia(
        docs.select((col("doc_id") * 3 + 2).as("doc_id"), col("text")))
      graft.operators.Multimodal.imageNearDupPairs(spark, img,
        maxHamming = 3)
    }

    // url_curation: the bench's materialized-url fixture
    val urlDir = java.nio.file.Files
      .createTempDirectory("plandump-urls").toString
    graft.SparkEntry.queries("web_url_normalize")(spark, sfDir)
      .join(docs.select(col("doc_id"), col("n_chars")), "doc_id")
      .select(col("doc_id"), col("n_chars"), col("norm_url").as("url"))
      .write.mode("overwrite").parquet(urlDir)
    val urls = spark.read.parquet(urlDir)
    dump("url_curation_dedup") {
      graft.operators.WebCuration.urlDedup(urls).agg(sum(col("cnt")))
    }
    dump("url_curation_cap") {
      graft.operators.WebCuration.capPerDomain(urls, "url",
        negate(col("n_chars")), col("doc_id"), n = 3)
    }

    // ANN shapes need built artifacts — build once (small at sf0.01,
    // acceptable at sf0.1 since explain itself is lazy for search)
    val storeDir = java.nio.file.Files
      .createTempDirectory("plandump-ivf").toString
    val ivfDir = s"$storeDir/ivf"
    val nCent = math.max(2, math.sqrt(emb.count().toDouble).toInt)
    graft.operators.IvfIndex.build(emb, ivfDir, nCent,
      graft.operators.Metric.Cosine)
    val ivfpqDir = s"$storeDir/ivfpq"
    graft.operators.IvfPq.build(spark, ivfDir, ivfpqDir, m = 32, ks = 64)
    val q1: Array[Float] = emb.filter(col("id") === 1L)
      .head().getSeq[Float](1).toArray
    dump("search_approx") {
      graft.operators.IvfIndex.search(spark, ivfDir, q1, 5, nProbe = 4)
    }
    dump("knn_batch_ivf") {
      val queries = emb.limit(100)
        .select(col("id").as("qid"), col("values").as("qvalues"))
      graft.operators.IvfIndex.searchBatch(spark, ivfDir, queries, 10,
        nProbe = 4)
    }
    dump("knn_batch_ivfpq") {
      val queries = emb.limit(100)
        .select(col("id").as("qid"), col("values").as("qvalues"))
      graft.operators.IvfPq.searchBatch(spark, ivfDir, ivfpqDir,
        queries, 10, nProbe = 16, overfetch = 8)
    }
    dump("knn_filtered_ivfpq") {
      val allowed = emb.filter(col("id") % 3 === 0).select(col("id"))
      graft.operators.IvfPq.searchRefined(spark, ivfDir, ivfpqDir, q1,
        10, nProbe = 16, overfetch = 8, allowed = Some(allowed))
    }

    // DSIR standing-model shapes
    val dsirT = graft.operators.TextAnalysis.wordModel(
      docs.filter(col("source") === "src0"))
    val dsirR = graft.operators.TextAnalysis.wordModel(docs)
    dump("dsir_score") {
      graft.operators.TextAnalysis.importanceMilli(docs, dsirT, dsirR)
        .agg(sum(col("imp_milli")))
    }
    dump("langid_score") {
      import spark.implicits._
      val model = graft.operators.TextAnalysis.trainLangId(
        graft.operators.TextAnalysis.LangIdSeedCorpus.toDF("lang", "text"))
      graft.operators.TextAnalysis.scoreLangId(docs, model)
        .agg(sum(col("score_milli")))
    }
    dump("gram_index_probe") {
      val d = s"$storeDir/gramidx"
      graft.operators.GramIndex.build(
        docs.filter(col("doc_id") >= 500), d, k = 4)
      graft.operators.GramIndex.probeSpans(spark, d,
          docs.filter(col("doc_id") < 500))
        .agg(sum(col("span_tokens")))
    }
    dump("lsh_index_probe") {
      val d = s"$storeDir/lshidx"
      graft.operators.LshTextIndex.build(
        docs.filter(col("doc_id") >= 500), d)
      graft.operators.LshTextIndex.probe(spark, d,
        docs.filter(col("doc_id") < 500),
        docs.filter(col("doc_id") >= 500), threshold = 0.9)
    }
    // r19: the containment verify path shares the sorted-sidecar
    // merge kernel with minhash_dedup — dumped so the claim is
    // checkable on its own plan
    dump("containment_pairs") {
      graft.operators.Dedup.containmentPairs(docs, threshold = 0.9)
    }

    spark.stop()
  }
}
