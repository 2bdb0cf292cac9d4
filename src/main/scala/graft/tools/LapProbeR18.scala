package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-18 stage-level measurement harness (guide §1: measure first,
  * isolate with the noop sink): times individual SUB-STAGES of the
  * most expensive bench entries so optimization effort lands where
  * the CPU actually goes. Wall + process-CPU per lap, 2 reps after a
  * warmup rep, noop sink unless the stage's own action is the shape.
  *
  * Usage: sbt "runMain graft.tools.LapProbeR18 [sfDir] [probe...]"
  */
object LapProbeR18 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val which = args.drop(1).toSet
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
    val osBean = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]

    // GRAFT_LAP_REPS overrides the 2 measured reps — e.g. 20 to keep
    // the JVM busy long enough for a jcmd JFR attach
    val reps = sys.env.get("GRAFT_LAP_REPS").map(_.toInt).getOrElse(2)
    def lap(name: String)(f: => Unit): Unit = {
      if (which.nonEmpty && !which.exists(name.startsWith)) return
      // warmup + measured reps
      f
      val runs = (1 to reps).map { _ =>
        val c0 = osBean.getProcessCpuTime
        val t0 = System.nanoTime()
        f
        ((System.nanoTime() - t0) / 1e9,
          (osBean.getProcessCpuTime - c0) / 1e9)
      }
      val w = runs.map(_._1).min
      val c = runs.map(_._2).min
      println(f"[lap] $name%-42s wall=$w%7.3f s  cpu=$c%7.3f s")
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    import graft.operators._
    import org.apache.spark.sql.graft.shims
    def minhashSig(c: org.apache.spark.sql.Column, n: Int) =
      shims.column(graft.functions.MinHashSig(shims.expression(c), n))
    def wordSetC(c: org.apache.spark.sql.Column) =
      array_distinct(split(trim(lower(c)), "\\s+"))
    def gramHashes(c: org.apache.spark.sql.Column, k: Int) =
      shims.column(graft.functions.WordGramHashes(shims.expression(c), k))

    // ---- pipeline_curate stage split ----
    spark.sparkContext.setJobDescription("curate: stage split")
    val model = {
      import spark.implicits._
      TextAnalysis.trainLangId(
        TextAnalysis.LangIdSeedCorpus.toDF("lang", "text")).cache()
    }
    model.count()

    lap("curate/0-read-only") { noop(docs) }
    lap("curate/1-quality-gate") {
      noop(WorkCols.spread(docs).filter(
        TextAnalysis.qualityMilli(col("text")) >= 650L &&
        TextAnalysis.tokenCount(col("text")).between(20L, 90L)))
    }
    lap("curate/1a-qualityMilli-only") {
      noop(WorkCols.spread(docs)
        .select(TextAnalysis.qualityMilli(col("text")).as("q")))
    }
    lap("curate/1b-tokenCount-only") {
      noop(WorkCols.spread(docs)
        .select(TextAnalysis.tokenCount(col("text")).as("t")))
    }
    lap("curate/2-simhash-sig-only") {
      noop(WorkCols.spread(docs).select(col("doc_id"),
        graft.functions.vfs_simhash(col("text"), 60, portable = true).as("sig")))
    }
    lap("curate/3-simhash-pairs") {
      noop(Dedup.simHashPairsPortable(docs, maxHamming = 3))
    }
    lap("curate/4-langid-score") {
      noop(TextAnalysis.scoreLangId(docs, model))
    }
    lap("curate/5-full-curate") {
      graft.SparkEntry.queries("pipeline_curate_e2e")(spark, sfDir).count()
    }

    // ---- minhash_dedup stage split ----
    lap("minhash/1-sig-only") {
      noop(WorkCols.spread(docs).select(col("doc_id"),
        minhashSig(col("text"), 64).as("sig")))
    }
    lap("minhash/2-banded") {
      noop(WorkCols.spread(docs).select(col("doc_id"),
          minhashSig(col("text"), 64).as("sig"))
        .select(col("doc_id"), col("sig"),
          explode(sequence(lit(0), lit(15))).as("band"))
        .select(col("doc_id"), col("band"),
          slice(col("sig"), col("band") * 4 + 1, lit(4)).as("bsig")))
    }
    lap("minhash/3-full") {
      Dedup.minHashLsh(docs, threshold = 0.8).count()
    }
    lap("minhash/4-wordset-only") {
      noop(docs.select(wordSetC(col("text")).as("w")))
    }

    // ---- url_curation stage split ----
    val urlFixtureDir = java.nio.file.Files
      .createTempDirectory("lap-urls").toString
    graft.SparkEntry.queries("web_url_normalize")(spark, sfDir)
      .join(docs.select(col("doc_id"), col("n_chars")), "doc_id")
      .select(col("doc_id"), col("n_chars"), col("norm_url").as("url"))
      .write.mode("overwrite").parquet(urlFixtureDir)
    val urls = spark.read.parquet(urlFixtureDir)
    lap("url/1-normalize-only") {
      noop(urls.select(WebCuration.normalizeUrl(col("url")).as("n")))
    }
    lap("url/2-domain-only") {
      noop(urls.select(WebCuration.urlDomain(col("url")).as("d")))
    }
    lap("url/3-dedup") {
      WebCuration.urlDedup(urls).agg(sum(col("cnt"))).collect()
    }
    lap("url/4-cap") {
      WebCuration.capPerDomain(urls, "url",
        negate(col("n_chars")), col("doc_id"), n = 3).count()
    }

    // ---- media: jpeg encode vs decode split ----
    lap("jpeg/1-synthesize-only") {
      noop(Multimodal.synthesizeJpegColor(docs).toDF())
    }
    lap("jpeg/2-full-decode-query") {
      graft.SparkEntry.queries("multimodal_jpeg_color")(spark, sfDir)
        .count()
    }
    lap("png/1-synthesize-only") {
      noop(Multimodal.synthesizeMedia(
        docs.select((col("doc_id") * 3 + 2).as("doc_id"), col("text")))
        .toDF())
    }
    lap("imgneardup/2-full") {
      val img = Multimodal.synthesizeMedia(
        docs.select((col("doc_id") * 3 + 2).as("doc_id"), col("text")))
      Multimodal.imageNearDupPairs(spark, img, maxHamming = 3).count()
    }

    // ---- substring_dedup split ----
    lap("substr/1-grams-only") {
      noop(docs.select(col("doc_id"),
        explode(gramHashes(col("text"), 4))
          .as("g")))
    }
    lap("substr/2-full") {
      Dedup.stripDuplicateSpans(docs, k = 4)
        .agg(sum(col("dup_tokens"))).collect()
    }

    // ---- pipeline_warc_curate front-end split (session 2) ----
    lap("warccurate/1-synthesize-only") {
      val html = graft.SparkEntry.htmlPageOf(col("doc_id"), col("text"))
      val pages = docs.select(col("doc_id"),
        concat(lit("https://w"), col("doc_id") % 5,
          lit(".example/p/"), col("doc_id")).as("uri"),
        html.as("html"))
      noop(Warc.synthesizeWarc(pages))
    }
    lap("warccurate/2-records") {
      val html = graft.SparkEntry.htmlPageOf(col("doc_id"), col("text"))
      val pages = docs.select(col("doc_id"),
        concat(lit("https://w"), col("doc_id") % 5,
          lit(".example/p/"), col("doc_id")).as("uri"),
        html.as("html"))
      noop(Warc.records(spark, Warc.synthesizeWarc(pages)).toDF())
    }
    lap("warccurate/3-wet-text") {
      val html = graft.SparkEntry.htmlPageOf(col("doc_id"), col("text"))
      val pages = docs.select(col("doc_id"),
        concat(lit("https://w"), col("doc_id") % 5,
          lit(".example/p/"), col("doc_id")).as("uri"),
        html.as("html"))
      val wet = Warc.records(spark, Warc.synthesizeWarc(pages)).toDF()
        .filter(col("rec_type") === "response")
        .select(col("doc_id"), graft.functions.vfs_html_text(
          graft.functions.vfs_charset_decode(col("body"),
            col("content_type"))).as("text"))
      noop(wet)
    }
    lap("warccurate/4-full") {
      graft.SparkEntry.queries("pipeline_warc_curate")(spark, sfDir).count()
    }

    // ---- boilerplate_strip split (session 2) ----
    lap("boiler/1-pages-only") {
      noop(graft.SparkEntry.boilerplatePages(spark, sfDir))
    }
    lap("boiler/2-full") {
      graft.SparkEntry.queries("dedup_boilerplate_lines")(spark, sfDir)
        .agg(sum(col("n_dropped"))).collect()
    }

    // ---- video/audio neardup split (session 2) ----
    lap("videond/1-synthesize-only") {
      noop(Multimodal.synthesizeVideo(
        docs.select(col("doc_id"), col("text")), frameRows = 2).toDF())
    }
    lap("videond/2-full") {
      graft.SparkEntry.queries("multimodal_video_neardup")(spark, sfDir)
        .count()
    }

    // ---- gram_index_probe split (session 2) ----
    lap("gramidx/full") {
      graft.SparkEntry.queries("dedup_incremental_substring")(spark, sfDir)
        .count()
    }

    // ---- index_build split ----
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("values"))
    val ivfDir = java.nio.file.Files
      .createTempDirectory("lap-ivf").toString + "/ivf"
    val nCent = math.max(2, math.sqrt(emb.count().toDouble).toInt)
    lap("ivfbuild/full") {
      IvfIndex.build(emb, ivfDir, nCent, Metric.Cosine)
    }

    spark.stop()
  }
}
