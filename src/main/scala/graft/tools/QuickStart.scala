package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions._
import graft.store.VfsStore

/** Runnable end-to-end example of the public API:
  * `sbt "runMain graft.tools.QuickStart"`.
  * Creates a quantized store, ingests the sf0.001 embeddings table,
  * and runs an exact cosine top-5 against a stored vector — the
  * reference's `/init` → `POST /vectors` → `POST /search` flow as a
  * Spark program.
  */
object QuickStart {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-quickstart")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.registerAll(spark)
    import spark.implicits._

    val root = java.nio.file.Files.createTempDirectory("graft-qs").toString
    println(s"[quickstart] store at $root")

    // /init with dim=64, quantized storage
    val store = VfsStore.create(spark, root, "quickstart", dim = 64,
      quantize = true)

    // bulk ingest the embeddings table (appendBatch = distributed path)
    val emb = spark.read.parquet(args.headOption.getOrElse(
      "/root/testdata/sf0.001/embeddings.parquet"))
    store.appendBatch(emb.select($"embedding".as("values"),
      concat(lit("vec_"), $"vec_id").as("name"),
      array($"label".cast("string")).as("tags")))
    println(s"[quickstart] ingested ${store.countEstimate} vectors (quantized at rest)")

    // record-at-a-time insert + read-your-writes
    val newId = store.insert(Array.fill(64)(0.01f), "probe", Seq("demo"))
    println(s"[quickstart] inserted probe id=$newId, visible pre-flush: " +
      store.getById(newId).map(_.name).getOrElse("MISSING"))

    // exact top-5 cosine kNN around stored vector id=1
    val q = store.getById(1L).get.values
    val top = store.read()
      .select($"id", $"name", vfs_cosine($"values", typedLit(q)).as("distance"))
      .orderBy($"distance".asc, $"id".asc)
      .limit(5)
    top.show(truncate = false)

    // snapshot / restore isolation
    store.snapshot("demo")
    store.insert(Array.fill(64)(0.5f), "post-snapshot", Nil)
    store.flush()
    val before = store.read().count()
    store.restore("demo")
    println(s"[quickstart] rows before restore=$before after=${store.read().count()}")

    // operator surface: single-query search, batch search, IVF probe
    val knnTop = graft.operators.Knn.search(store, q, 5,
      graft.operators.Metric.Cosine)
    println(s"[quickstart] Knn.search top ids: " +
      knnTop.select("id").as[Long].collect().mkString(","))
    val queries = Seq((1L, q)).toDF("qid", "qvalues")
    val batch = graft.operators.Knn.exactBatch(store.read(), queries, 5,
      graft.operators.Metric.Cosine)
    println(s"[quickstart] exactBatch rows: ${batch.count()}")
    val ivfDir = s"$root/ivf"
    graft.operators.IvfIndex.build(store.read(), ivfDir, 8,
      graft.operators.Metric.Cosine)
    val approx = graft.operators.IvfIndex.search(spark, ivfDir, q, 5)
      .select("id").as[Long].collect()
    println(s"[quickstart] IVF top ids: ${approx.mkString(",")}")

    // error taxonomy probes
    try store.insert(Array(1f, 2f), "bad-dim", Nil)
    catch { case e: Exception => println(s"[quickstart] expected: ${e.getMessage}") }
    try store.restore("nope")
    catch { case e: Exception => println(s"[quickstart] expected: ${e.getMessage}") }

    // LLM-pipeline surface: text analysis + dedup on the documents table
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val analyzed = graft.operators.TextAnalysis.analyze(docs)
    println(s"[quickstart] analyzed ${analyzed.count()} docs; sample: " +
      analyzed.select("doc_id", "n_tokens", "lang_pred", "quality_milli")
        .head().toString)
    val nearDups = graft.operators.Dedup.minHashLsh(docs, threshold = 0.9)
    println(s"[quickstart] minhash near-dup pairs (j>=0.9): ${nearDups.count()}")
    val rep = graft.operators.TextAnalysis.repetitionSignals(docs)
    println(s"[quickstart] repetition signals: " +
      rep.select("doc_id", "top2_milli", "dup2_milli").head().toString)
    val packed = graft.operators.Packing.packSequences(docs,
      shard = pmod(col("doc_id"), lit(4L)), orderBy = col("doc_id"),
      nTokens = graft.operators.TextAnalysis.tokenCount(col("text")),
      seqLen = 512)
    // sequences per shard = max(seq_id_last)+1 (counting distinct
    // seq_id would miss middle sequences of multi-sequence docs)
    val nSeqs = packed.groupBy(col("shard"))
      .agg(max(col("seq_id_last")).as("m"))
      .agg(sum(col("m") + 1)).head().getLong(0)
    println(s"[quickstart] packed ${packed.count()} docs into " +
      s"$nSeqs training sequences (4 shards, seqLen=512)")

    // model-free text→vector→semantic-dedup, entirely in-engine
    val textEmb = docs.select(col("doc_id"),
      graft.operators.TextAnalysis.hashEmbedding(col("text"), 64)
        .as("embedding"))
    val semDropped = graft.operators.Dedup.semanticDedup(textEmb,
      graft.operators.Dedup.seedCentroids(textEmb, 8, idCol = "doc_id"),
      tauMilli = 100L, idCol = "doc_id")
    println(s"[quickstart] semantic dedup over hashed-BoW embeddings: " +
      s"${semDropped.count()} near-dup docs dropped")

    // real multimodal round trip: wrap doc payloads in genuine
    // WAV/BMP/PPM containers, parse them back, stats from decoded bytes
    val media = graft.operators.Multimodal.synthesizeMedia(docs.limit(30))
    val stats = graft.operators.Multimodal.decodeStats(spark, media)
      .collect()
    println(s"[quickstart] decoded ${stats.length} media containers " +
      s"(${stats.map(_.format).distinct.sorted.mkString(",")}); " +
      s"sample stats: ${stats.head.productIterator.mkString("[", ",", "]")}")
    // compressed-raster twin: zlib PNG (Inflater + scanline filters)
    val pngStats = graft.operators.Multimodal.decodeStats(spark,
      graft.operators.Multimodal.synthesizePng(docs.limit(10))).collect()
    println(s"[quickstart] decoded ${pngStats.length} png containers; " +
      s"sample: ${pngStats.head.productIterator.mkString("[", ",", "]")}")

    // real resize + video frame sampling over the same containers
    val resized = graft.operators.Multimodal.decodeStats(spark,
      graft.operators.Multimodal.resizeMedia(spark,
        graft.operators.Multimodal.synthesizePng(docs.limit(10)), 2, 3))
      .collect()
    println(s"[quickstart] resized ${resized.length} rasters to 2x3; " +
      s"sample: ${resized.head.productIterator.mkString("[", ",", "]")}")
    val frames = graft.operators.Multimodal.sampleFrames(spark,
      graft.operators.Multimodal.synthesizeVideo(docs.limit(10)),
      everyN = 4).collect()
    println(s"[quickstart] sampled ${frames.length} frames from 10 " +
      s"ppm-stream videos; sample: " +
      s"${frames.head.productIterator.mkString("[", ",", "]")}")

    // one-pass profile + lexical/hybrid retrieval
    val prof = graft.operators.Profile.profile(docs,
      Seq("doc_id", "lang", "source")).collect()
    println(s"[quickstart] profile: " + prof.map(r =>
      s"${r.getString(0)}(distinct=${r.getLong(3)})").mkString(", "))
    val bmTop = graft.operators.TextAnalysis.bm25Scores(docs,
        Seq("vector", "join", "spark"))
      .orderBy(col("score_milli").desc, col("doc_id").asc)
      .limit(10).select("doc_id").collect().map(_.getLong(0)).toSeq
    val fused = graft.operators.Knn.rrfFuse(spark,
      Seq(bmTop, bmTop.reverse)).collect()
    println(s"[quickstart] bm25 top-10 ${bmTop.take(3).mkString(",")}...; " +
      s"rrf fused ${fused.length} ids, best=${fused.head.getLong(0)}")

    // round-6 surfaces: standing text-LSH index, model-based filter,
    // workload BM25 + batch hybrid retrieval, leak-safe splits
    val lshDir = s"$root/lshidx"
    graft.operators.LshTextIndex.build(
      docs.filter($"doc_id" >= 20), lshDir)
    val probeHits = graft.operators.LshTextIndex.probe(spark, lshDir,
      docs.filter($"doc_id" < 20), docs.filter($"doc_id" >= 20),
      threshold = 0.9)
    println(s"[quickstart] standing-LSH delta probe: " +
      s"${probeHits.count()} near-dup pairs (corpus banded once)")
    val clfModel = graft.operators.TextAnalysis.trainTokenClassifier(
      docs.filter($"doc_id" % 5 =!= 0), $"lang" === "en", vocab = 24)
    val clfScores = graft.operators.TextAnalysis.scoreTokenClassifier(
      docs.filter($"doc_id" % 5 === 0), clfModel)
    println(s"[quickstart] token classifier: ${clfModel.count()}-term " +
      s"model, held-out sample: ${clfScores.head().toString}")
    val workload = Seq((1L, "vector"), (1L, "join"), (2L, "spark"))
      .toDF("qid", "term")
    val wScores = graft.operators.TextAnalysis.bm25ScoresTable(docs, workload)
    println(s"[quickstart] workload bm25: ${wScores.count()} " +
      s"(qid, doc) scores from one inverted pass")
    val split = graft.operators.Dedup.leakSafeSplit(docs, nearDups,
      Seq("train" -> 800, "val" -> 100, "test" -> 100))
    println(s"[quickstart] leak-safe split: " +
      split.groupBy("split").count().orderBy("split")
        .collect().map(r => s"${r.getString(0)}=${r.getLong(1)}")
        .mkString(", "))
    val lm = graft.operators.TextAnalysis.lmScore(docs)
      .orderBy(col("mean_invp_milli").desc).limit(1)
      .collect().head
    println(s"[quickstart] bigram LM: most surprising doc " +
      s"${lm.getLong(0)} at ${lm.getLong(2)} milli-inv-p over " +
      s"${lm.getLong(1)} bigrams")
    val bpe = graft.operators.Bpe.trainBpe(docs, nMerges = 50)
    val bpeToks = graft.operators.Bpe.bpeEncode(docs, bpe)
    println(s"[quickstart] bpe: ${bpe.merges.length} merges, " +
      s"${bpeToks.agg(sum(col("n_tokens"))).collect().head.getLong(0)} " +
      s"tokens over ${bpeToks.count()} docs")

    // CDC: snapshot, append, read only the delta (file-pruned)
    val cdcRoot = java.nio.file.Files
      .createTempDirectory("graft-cdc-demo").toString
    val cdcStore = graft.store.VfsStore.create(spark, cdcRoot, "cdc", dim = 4)
    cdcStore.appendBatch(spark.range(3).select(
      array(lit(1f), lit(0f), lit(0f), lit(0f)).as("values"),
      concat(lit("base"), col("id")).as("name"),
      array().cast("array<string>").as("tags")))
    cdcStore.snapshot("base")
    cdcStore.appendBatch(spark.range(2).select(
      array(lit(0f), lit(1f), lit(0f), lit(0f)).as("values"),
      concat(lit("delta"), col("id")).as("name"),
      array().cast("array<string>").as("tags")))
    println(s"[quickstart] changesSince(base): " +
      s"${cdcStore.changesSince("base").count()} delta rows of " +
      s"${cdcStore.read().count()} total")

    // MERGE-by-name upsert: replace one base row, insert one new —
    // survivors untouched, one atomic manifest swap
    cdcStore.upsertBatch(Seq(
      (Seq(0f, 0f, 1f, 0f), "base1", Seq[String]()),
      (Seq(0f, 0f, 0f, 1f), "new0", Seq[String]()))
      .toDF("values", "name", "tags"))
    println(s"[quickstart] upsert: ${cdcStore.read().count()} rows, " +
      "base1 replaced, new0 inserted")

    // ExactSubstr: maximal duplicated spans + the standing gram index
    // vetting a delta against the corpus
    val spans = graft.operators.Dedup.stripDuplicateSpans(docs, k = 4)
    println(s"[quickstart] substring dedup: " +
      s"${spans.agg(sum($"dup_tokens")).head.getLong(0)} duplicated " +
      s"tokens across ${spans.filter($"dup_tokens" > 0).count()} " +
      s"of ${spans.count()} docs")
    val gramDir = java.nio.file.Files
      .createTempDirectory("graft-gramidx").toString
    graft.operators.GramIndex.build(
      docs.filter($"doc_id" >= 100), gramDir, k = 4)
    val probed = graft.operators.GramIndex.probeSpans(spark, gramDir,
      docs.filter($"doc_id" < 100))
    println(s"[quickstart] gram-index probe: ${probed.count()} dup " +
      "spans in the delta, corpus text untouched")

    // streaming gram sink + safe-point compaction: three ingest
    // batches accumulate batch=<id> gram dirs, then compactBatched
    // folds them (earliest-batch provenance kept, replay semantics
    // intact) while the stream is stopped
    val ingDir = java.nio.file.Files
      .createTempDirectory("graft-substr-ing").toString
    (0L to 2L).foreach { b =>
      graft.streaming.Ingest.substringDedupBatch(
        docs.filter($"doc_id" < 90 && pmod($"doc_id", lit(3)) === b)
          .select($"doc_id", $"text"), b, ingDir, k = 4,
        maxDupFrac = 0.5)
    }
    val preDirs = new java.io.File(s"$ingDir/grams").listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("batch="))
    val preDocs = spark.read.parquet(s"$ingDir/docs").count()
    graft.operators.GramIndex.compactBatched(spark, ingDir)
    val postRows = spark.read.parquet(s"$ingDir/grams").count()
    println(s"[quickstart] streaming gram compaction: $preDirs batch " +
      s"dirs -> $postRows folded gram rows, $preDocs survivor docs, " +
      s"k frozen at ${graft.operators.GramIndex.readMeta(ingDir).k}")

    // binary (1-bit) quantization tier: Hamming prefilter then exact
    val qv = emb.filter($"vec_id" === 1L)
      .select($"embedding").head.getSeq[Float](0)
    val qp = graft.functions.vfs_binary_quantize(typedLit(qv))
    val bh = emb.select($"vec_id",
        graft.functions.vfs_hamming(
          graft.functions.vfs_binary_quantize($"embedding"), qp).as("h"))
      .orderBy($"h".asc, $"vec_id".asc).limit(5)
      .collect().map(r => s"${r.getLong(0)}(${r.getLong(1)})")
    println(s"[quickstart] binary-hamming prefilter top-5: " +
      bh.mkString(", "))

    // the two paper filter cascades + survivor selection + packing
    val gp = graft.operators.TextAnalysis.gopherSignals(docs)
      .agg(sum($"gopher_pass"), count(lit(1))).head
    val c4 = graft.operators.TextAnalysis.c4CleanLines(docs)
      .agg(sum($"n_kept"), sum($"page_drop")).head
    println(s"[quickstart] filters: gopher pass ${gp.getLong(0)}/" +
      s"${gp.getLong(1)}, c4 kept ${c4.getLong(0)} lines, " +
      s"${c4.getLong(1)} page drops")
    val surv = graft.operators.Dedup.nearDupSurvivors(docs,
      graft.operators.Dedup.jaccardPairsWithin(docs, "source", 0.9),
      graft.operators.TextAnalysis.qualityMilli($"text"))
    println(s"[quickstart] near-dup survivors: ${surv.count()} of " +
      s"${docs.count()} docs keep their cluster's best copy")
    val bins = graft.operators.Packing.packBinsNextFit(docs,
      shard = pmod($"doc_id", lit(4L)), orderBy = $"doc_id",
      nTokens = graft.operators.TextAnalysis.tokenCount($"text"),
      binCapacity = 256)
    println(s"[quickstart] no-straddle packing: ${docs.count()} docs " +
      s"into ${bins.select($"shard", $"bin_id").distinct().count()} " +
      "bins of 256 tokens, zero straddles by construction")

    // round-11 surface: takedown, trigram langid, audio near-dup,
    // quality-gate TVF
    val lshDelDir = java.nio.file.Files
      .createTempDirectory("graft-lsh-del").toString
    graft.operators.LshTextIndex.build(docs, lshDelDir)
    val victim = docs.select($"doc_id").head.getLong(0)
    val removedBands = graft.operators.LshTextIndex.deleteIds(spark,
      lshDelDir, Seq(victim))
    println(s"[quickstart] takedown: doc $victim -> $removedBands band " +
      s"triples removed, generation " +
      s"${graft.operators.LshTextIndex.readMeta(lshDelDir).generation}")
    val lidModel = graft.operators.TextAnalysis.trainLangId(
      graft.operators.TextAnalysis.LangIdSeedCorpus.toDF("lang", "text"))
    val lid = graft.operators.TextAnalysis.scoreLangId(
        Seq((1L, "bonjour"), (2L, "nachdenken"), (3L, "the cat sat"))
          .toDF("doc_id", "text"), lidModel)
      .orderBy($"doc_id").collect()
      .map(r => s"${r.getLong(0)}=${r.getString(1)}")
    println(s"[quickstart] trigram langid: ${lid.mkString(", ")}")
    val aud = graft.operators.Multimodal.synthesizeMedia(
      docs.select(($"doc_id" * 3).as("doc_id"), $"text"))
    val audPairs = graft.operators.Multimodal.audioNearDupPairs(spark,
      aud, window = 4)
    println(s"[quickstart] audio near-dup: ${audPairs.count()} pairs " +
      "at hamming <= 3 over energy-delta fingerprints")
    graft.functions.registerAll(spark)
    docs.write.mode("overwrite").parquet(s"$lshDelDir/docs")
    val tvfKept = spark.sql(
      s"""SELECT count(*) FROM vfs_quality_gate('$lshDelDir/docs')
         |WHERE gopher_pass = 1 AND page_drop = 0""".stripMargin)
      .head.getLong(0)
    println(s"[quickstart] vfs_quality_gate TVF: $tvfKept docs pass " +
      "both cascades from pure SQL")

    // round-15 surface: new codecs, pHash, quarantine, html, robots
    val webp = graft.operators.Multimodal.decodeStats(spark,
      graft.operators.Multimodal.synthesizeWebp(docs.limit(50))).count()
    val flac = graft.operators.Multimodal.decodeStats(spark,
      graft.operators.Multimodal.synthesizeFlac(docs.limit(50))).count()
    println(s"[quickstart] webp/flac decode: $webp + $flac assets " +
      "through VP8L prefix codes and FLAC frames")
    val corrupted = graft.operators.Multimodal
      .synthesizeMedia(docs.limit(74)
        .select(($"doc_id" * 3 + 2).as("doc_id"), $"text")).toDF()
      .withColumn("media", when($"doc_id" % 37 === 0,
        expr("substring(media, 1, 20)")).otherwise($"media"))
      .as[graft.operators.MediaRecord]
    val q15 = graft.operators.Multimodal
      .imageFingerprintQuarantined(spark, corrupted)
    println(s"[quickstart] quarantine: " +
      s"${q15.filter($"err".isNotNull).count()} corrupt assets " +
      s"routed aside, ${q15.filter($"err".isNull).count()} clean " +
      "fingerprinted (pHash variant: " +
      graft.operators.Multimodal.imagePHash(spark,
        graft.operators.Multimodal.synthesizeMedia(docs.limit(3)
          .select(($"doc_id" * 3 + 2).as("doc_id"), $"text")))
        .count() + " sigs)")
    val page = "<html><head><title>T &amp; U</title></head><body>" +
      "<script>if(a<b){}</script><p>Hello &#87;orld</p>" +
      "<a href=\"https://x.example/1\">l</a></body></html>"
    val htmlRow = spark.sql(
      s"""SELECT vfs_html_title(p) t, vfs_html_text(p) x,
         |  size(vfs_html_links(p)) l
         |FROM (SELECT '${page.replace("'", "''")}' AS p)""".stripMargin)
      .head()
    println(s"[quickstart] html: title='${htmlRow.getString(0)}' " +
      s"text='${htmlRow.getString(1).replace("\n", " / ")}' " +
      s"links=${htmlRow.getInt(2)}")
    val robotsKept = graft.operators.WebCuration.robotsFilter(
      Seq((1L, "https://a.example/ok"), (2L, "https://a.example/private/x"))
        .toDF("doc_id", "url"),
      Seq(("a.example", "User-agent: *\nDisallow: /private\n"))
        .toDF("host", "robots_txt"),
      "graftbot").count()
    println(s"[quickstart] robots gate: $robotsKept of 2 urls fetchable")

    // round-16 web/front-end surfaces: main-content scoping drops the
    // chrome, crawl-delay rides the same most-specific UA walk, PDFs
    // and MP4 containers parse back to their construction
    val chromePage = "<body><nav>Menu Home</nav>" +
      "<form>We use cookies</form><main><p>the prose</p></main>" +
      "<footer>(c) site</footer></body>"
    val mainText = spark.sql(
      s"""SELECT vfs_html_main_text(p) FROM
         |  (SELECT '$chromePage' AS p)""".stripMargin).head().getString(0)
    val delay = spark.sql(
      """SELECT vfs_robots_crawl_delay(
        |  'User-agent: graft\nCrawl-delay: 1.5\nDisallow: /x\n',
        |  'graftbot-news')""".stripMargin).head().getLong(0)
    println(s"[quickstart] main-content: '$mainText' (chrome dropped); " +
      s"crawl-delay via prefix group: ${delay} ms")
    val pdfBack = graft.operators.Pdf
      .synthesizePdf(docs.limit(5))
      .select($"doc_id", graft.functions.vfs_pdf_text($"pdf").as("t"))
      .join(docs.limit(5), "doc_id")
      .filter($"t" === $"text").count()
    val mp4Meta = graft.operators.Mp4.trackMeta(spark,
      graft.operators.Mp4.synthesizeMp4(docs.limit(5))).collect()
    println(s"[quickstart] pdf: $pdfBack of 5 extractions invert the " +
      s"synthesis; mp4: ${mp4Meta.length} tracks walked, " +
      s"${mp4Meta.map(_.getAs[Long]("n_keyframes")).sum} keyframes " +
      "byte-ranged")

    // API-parity surface: the reference's 7 endpoints as library calls
    val api = new graft.api.VfsApi(spark,
      java.nio.file.Files.createTempDirectory("graft-api").toString)
    api.init("""{"vector_dimension": 4, "quantize": true}""")
    val ins = api.register("""{"values":[0.1,0.2,0.3,0.4],"name":"n1","tags":["t"]}""")
    val srch = api.search("""{"values":[0.1,0.2,0.3,0.4],"top_k":1,"search_type":"exact"}""")
    println(s"[quickstart] api insert=${ins.status} search=${srch.status} " +
      s"hit=${srch.body.path("results").get(0).path("id").asLong()}")

    spark.stop()
    println("[quickstart] OK")
  }
}
