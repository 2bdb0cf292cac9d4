package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Verifies the cluster-deploy registration path:
  * spark.sql.extensions=graft.GraftExtensions makes every graft
  * function SQL-available with no driver code. */
class ExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions injects functions at session build") {
    val shared = GraftTest.spark // materialize the shared session first
    // spark.sql.extensions is a STATIC conf — the builder ignores it on
    // an existing SparkContext, so construct the session via the shim
    // (same code path Spark uses for a fresh context).
    try {
      val s = org.apache.spark.sql.graft.shims.sessionWithExtensions(
        shared.sparkContext, new GraftExtensions())
      val r = s.sql(
        """SELECT vfs_euclidean(array(3.0F, 0.0F), array(0.0F, 4.0F)) AS e,
          |       vfs_fingerprint('abc') AS fp,
          |       vfs_quantize(array(0.5F), CAST(127.0 AS FLOAT)) AS q
          |""".stripMargin).head()
      assert(r.getDouble(0) === 5.0)
      assert(r.getLong(1) === graft.functions.TextHash.fnv1a("abc".getBytes))
      assert(r.getSeq[Byte](2).head === 64.toByte)
      // the custom aggregate comes only from the extension (registerAll
      // does not add vfs_topk), proving this session used the injector
      val agg = s.sql(
        """SELECT vfs_topk(d, id, 2) AS t FROM VALUES
          |  (3.0D, 1L), (1.0D, 2L), (2.0D, 3L) AS v(d, id)""".stripMargin)
        .head().getSeq[org.apache.spark.sql.Row](0)
      assert(agg.map(_.getLong(0)) === Seq(2L, 3L))
    } finally {
      SparkSession.setActiveSession(shared)
      SparkSession.setDefaultSession(shared)
    }
  }

  test("registered index routes KnnSearch to an IVF probe, pruned scan") {
    import org.apache.spark.sql.functions.col
    val shared = GraftTest.spark
    val dataPath = s"${GraftTest.sf0001}/embeddings.parquet"
    val ivfPath = java.nio.file.Files
      .createTempDirectory("graft_route_ivf").toString
    try {
      val s = org.apache.spark.sql.graft.shims.sessionWithExtensions(
        shared.sparkContext, new GraftExtensions())
      SparkSession.setActiveSession(s)
      val emb = s.read.parquet(dataPath)
        .select(col("vec_id").as("id"), col("embedding").as("values"))
      graft.operators.IvfIndex.build(emb, ivfPath, nCentroids = 8,
        metric = graft.operators.Metric.Cosine)
      val q = emb.filter(col("id") === 1L).head().getSeq[Float](1).toArray

      graft.plans.IndexRegistry.register(dataPath, ivfPath,
        idCol = "vec_id", vecCol = "embedding")
      s.conf.set("spark.graft.knn.nprobe", "8") // full probe: exact ids
      val routed = graft.plans.KnnPlan.knn(emb, q, 5, "cosine")
      // routed: the plan is the DEFERRED probe leaf (cluster selection
      // at execution time), not a global sort of the base table
      val phys = routed.queryExecution.executedPlan.toString
      assert(phys.contains("IvfProbe"), phys)
      assert(!phys.contains("Sort"), phys)
      val ids = routed.select("id").collect().map(_.getLong(0)).toSeq
      val expect = graft.operators.Knn
        .exact(emb, q, 5, graft.operators.Metric.Cosine)
        .select("id").collect().map(_.getLong(0)).toSeq
      assert(ids === expect) // full probe == exact result
      // a Filter between scan and knn makes the child non-servable:
      // the node must fall through to EXACT over the filtered subset,
      // never route (routing would silently drop the filter)
      val filtered = graft.plans.KnnPlan.knn(
        emb.filter(col("id") > 250L), q, 5, "cosine")
      assert(!filtered.queryExecution.executedPlan.toString
        .contains("IvfProbe"))
      val fids = filtered.select("id").collect().map(_.getLong(0))
      assert(fids.forall(_ > 250L), fids.mkString(","))
      // EXECUTION-TIME probing: append a perfect match for the query
      // AFTER the routed Dataset was analyzed — re-running the SAME
      // Dataset must surface it (the analysis-time expansion froze the
      // directory list and could not)
      import s.implicits._
      graft.operators.IvfIndex.append(
        Seq((9999L, q)).toDF("id", "values"), ivfPath)
      val again = routed.select("id").collect().map(_.getLong(0)).toSeq
      assert(again.contains(9999L),
        s"appended vector invisible to cached plan: $again")
      // a bare rename of a DIFFERENT source column must NOT route: the
      // index was built on (vec_id, embedding), so a query aliasing
      // `label` to "id" would be served silently wrong ids from the
      // index — the registry's recorded source columns force the exact
      // path instead. (Single attribute-only Project, so only the
      // column-name check can reject it.)
      val wrongId = s.read.parquet(dataPath)
        .select(col("label").as("id"), col("embedding").as("values"))
      val wrongPlan = graft.plans.KnnPlan.knn(wrongId, q, 5, "cosine")
      assert(!wrongPlan.queryExecution.executedPlan.toString
        .contains("IvfProbe"))
      // unregistered -> exact path again (scans the base location)
      graft.plans.IndexRegistry.unregister(dataPath)
      val unrouted = graft.plans.KnnPlan.knn(emb, q, 5, "cosine")
      assert(!unrouted.queryExecution.executedPlan.toString
        .contains("IvfProbe"))
    } finally {
      graft.plans.IndexRegistry.clear()
      SparkSession.setActiveSession(shared)
      SparkSession.setDefaultSession(shared)
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(ivfPath))
    }
  }

  test("vfs_knn table-valued function: whole search surface from SQL text") {
    import org.apache.spark.sql.functions.col
    val shared = GraftTest.spark
    val dataPath = s"${GraftTest.sf0001}/embeddings.parquet"
    try {
      val s = org.apache.spark.sql.graft.shims.sessionWithExtensions(
        shared.sparkContext, new GraftExtensions())
      SparkSession.setActiveSession(s)
      val emb = s.read.parquet(dataPath)
        .select(col("vec_id").as("id"), col("embedding").as("values"))
      val q = emb.filter(col("id") === 1L).head().getSeq[Float](1).toArray
      // float-exact literal array: CAST each printed value back to FLOAT
      val qLit = q.map(x => s"CAST('$x' AS FLOAT)")
        .mkString("array(", ", ", ")")
      val sql =
        s"""SELECT vec_id, distance
           |FROM vfs_knn('$dataPath', 5, 'cosine', $qLit,
           |             'embedding', 'vec_id')""".stripMargin
      val got = s.sql(sql).select("vec_id").collect().map(_.getLong(0)).toSeq
      val expect = graft.operators.Knn
        .exact(emb, q, 5, graft.operators.Metric.Cosine)
        .select("id").collect().map(_.getLong(0)).toSeq
      assert(got === expect)
      // non-literal args fail loudly, not silently
      val err = intercept[Exception] {
        s.sql(s"SELECT * FROM vfs_knn('$dataPath', 5, 'cosine', " +
          "array(rand()))").collect()
      }
      assert(err.getMessage.contains("[GRAFT]") ||
        err.getMessage.contains("literal"), err.getMessage)
      // NULL literals are foldable — they must hit the [GRAFT] error,
      // not a bare NullPointerException
      val nullPath = intercept[Exception] {
        s.sql(s"SELECT * FROM vfs_knn(NULL, 5, 'cosine', " +
          "array(CAST('0.1' AS FLOAT)))").collect()
      }
      assert(nullPath.getMessage.contains("[GRAFT]"), nullPath.getMessage)
      val nullQuery = intercept[Exception] {
        s.sql(s"SELECT * FROM vfs_knn('$dataPath', 5, 'cosine', " +
          "CAST(NULL AS ARRAY<FLOAT>))").collect()
      }
      assert(nullQuery.getMessage.contains("[GRAFT]"), nullQuery.getMessage)
      // index internals as temp views: SQL reaches cluster layout
      val ivfPath = java.nio.file.Files
        .createTempDirectory("graft_sql_ivf").toString
      graft.operators.IvfIndex.build(emb, ivfPath, nCentroids = 4,
        graft.operators.Metric.Cosine)
      graft.plans.SqlSurface.registerIndex(s, ivfPath, "vx")
      val nClusters = s.sql(
        "SELECT count(DISTINCT cluster) FROM vx_assignments")
        .head().getLong(0)
      assert(nClusters >= 2L)
      assert(s.sql("SELECT count(*) FROM vx_centroids").head().getLong(0) === 4L)
      // the views are PATH-defined, not listing-snapshots: rows appended
      // AFTER registration must be visible without re-registering
      val before = s.sql("SELECT count(*) FROM vx_assignments")
        .head().getLong(0)
      import s.implicits._
      graft.operators.IvfIndex.append(
        Seq((5000L, q)).toDF("id", "values"), ivfPath)
      val after = s.sql("SELECT count(*) FROM vx_assignments")
        .head().getLong(0)
      assert(after === before + 1, s"stale view: $before -> $after")
      // malformed names/paths fail loudly (SQL-injection guard)
      intercept[IllegalArgumentException] {
        graft.plans.SqlSurface.registerIndex(s, ivfPath, "bad name")
      }
    } finally {
      SparkSession.setActiveSession(shared)
      SparkSession.setDefaultSession(shared)
    }
  }

  test("vfs_bm25 table-valued function: lexical scoring from SQL text") {
    val shared = GraftTest.spark
    val dataPath = s"${GraftTest.sf0001}/documents.parquet"
    try {
      val s = org.apache.spark.sql.graft.shims.sessionWithExtensions(
        shared.sparkContext, new GraftExtensions())
      SparkSession.setActiveSession(s)
      val got = s.sql(
        s"""SELECT doc_id, score_milli
           |FROM vfs_bm25('$dataPath', 'vector join spark')
           |ORDER BY doc_id""".stripMargin)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq
      val expect = graft.operators.TextAnalysis.bm25Scores(
          s.read.parquet(dataPath), Seq("vector", "join", "spark"))
        .orderBy("doc_id")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq
      assert(got.nonEmpty && got === expect)
      // duplicate / empty / NULL term lists fail loudly
      Seq("'vector vector'", "'  '", "NULL").foreach { bad =>
        val err = intercept[Exception] {
          s.sql(s"SELECT * FROM vfs_bm25('$dataPath', $bad)").collect()
        }
        assert(err.getMessage.contains("[GRAFT]"), err.getMessage)
      }
    } finally {
      SparkSession.setActiveSession(shared)
      SparkSession.setDefaultSession(shared)
    }
  }

  test("vfs_ohlc table-valued function: OHLC bars from SQL text, " +
      "NTZ-tolerant, bad args loud") {
    val shared = GraftTest.spark
    val dataPath = s"${GraftTest.sf0001}/events.parquet"
    try {
      val s = org.apache.spark.sql.graft.shims.sessionWithExtensions(
        shared.sparkContext, new GraftExtensions())
      SparkSession.setActiveSession(s)
      val got = s.sql(
        s"""SELECT k, bucket, n, open_c, high_c, low_c, close_c
           |FROM vfs_ohlc('$dataPath', 3600)
           |ORDER BY k, bucket""".stripMargin)
        .collect().map(_.toSeq).toSeq
      import org.apache.spark.sql.functions.col
      val expect = graft.operators.TimeSeries.ohlc(
          graft.operators.TimeNorm.normalize(
            s.read.parquet(dataPath), "ts"),
          col("event_type"), col("ts"), col("value"), stepSec = 3600L)
        .orderBy(col("k"), col("bucket"))
        .collect().map(_.toSeq).toSeq
      assert(got.nonEmpty && got === expect)
      val e = intercept[Exception] {
        s.sql(s"SELECT * FROM vfs_ohlc('$dataPath')").collect()
      }
      assert(e.getMessage.contains("expected 2-5 arguments"))
    } finally {
      SparkSession.setActiveSession(shared)
      SparkSession.setDefaultSession(shared)
    }
  }

  test("vfs_dup_spans table-valued function: ExactSubstr spans from " +
      "SQL text, parity with the DataFrame operator, bad args loud") {
    val shared = GraftTest.spark
    val dataPath = s"${GraftTest.sf0001}/documents.parquet"
    try {
      val s = org.apache.spark.sql.graft.shims.sessionWithExtensions(
        shared.sparkContext, new GraftExtensions())
      SparkSession.setActiveSession(s)
      val got = s.sql(
        s"""SELECT doc_id, span_start, span_end, span_tokens
           |FROM vfs_dup_spans('$dataPath', 3)
           |ORDER BY doc_id, span_start""".stripMargin)
        .collect().map(_.toSeq).toSeq
      import org.apache.spark.sql.functions.col
      val expect = graft.operators.Dedup.duplicateSpans(
          s.read.parquet(dataPath), k = 3)
        .orderBy(col("doc_id"), col("span_start"))
        .collect().map(_.toSeq).toSeq
      assert(got.nonEmpty && got === expect)
      val e = intercept[Exception] {
        s.sql(s"SELECT * FROM vfs_dup_spans('$dataPath')").collect()
      }
      assert(e.getMessage.contains("expected 2-4 arguments"))
    } finally {
      SparkSession.setActiveSession(shared)
      SparkSession.setDefaultSession(shared)
    }
  }

  test("vfs_minhash_pairs table-valued function: LSH near-dup pairs " +
      "from SQL text, parity with the DataFrame operator, bad args loud") {
    val shared = GraftTest.spark
    val dataPath = s"${GraftTest.sf0001}/documents.parquet"
    try {
      val s = org.apache.spark.sql.graft.shims.sessionWithExtensions(
        shared.sparkContext, new GraftExtensions())
      SparkSession.setActiveSession(s)
      val got = s.sql(
        s"""SELECT a, b, jaccard_milli
           |FROM vfs_minhash_pairs('$dataPath', 0.9)
           |ORDER BY a, b""".stripMargin)
        .collect().map(_.toSeq).toSeq
      import org.apache.spark.sql.functions.col
      val expect = graft.operators.Dedup.minHashLsh(
          s.read.parquet(dataPath), threshold = 0.9)
        .orderBy(col("a"), col("b"))
        .collect().map(_.toSeq).toSeq
      assert(got.nonEmpty && got === expect)
      // DOUBLE-typed literal resolves identically to the DECIMAL one
      val gotD = s.sql(
        s"""SELECT a, b, jaccard_milli
           |FROM vfs_minhash_pairs('$dataPath', CAST(0.9 AS DOUBLE))
           |ORDER BY a, b""".stripMargin)
        .collect().map(_.toSeq).toSeq
      assert(gotD === got)
      val e = intercept[Exception] {
        s.sql(s"SELECT * FROM vfs_minhash_pairs('$dataPath')").collect()
      }
      assert(e.getMessage.contains("expected 2-4 arguments"))
      val e2 = intercept[Exception] {
        s.sql(s"SELECT * FROM vfs_minhash_pairs('$dataPath', 1.5)")
          .collect()
      }
      assert(e2.getMessage.contains("(0, 1]"))
    } finally {
      SparkSession.setActiveSession(shared)
      SparkSession.setDefaultSession(shared)
    }
  }

  test("vfs_quality_gate table-valued function: one-scan Gopher+C4 " +
      "cascade from SQL text, parity with the DataFrame operator, " +
      "bad args loud") {
    val shared = GraftTest.spark
    val dataPath = s"${GraftTest.sf0001}/documents.parquet"
    try {
      val s = org.apache.spark.sql.graft.shims.sessionWithExtensions(
        shared.sparkContext, new GraftExtensions())
      SparkSession.setActiveSession(s)
      import org.apache.spark.sql.functions.col
      val got = s.sql(
        s"""SELECT doc_id, n_words, stop_hits, gopher_pass, page_drop,
           |       n_kept, clean_text
           |FROM vfs_quality_gate('$dataPath', 5)
           |ORDER BY doc_id""".stripMargin)
        .collect().map(_.toSeq).toSeq
      val expect = graft.operators.TextAnalysis.qualityGate(
          s.read.parquet(dataPath), minWords = 5)
        .select(col("doc_id"), col("n_words"), col("stop_hits"),
          col("gopher_pass"), col("page_drop"), col("n_kept"),
          col("clean_text"))
        .orderBy(col("doc_id"))
        .collect().map(_.toSeq).toSeq
      assert(got.nonEmpty && got === expect)
      // the default minWords is 5 — one-argument form is identical
      val gotDefault = s.sql(
        s"""SELECT doc_id, n_words, stop_hits, gopher_pass, page_drop,
           |       n_kept, clean_text
           |FROM vfs_quality_gate('$dataPath')
           |ORDER BY doc_id""".stripMargin)
        .collect().map(_.toSeq).toSeq
      assert(gotDefault === got)
      // policy composes as plain SQL over the signal columns
      val kept = s.sql(
        s"""SELECT count(*) FROM vfs_quality_gate('$dataPath')
           |WHERE gopher_pass = 1 AND page_drop = 0""".stripMargin)
        .head().getLong(0)
      assert(kept <= got.length)
      val e = intercept[Exception] {
        s.sql("SELECT * FROM vfs_quality_gate()").collect()
      }
      assert(e.getMessage.contains("expected 1-4 arguments"))
      val e2 = intercept[Exception] {
        s.sql(s"SELECT * FROM vfs_quality_gate('$dataPath', 0)").collect()
      }
      assert(e2.getMessage.contains("minWords must be >= 1"))
    } finally {
      SparkSession.setActiveSession(shared)
      SparkSession.setDefaultSession(shared)
    }
  }

  test("vfs_boilerplate table-valued function: corpus boilerplate " +
      "strip from SQL text, parity with the DataFrame operator, " +
      "bad args loud") {
    val shared = GraftTest.spark
    try {
      val s = org.apache.spark.sql.graft.shims.sessionWithExtensions(
        shared.sparkContext, new GraftExtensions())
      SparkSession.setActiveSession(s)
      import org.apache.spark.sql.functions.col
      // a tiny corpus with real cross-doc boilerplate, persisted so
      // the TVF sees it as a path
      val dir = java.nio.file.Files
        .createTempDirectory("tvf-boiler").toString
      import s.implicits._
      Seq((1L, "NAV\na one"), (2L, "NAV\nb two"), (3L, "NAV\nc three"))
        .toDF("doc_id", "text").write.mode("overwrite").parquet(dir)
      val got = s.sql(
        s"""SELECT doc_id, n_kept, n_dropped, clean_text
           |FROM vfs_boilerplate('$dir', 3)
           |ORDER BY doc_id""".stripMargin)
        .collect().map(_.toSeq).toSeq
      val expect = graft.operators.Dedup.stripBoilerplate(
          s.read.parquet(dir), minDocFreq = 3L)
        .orderBy(col("doc_id"))
        .collect().map(_.toSeq).toSeq
      assert(got.nonEmpty && got === expect)
      assert(got.forall(r => r(3).asInstanceOf[String].contains("NAV")
        == false))
      val e = intercept[Exception] {
        s.sql("SELECT * FROM vfs_boilerplate()").collect()
      }
      assert(e.getMessage.contains("expected 1-4 arguments"))
      val e2 = intercept[Exception] {
        s.sql(s"SELECT * FROM vfs_boilerplate('$dir', 1)").collect()
      }
      assert(e2.getMessage.contains("minDocFreq must be >= 2"))
    } finally {
      SparkSession.setActiveSession(shared)
      SparkSession.setDefaultSession(shared)
    }
  }

  test("vfs_langid table-valued function: trigram language ID from " +
      "SQL text — zero-setup and standing-model forms both match the " +
      "DataFrame operator, bad args loud") {
    val shared = GraftTest.spark
    val dataPath = s"${GraftTest.sf0001}/documents.parquet"
    try {
      val s = org.apache.spark.sql.graft.shims.sessionWithExtensions(
        shared.sparkContext, new GraftExtensions())
      SparkSession.setActiveSession(s)
      import org.apache.spark.sql.functions.col
      val fixture = s.createDataFrame(
        graft.operators.TextAnalysis.LangIdSeedCorpus).toDF("lang", "text")
      val model = graft.operators.TextAnalysis.trainLangId(fixture)
      val expect = graft.operators.TextAnalysis.scoreLangId(
          s.read.parquet(dataPath), model)
        .orderBy(col("doc_id"))
        .collect().map(_.toSeq).toSeq
      // zero-setup form trains on the same built-in fixture
      val got = s.sql(
        s"""SELECT doc_id, lang_pred, matched, score_milli
           |FROM vfs_langid('$dataPath')
           |ORDER BY doc_id""".stripMargin)
        .collect().map(_.toSeq).toSeq
      assert(got.nonEmpty && got === expect)
      // the production form: persist the model, score against the
      // standing artifact — identical output
      val modelPath = java.nio.file.Files
        .createTempDirectory("langid-tvf-model").toString
      model.write.mode("overwrite").parquet(modelPath)
      val gotModel = s.sql(
        s"""SELECT doc_id, lang_pred, matched, score_milli
           |FROM vfs_langid('$dataPath', '$modelPath')
           |ORDER BY doc_id""".stripMargin)
        .collect().map(_.toSeq).toSeq
      assert(gotModel === expect)
      // language policy composes as plain SQL
      val en = s.sql(
        s"""SELECT count(*) FROM vfs_langid('$dataPath')
           |WHERE lang_pred = 'en'""".stripMargin).head().getLong(0)
      assert(en > 0 && en <= got.length)
      val e = intercept[Exception] {
        s.sql("SELECT * FROM vfs_langid()").collect()
      }
      assert(e.getMessage.contains("expected 1-4 arguments"))
    } finally {
      SparkSession.setActiveSession(shared)
      SparkSession.setDefaultSession(shared)
    }
  }

  test("vfs_binary_knn table-valued function: binary coarse tier from " +
      "SQL text, parity with the expression pipeline, bad args loud") {
    val shared = GraftTest.spark
    val dataPath = s"${GraftTest.sf0001}/embeddings.parquet"
    try {
      val s = org.apache.spark.sql.graft.shims.sessionWithExtensions(
        shared.sparkContext, new GraftExtensions())
      SparkSession.setActiveSession(s)
      import org.apache.spark.sql.functions.{col, typedLit}
      val q = s.read.parquet(dataPath)
        .filter(col("vec_id") === 1L).select(col("embedding"))
        .head().getSeq[Float](0)
      val qLit = q.map(x => s"CAST('$x' AS FLOAT)")
        .mkString("array(", ",", ")")
      val got = s.sql(
        s"""SELECT vec_id, ham, distance
           |FROM vfs_binary_knn('$dataPath', $qLit, 25,
           |                    'embedding', 'vec_id')
           |ORDER BY ham, vec_id""".stripMargin)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      // parity with the expression-composed DataFrame pipeline
      val qp = graft.functions.vfs_binary_quantize(typedLit(q))
      val expect = s.read.parquet(dataPath)
        .select(col("vec_id"),
          graft.functions.vfs_hamming(
            graft.functions.vfs_binary_quantize(col("embedding")), qp)
            .as("ham"))
        .orderBy(col("ham").asc, col("vec_id").asc).limit(25)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got.size === 25 && got === expect)
      // self is the nearest candidate at Hamming 0
      assert(got.head === ((1L, 0L)))
      // guards are loud
      val e = intercept[Exception] {
        s.sql(s"SELECT * FROM vfs_binary_knn('$dataPath')").collect()
      }
      assert(e.getMessage.contains("expected 3-5 arguments"))
      val e2 = intercept[Exception] {
        s.sql(s"SELECT * FROM vfs_binary_knn('$dataPath', $qLit, 0)")
          .collect()
      }
      assert(e2.getMessage.contains("positive"))
    } finally {
      SparkSession.setActiveSession(shared)
      SparkSession.setDefaultSession(shared)
    }
  }

  test("vfs_lm_score table-valued function: self-score and standing " +
      "model from SQL text, bad arity loud") {
    val shared = GraftTest.spark
    val dataPath = s"${GraftTest.sf0001}/documents.parquet"
    try {
      val s = org.apache.spark.sql.graft.shims.sessionWithExtensions(
        shared.sparkContext, new GraftExtensions())
      SparkSession.setActiveSession(s)
      val got = s.sql(
        s"""SELECT doc_id, n_bigrams, mean_invp_milli
           |FROM vfs_lm_score('$dataPath')
           |ORDER BY doc_id""".stripMargin)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSeq
      val expect = graft.operators.TextAnalysis.lmScore(
          s.read.parquet(dataPath))
        .orderBy("doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSeq
      assert(got.nonEmpty && got === expect)
      // standing model: scores against a FROZEN half-corpus model
      // differ from self-scoring (proves the path is not ignored)
      val modelDir = java.nio.file.Files
        .createTempDirectory("tvf-lm-model").toString
      graft.operators.TextAnalysis.saveLmModel(
        graft.operators.TextAnalysis.lmModel(
          s.read.parquet(dataPath).filter("doc_id % 2 = 0")), modelDir)
      val cross = s.sql(
        s"""SELECT doc_id, mean_invp_milli
           |FROM vfs_lm_score('$dataPath', '$modelDir')
           |ORDER BY doc_id""".stripMargin)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(cross.size === got.size)
      assert(cross.map(_._2) !== got.map(_._3))
      Seq(s"vfs_lm_score()", s"vfs_lm_score('$dataPath', 'x', 'y', 'z', 'w')",
          s"vfs_lm_score(NULL)").foreach { bad =>
        val err = intercept[Exception] {
          s.sql(s"SELECT * FROM $bad").collect()
        }
        assert(err.getMessage.contains("[GRAFT]") ||
          err.getMessage.contains("UNRESOLV"), err.getMessage)
      }
    } finally {
      SparkSession.setActiveSession(shared)
      SparkSession.setDefaultSession(shared)
    }
  }

  test("KnnSearch plan node resolves through the injected rule") {
    import org.apache.spark.sql.functions.col
    val shared = GraftTest.spark
    try {
      val s = org.apache.spark.sql.graft.shims.sessionWithExtensions(
        shared.sparkContext, new GraftExtensions())
      SparkSession.setActiveSession(s)
      val emb = s.read.parquet(s"${GraftTest.sf0001}/embeddings.parquet")
        .select(col("vec_id").as("id"), col("embedding").as("values"))
      val q = emb.filter(col("id") === 1L).head().getSeq[Float](1).toArray
      val viaPlan = graft.plans.KnnPlan.knn(emb, q, 5, "cosine")
      // the rewrite must plan as TakeOrderedAndProject and agree with
      // the library operator
      val phys = viaPlan.queryExecution.executedPlan.toString
      assert(phys.contains("TakeOrderedAndProject"), phys)
      val ids = viaPlan.select("id").collect().map(_.getLong(0)).toSeq
      val expect = graft.operators.Knn
        .exact(emb, q, 5, graft.operators.Metric.Cosine)
        .select("id").collect().map(_.getLong(0)).toSeq
      assert(ids === expect)
    } finally {
      SparkSession.setActiveSession(shared)
      SparkSession.setDefaultSession(shared)
    }
  }
}
