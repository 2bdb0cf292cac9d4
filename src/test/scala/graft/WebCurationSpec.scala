package graft

import org.apache.spark.sql.functions.explode
import org.apache.spark.unsafe.types.UTF8String

/** RFC 3986 §5 reference resolution: the spec's own §5.4 example
  * tables (normal AND abnormal) verbatim, plus the Spark surface. */
class UrlResolveSpec extends org.scalatest.funsuite.AnyFunSuite {
  private def res(base: String, ref: String): String =
    graft.functions.UrlResolveKernel.resolve(
      UTF8String.fromString(base), UTF8String.fromString(ref)).toString

  private val Base = "http://a/b/c/d;p?q"

  test("RFC 3986 §5.4.1 normal examples, all 24") {
    val cases = Seq(
      "g:h" -> "g:h", "g" -> "http://a/b/c/g",
      "./g" -> "http://a/b/c/g", "g/" -> "http://a/b/c/g/",
      "/g" -> "http://a/g", "//g" -> "http://g",
      "?y" -> "http://a/b/c/d;p?y", "g?y" -> "http://a/b/c/g?y",
      "#s" -> "http://a/b/c/d;p?q#s", "g#s" -> "http://a/b/c/g#s",
      "g?y#s" -> "http://a/b/c/g?y#s", ";x" -> "http://a/b/c/;x",
      "g;x" -> "http://a/b/c/g;x", "g;x?y#s" -> "http://a/b/c/g;x?y#s",
      "" -> "http://a/b/c/d;p?q", "." -> "http://a/b/c/",
      "./" -> "http://a/b/c/", ".." -> "http://a/b/",
      "../" -> "http://a/b/", "../g" -> "http://a/b/g",
      "../.." -> "http://a/", "../../" -> "http://a/",
      "../../g" -> "http://a/g")
    cases.foreach { case (ref, want) =>
      assert(res(Base, ref) === want, s"ref '$ref'")
    }
  }

  test("RFC 3986 §5.4.2 abnormal examples, all 19 (incl. the strict-parser http:g)") {
    val cases = Seq(
      "../../../g" -> "http://a/g", "../../../../g" -> "http://a/g",
      "/./g" -> "http://a/g", "/../g" -> "http://a/g",
      "g." -> "http://a/b/c/g.", ".g" -> "http://a/b/c/.g",
      "g.." -> "http://a/b/c/g..", "..g" -> "http://a/b/c/..g",
      "./../g" -> "http://a/b/g", "./g/." -> "http://a/b/c/g/",
      "g/./h" -> "http://a/b/c/g/h", "g/../h" -> "http://a/b/c/h",
      "g;x=1/./y" -> "http://a/b/c/g;x=1/y",
      "g;x=1/../y" -> "http://a/b/c/y",
      "g?y/./x" -> "http://a/b/c/g?y/./x",
      "g?y/../x" -> "http://a/b/c/g?y/../x",
      "g#s/./x" -> "http://a/b/c/g#s/./x",
      "g#s/../x" -> "http://a/b/c/g#s/../x",
      "http:g" -> "http:g")
    cases.foreach { case (ref, want) =>
      assert(res(Base, ref) === want, s"ref '$ref'")
    }
  }

  test("crawl shapes: empty base path, authority-only base, colon in a path segment, query-bearing base kept only for empty refs") {
    assert(res("https://h.example", "g") === "https://h.example/g")
    assert(res("https://h.example?q", "p/x") === "https://h.example/p/x")
    // "b:c" IS a scheme per the grammar (why authors write ./b:c)
    assert(res("https://h.example/d/", "b:c") === "b:c")
    assert(res("https://h.example/d/", "./b:c") ===
      "https://h.example/d/b:c")
    // scheme is ASCII-only ALPHA: a non-ASCII first segment with a
    // colon is a RELATIVE path, not a scheme (Unicode isLetter would
    // hand the frontier an unfetchable pseudo-absolute URL)
    assert(res("https://h.example/a/", "файл:страница") ===
      "https://h.example/a/файл:страница")
  }

  test("Spark surface: vfs_url_resolve registers for SQL and composes with vfs_html_links into the frontier shape") {
    val spark = GraftTest.spark
    import spark.implicits._
    graft.functions.registerAll(spark)
    val pages = Seq((1L, "https://h.example/a/page",
      "<a href=\"../up\">u</a><a href=\"sib\">s</a>"))
      .toDF("doc_id", "page_url", "html")
    val abs = pages.select(explode(
        graft.functions.vfs_html_links($"html")).as("href"),
        $"page_url")
      .select(graft.functions.vfs_url_resolve($"page_url", $"href")
        .as("abs"))
      .as[String].collect().toSeq
    assert(abs === Seq("https://h.example/up", "https://h.example/a/sib"))
    val viaSql = spark.sql(
      "SELECT vfs_url_resolve('http://a/b/c/d;p?q', '../g')").head()
    assert(viaSql.getString(0) === "http://a/b/g")
  }
}


import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Sampling, WebCuration}

class WebCurationSpec extends AnyFunSuite {
  lazy val spark = GraftTest.spark
  import spark.implicits._

  private def norm(urls: Seq[String]): Seq[Option[String]] =
    urls.zipWithIndex.map { case (u, i) => (i, u) }
      .toDF("i", "url")
      .select(col("i"), WebCuration.normalizeUrl(col("url")).as("n"))
      .orderBy(col("i")).as[(Int, Option[String])].collect()
      .map(_._2).toSeq

  test("normalizeUrl canonicalizes the documented rule list") {
    val cases = Seq(
      // case + www + default port + tracking params + fragment
      "HTTP://WWW.Example.COM:80/Articles/5?utm_source=feed&ref=rss&id=5#sec"
        -> Some("http://example.com/Articles/5?id=5"),
      // https default port + trailing slash
      "https://news.bbc.co.uk:443/posts/7/"
        -> Some("https://news.bbc.co.uk/posts/7"),
      // tracking-only query drops the '?' entirely
      "https://sub.example.org/a/b/?fbclid=xyz"
        -> Some("https://sub.example.org/a/b"),
      // bare host, and root path collapses to bare host
      "https://example.com" -> Some("https://example.com"),
      "https://example.com/" -> Some("https://example.com"),
      // userinfo stripped
      "https://user:pw@example.com/x" -> Some("https://example.com/x"),
      // surviving params byte-sorted
      "https://example.com/post?b=2&a=1&utm_medium=email"
        -> Some("https://example.com/post?a=1&b=2"),
      // NON-default port is a different origin — kept
      "http://example.com:8080/x" -> Some("http://example.com:8080/x"),
      // path case preserved, only scheme+host lower
      "FTP://Example.com/Mixed/Case" -> Some("ftp://example.com/Mixed/Case"),
      // bare tracking param name (no '=') also drops
      "https://example.com/p?ref&x=1" -> Some("https://example.com/p?x=1"),
      // not a URL / empty authority -> NULL key
      "not a url" -> None,
      "http://:80/x" -> None)
    assert(norm(cases.map(_._1)) === cases.map(_._2))
  }

  test("property: normalizeUrl collapses generated fetch noise onto the canonical key, idempotently") {
    import org.scalacheck.Gen
    // the 'u' prefix keeps labels off "www" WITHOUT suchThat — a
    // rejected draw would make Gen.sample return None and flake
    val label = Gen.nonEmptyListOf(Gen.alphaLowerChar)
      .map(l => "u" + l.mkString.take(7))
    val genCase = for {
      scheme <- Gen.oneOf("http", "https")
      labels <- Gen.listOfN(2, label)
      suffix <- Gen.oneOf("com", "org", "co.uk", "io")
      segs <- Gen.listOf(label).map(_.take(3))
      params <- Gen.listOf(Gen.zip(label, Gen.choose(0, 99)))
        .map(_.take(3))
      www <- Gen.oneOf(true, false)
      upcase <- Gen.oneOf(true, false)
      port <- Gen.oneOf(true, false)
      frag <- Gen.oneOf("", "#sec-1")
      slash <- Gen.oneOf("", "/")
      shuffleSeed <- Gen.choose(0, 5)
    } yield {
      val host = labels.mkString(".") + "." + suffix
      val path = segs.map("/" + _).mkString
      // the 'q' prefix keeps generated names off the tracking list
      val kept = params.map { case (k, v) => s"q$k=$v" }
      val canonical = s"$scheme://$host$path" +
        (if (kept.nonEmpty) "?" + kept.sorted.mkString("&") else "")
      val noisyHost = (if (www) "www." else "") +
        (if (upcase) host.toUpperCase else host) +
        (if (port) { if (scheme == "http") ":80" else ":443" } else "")
      val noisyParams = new scala.util.Random(shuffleSeed.toLong)
        .shuffle(kept ++ Seq("utm_source=prop", "fbclid=x", "ref"))
      val noisy = (if (upcase) scheme.toUpperCase else scheme) +
        s"://$noisyHost$path$slash?" + noisyParams.mkString("&") + frag
      (canonical, noisy)
    }
    val cases = Gen.listOfN(300, genCase).sample.get
    val df = cases.toDF("canonical", "noisy")
      .select(col("canonical"),
        WebCuration.normalizeUrl(col("noisy")).as("nn"),
        WebCuration.normalizeUrl(col("canonical")).as("nc"))
    val bad = df.filter(col("nn") =!= col("canonical") ||
      col("nc") =!= col("canonical")).collect()
    assert(bad.isEmpty, s"${bad.length} mismatches, first: " +
      bad.headOption.map(_.toString).getOrElse(""))
  }

  test("urlHost and registeredDomain: eTLD+1 under the frozen suffix head") {
    val got = Seq(
      "https://news.bbc.co.uk/x", "https://WWW.Example.COM/x",
      "https://a.b.example.com/x", "https://example.co.uk/x",
      "http://localhost/x", "https://blog.shop.com.au/x")
      .zipWithIndex.map { case (u, i) => (i, u) }.toDF("i", "url")
      .select(col("i"),
        WebCuration.urlHost(col("url")).as("h"),
        WebCuration.urlDomain(col("url")).as("d"))
      .orderBy(col("i")).as[(Int, String, String)].collect()
      .map(r => (r._2, r._3)).toSeq
    assert(got === Seq(
      ("news.bbc.co.uk", "bbc.co.uk"),
      ("example.com", "example.com"),
      ("a.b.example.com", "example.com"),
      ("example.co.uk", "example.co.uk"),
      ("localhost", "localhost"),
      ("blog.shop.com.au", "shop.com.au")))
  }

  test("urlDedup collapses normalization variants; malformed rows drop") {
    val d = Seq(
      (1L, "HTTP://WWW.Example.COM:80/a?utm_source=x"),
      (2L, "http://example.com/a"),
      (3L, "http://example.com/a/"),
      (4L, "http://example.com/b"),
      (5L, "garbage")).toDF("doc_id", "url")
    val got = WebCuration.urlDedup(d)
      .orderBy(col("keeper")).as[(String, Long, Long)].collect().toSeq
    assert(got === Seq(
      ("http://example.com/a", 1L, 3L),
      ("http://example.com/b", 4L, 1L)))
  }

  test("capPerDomain keeps top-n by rank per registered domain, both paths agree") {
    // two domains (hosts differ, registered domain collapses them),
    // rank = -length (keep LONGEST), tiebreak id
    val d = Seq(
      (1L, "https://a.example.com/x", 10L),
      (2L, "https://b.example.com/y", 30L),
      (3L, "https://example.com/z", 20L),
      (4L, "https://example.com/w", 30L), // ties rank with id 2
      (5L, "https://other.org/q", 5L)).toDF("doc_id", "url", "len")
    def ids(bandCap: Long) = WebCuration.capPerDomain(
        d, "url", -col("len"), col("doc_id"), n = 2, bandCap = bandCap)
      .select(col("doc_id")).as[Long].collect().toSet
    // keep-longest 2 of example.com = ids 2 and 4 (len 30, 30); other.org all
    assert(ids(100000L) === Set(2L, 4L, 5L))
    // bandCap=1 forces the histogram refinement down to shift 0 — the
    // tie group at rank -30 is windowed whole; same answer
    assert(ids(1L) === Set(2L, 4L, 5L))
    // unattributable rows pass through WHOLE (no domain -> no cap),
    // the family-wide stance — the cap must not double as a
    // malformed-URL filter
    val withBad = d.unionByName(
      Seq((9L, "not a url", 999L)).toDF("doc_id", "url", "len"))
    assert(WebCuration.capPerDomain(withBad, "url", -col("len"),
        col("doc_id"), n = 2)
      .select(col("doc_id")).as[Long].collect().toSet ===
      Set(2L, 4L, 5L, 9L))
  }

  test("rankedTopN with a fingerprint rank reproduces stratifiedTopN") {
    val docs = spark.read.parquet(s"${GraftTest.sf001}/documents.parquet")
    val key = col("doc_id").cast("string")
    val a = Sampling.stratifiedTopN(docs, col("source"), key,
        col("doc_id"), n = 3)
      .select(col("doc_id")).as[Long].collect().toSet
    val b = Sampling.rankedTopN(docs, col("source"),
        graft.functions.vfs_fingerprint(key), col("doc_id"), n = 3)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(a === b && a.nonEmpty)
  }

  test("vfs_url_normalize / host / domain are reachable from pure SQL") {
    graft.functions.registerAll(spark)
    // the param-filter lambda must survive the eager Column→Expression
    // conversion the function registry requires
    val got = spark.sql(
      "SELECT vfs_url_normalize('HTTP://WWW.Example.COM:80/a?utm_source=x&b=1#f') AS n, " +
        "vfs_url_host('https://news.bbc.co.uk:443/x') AS h, " +
        "vfs_url_domain('https://news.bbc.co.uk/x') AS d")
      .as[(String, String, String)].head()
    assert(got === (("http://example.com/a?b=1", "news.bbc.co.uk",
      "bbc.co.uk")))
    // the PSL form: snapshot entries ride as string literals
    assert(spark.sql(
      "SELECT vfs_psl_domain('user7.github.io', 'io', 'github.io') AS d")
      .as[String].head() === "user7.github.io")
    val bad = intercept[Exception] {
      spark.sql("SELECT vfs_psl_domain('a.b.com', upper('com'))")
        .collect()
    }
    assert(bad.getMessage.contains("[GRAFT]"))
  }

  test("urlKeepFirst keeps the smallest id per normalized url; null-key rows all pass") {
    val d = Seq(
      (3L, "HTTP://WWW.Example.COM:80/a?utm_source=x"),
      (1L, "http://example.com/a/"),
      (2L, "http://example.com/b"),
      (7L, "garbage"), (8L, "also garbage")).toDF("doc_id", "url")
    val got = WebCuration.urlKeepFirst(d)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(got === Set(1L, 2L, 7L, 8L))
  }

  test("UrlIndex lifecycle: append replay no-op, filterNew excl-batch, compact/delete preserve semantics") {
    import graft.operators.{ArtifactIo, UrlIndex}
    val idx = java.nio.file.Files
      .createTempDirectory("urlidx").toString
    // no artifact -> loud
    intercept[IllegalArgumentException] {
      UrlIndex.filterNew(spark,
        idx, Seq((1L, "http://a.com/x")).toDF("doc_id", "url"))
    }
    UrlIndex.create(spark, idx)
    assert(UrlIndex.exists(idx))
    def docsOf(rows: (Long, String)*) = rows.toDF("doc_id", "url")
    assert(UrlIndex.appendIdempotent(
      docsOf(1L -> "http://a.com/x", 2L -> "HTTP://WWW.A.COM:80/x"),
      idx, 0L))
    // one NORMALIZED key stored for the two variants
    assert(UrlIndex.stored(spark, idx).count() === 1L)
    // replay refused; stale refused
    assert(!UrlIndex.appendIdempotent(
      docsOf(9L -> "http://z.com/q"), idx, 0L))
    assert(UrlIndex.appendIdempotent(
      docsOf(3L -> "http://b.com/y"), idx, 1L))
    // probe: the a.com variant is seen, c.com is new, garbage passes
    val probe = docsOf(10L -> "http://a.com/x/",
      11L -> "http://c.com/z", 12L -> "garbage")
    def newIds(excl: Long = Long.MinValue) =
      UrlIndex.filterNew(spark, idx, probe, excludeBatch = excl)
        .select(col("doc_id")).as[Long].collect().toSet
    assert(newIds() === Set(11L, 12L))
    // excluding batch 0 masks a.com from the probe
    assert(newIds(excl = 0L) === Set(10L, 11L, 12L))
    // compact folds partitions; probe identical; watermark survives
    // so the stale replay is STILL refused
    UrlIndex.compact(spark, idx)
    assert(newIds() === Set(11L, 12L))
    assert(!UrlIndex.appendIdempotent(
      docsOf(9L -> "http://z.com/q"), idx, 1L))
    // takedown: a.com removed -> new again; watermark carried
    assert(UrlIndex.deleteUrls(spark, idx,
      Seq("HTTP://WWW.A.COM/x#frag")) === 1L)
    assert(newIds() === Set(10L, 11L, 12L))
    assert(!UrlIndex.appendIdempotent(
      docsOf(9L -> "http://z.com/q"), idx, 1L))
    // rebuild bumps the generation: the batch sequence restarts via
    // the binding (the watermark FILE survives, no delete window)
    UrlIndex.build(docsOf(20L -> "http://d.com/w"), idx)
    assert(ArtifactIo.fileExists(idx, "_append_batch"))
    assert(UrlIndex.appendIdempotent(
      docsOf(21L -> "http://e.com/v"), idx, 0L))
  }

  test("url ingest stream: keep-first + seen-set probe per batch, replay and crash-sim idempotent") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.{ArtifactIo, UrlIndex}
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files
      .createTempDirectory("url_ingest").toString
    val ck = java.nio.file.Files
      .createTempDirectory("url_ingest_ck").toString
    val stream = MemoryStream[(Long, String)]
    val q = graft.streaming.Ingest.urlIngestStream(
      stream.toDF().toDF("doc_id", "url"), dir, ck,
      trigger = org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("50 milliseconds"))
    try {
      // batch 0: two variants of one page + one unique
      stream.addData((1L, "HTTP://WWW.N.COM:80/p?utm_source=x"),
        (2L, "http://n.com/p"), (3L, "http://m.com/q"))
      q.processAllAvailable()
      assert(spark.read.parquet(s"$dir/docs/batch=0")
        .select($"doc_id").as[Long].collect().toSet === Set(1L, 3L))
      // batch 1: a re-fetch of n.com/p drops; a new page lands
      stream.addData((4L, "http://n.com/p/"), (5L, "http://o.com/r"))
      q.processAllAvailable()
      assert(spark.read.parquet(s"$dir/docs/batch=1")
        .select($"doc_id").as[Long].collect().toSet === Set(5L))
    } finally q.stop()
    // REPLAY batch 1's body: identical survivors, no double store
    graft.streaming.Ingest.urlDedupBatch(
      Seq((4L, "http://n.com/p/"), (5L, "http://o.com/r"))
        .toDF("doc_id", "url"), 1L, dir)
    assert(spark.read.parquet(s"$dir/docs/batch=1")
      .select($"doc_id").as[Long].collect().toSet === Set(5L))
    assert(UrlIndex.stored(spark, s"$dir/urlidx")
      .select($"url").as[String].collect().toSet ===
      Set("http://n.com/p", "http://m.com/q", "http://o.com/r"))
    // CRASH SIM: batch 1's append landed but the watermark write did
    // not — delete the watermark and replay; the probe excludes the
    // batch's own partition, so survivors are identical and the
    // partitions rewrite to the same bytes
    ArtifactIo.deleteFile(s"$dir/urlidx", "_append_batch")
    graft.streaming.Ingest.urlDedupBatch(
      Seq((4L, "http://n.com/p/"), (5L, "http://o.com/r"))
        .toDF("doc_id", "url"), 1L, dir)
    assert(spark.read.parquet(s"$dir/docs/batch=1")
      .select($"doc_id").as[Long].collect().toSet === Set(5L))
    assert(UrlIndex.stored(spark, s"$dir/urlidx")
      .select($"url").as[String].collect().toSet ===
      Set("http://n.com/p", "http://m.com/q", "http://o.com/r"))
    // COMPACT-THEN-REPLAY: compact folds batch 1's keys into the base
    // partition, where excludeBatch can no longer mask them — a
    // replayed COMMITTED batch must be skipped wholesale or the
    // landed survivors would be overwritten with an empty set
    UrlIndex.compact(spark, s"$dir/urlidx")
    graft.streaming.Ingest.urlDedupBatch(
      Seq((4L, "http://n.com/p/"), (5L, "http://o.com/r"))
        .toDF("doc_id", "url"), 1L, dir)
    assert(spark.read.parquet(s"$dir/docs/batch=1")
      .select($"doc_id").as[Long].collect().toSet === Set(5L))
  }

  test("vfs_psl_domain_table: loads the snapshot from a parquet path or table, non-literal/bad sources loud") {
    import graft.operators.WebCuration
    graft.functions.registerAll(spark)
    val tmp = java.nio.file.Files
      .createTempDirectory("psl_table").toString
    WebCuration.PslSampleSnapshot.toDF("suffix")
      .write.mode("overwrite").parquet(s"$tmp/psl")
    Seq(("u1.github.io"), ("news.bbc.co.uk"), ("x.example.com"))
      .toDF("host").createOrReplaceTempView("psl_hosts_v")
    // parquet-path form
    val viaPath = spark.sql("SELECT vfs_psl_domain_table(host, " +
        s"'$tmp/psl') AS d FROM psl_hosts_v ORDER BY host")
      .as[String].collect().toSeq
    assert(viaPath === Seq("bbc.co.uk", "u1.github.io", "example.com"))
    // table-name form resolves through the catalog
    WebCuration.PslSampleSnapshot.toDF("suffix")
      .createOrReplaceTempView("psl_snapshot_v")
    val viaTable = spark.sql("SELECT vfs_psl_domain_table(host, " +
        "'psl_snapshot_v') AS d FROM psl_hosts_v ORDER BY host")
      .as[String].collect().toSeq
    assert(viaTable === viaPath)
    // a table without the suffix column fails with the pslFromTable
    // contract error, not a late schema crash
    Seq("com").toDF("wrong").createOrReplaceTempView("psl_bad_v")
    val eCol = intercept[Exception] {
      spark.sql("SELECT vfs_psl_domain_table(host, 'psl_bad_v') " +
        "FROM psl_hosts_v").collect()
    }
    assert(eCol.getMessage.contains("suffix"))
    // a non-literal source is a plan-time error
    val eLit = intercept[Exception] {
      spark.sql("SELECT vfs_psl_domain_table(host, host) " +
        "FROM psl_hosts_v").collect()
    }
    assert(eLit.getMessage.contains("string literal"))
  }

  test("url ingest with PSL attribution: landed rows carry psl_domain, replay-idempotent, input collision loud") {
    import graft.operators.WebCuration
    val dir = java.nio.file.Files
      .createTempDirectory("url_ingest_psl").toString
    val psl = WebCuration.PslSampleSnapshot
    def batch = Seq(
      (1L, "https://u1.github.io/a"), (2L, "https://u2.github.io/b"),
      (3L, "https://news.bbc.co.uk/c"), (4L, "https://news.bbc.co.uk/c"))
      .toDF("doc_id", "url")
    graft.streaming.Ingest.urlDedupBatch(batch, 0L, dir, psl = psl)
    def landed = spark.read.parquet(s"$dir/docs/batch=0")
      .select($"doc_id", $"psl_domain").as[(Long, String)]
      .collect().toMap
    // the two github.io users are DISTINCT publishers under the PSL
    // snapshot; the duplicate bbc fetch deduped within the batch
    assert(landed === Map(1L -> "u1.github.io", 2L -> "u2.github.io",
      3L -> "bbc.co.uk"))
    // replay: same survivors, same attribution
    graft.streaming.Ingest.urlDedupBatch(batch, 0L, dir, psl = psl)
    assert(landed.size === 3)
    // an input already carrying psl_domain fails loudly instead of
    // silently shadowing the caller's column
    val e = intercept[IllegalArgumentException] {
      graft.streaming.Ingest.urlDedupBatch(
        batch.withColumn("psl_domain", lit("x")), 1L, dir, psl = psl)
    }
    assert(e.getMessage.contains("psl_domain"))
  }

  test("legacy unbound watermark: rebuild migrates it, fresh batch sequence is not refused") {
    import graft.operators.{ArtifactIo, UrlIndex}
    val idx = java.nio.file.Files
      .createTempDirectory("urlidx_legacy").toString
    UrlIndex.create(spark, idx)
    assert(UrlIndex.appendIdempotent(
      Seq((1L, "http://a.com/x")).toDF("doc_id", "url"), idx, 7L))
    // emulate a pre-binding artifact: plain '<batchId>' marker, valid
    // for EVERY generation under the legacy-compat read
    graft.operators.ArtifactIo.writeSmallFileAtomic(idx,
      "_append_batch", "7")
    // rebuild WITHOUT migration would leave '7' live and silently
    // refuse batches 0..7 of the fresh sequence
    UrlIndex.build(Seq((2L, "http://b.com/y")).toDF("doc_id", "url"),
      idx)
    assert(UrlIndex.appendIdempotent(
      Seq((3L, "http://c.com/z")).toDF("doc_id", "url"), idx, 0L),
      "rebuilt artifact must accept batch 0 — the legacy watermark " +
        "was not migrated")
  }

  test("registeredDomainPsl: longest match wins, wildcards honored, head parity on head-covered hosts") {
    val psl = WebCuration.PslSampleSnapshot ++
      Seq("*.compute.example", "ck", "*.ck", "!www.ck")
    def domains(hosts: Seq[String]): Seq[String] =
      hosts.zipWithIndex.map { case (h, i) => (i, h) }.toDF("i", "h")
        .select(col("i"),
          WebCuration.registeredDomainPsl(col("h"), psl).as("d"))
        .orderBy(col("i")).as[(Int, String)].collect().map(_._2).toSeq
    assert(domains(Seq(
      // the hosting-platform suffixes the head is MISSING: distinct
      // publishers stay distinct
      "user1.github.io", "user2.github.io", "deep.user3.github.io",
      "blog.blogspot.com", "app.netlify.app",
      // head-covered hosts (two-level + plain suffixes)
      "news.bbc.co.uk", "a.b.example.com", "example.co.uk",
      // wildcard rule: *.compute.example matches one extra label
      "vm7.zone-a.compute.example",
      // exception rule: !www.ck carves a registrable domain out of
      // *.ck — any host at or under it registers AT www.ck, while
      // other .ck hosts follow the wildcard
      "www.ck", "a.www.ck", "x.foo.ck",
      // host IS a suffix -> returned whole (documented divergence)
      "github.io",
      // unlisted TLD -> two-label fallback; single label passes whole
      "x.y.weirdtld", "localhost")) === Seq(
      "user1.github.io", "user2.github.io", "user3.github.io",
      "blog.blogspot.com", "app.netlify.app",
      "bbc.co.uk", "example.com", "example.co.uk",
      "vm7.zone-a.compute.example",
      "www.ck", "www.ck", "x.foo.ck",
      "github.io",
      "y.weirdtld", "localhost"))
    // head-vs-PSL parity on every head-covered construction: for
    // hosts whose suffix the frozen head lists (or that fall to the
    // two-label rule under BOTH forms), the derivations must agree
    val headHosts = Seq("news.bbc.co.uk", "a.b.shop.com.au",
      "example.co.uk", "www-ish.example.com", "a.example.org",
      "x.y.weirdtld", "localhost", "sub.site.co.jp")
    val both = headHosts.zipWithIndex.map { case (h, i) => (i, h) }
      .toDF("i", "h")
      .select(col("i"), WebCuration.registeredDomain(col("h")).as("head"),
        WebCuration.registeredDomainPsl(col("h"),
          WebCuration.PslSampleSnapshot).as("psl"))
      .orderBy(col("i")).as[(Int, String, String)].collect()
    both.foreach { case (i, head, p) =>
      assert(head === p, s"head/PSL diverge on ${headHosts(i)}")
    }
    // a RAW mixed-case host (not urlHost-derived) must not silently
    // miss every lowercased rule and fall to the two-label fallback:
    // the kernel lowercases and returns the canonical form
    assert(domains(Seq("User7.GitHub.IO", "News.BBC.Co.UK")) ===
      Seq("user7.github.io", "bbc.co.uk"))
    // snapshot validation is loud on junk entries (comments, blanks,
    // wildcard exceptions) — but plain/wildcard/exception rules all
    // load, so the real unmodified list ingests
    graft.functions.PslDomain.validate(Seq("com", "*.ck", "!www.ck"))
    intercept[IllegalArgumentException] {
      graft.functions.PslDomain.validate(Seq("// comment"))
    }
    intercept[IllegalArgumentException] {
      graft.functions.PslDomain.validate(Seq(""))
    }
    intercept[IllegalArgumentException] {
      graft.functions.PslDomain.validate(Seq("!*.ck"))
    }
  }

  test("politenessSchedule: per-host ordinals under each host's crawl-delay, default for undeclared/missing hosts, duplicate robots rows fail loudly") {
    val spark = GraftTest.spark
    import spark.implicits._
    val urls = Seq(
      (1L, "https://slow.example/a"),
      (3L, "https://slow.example/b"),
      (5L, "https://slow.example/c"),
      (2L, "https://fast.example/x"),
      (4L, "https://norobot.example/y"),
      (6L, "https://norobot.example/z")).toDF("doc_id", "url")
    val robots = Seq(
      ("slow.example", "User-agent: graft\nCrawl-delay: 2\n"),
      ("fast.example", "User-agent: *\nCrawl-delay: 0.25\n"),
      // a delay-less group must fall to the DEFAULT, not to 0
      ("nodelay.example", "User-agent: *\nDisallow: /x\n"))
      .toDF("host", "robots_txt")
    val out = graft.operators.WebCuration
      .politenessSchedule(urls, robots, "graftbot", 1000L)
      .select($"doc_id", $"delay_milli", $"fetch_seq",
        $"fetch_at_milli")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    // slow.example: graftbot prefix-matches the graft group, 2000 ms
    assert(out(1L) === ((2000L, 1L, 0L)))
    assert(out(3L) === ((2000L, 2L, 2000L)))
    assert(out(5L) === ((2000L, 3L, 4000L)))
    // fast.example via '*': 250 ms
    assert(out(2L) === ((250L, 1L, 0L)))
    // no robots row: the default delay
    assert(out(4L) === ((1000L, 1L, 0L)))
    assert(out(6L) === ((1000L, 2L, 1000L)))
    // the duplicate-host guard lives INSIDE the plan (no eager
    // validation job) — it fires when the plan executes
    val dup = graft.operators.WebCuration.politenessSchedule(urls,
      robots.unionAll(robots.limit(1)), "graftbot")
    // count() would PRUNE the guarded column — force delay_milli
    val e = intercept[Exception] {
      dup.agg(org.apache.spark.sql.functions.sum($"delay_milli"))
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(m => m.contains("[GRAFT]") &&
      m.contains("duplicate host")))
    // an input already carrying an output column name fails loudly
    // instead of coming back with TWO 'host' columns
    val clash = intercept[IllegalArgumentException] {
      graft.operators.WebCuration.politenessSchedule(
        urls.withColumn("host", $"url"), robots, "graftbot")
    }
    assert(clash.getMessage.contains("'host'"))
  }

  test("politeness at skew: the cap-first contract — capPerDomain bounds the window input, the maxPerHost guard fails loudly on an uncapped mega-host") {
    val spark = GraftTest.spark
    import spark.implicits._
    // one mega-host (60 urls) drowning two small hosts (2 each)
    val urls = ((1L to 60L).map(i =>
        (i, s"https://mega.example/p/$i")) ++
      Seq((100L, "https://a.example/x"), (101L, "https://a.example/y"),
        (102L, "https://b.example/x"), (103L, "https://b.example/y")))
      .toDF("doc_id", "url")
    val robots = Seq(("mega.example", "User-agent: *\nCrawl-delay: 1\n"))
      .toDF("host", "robots_txt")
    // uncapped + maxPerHost: the guard fires AT EXECUTION naming the
    // host — the silent mega-host sort becomes a loud contract
    val uncapped = graft.operators.WebCuration.politenessSchedule(
      urls, robots, "graftbot", maxPerHost = 5L)
    // count() would PRUNE the guarded window column — force it
    val e = intercept[Exception] {
      uncapped.agg(org.apache.spark.sql.functions.sum($"fetch_seq"))
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(m => m.contains("maxPerHost") &&
      m.contains("mega.example")))
    // the documented recipe: cap FIRST, then schedule — the window's
    // input is <= cap per host, so every ordinal respects the guard
    val capped = graft.operators.WebCuration.capPerDomain(
      urls, "url", org.apache.spark.sql.functions.col("doc_id"),
      org.apache.spark.sql.functions.col("doc_id"), n = 5)
    val sched = graft.operators.WebCuration.politenessSchedule(
      capped, robots, "graftbot", maxPerHost = 5L)
    val perHost = sched.groupBy($"host")
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.max($"fetch_seq").as("mx"))
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(perHost("mega.example") === ((5L, 5L))) // capped at 5
    assert(perHost("a.example") === ((2L, 2L)))
    assert(perHost("b.example") === ((2L, 2L)))
    // the kept mega rows are the 5 smallest ranks, scheduled in order
    val mega = sched.filter($"host" === "mega.example")
      .select($"doc_id", $"fetch_seq", $"fetch_at_milli")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(mega.map(_._1).toSeq === (1L to 5L))
    assert(mega.map(_._3).toSeq === Seq(0L, 1000L, 2000L, 3000L, 4000L))
  }

  test("politenessStream: per-host ordinals CONTINUE across micro-batches (state = last seq per host); a static-frame run matches the batch window") {
    val spark = GraftTest.spark
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val robots = Seq(("slow.example", "User-agent: *\nCrawl-delay: 2\n"))
      .toDF("host", "robots_txt")
    val stream = MemoryStream[(Long, String)]
    val out = graft.streaming.Ingest.politenessStream(
      stream.toDF().toDF("doc_id", "url"), robots, "graftbot")
    val q = out.writeStream.format("memory")
      .queryName("polite_stream").outputMode("append").start()
    def landed() = spark.table("polite_stream")
      .select($"doc_id", $"host", $"delay_milli", $"fetch_seq",
        $"fetch_at_milli")
      .as[(Long, String, Long, Long, Long)].collect().sortBy(_._1)
    try {
      stream.addData((1L, "https://slow.example/a"),
        (2L, "https://other.example/x"))
      q.processAllAvailable()
      assert(landed().toSeq === Seq(
        (1L, "slow.example", 2000L, 1L, 0L),
        (2L, "other.example", 1000L, 1L, 0L)))
      // batch 2: slow.example's ordinal CONTINUES (2, 3), offsets
      // keep pricing from the host's crawl start
      stream.addData((3L, "https://slow.example/b"),
        (4L, "https://slow.example/c"))
      q.processAllAvailable()
      assert(landed().toSeq === Seq(
        (1L, "slow.example", 2000L, 1L, 0L),
        (2L, "other.example", 1000L, 1L, 0L),
        (3L, "slow.example", 2000L, 2L, 2000L),
        (4L, "slow.example", 2000L, 3L, 4000L)))
    } finally q.stop()
    // the same fold over a static frame = the batch window exactly
    val urls = Seq((1L, "https://slow.example/a"),
      (2L, "https://other.example/x"), (3L, "https://slow.example/b"),
      (4L, "https://slow.example/c")).toDF("doc_id", "url")
    val bm = graft.streaming.Ingest.politenessStream(urls, robots,
        "graftbot")
      .select($"doc_id", $"fetch_seq", $"fetch_at_milli")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val bw = graft.operators.WebCuration.politenessSchedule(urls,
        robots, "graftbot")
      .select($"doc_id", $"fetch_seq", $"fetch_at_milli")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(bm === bw)
  }

  test("recrawlSetConditional: matched ETag skips despite a moved lastmod, changed validators recrawl, validator-less rows fall back to the sitemap rule; duplicate probes are loud") {
    val spark = GraftTest.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.count
    val entries = Seq(
      (1L, "https://a/e-match", "2026-03-15"), // etag match -> skip
      (2L, "https://a/e-diff", "2026-01-15"),  // etag differ -> keep
      (3L, "https://a/lm-match", "2026-03-15"), // lm match -> skip
      (4L, "https://a/lm-diff", ""),           // lm differ -> keep
      (5L, "https://a/plain-new", "2026-03-15"), // sitemap -> modified
      (6L, "https://a/plain-old", "2026-01-15"), // sitemap -> skip
      (7L, "https://a/new", "2026-03-15"))     // no ledger row
      .toDF("doc_id", "url", "lastmod")
    val lmOld = "Wed, 01 Jan 2026 00:00:00 GMT"
    val crawled = Seq(
      ("https://a/e-match", "2026-02-01", "\"v1\"", ""),
      ("https://a/e-diff", "2026-02-01", "\"v1\"", ""),
      ("https://a/lm-match", "2026-02-01", "", lmOld),
      ("https://a/lm-diff", "2026-02-01", "", lmOld),
      ("https://a/plain-new", "2026-02-01", "", ""),
      ("https://a/plain-old", "2026-02-01", "", ""))
      .toDF("url", "crawled_at", "etag", "last_modified")
    val probes = Seq(
      ("https://a/e-match", "\"v1\"", ""),
      ("https://a/e-diff", "\"v2\"", ""),
      ("https://a/lm-match", "", lmOld),
      ("https://a/lm-diff", "", "Thu, 05 Feb 2026 00:00:00 GMT"))
      .toDF("url", "etag", "last_modified")
    val out = graft.operators.WebCuration
      .recrawlSetConditional(entries, crawled, probes)
      .select($"url", $"recrawl_reason").as[(String, String)]
      .collect().toMap
    assert(out === Map(
      "https://a/e-diff" -> "validator_changed",
      "https://a/lm-diff" -> "validator_changed",
      "https://a/plain-new" -> "modified",
      "https://a/new" -> "never_crawled"))
    // newest-wins ledger: an OLDER duplicate row with a stale etag
    // must not outrank the latest crawl's matching validator
    val crawled2 = crawled.unionAll(
      Seq(("https://a/e-match", "2026-01-01", "\"stale\"", ""))
        .toDF("url", "crawled_at", "etag", "last_modified"))
    val out2 = graft.operators.WebCuration
      .recrawlSetConditional(entries, crawled2, probes)
      .select($"url", $"recrawl_reason").as[(String, String)]
      .collect().toMap
    assert(!out2.contains("https://a/e-match"))
    // duplicate probe rows fail loudly when the plan executes (the
    // decision filter always evaluates the guarded column)
    val dup = graft.operators.WebCuration.recrawlSetConditional(
      entries, crawled, probes.unionAll(
        Seq(("https://a/e-match", "\"x\"", ""))
          .toDF("url", "etag", "last_modified")))
    val e = intercept[Exception] { dup.collect() }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(m => m.contains("[GRAFT]") &&
      m.contains("duplicate probe")))
  }

  test("recrawlStream: stream-static ledger arithmetic + per-URL emitted-guard — a URL resurfacing in a later batch is scheduled once; in-batch duplicates fold deterministically") {
    val spark = GraftTest.spark
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val crawled = Seq(("https://a/p1", "2026-02-01"),
      ("https://a/old", "2026-02-01")).toDF("url", "crawled_at")
    val stream = MemoryStream[(String, String)]
    val out = graft.streaming.Ingest.recrawlStream(
      stream.toDF().toDF("url", "lastmod"), crawled)
    val q = out.writeStream.format("memory")
      .queryName("recrawl_stream").outputMode("append").start()
    def landed() = spark.table("recrawl_stream")
      .select($"url", $"lastmod", $"recrawl_reason")
      .as[(String, String, String)].collect().sortBy(_._1).toSeq
    try {
      stream.addData(("https://a/p1", "2026-03-15"),
        ("https://a/q", ""), ("https://a/old", "2026-01-01"))
      q.processAllAvailable()
      assert(landed() === Seq(
        ("https://a/p1", "2026-03-15", "modified"),
        ("https://a/q", "", "never_crawled")))
      // batch 2: p1 resurfaces (suppressed by state), p2 is new,
      // p3 appears twice in ONE batch (min (lastmod, reason) wins)
      stream.addData(("https://a/p1", "2026-03-15"),
        ("https://a/p2", "2026-03-20"),
        ("https://a/p3", "2026-03-20"), ("https://a/p3", "2026-03-18"))
      q.processAllAvailable()
      assert(landed() === Seq(
        ("https://a/p1", "2026-03-15", "modified"),
        ("https://a/p2", "2026-03-20", "never_crawled"),
        ("https://a/p3", "2026-03-18", "never_crawled"),
        ("https://a/q", "", "never_crawled")))
    } finally q.stop()
    // a static-frame run replays the batch operator (dedup included)
    val entries = Seq(("https://a/p1", "2026-03-15"),
      ("https://a/q", ""), ("https://a/old", "2026-01-01"))
      .toDF("url", "lastmod")
    val bm = graft.streaming.Ingest.recrawlStream(entries, crawled)
      .select($"url", $"recrawl_reason").as[(String, String)]
      .collect().sortBy(_._1).toSeq
    val bw = graft.operators.WebCuration.recrawlSet(entries, crawled)
      .select($"url", $"recrawl_reason").as[(String, String)]
      .collect().sortBy(_._1).toSeq
    assert(bm === bw)
  }

  test("governanceReport: sequential per-stage accounting in one scan — a row dropped early is not re-counted, the unquoted meta opt-out counts, header channel included") {
    val spark = GraftTest.spark
    import spark.implicits._
    val pages = Seq(
      (1L, "https://bad.example/p", "<p>a</p>", null),
      (2L, "https://bad.example/x",
        "<meta name=\"robots\" content=\"noindex\"><p>b</p>", null),
      (3L, "https://r.example/x/1", "<p>c</p>", null),
      (4L, "https://r.example/x/2",
        "<meta name=\"robots\" content=\"noai\"><p>d</p>", null),
      (5L, "https://ok.example/p",
        "<meta name=robots content=noai><p>e</p>", null),
      (6L, "https://ok.example/q", "<p>f</p>", "noai"),
      (7L, "https://ok.example/r", "<p>g</p>", null))
      .toDF("doc_id", "url", "html", "x_robots_tag")
    val robots = Seq(("r.example", "User-agent: *\nDisallow: /x\n"))
      .toDF("host", "robots_txt")
    val rows = graft.operators.WebCuration.governanceReport(pages,
        robots, Seq("bad.example"), "bot",
        headerCol = "x_robots_tag")
      .orderBy($"stage")
      .as[(Long, String, Long, Long, Long)].collect().toSeq
    assert(rows === Seq(
      (1L, "blocklist", 7L, 5L, 2L),
      (2L, "robots", 5L, 3L, 2L),
      (3L, "optout", 3L, 1L, 2L)))
    // an empty corpus reports three zero rows, not NULL arithmetic
    val zero = graft.operators.WebCuration.governanceReport(
        pages.limit(0), robots, Seq("bad.example"), "bot")
      .as[(Long, String, Long, Long, Long)].collect().toSeq
    assert(zero.map(r => (r._1, r._3, r._4, r._5)) ===
      Seq((1L, 0L, 0L, 0L), (2L, 0L, 0L, 0L), (3L, 0L, 0L, 0L)))
  }

  test("politenessStream maxPerHost: an over-cap host fails the stream naming the host (lifetime count, state included); an at-cap host passes") {
    val spark = GraftTest.spark
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val robots = Seq.empty[(String, String)]
      .toDF("host", "robots_txt")
    // at-cap: 2 rows for the host under maxPerHost = 2 pass
    val okUrls = Seq((1L, "https://m.example/a"),
      (2L, "https://m.example/b")).toDF("doc_id", "url")
    val ok = graft.streaming.Ingest.politenessStream(okUrls, robots,
        "bot", maxPerHost = 2L)
      .select($"fetch_seq").as[Long].collect().sorted.toSeq
    assert(ok === Seq(1L, 2L))
    // over-cap in ONE batch (static run): the fold throws naming the
    // host — same contract as the batch window's raise_error
    val e = intercept[Exception] {
      graft.streaming.Ingest.politenessStream(
        okUrls.unionAll(Seq((3L, "https://m.example/c"))
          .toDF("doc_id", "url")),
        robots, "bot", maxPerHost = 2L).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(m => m.contains("[GRAFT]") &&
      m.contains("m.example") && m.contains("maxPerHost=2")))
    // streaming: the cap counts the host's LIFETIME ordinal — batch 1
    // schedules 2 rows, batch 2's single row crosses the cap and
    // fails the query even though the batch itself is under it
    val stream = MemoryStream[(Long, String)]
    val out = graft.streaming.Ingest.politenessStream(
      stream.toDF().toDF("doc_id", "url"), robots, "bot",
      maxPerHost = 2L)
    val q = out.writeStream.format("memory")
      .queryName("polite_cap_stream").outputMode("append").start()
    try {
      stream.addData((1L, "https://m.example/a"),
        (2L, "https://m.example/b"))
      q.processAllAvailable()
      assert(spark.table("polite_cap_stream").count() === 2L)
      stream.addData((3L, "https://m.example/c"))
      val se = intercept[Exception] { q.processAllAvailable() }
      assert(msgs(se).exists(m => m.contains("[GRAFT]") &&
        m.contains("m.example")))
    } finally q.stop()
  }

  test("resolveRedirects: multi-hop chains resolve within maxHops, cycles stay bounded, duplicate edges and column clashes are loud") {
    val spark = GraftTest.spark
    import spark.implicits._
    val urls = Seq((1L, "https://a/1"), (2L, "https://a/2"),
      (3L, "https://a/cyc1"), (4L, "https://a/deep0"))
      .toDF("doc_id", "url")
    val edges = Seq(
      ("https://a/1", "https://a/1b"),          // 1 hop
      ("https://a/cyc1", "https://a/cyc2"),     // 2-cycle
      ("https://a/cyc2", "https://a/cyc1"),
      ("https://a/deep0", "https://a/deep1"),   // 4 hops > maxHops=3
      ("https://a/deep1", "https://a/deep2"),
      ("https://a/deep2", "https://a/deep3"),
      ("https://a/deep3", "https://a/deep4"))
      .toDF("from_url", "to_url")
    val out = graft.operators.WebCuration
      .resolveRedirects(urls, edges, maxHops = 3)
      .select($"doc_id", $"final_url", $"n_hops",
        $"redirect_unresolved")
      .as[(Long, String, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) === (("https://a/1b", 1L, false)))
    assert(out(2L) === (("https://a/2", 0L, false))) // no edge
    // the 2-cycle advances maxHops times and STOPS — the unresolved
    // PROBE (does the final url still redirect?) flags it; n_hops
    // alone cannot (a chain resolving in exactly maxHops also reads
    // maxHops)
    assert(out(3L)._2 === 3L && out(3L)._3 === true)
    assert(out(4L) === (("https://a/deep3", 3L, true))) // clipped
    // a chain resolving in EXACTLY maxHops hops is NOT flagged
    val exact = graft.operators.WebCuration
      .resolveRedirects(Seq((9L, "https://a/deep1"))
        .toDF("doc_id", "url"), edges, maxHops = 3)
      .select($"final_url", $"n_hops", $"redirect_unresolved")
      .as[(String, Long, Boolean)].collect().head
    assert(exact === (("https://a/deep4", 3L, false)))
    // duplicate from-URL edges fail loudly AT EXECUTION (in-plan)
    val dup = graft.operators.WebCuration.resolveRedirects(urls,
      edges.unionAll(Seq(("https://a/1", "https://a/other"))
        .toDF("from_url", "to_url")), maxHops = 2)
    val e = intercept[Exception] {
      dup.agg(org.apache.spark.sql.functions
        .count($"final_url")).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(m => m.contains("[GRAFT]") &&
      m.contains("duplicate from-URL")))
    // output-column clash is loud at construction
    val clash = intercept[IllegalArgumentException] {
      graft.operators.WebCuration.resolveRedirects(
        urls.withColumn("n_hops", $"doc_id"), edges)
    }
    assert(clash.getMessage.contains("n_hops"))
  }

  test("recrawlSet: instant comparison across UTC offsets, newest-wins ledger duplicates, absent/unparseable lastmods are no change evidence") {
    val spark = GraftTest.spark
    import spark.implicits._
    val entries = Seq(
      // changed AFTER the crawl in INSTANT terms, though the string
      // sorts before it (offset -12:00 = 2026-02-02T11:59:59Z)
      (1L, "https://a/offset", "2026-02-01T23:59:59-12:00"),
      (2L, "https://a/stale", "2026-01-01"),
      (3L, "https://a/fresh", "2026-03-01"),
      (4L, "https://a/nolm", ""),
      (5L, "https://a/new", "2026-01-01"),
      (6L, "https://a/garbled", "not-a-date"),
      (7L, "https://a/offmax", "2026-02-01T20:00:00Z"),
      (8L, "https://a/badledger", "2026-02-01"))
      .toDF("doc_id", "url", "lastmod")
    val crawled = Seq(
      ("https://a/offset", "2026-02-02T08:00:00Z"),
      ("https://a/stale", "2026-02-01"),
      // duplicate ledger rows: the LATEST crawl wins — the later
      // 2026-03-05 crawl already saw the 2026-03-01 change
      ("https://a/fresh", "2026-01-01"),
      ("https://a/fresh", "2026-03-05"),
      ("https://a/nolm", "2026-01-01"),
      ("https://a/garbled", "2026-01-01"),
      // the ledger fold is on INSTANTS: the +14:00 row SORTS above
      // the Z row as a string but is the EARLIER instant — the real
      // latest crawl (23:00Z) already covers the 20:00Z change
      ("https://a/offmax", "2026-02-02T01:00:00+14:00"),
      ("https://a/offmax", "2026-02-01T23:00:00Z"),
      // a URL whose ledger dates are ALL garbage has no usable
      // crawl record — conservatively recrawl as never_crawled
      ("https://a/badledger", "corrupt"))
      .toDF("url", "crawled_at")
    val out = graft.operators.WebCuration.recrawlSet(entries, crawled)
      .select($"doc_id", $"recrawl_reason")
      .as[(Long, String)].collect().toMap
    assert(out === Map(1L -> "modified", 5L -> "never_crawled",
      8L -> "never_crawled"))
  }

  test("capPerDomainPsl: per-publisher caps on hosting platforms; pslFromTable gates the collect") {
    import graft.operators.BroadcastGate
    // 4 publishers on github.io, 3 pages each except u1 with 4 — the
    // head form would collapse all 13 rows into ONE github.io domain
    // and cap them to n; the PSL form caps per publisher
    val rows = for {
      u <- 1 to 4
      p <- 1 to (if (u == 1) 4 else 3)
    } yield ((u * 100 + p).toLong, s"https://u$u.github.io/p$p",
      (10 * p).toLong)
    val d = rows.toDF("doc_id", "url", "len")
    val psl = WebCuration.pslFromTable(
      WebCuration.PslSampleSnapshot.toDF("suffix"))
    assert(psl === WebCuration.PslSampleSnapshot.distinct.sorted)
    val kept = WebCuration.capPerDomainPsl(d, "url", psl,
        -col("len"), col("doc_id"), "doc_id", n = 3)
      .select(col("doc_id")).as[Long].collect().toSet
    // u1 drops only its SHORTEST page (101); everyone else keeps all
    assert(kept === rows.map(_._1).toSet - 101L)
    // head form for contrast: one mega-domain, 3 survivors total
    assert(WebCuration.capPerDomain(d, "url", -col("len"),
        col("doc_id"), n = 3)
      .count() === 3L)
    // the gated collect is loud on absurd inputs
    val old = System.getProperty("graft.collect.budget.bytes")
    try {
      System.setProperty("graft.collect.budget.bytes", "64")
      intercept[IllegalArgumentException] {
        WebCuration.pslFromTable(
          WebCuration.PslSampleSnapshot.toDF("suffix"))
      }
    } finally {
      if (old == null) System.clearProperty("graft.collect.budget.bytes")
      else System.setProperty("graft.collect.budget.bytes", old)
    }
  }

  test("capPerDomainPsl plan: the suffix walk never re-inlines into the selection (localCheckpoint barrier)") {
    val d = (1 to 40).map(i =>
      (i.toLong, s"https://u${i % 7}.github.io/p$i", (i * 3).toLong))
      .toDF("doc_id", "url", "len")
    val out = WebCuration.capPerDomainPsl(d, "url",
      WebCuration.PslSampleSnapshot, -col("len"), col("doc_id"),
      "doc_id", n = 2)
    val plan = out.queryExecution.optimizedPlan.toString
    // the selection side reads the ALREADY-EXECUTED slim frame
    // (LogicalRDD from the localCheckpoint) — the vfs_psl_domain
    // walk must appear NOWHERE in the final plan (CollapseProject
    // re-inlined staged Projects before; the checkpoint is the
    // barrier that holds). The pass-through branch derives only the
    // host.
    assert(!plan.contains("vfs_psl_domain"),
      s"PSL walk re-inlined into the selection plan:\n$plan")
    assert(plan.contains("LogicalRDD") || plan.contains("ExistingRDD"),
      s"expected the checkpointed slim frame in:\n$plan")
  }

  test("blocklist filters match between inline and table forms; unattributable rows survive") {
    val d = Seq(
      (1L, "https://news.bbc.co.uk/x"),
      (2L, "https://example.com/y"),
      (3L, "https://spam.example.com/z"),
      (4L, "not a url")).toDF("doc_id", "url")
    val inline = WebCuration.blocklistFilter(d, "url", Seq("example.com"))
      .select(col("doc_id")).as[Long].collect().toSet
    val table = WebCuration.blocklistFilterTable(d, "url",
        Seq("example.com").toDF("domain"), blockedRows = 1L)
      .select(col("doc_id")).as[Long].collect().toSet
    // both example.com hosts drop (registered-domain match); the
    // malformed row has no domain to block on and survives
    assert(inline === Set(1L, 4L))
    assert(table === inline)
  }
}
