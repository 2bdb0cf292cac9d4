package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Warc

/** WARC container parsing: record framing, HTTP response splitting,
  * gzip (multi-member) input, malformed-archive loud failures, and
  * the records() → html-kernel chain. */
class WarcSpec extends AnyFunSuite {

  test("encode/parse duals: warcinfo + request + response round-trip, plain and gzipped") {
    val html = "<p>Hello</p>".getBytes("UTF-8")
    for (gz <- Seq(false, true)) {
      val recs = Warc.parseArchive(
        Warc.encodeArchive("https://x.example/a", html, gzip = gz))
      assert(recs.map(_._1) === Seq("warcinfo", "request", "response"))
      val (_, uri, http) = recs(2)
      assert(uri === "https://x.example/a")
      assert(http.status === 200)
      assert(http.body.toSeq === html.toSeq, s"gzip=$gz")
    }
  }

  test("multi-member gzip: two concatenated gzipped archives parse as one stream (the CommonCrawl layout)") {
    val a = Warc.encodeArchive("https://x/a", "<p>a</p>".getBytes("UTF-8"),
      gzip = true)
    val b = Warc.encodeArchive("https://x/b", "<p>b</p>".getBytes("UTF-8"),
      gzip = true)
    val recs = Warc.parseArchive(a ++ b)
    assert(recs.count(_._1 == "response") === 2)
    assert(recs.filter(_._1 == "response").map(_._2) ===
      Seq("https://x/a", "https://x/b"))
  }

  test("malformed archives fail loudly: bad version line, missing Content-Length, overrunning content, corrupt gzip, bad status line") {
    def loud(bytes: Array[Byte]): Unit = {
      val e = intercept[Exception](Warc.parseArchive(bytes))
      assert(e.getMessage != null && e.getMessage.contains("[GRAFT]"),
        new String(bytes.take(30), "US-ASCII"))
    }
    loud("NOTWARC/1.0\r\n\r\n".getBytes("US-ASCII"))
    loud("WARC/1.0\r\nWARC-Type: response\r\n\r\nbody".getBytes("US-ASCII"))
    loud(("WARC/1.0\r\nWARC-Type: metadata\r\n" +
      "Content-Length: 9999\r\n\r\nshort").getBytes("US-ASCII"))
    loud(("WARC/1.0\r\nWARC-Type: response\r\n" +
      "Content-Length: 7\r\n\r\nnothttp").getBytes("US-ASCII"))
    val ok = Warc.encodeArchive("https://x/a",
      "<p>a</p>".getBytes("UTF-8"), gzip = true)
    ok(10) = (ok(10) ^ 0x55).toByte
    loud(ok)
  }

  test("non-identity bodies decode to identity: chunked, gzip Content-Encoding, chunked over gzip, deflate — byte-identical to the plain page") {
    val html = ("<p>" + ("wiki " * 40) + "</p>").getBytes("UTF-8")
    for (coding <- Seq(0, 1, 2, 3)) {
      val recs = Warc.parseArchive(
        Warc.encodeArchive("https://x/a", html, bodyCoding = coding))
      val (_, _, http) = recs(2)
      assert(http.status === 200)
      assert(http.body.toSeq === html.toSeq, s"bodyCoding=$coding")
    }
    // deflate (zlib-wrapped) content coding decodes too
    val defl = {
      val d = new java.util.zip.Deflater()
      d.setInput(html); d.finish()
      val buf = new Array[Byte](html.length * 2 + 64)
      val n = d.deflate(buf); d.end()
      java.util.Arrays.copyOf(buf, n)
    }
    val content = ("HTTP/1.1 200 OK\r\nContent-Encoding: deflate\r\n" +
      "\r\n").getBytes("US-ASCII") ++ defl
    val rec = (s"WARC/1.0\r\nWARC-Type: response\r\n" +
      s"Content-Length: ${content.length}\r\n\r\n").getBytes("US-ASCII") ++
      content
    val out = Warc.parseArchive(rec)
    assert(out.head._3.body.toSeq === html.toSeq)
  }

  test("body-coding failures are loud: malformed chunk size, overrunning chunk, truncated terminal chunk, unsupported Content-Encoding") {
    def response(body: Array[Byte], headers: String): Array[Byte] = {
      val content = (s"HTTP/1.1 200 OK\r\n$headers\r\n")
        .getBytes("US-ASCII") ++ body
      (s"WARC/1.0\r\nWARC-Type: response\r\n" +
        s"Content-Length: ${content.length}\r\n\r\n")
        .getBytes("US-ASCII") ++ content
    }
    def loud(bytes: Array[Byte]): Unit = {
      val e = intercept[Exception](Warc.parseArchive(bytes))
      assert(e.getMessage != null && e.getMessage.contains("[GRAFT]"))
    }
    val te = "Transfer-Encoding: chunked\r\n"
    loud(response("zz\r\nabc\r\n0\r\n\r\n".getBytes("US-ASCII"), te))
    loud(response("ff\r\nshort\r\n0\r\n\r\n".getBytes("US-ASCII"), te))
    loud(response("5\r\nhello\r\n".getBytes("US-ASCII"), te)) // no 0-chunk
    loud(response("x".getBytes("US-ASCII"), "Content-Encoding: br\r\n"))
    // Transfer-Encoding is a COMMA LIST: 'gzip, chunked' dechunks
    // but the remaining gzip TRANSFER coding is unsupported — loud,
    // not binary garbage into the HTML kernel
    loud(response("3\r\nabc\r\n0\r\n\r\n".getBytes("US-ASCII"),
      "Transfer-Encoding: gzip, chunked\r\n"))
    loud(response("x".getBytes("US-ASCII"),
      "Transfer-Encoding: gzip\r\n"))
    // 'identity' paddings in the list are harmless
    val idBody = "3\r\nabc\r\n0\r\n\r\n"
    val idRecs = Warc.parseArchive(response(
      idBody.getBytes("US-ASCII"),
      "Transfer-Encoding: identity, chunked\r\n"))
    assert(idRecs.head._3.body.toSeq === "abc".getBytes("US-ASCII").toSeq)
    // chunk extensions and trailer fields are tolerated, not errors
    val okBody = "3;graft=1\r\nabc\r\n0\r\nX-Trailer: t\r\n\r\n"
    val recs = Warc.parseArchive(
      response(okBody.getBytes("US-ASCII"), te))
    assert(recs.head._3.body.toSeq === "abc".getBytes("US-ASCII").toSeq)
  }

  test("synthesizeWarc(bodyCodings=true) rotates codings by doc_id % 4 and every page survives the decode walk") {
    val spark = GraftTest.spark
    import spark.implicits._
    val pages = (0L to 7L).map(i =>
      (i, s"https://w.example/$i", s"<p>page $i</p>"))
      .toDF("doc_id", "uri", "html")
    val recs = graft.operators.Warc.records(spark,
        graft.operators.Warc.synthesizeWarc(pages, bodyCodings = true))
      .toDF()
      .filter($"rec_type" === "response")
      .select($"doc_id", decode($"body", "UTF-8").as("page"))
      .as[(Long, String)].collect().sortBy(_._1)
    assert(recs.length === 8)
    recs.foreach { case (id, page) =>
      assert(page === s"<p>page $id</p>", s"doc $id")
    }
  }

  test("response records carry the lowercased Content-Type header; the synthesizer declares charset=utf-8") {
    val recs = Warc.parseArchive(
      Warc.encodeArchive("https://x/a", "<p>a</p>".getBytes("UTF-8")))
    assert(recs(2)._3.contentType === "text/html; charset=utf-8")
    assert(recs(0)._3.contentType === "" &&
      recs(1)._3.contentType === "") // non-response
    val cp = Warc.parseArchive(Warc.encodeArchive("https://x/b",
      "café".getBytes("windows-1252"),
      contentType = "text/html; charset=Windows-1252"))
    assert(cp(2)._3.contentType === "text/html; charset=windows-1252")
    // the charset chain end to end: sniff the header, decode
    assert(graft.functions.CharsetKernel.decode(cp(2)._3.body,
      org.apache.spark.unsafe.types.UTF8String
        .fromString(cp(2)._3.contentType)).toString === "café")
  }

  test("recordsQuarantined: framing damage costs one record and resyncs, undecodable codings keep record identity, corrupt gzip quarantines the archive") {
    val spark = GraftTest.spark
    import spark.implicits._
    val clean = Warc.encodeArchive("https://q/0", "<p>ok</p>".getBytes("UTF-8"))
    // truncate the final response record's body — its extent overruns
    val truncated = java.util.Arrays.copyOf(clean, clean.length - 12)
    // a br-coded response body this walk cannot decode
    val br = Warc.encodeArchive("https://q/2", "xx".getBytes("UTF-8"),
      bodyCoding = 4)
    val corrupt = {
      val gz = Warc.encodeArchive("https://q/3",
        "<p>z</p>".getBytes("UTF-8"), gzip = true)
      gz(10) = (gz(10) ^ 0x55).toByte; gz
    }
    val rows = graft.operators.Warc.recordsQuarantined(spark,
        Seq((0L, clean), (1L, truncated), (2L, br), (3L, corrupt))
          .toDF("doc_id", "warc"))
      .collect().groupBy(_.doc_id)
    // clean: 3 records, no err
    assert(rows(0L).length === 3 && rows(0L).forall(_.err == null))
    // truncated: warcinfo + request survive, ONE err row for the
    // damaged response, nothing after (no phantom resync match)
    assert(rows(1L).count(_.err == null) === 2)
    val terr = rows(1L).filter(_.err != null)
    assert(terr.length === 1 && terr.head.err.contains("overruns"))
    // br: framing fine, body decode quarantined WITH identity kept
    assert(rows(2L).count(_.err == null) === 2)
    val berr = rows(2L).filter(_.err != null).head
    assert(berr.rec_type === "response" &&
      berr.target_uri === "https://q/2" && berr.err.contains("br") &&
      berr.body.isEmpty)
    // corrupt gzip: one err row for the whole archive
    assert(rows(3L).length === 1 && rows(3L).head.err != null)

    // resync: a damaged record in the MIDDLE loses only itself — the
    // next record's WARC/1. magic recovers the walk
    val a = Warc.encodeArchive("https://q/a", "<p>a</p>".getBytes("UTF-8"))
    val b = Warc.encodeArchive("https://q/b", "<p>b</p>".getBytes("UTF-8"))
    val damaged = ("WARC/1.0\r\nWARC-Type: metadata\r\n" +
      "Content-Leng").getBytes("US-ASCII") // no blank line → truncated
    val mixed = a ++ damaged ++ "\r\n\r\n".getBytes("US-ASCII") ++ b
    val recs = Warc.parseArchiveQuarantined(mixed)
    assert(recs.count(_._4 == null) === 6) // both healthy archives
    assert(recs.count(_._4 != null) === 1)
    assert(recs.filter(_._1 == "response").map(_._2) ===
      Seq("https://q/a", "https://q/b"))
  }

  test("warcExtractBatch: clean pages land with charset, damaged records land in quarantine (written even when empty), replays overwrite identically") {
    val spark = GraftTest.spark
    import spark.implicits._
    val page = "<title>T</title><p>body <a href=\"/x\">x</a></p>"
      .getBytes("UTF-8")
    val clean = Warc.encodeArchive("https://s/1", page)
    val br = Warc.encodeArchive("https://s/2", page, bodyCoding = 4)
    val out = java.nio.file.Files
      .createTempDirectory("warc-stream").toString
    val batch = Seq((1L, clean), (2L, br)).toDF("doc_id", "warc")
    graft.streaming.Ingest.warcExtractBatch(batch, 0L, out)
    val docs = spark.read.parquet(s"$out/docs/batch=0")
      .select($"doc_id", $"charset", $"title", $"text")
      .as[(Long, String, String, String)].collect().toSeq
    assert(docs === Seq((1L, "UTF-8", "T", "T\nbody x")))
    val links = spark.read.parquet(s"$out/links/batch=0")
      .select($"doc_id", $"href").as[(Long, String)].collect().toSeq
    assert(links === Seq((1L, "/x")))
    val q = spark.read.parquet(s"$out/quarantine/batch=0")
      .select($"doc_id", $"rec_type", $"target_uri")
      .as[(Long, String, String)].collect().toSeq
    assert(q === Seq((2L, "response", "https://s/2")))
    // replay: identical bytes land (overwrite, not append)
    graft.streaming.Ingest.warcExtractBatch(batch, 0L, out)
    assert(spark.read.parquet(s"$out/docs/batch=0").count() === 1L)
    assert(spark.read.parquet(s"$out/quarantine/batch=0").count() === 1L)
    // an all-clean batch still writes its (empty) quarantine dir —
    // a missing dir must mean "never ran", never "was clean"
    graft.streaming.Ingest.warcExtractBatch(
      Seq((3L, clean)).toDF("doc_id", "warc"), 1L, out)
    assert(spark.read.parquet(s"$out/quarantine/batch=1").count() === 0L)
    // http_status rides the docs sink (error pages must stay
    // filterable corpus-side)
    assert(spark.read.parquet(s"$out/docs/batch=1")
      .select($"http_status").as[Long].collect().toSeq === Seq(200L))
    // a ZERO-ROW trigger still lands all three dirs
    graft.streaming.Ingest.warcExtractBatch(
      Seq.empty[(Long, Array[Byte])].toDF("doc_id", "warc"), 2L, out)
    for (d <- Seq("docs", "links", "quarantine"))
      assert(spark.read.parquet(s"$out/$d/batch=2").count() === 0L, d)
  }

  test("recordsQuarantined resyncs on ANY WARC version magic — a damaged record in a WARC/0.18 archive costs one record, not the rest") {
    def record(version: String, body: String): Array[Byte] =
      (s"WARC/$version\r\nWARC-Type: metadata\r\n" +
        s"Content-Length: ${body.length}\r\n\r\n$body\r\n\r\n")
        .getBytes("US-ASCII")
    val damaged = "WARC/0.18\r\nWARC-Type: metadata\r\nnope\r\n\r\n"
      .getBytes("US-ASCII") // no Content-Length → framing err
    val mixed = record("0.18", "first") ++ damaged ++
      record("0.18", "second")
    val recs = Warc.parseArchiveQuarantined(mixed)
    assert(recs.count(_._4 == null) === 2,
      "both healthy 0.18 records must survive the resync")
    assert(recs.count(_._4 != null) === 1)
  }

  test("records() chains into the HTML kernel; the synthesizer gzips every 3rd archive") {
    val spark = GraftTest.spark
    import spark.implicits._
    val pages = (0L to 5L).map(i =>
      (i, s"https://w.example/$i",
        s"<title>t$i</title><p>body $i &amp; more</p>"))
      .toDF("doc_id", "uri", "html")
    val warcs = Warc.synthesizeWarc(pages)
    // every 3rd archive carries the gzip magic
    val gzFlags = warcs.select($"doc_id",
        substring($"warc", 1, 2) === lit(Array(0x1f.toByte, 0x8b.toByte)))
      .as[(Long, Boolean)].collect().toMap
    assert((0L to 5L).forall(i => gzFlags(i) === (i % 3 == 0)))
    val texts = Warc.records(spark, warcs).toDF()
      .filter($"rec_type" === "response")
      .select($"doc_id", $"target_uri",
        graft.functions.vfs_html_text(decode($"body", "UTF-8")).as("t"))
      .as[(Long, String, String)].collect().sortBy(_._1)
    assert(texts.length === 6)
    assert(texts(4) === ((4L, "https://w.example/4", "t4\nbody 4 & more")))
  }
}
