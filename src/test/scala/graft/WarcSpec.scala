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
      val (_, uri, status, body) = recs(2)
      assert(uri === "https://x.example/a")
      assert(status === 200)
      assert(body.toSeq === html.toSeq, s"gzip=$gz")
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
