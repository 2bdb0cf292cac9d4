package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One parsed WARC record: its type, the target URI ("" when the
  * record carries none), the HTTP status (0 for non-response
  * records), and the PAYLOAD — for `response` records the HTTP body
  * after the header block, for everything else the raw content. */
case class WarcRecordRow(doc_id: Long, rec_type: String,
    target_uri: String, http_status: Int, body: Array[Byte])

/** WARC/1.0 container parsing (ISO 28500 — the CommonCrawl archive
  * format), pure JVM: record framing (header lines + Content-Length
  * body + CRLF CRLF separators), per-record header fields, HTTP
  * response splitting (status line, headers, body), and gzip input
  * (java.util.zip reads the member-per-record concatenation CC
  * ships). This is the step BEFORE [[graft.functions.HtmlKernel]]:
  * WARC bytes → response bodies → extracted prose → the curation
  * family.
  *
  * Malformed archives fail LOUDLY with [GRAFT] errors (WARC files
  * come from crawl infrastructure, not from page authors — framing
  * damage means truncation or corruption, never routine dirt; route
  * untrusted inputs through a quarantining caller if needed, the
  * [[Multimodal.decodeStatsQuarantined]] stance). Transfer encodings
  * (chunked) and Content-Encoding are NOT decoded — CC WARC response
  * payloads are stored identity-encoded. */
object Warc {

  /** Parse every record of one archive (plain or gzipped —
    * multi-member gzip is read through, the CC layout). */
  private[graft] def parseArchive(bytes0: Array[Byte]): Seq[(String, String, Int, Array[Byte])] = {
    val bytes =
      if (bytes0.length >= 2 && (bytes0(0) & 0xff) == 0x1f &&
        (bytes0(1) & 0xff) == 0x8b) gunzipAll(bytes0)
      else bytes0
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(String, String, Int, Array[Byte])]
    var pos = 0
    while (pos < bytes.length) {
      // tolerate the inter-record CRLF CRLF separators
      while (pos < bytes.length &&
        (bytes(pos) == '\r' || bytes(pos) == '\n')) pos += 1
      if (pos < bytes.length) {
        val (headers, bodyAt) = headerBlock(bytes, pos)
        require(headers.headOption.exists(_.startsWith("WARC/")),
          "[GRAFT] warc: record must start with a WARC/ version line")
        val fields = headers.tail.flatMap { l =>
          val c = l.indexOf(':')
          if (c > 0) Some(l.substring(0, c).trim.toLowerCase ->
            l.substring(c + 1).trim)
          else None
        }.toMap
        val len = fields.getOrElse("content-length",
          throw new IllegalArgumentException(
            "[GRAFT] warc: record without Content-Length")).toInt
        require(len >= 0 && bodyAt + len <= bytes.length,
          "[GRAFT] warc: content overruns the archive")
        val content = java.util.Arrays.copyOfRange(bytes, bodyAt,
          bodyAt + len)
        val recType = fields.getOrElse("warc-type", "unknown")
        val uri = fields.getOrElse("warc-target-uri", "")
        val (status, payload) =
          if (recType == "response") splitHttp(content)
          else (0, content)
        out += ((recType, uri, status, payload))
        pos = bodyAt + len
      }
    }
    require(out.nonEmpty, "[GRAFT] warc: no records in the archive")
    out.toSeq
  }

  /** ASCII header lines from `from` up to the blank line; returns
    * (lines, index past the blank line). */
  private def headerBlock(bytes: Array[Byte],
      from: Int): (Seq[String], Int) = {
    val lines = scala.collection.mutable.ArrayBuffer.empty[String]
    var pos = from
    var done = false
    while (!done) {
      var eol = pos
      while (eol < bytes.length && bytes(eol) != '\n') eol += 1
      require(eol < bytes.length, "[GRAFT] warc: header block truncated")
      val end = if (eol > pos && bytes(eol - 1) == '\r') eol - 1 else eol
      if (end == pos) done = true // blank line
      else lines += new String(bytes, pos, end - pos,
        StandardCharsets.US_ASCII)
      pos = eol + 1
    }
    (lines.toSeq, pos)
  }

  /** HTTP response content → (status, body after the header block). */
  private def splitHttp(content: Array[Byte]): (Int, Array[Byte]) = {
    val (lines, bodyAt) = headerBlock(content, 0)
    val statusLine = lines.headOption.getOrElse("")
    require(statusLine.startsWith("HTTP/"),
      "[GRAFT] warc: response content without an HTTP status line")
    val parts = statusLine.split(" ")
    require(parts.length >= 2, "[GRAFT] warc: malformed status line")
    (parts(1).toInt,
      java.util.Arrays.copyOfRange(content, bodyAt, content.length))
  }

  private def gunzipAll(bytes: Array[Byte]): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try in.readAllBytes()
    catch { case e: java.io.IOException =>
      throw new IllegalArgumentException(
        s"[GRAFT] warc: corrupt gzip stream (${e.getMessage})")
    } finally in.close()
  }

  /** Explode a frame of WARC archives (idCol, binCol) into records —
    * one per-partition parse kernel, zero shuffle; rows ∝ records.
    * Typical chain:
    * {{{ Warc.records(spark, warcs).filter($"rec_type" === "response")
    *       .select($"target_uri",
    *         vfs_html_text(decode($"body", "UTF-8"))) }}} */
  def records(spark: SparkSession, warcs: DataFrame,
      idCol: String = "doc_id",
      binCol: String = "warc"): Dataset[WarcRecordRow] = {
    import spark.implicits._
    warcs.select(col(idCol).cast("long").as("doc_id"),
        col(binCol).as("warc"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          parseArchive(bytes).map { case (t, uri, status, body) =>
            WarcRecordRow(id, t, uri, status, body)
          }
        }
      }
  }

  /** Build a bona fide single-page WARC archive — warcinfo + request
    * + response records with real framing — for fixtures and the
    * synthesizer (the encoder side every graft codec ships). */
  private[graft] def encodeArchive(uri: String, html: Array[Byte],
      gzip: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def record(headers: Seq[(String, String)],
        content: Array[Byte]): Unit = {
      val sb = new StringBuilder("WARC/1.0\r\n")
      (headers :+ ("Content-Length" -> content.length.toString))
        .foreach { case (k, v) => sb.append(k).append(": ")
          .append(v).append("\r\n") }
      sb.append("\r\n")
      out.write(sb.toString.getBytes(StandardCharsets.US_ASCII))
      out.write(content)
      out.write("\r\n\r\n".getBytes(StandardCharsets.US_ASCII))
    }
    record(Seq("WARC-Type" -> "warcinfo"),
      "software: graft\r\n".getBytes(StandardCharsets.US_ASCII))
    record(Seq("WARC-Type" -> "request", "WARC-Target-URI" -> uri),
      s"GET $uri HTTP/1.1\r\nHost: x\r\n\r\n"
        .getBytes(StandardCharsets.US_ASCII))
    val http = new java.io.ByteArrayOutputStream()
    http.write(("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
      s"Content-Length: ${html.length}\r\n\r\n")
      .getBytes(StandardCharsets.US_ASCII))
    http.write(html)
    record(Seq("WARC-Type" -> "response", "WARC-Target-URI" -> uri),
      http.toByteArray)
    val plain = out.toByteArray
    if (!gzip) plain
    else {
      val bo = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(bo)
      gz.write(plain); gz.close()
      bo.toByteArray
    }
  }

  /** Wrap every document's page in a REAL WARC archive (warcinfo +
    * request + response records; `gzipEvery` > 0 gzips every n-th
    * archive so the gzip path runs at corpus scale). */
  def synthesizeWarc(pages: DataFrame, uriCol: String = "uri",
      htmlCol: String = "html", idCol: String = "doc_id",
      gzipEvery: Int = 3): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._
    WorkCols.spread(pages)
      .select(col(idCol).cast("long").as("doc_id"),
        col(uriCol).cast("string").as("uri"),
        encode(col(htmlCol), "UTF-8").as("html"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, uri, html) =>
          val gz = gzipEvery > 0 && id % gzipEvery == 0
          (id, Warc.encodeArchive(uri, html, gzip = gz))
        }
      }.toDF("doc_id", "warc")
  }
}
