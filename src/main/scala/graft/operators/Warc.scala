package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One parsed WARC record: its type, the target URI ("" when the
  * record carries none), the HTTP status (0 for non-response
  * records), the response's Content-Type header value lowercased
  * ("" when absent/non-response — the charset sniff's transport
  * tier, [[graft.functions.CharsetKernel]]), the Location header
  * AS WRITTEN ("" when absent — redirect targets are URLs whose
  * case matters, routinely RELATIVE: resolve against target_uri
  * with `vfs_url_resolve`), the conditional-request validators
  * `last_modified`/`etag` AS WRITTEN ("" when absent — ETag
  * comparison is byte-exact per RFC 9110 §8.8.3, so the value must
  * not be normalized; these feed the recrawl ledger,
  * [[WebCuration.recrawlSetConditional]]), the `x_robots_tag`
  * response header AS WRITTEN ("" when absent — the header-level
  * opt-out channel, [[WebCuration.optOutFilter]]'s `headerCol`),
  * and the PAYLOAD — for `response` records the HTTP body after
  * the header block, for everything else the raw content. */
case class WarcRecordRow(doc_id: Long, rec_type: String,
    target_uri: String, http_status: Int, content_type: String,
    location: String, last_modified: String, etag: String,
    x_robots_tag: String, body: Array[Byte])

/** [[WarcRecordRow]] plus an `err` column — the quarantining twin's
  * row shape ([[Warc.recordsQuarantined]]): err = null on success;
  * on failure the row keeps whatever identity the walk recovered
  * (rec_type/target_uri for body-decode failures, "" for framing
  * damage) with an empty body. */
case class WarcRecordQRow(doc_id: Long, rec_type: String,
    target_uri: String, http_status: Int, content_type: String,
    location: String, last_modified: String, etag: String,
    x_robots_tag: String, body: Array[Byte], err: String)

/** The parsed HTTP half of a response record — [[Warc]]'s internal
  * carrier between `splitHttp` and the record rows (status 0 and
  * empty fields for non-response records). */
private[graft] case class HttpParts(status: Int, contentType: String,
    location: String, lastModified: String, etag: String,
    xRobotsTag: String, body: Array[Byte])

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
  * [[Multimodal.decodeStatsQuarantined]] stance). Response bodies
  * are decoded to identity: `Transfer-Encoding: chunked` is
  * dechunked first (RFC 9112 §7.1 — hex size lines, chunk
  * extensions ignored, trailers skipped), then
  * `Content-Encoding: gzip`/`x-gzip`/`deflate`/`zstd` is
  * decompressed (zstd via zstd-jni, the codec Spark itself ships) —
  * CommonCrawl stores payloads identity-encoded, but wget/heritrix
  * archives keep the wire coding and would otherwise flow into the
  * HTML kernel as binary garbage. An encoding this walk cannot
  * decode (`br` — no stock-JVM/Spark-shipped Brotli codec exists)
  * fails loudly naming it. */
object Warc {

  /** Parse every record of one archive (plain or gzipped —
    * multi-member gzip is read through, the CC layout). */
  private[graft] def parseArchive(
      bytes0: Array[Byte]): Seq[(String, String, HttpParts)] = {
    val bytes =
      if (bytes0.length >= 2 && (bytes0(0) & 0xff) == 0x1f &&
        (bytes0(1) & 0xff) == 0x8b) gunzipAll(bytes0)
      else bytes0
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(String, String, HttpParts)]
    var pos = 0
    while (pos < bytes.length) {
      // tolerate the inter-record CRLF CRLF separators
      while (pos < bytes.length &&
        (bytes(pos) == '\r' || bytes(pos) == '\n')) pos += 1
      if (pos < bytes.length) {
        val (recType, uri, content, next) = recordAt(bytes, pos)
        val http =
          if (recType == "response") splitHttp(content)
          else HttpParts(0, "", "", "", "", "", content)
        out += ((recType, uri, http))
        pos = next
      }
    }
    require(out.nonEmpty, "[GRAFT] warc: no records in the archive")
    out.toSeq
  }

  /** One record's FRAMING at `pos`: (rec_type, target_uri, content
    * bytes, index past the record). Loud on framing damage — shared
    * by the loud [[parseArchive]] and the per-record Try of
    * [[parseArchiveQuarantined]]. */
  private def recordAt(bytes: Array[Byte],
      pos: Int): (String, String, Array[Byte], Int) = {
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
    (fields.getOrElse("warc-type", "unknown"),
      fields.getOrElse("warc-target-uri", ""), content, bodyAt + len)
  }

  /** Quarantining variant of [[parseArchive]]: every failure becomes
    * an `err` ROW, never a task failure. A framing failure (damaged
    * version line, missing/overrunning Content-Length) emits one err
    * row and RESYNCS at the next `WARC/<digit>` magic (ANY version) — the rest of a
    * multi-GB archive survives one truncated record; a BODY-decode
    * failure (bad status line, malformed chunking, an unsupported
    * br/zstd coding) keeps the record's identity (type + URI) with
    * an empty body. A corrupt gzip envelope or an empty archive
    * yields a single err row. Success rows carry err = null. */
  private[graft] def parseArchiveQuarantined(bytes0: Array[Byte])
      : Seq[(String, String, HttpParts, String)] = {
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(String, String, HttpParts, String)]
    val empty = HttpParts(0, "", "", "", "", "", Array.emptyByteArray)
    def errOf(e: Throwable): String =
      e.getClass.getSimpleName + ": " +
        Option(e.getMessage).getOrElse("").take(300)
    val bytes =
      try {
        if (bytes0.length >= 2 && (bytes0(0) & 0xff) == 0x1f &&
          (bytes0(1) & 0xff) == 0x8b) gunzipAll(bytes0)
        else bytes0
      } catch { case e: Exception =>
        return Seq(("", "", empty, errOf(e)))
      }
    var pos = 0
    while (pos < bytes.length) {
      while (pos < bytes.length &&
        (bytes(pos) == '\r' || bytes(pos) == '\n')) pos += 1
      if (pos < bytes.length) {
        try {
          val (recType, uri, content, next) = recordAt(bytes, pos)
          try {
            val http =
              if (recType == "response") splitHttp(content)
              else HttpParts(0, "", "", "", "", "", content)
            out += ((recType, uri, http, null))
          } catch { case e: Exception =>
            out += ((recType, uri, empty, errOf(e)))
          }
          pos = next
        } catch { case e: Exception =>
          out += (("", "", empty, errOf(e)))
          pos = resyncAt(bytes, pos + 1)
        }
      }
    }
    if (out.isEmpty)
      out += (("", "", empty,
        "IllegalArgumentException: [GRAFT] warc: no records in the " +
          "archive"))
    out.toSeq
  }

  /** Index of the next `WARC/<digit>` magic at or after `from` (the
    * resync point after a framing failure — any version, matching
    * [[recordAt]]'s own `WARC/` acceptance: a WARC/0.18 heritrix
    * archive must resync too, or one damaged record silently drops
    * every record after it); `bytes.length` when none remains.
    * Payload extents of HEALTHY records are skipped wholesale by the
    * framing walk, so only damaged regions are ever scanned. */
  private def resyncAt(bytes: Array[Byte], from: Int): Int = {
    val magic = "WARC/".getBytes(StandardCharsets.US_ASCII)
    var i = math.max(0, from)
    while (i + magic.length + 1 <= bytes.length) {
      var j = 0
      while (j < magic.length && bytes(i + j) == magic(j)) j += 1
      if (j == magic.length && bytes(i + magic.length) >= '0' &&
        bytes(i + magic.length) <= '9') return i
      i += 1
    }
    bytes.length
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

  /** HTTP response content → [[HttpParts]] (status, lowercased
    * Content-Type value or "", Location / Last-Modified / ETag /
    * X-Robots-Tag headers as written or "", IDENTITY body after
    * the header block): chunked transfer coding removed, then
    * gzip/deflate/zstd content coding decompressed. */
  private def splitHttp(content: Array[Byte]): HttpParts = {
    val (lines, bodyAt) = headerBlock(content, 0)
    val statusLine = lines.headOption.getOrElse("")
    require(statusLine.startsWith("HTTP/"),
      "[GRAFT] warc: response content without an HTTP status line")
    val parts = statusLine.split(" ")
    require(parts.length >= 2, "[GRAFT] warc: malformed status line")
    // header VALUES stay as written — Location is a URL whose case
    // matters; the coding/type lookups lowercase at their use sites
    val fields = lines.tail.flatMap { l =>
      val c = l.indexOf(':')
      if (c > 0) Some(l.substring(0, c).trim.toLowerCase ->
        l.substring(c + 1).trim)
      else None
    }.toMap
    var body = java.util.Arrays.copyOfRange(content, bodyAt,
      content.length)
    // transfer coding is applied LAST on the wire, so it comes off
    // first; only the final coding may be chunked (RFC 9112 §6.1).
    // The header is a COMMA LIST — 'gzip, chunked' dechunks and then
    // still carries the gzip transfer coding, which this walk does
    // not decode as a TRANSFER coding: fail loudly naming it rather
    // than letting binary garbage flow into the HTML kernel
    val te = fields.get("transfer-encoding").toSeq
      .flatMap(_.split(',')).map(_.trim.toLowerCase)
      .filter(c => c.nonEmpty && c != "identity")
    val teRest =
      if (te.lastOption.contains("chunked")) { body = dechunk(body); te.init }
      else te
    teRest.foreach(c => throw new IllegalArgumentException(
      s"[GRAFT] warc: unsupported Transfer-Encoding '$c'"))
    fields.getOrElse("content-encoding", "identity").toLowerCase match {
      case "identity" | "" => ()
      case "gzip" | "x-gzip" => body = gunzipAll(body)
      case "deflate" => body = inflate(body)
      case "zstd" => body = unzstd(body)
      case other => throw new IllegalArgumentException(
        s"[GRAFT] warc: unsupported Content-Encoding '$other'")
    }
    HttpParts(parts(1).toInt,
      fields.getOrElse("content-type", "").toLowerCase,
      fields.getOrElse("location", ""),
      fields.getOrElse("last-modified", ""),
      fields.getOrElse("etag", ""),
      fields.getOrElse("x-robots-tag", ""), body)
  }

  /** Remove the chunked transfer coding (RFC 9112 §7.1): hex size
    * line (chunk extensions after ';' ignored) + data + CRLF,
    * terminated by a zero-size chunk; trailer fields are skipped. */
  private[graft] def dechunk(body: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(body.length)
    var pos = 0
    var done = false
    while (!done) {
      var eol = pos
      while (eol < body.length && body(eol) != '\n') eol += 1
      require(eol < body.length, "[GRAFT] warc: chunk size line truncated")
      val end = if (eol > pos && body(eol - 1) == '\r') eol - 1 else eol
      val line = new String(body, pos, end - pos, StandardCharsets.US_ASCII)
      val semi = line.indexOf(';')
      val sizeHex = (if (semi >= 0) line.substring(0, semi) else line).trim
      val size = try Integer.parseInt(sizeHex, 16)
        catch { case _: NumberFormatException =>
          throw new IllegalArgumentException(
            s"[GRAFT] warc: malformed chunk size '$sizeHex'")
        }
      require(size >= 0, "[GRAFT] warc: negative chunk size")
      pos = eol + 1
      if (size == 0) done = true // trailers (if any) are skipped
      else {
        require(pos + size <= body.length,
          "[GRAFT] warc: chunk data overruns the body")
        out.write(body, pos, size)
        pos += size
        // the CRLF after the chunk data
        if (pos < body.length && body(pos) == '\r') pos += 1
        if (pos < body.length && body(pos) == '\n') pos += 1
      }
    }
    out.toByteArray
  }

  /** Apply the chunked transfer coding — the encoder twin of
    * [[dechunk]]. Rotating chunk sizes force multi-chunk reassembly
    * and the first chunk carries an extension (`;graft=1`) so the
    * decoder's extension-skip path runs on every fixture. */
  private[graft] def chunkEncode(body: Array[Byte]): Array[Byte] = {
    val sizes = Array(7, 13, 29)
    val out = new java.io.ByteArrayOutputStream(body.length + 64)
    def ascii(s: String): Unit =
      out.write(s.getBytes(StandardCharsets.US_ASCII))
    var pos = 0
    var i = 0
    while (pos < body.length) {
      val n = math.min(sizes(i % sizes.length), body.length - pos)
      ascii(Integer.toHexString(n) + (if (i == 0) ";graft=1" else "") +
        "\r\n")
      out.write(body, pos, n)
      ascii("\r\n")
      pos += n
      i += 1
    }
    ascii("0\r\n\r\n")
    out.toByteArray
  }

  private def inflate(bytes: Array[Byte]): Array[Byte] = {
    // some servers send raw-deflate under the 'deflate' token; retry
    // nowrap on a zlib-header failure (the curl/browser behavior)
    def run(nowrap: Boolean): Array[Byte] = {
      val inf = new java.util.zip.Inflater(nowrap)
      inf.setInput(bytes)
      val out = new java.io.ByteArrayOutputStream(bytes.length * 4)
      val buf = new Array[Byte](8192)
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n == 0 && inf.needsInput())
          throw new java.util.zip.DataFormatException("truncated")
        out.write(buf, 0, n)
      }
      inf.end()
      out.toByteArray
    }
    try run(nowrap = false)
    catch { case _: java.util.zip.DataFormatException =>
      try run(nowrap = true)
      catch { case e: java.util.zip.DataFormatException =>
        throw new IllegalArgumentException(
          s"[GRAFT] warc: corrupt deflate body (${e.getMessage})")
      }
    }
  }

  /** Decode a `Content-Encoding: zstd` body via zstd-jni (the codec
    * Spark itself ships for shuffle/parquet — offline-available on
    * every executor). `br` (Brotli) has no stock-JVM or Spark-shipped
    * codec and stays quarantined ([[recordsQuarantined]] emits an
    * err row naming it). */
  private def unzstd(bytes: Array[Byte]): Array[Byte] = {
    val in = new com.github.luben.zstd.ZstdInputStreamNoFinalizer(
      new java.io.ByteArrayInputStream(bytes))
    try in.readAllBytes()
    catch { case e: java.io.IOException =>
      throw new IllegalArgumentException(
        s"[GRAFT] warc: corrupt zstd stream (${e.getMessage})")
    } finally in.close()
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
    * Typical chain (charset-sniffed decode — the content_type column
    * feeds [[graft.functions.CharsetKernel]]'s transport tier):
    * {{{ Warc.records(spark, warcs).filter($"rec_type" === "response")
    *       .select($"target_uri", vfs_html_text(
    *         vfs_charset_decode($"body", $"content_type"))) }}} */
  def records(spark: SparkSession, warcs: DataFrame,
      idCol: String = "doc_id",
      binCol: String = "warc"): Dataset[WarcRecordRow] = {
    import spark.implicits._
    warcs.select(col(idCol).cast("long").as("doc_id"),
        col(binCol).as("warc"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          parseArchive(bytes).map { case (t, uri, h) =>
            WarcRecordRow(id, t, uri, h.status, h.contentType,
              h.location, h.lastModified, h.etag, h.xRobotsTag, h.body)
          }
        }
      }
  }

  /** Quarantining twin of [[records]] for archives outside the CC
    * trust boundary (heritrix/wget output, partial downloads): the
    * [[Multimodal.decodeStatsQuarantined]] stance — corrupt records
    * become `err` rows the caller routes aside, never task
    * failures/retries; a framing failure costs ONE record (the walk
    * resyncs at the next WARC/<digit> magic — any version, old
    * heritrix WARC/0.x included), an unsupported coding keeps
    * the record's identity. Same kernel shape: one per-partition
    * parse, zero shuffle. */
  def recordsQuarantined(spark: SparkSession, warcs: DataFrame,
      idCol: String = "doc_id",
      binCol: String = "warc"): Dataset[WarcRecordQRow] = {
    import spark.implicits._
    warcs.select(col(idCol).cast("long").as("doc_id"),
        col(binCol).as("warc"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          parseArchiveQuarantined(bytes).map { case (t, uri, h, err) =>
            WarcRecordQRow(id, t, uri, h.status, h.contentType,
              h.location, h.lastModified, h.etag, h.xRobotsTag,
              h.body, err)
          }
        }
      }
  }

  /** Build a bona fide single-page WARC archive — warcinfo + request
    * + response records with real framing — for fixtures and the
    * synthesizer (the encoder side every graft codec ships).
    * `bodyCoding` selects the response body's wire coding: 0 identity
    * (the CC layout), 1 chunked, 2 gzip Content-Encoding, 3 chunked
    * OVER gzip (the full wget/heritrix shape), 4 a DECLARED-br body
    * carried raw (undecodable by this walk — the quarantine
    * fixture's poison record), 5 zstd Content-Encoding (decoded via
    * zstd-jni). `contentType` is the response's
    * declared Content-Type — the default declares charset=utf-8 (the
    * CC common case, feeding the sniff's transport tier); callers
    * synthesizing non-UTF-8 pages pass matching bytes + label.
    * `extraHeaders` are appended verbatim to the response header
    * block (Last-Modified / ETag / X-Robots-Tag fixtures). */
  private[graft] def encodeArchive(uri: String, html: Array[Byte],
      gzip: Boolean = false, bodyCoding: Int = 0,
      contentType: String = "text/html; charset=utf-8",
      redirectTo: String = null,
      extraHeaders: Seq[(String, String)] = Nil): Array[Byte] = {
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
    val gzipBody = bodyCoding == 2 || bodyCoding == 3
    val zstdBody = bodyCoding == 5
    val chunked = bodyCoding == 1 || bodyCoding == 3
    val coded0 =
      if (gzipBody) {
        val bo = new java.io.ByteArrayOutputStream()
        val gz = new java.util.zip.GZIPOutputStream(bo)
        gz.write(html); gz.close()
        bo.toByteArray
      } else if (zstdBody) {
        val bo = new java.io.ByteArrayOutputStream()
        val zo = new com.github.luben.zstd.ZstdOutputStreamNoFinalizer(bo)
        zo.write(html); zo.close()
        bo.toByteArray
      } else html
    val coded = if (chunked) chunkEncode(coded0) else coded0
    val http = new java.io.ByteArrayOutputStream()
    val codingHeaders =
      (if (gzipBody) "Content-Encoding: gzip\r\n" else "") +
        (if (zstdBody) "Content-Encoding: zstd\r\n" else "") +
        (if (bodyCoding == 4) "Content-Encoding: br\r\n" else "") +
        (if (chunked) "Transfer-Encoding: chunked\r\n"
         else s"Content-Length: ${coded.length}\r\n")
    // a redirect response: 301 + the Location header AS GIVEN
    // (routinely relative on real servers)
    val statusHead =
      if (redirectTo == null) "HTTP/1.1 200 OK\r\n"
      else s"HTTP/1.1 301 Moved Permanently\r\nLocation: $redirectTo\r\n"
    val extras = extraHeaders
      .map { case (k, v) => s"$k: $v\r\n" }.mkString
    http.write((statusHead + s"Content-Type: $contentType\r\n" +
      extras + codingHeaders + "\r\n")
      .getBytes(StandardCharsets.US_ASCII))
    http.write(coded)
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
    * archive so the gzip path runs at corpus scale; `bodyCodings`
    * rotates the response body's wire coding by doc_id % 4 —
    * identity / chunked / gzip / chunked-over-gzip — so the decode
    * walk runs at corpus scale too). */
  def synthesizeWarc(pages: DataFrame, uriCol: String = "uri",
      htmlCol: String = "html", idCol: String = "doc_id",
      gzipEvery: Int = 3, bodyCodings: Boolean = false): DataFrame = {
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
          val coding = if (bodyCodings) (id % 4).toInt else 0
          (id, Warc.encodeArchive(uri, html, gzip = gz,
            bodyCoding = coding))
        }
      }.toDF("doc_id", "warc")
  }
}
