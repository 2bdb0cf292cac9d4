package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PDF encoding — the encoder twin of [[graft.functions.PdfKernel]]
  * (every graft codec ships both sides): a REAL single-page PDF with
  * catalog/pages/page/font objects, a content stream drawing the
  * text through the standard operators, a correct xref table and
  * trailer (offset-exact, so external tools can read the fixtures
  * even though the extractor itself never consults xref). */
object Pdf {

  private def escape(line: String): String = {
    val sb = new StringBuilder(line.length + 8)
    line.foreach {
      case '\\' => sb.append("\\\\")
      case '(' => sb.append("\\(")
      case ')' => sb.append("\\)")
      case c => sb.append(c)
    }
    sb.toString
  }

  /** The content stream for one page of `text`: an initial
    * positioning Td, one show per line with T* line moves between.
    * Every third line shows through a split TJ array and every fifth
    * through a hex string, so the extractor's three string paths all
    * run at corpus scale. The assembly contract makes extraction the
    * exact inverse: extracted text == `text`. */
  private[graft] def contentStream(text: String): Array[Byte] = {
    val lines = text.split("\n", -1)
    val shows = lines.zipWithIndex.map { case (l, i) =>
      if (i % 5 == 4)
        "<" + l.getBytes(StandardCharsets.UTF_8)
          .map(b => f"${b & 0xff}%02x").mkString + "> Tj"
      else if (i % 3 == 2 && l.length >= 2) {
        // never split a surrogate pair: each half UTF-8-encodes
        // independently, and a lone surrogate would mojibake to '?'
        val mid0 = l.length / 2
        val mid = if (Character.isHighSurrogate(l.charAt(mid0 - 1)) &&
          Character.isLowSurrogate(l.charAt(mid0))) mid0 + 1 else mid0
        s"[(${escape(l.substring(0, mid))}) -2 " +
          s"(${escape(l.substring(mid))})] TJ"
      } else s"(${escape(l)}) Tj"
    }
    ("BT /F1 12 Tf 72 720 Td " + shows.mkString(" T* ") + " ET")
      .getBytes(StandardCharsets.UTF_8)
  }

  /** Encode one single-page PDF carrying `text`; `flate` compresses
    * the content stream with zlib (/FlateDecode). */
  private[graft] def encodePdf(text: String,
      flate: Boolean = false): Array[Byte] = {
    val content0 = contentStream(text)
    val content =
      if (!flate) content0
      else {
        val d = new java.util.zip.Deflater()
        d.setInput(content0); d.finish()
        val buf = new Array[Byte](content0.length * 2 + 64)
        val out = new java.io.ByteArrayOutputStream(content0.length)
        while (!d.finished()) {
          val n = d.deflate(buf)
          out.write(buf, 0, n)
        }
        d.end()
        out.toByteArray
      }
    val filter = if (flate) " /Filter /FlateDecode" else ""
    val bos = new java.io.ByteArrayOutputStream(content.length + 512)
    def ascii(s: String): Unit =
      bos.write(s.getBytes(StandardCharsets.US_ASCII))
    val offsets = new Array[Int](6) // 1-based object offsets
    ascii("%PDF-1.4\n")
    offsets(1) = bos.size()
    ascii("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    offsets(2) = bos.size()
    ascii("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    offsets(3) = bos.size()
    ascii("3 0 obj << /Type /Page /Parent 2 0 R " +
      "/MediaBox [0 0 612 792] /Resources << /Font << /F1 4 0 R >> >> " +
      "/Contents 5 0 R >> endobj\n")
    offsets(4) = bos.size()
    ascii("4 0 obj << /Type /Font /Subtype /Type1 " +
      "/BaseFont /Helvetica >> endobj\n")
    offsets(5) = bos.size()
    ascii(s"5 0 obj << /Length ${content.length}$filter >>\nstream\n")
    bos.write(content)
    ascii("\nendstream\nendobj\n")
    val xrefAt = bos.size()
    ascii("xref\n0 6\n0000000000 65535 f \n")
    (1 to 5).foreach(i => ascii(f"${offsets(i)}%010d 00000 n \n"))
    ascii(s"trailer << /Size 6 /Root 1 0 R >>\nstartxref\n$xrefAt\n%%EOF\n")
    bos.toByteArray
  }

  /** Wrap every document's text in a real PDF (every 2nd
    * Flate-compressed so both stream paths run at corpus scale). */
  def synthesizePdf(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    WorkCols.spread(docs)
      .select(col(idCol).cast("long").as("doc_id"),
        col(textCol).cast("string").as("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          (id, encodePdf(text, flate = id % 2 == 0))
        }
      }.toDF("doc_id", "pdf")
  }
}
