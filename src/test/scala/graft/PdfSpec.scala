package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.PdfKernel
import graft.operators.Pdf

/** PDF text extraction: the string grammar (escapes, octal, nested
  * parens, continuations, hex), the operator walk (Tj/TJ/line
  * moves, BT..ET scoping), stream decoding (raw, Flate, direct vs
  * indirect Length, skipped filters), the encode/extract duality,
  * and the Spark surface. */
class PdfSpec extends AnyFunSuite {

  private def extract(pdf: Array[Byte]): String =
    PdfKernel.text(pdf).toString

  private def rawPdf(content: String): Array[Byte] = {
    val c = content.getBytes("UTF-8")
    (s"%PDF-1.4\n1 0 obj << /Length ${c.length} >>\nstream\n")
      .getBytes("US-ASCII") ++ c ++
      "\nendstream\nendobj\n%%EOF\n".getBytes("US-ASCII")
  }

  test("encode/extract duals: literal, split-TJ, and hex shows all invert exactly, raw and Flate") {
    val text = "first line\nsecond longer line\nthird (with) parens\n" +
      "fourth \\ backslash\nfifth hex line\nlast"
    for (flate <- Seq(false, true)) {
      assert(extract(Pdf.encodePdf(text, flate)) === text,
        s"flate=$flate")
    }
    // leading and trailing empty lines survive (the shown-flag rule)
    assert(extract(Pdf.encodePdf("\nafter empty")) === "\nafter empty")
    assert(extract(Pdf.encodePdf("before\n")) === "before\n")
    assert(extract(Pdf.encodePdf("")) === "")
  }

  test("string grammar: escapes, octal (1-3 digits), nested parens, line continuation, unknown escape, hex odd-pad, whitespace in hex") {
    assert(extract(rawPdf("BT (a\\(b\\)c\\\\d) Tj ET")) === "a(b)c\\d")
    assert(extract(rawPdf("BT (x\\101\\12\\7y) Tj ET")) === "xA\ny")
    assert(extract(rawPdf("BT (a(nested(deep))b) Tj ET")) ===
      "a(nested(deep))b")
    assert(extract(rawPdf("BT (cont\\\ninued) Tj ET")) === "continued")
    assert(extract(rawPdf("BT (q\\zw) Tj ET")) === "qzw") // unknown esc
    assert(extract(rawPdf("BT <48 65 6c6C6f> Tj ET")) === "Hello")
    assert(extract(rawPdf("BT <487> Tj ET")) === "Hp") // odd pads 0
    assert(extract(rawPdf("BT (tab\\there\\r) Tj ET")) === "tab\there\r")
  }

  test("operator walk: TJ arrays concatenate, quote ops line-move then show, Td/TD/T* line-move only after a show, strings outside BT..ET are ignored, comments and inline dicts skip") {
    assert(extract(rawPdf("BT [(a) -5 (b) 3 (c)] TJ ET")) === "abc")
    assert(extract(rawPdf("BT (l1) Tj (l2) ' ET")) === "l1\nl2")
    assert(extract(rawPdf("BT (l1) Tj 2 4 (l2) \" ET")) === "l1\nl2")
    // the initial positioning Td emits nothing; moves after a show do
    assert(extract(rawPdf("BT 72 720 Td (a) Tj T* (b) Tj ET")) === "a\nb")
    assert(extract(rawPdf("(orphan) Tj BT (kept) Tj ET (tail) Tj")) ===
      "kept")
    assert(extract(rawPdf("BT % comment (not text) Tj\n(real) Tj ET")) ===
      "real")
    assert(extract(rawPdf(
      "BT BI << /W 4 /H (fake) >> ID xx EI (after) Tj ET")) === "after")
    // operands of an unrelated operator never leak into the next show
    assert(extract(rawPdf("BT (gone) Tz (shown) Tj ET")) === "shown")
  }

  test("stream decoding: indirect /Length falls back to the endstream scan, non-Flate filters skip silently, truncated Flate skips, multiple streams concatenate in document order") {
    // indirect length: /Length 9 0 R — must scan to endstream
    val c = "BT (ind) Tj ET"
    val ind = (s"%PDF-1.4\n1 0 obj << /Length 9 0 R >>\nstream\n" +
      c + "\nendstream\nendobj\n").getBytes("US-ASCII")
    assert(extract(ind) === "ind")
    // an LZW-filtered stream is skipped, the raw one still extracts
    val mixed = (s"%PDF-1.4\n" +
      s"1 0 obj << /Length 4 /Filter /LZWDecode >>\nstream\nXXXX\nendstream\nendobj\n" +
      s"2 0 obj << /Length ${c.length} >>\nstream\n$c\nendstream\nendobj\n")
      .getBytes("US-ASCII")
    assert(extract(mixed) === "ind")
    // corrupt Flate data: skipped, never thrown
    val corrupt = ("%PDF-1.4\n1 0 obj " +
      "<< /Length 4 /Filter /FlateDecode >>\nstream\nZZZZ\nendstream\n")
      .getBytes("US-ASCII")
    assert(extract(corrupt) === "") // tolerant, deterministic
    // two raw streams in order
    val s1 = "BT (a) Tj ET"
    val s2 = "BT (b) Tj ET"
    val two = (s"%PDF-1.4\n" +
      s"1 0 obj << /Length ${s1.length} >>\nstream\n$s1\nendstream\n" +
      s"2 0 obj << /Length ${s2.length} >>\nstream\n$s2\nendstream\n")
      .getBytes("US-ASCII")
    assert(extract(two) === "ab")
  }

  test("stream-scan hazards: the keyword inside 'endstream' never opens a phantom stream, and a nested /DecodeParms sub-dict does not hide the governing /Filter") {
    // TWO streams whose inter-object gap is LONGER than stream 1's
    // /Length: a scanner resuming at dataEnd re-matches the "stream"
    // tail of "endstream", adopts stream 1's dict, and its phantom
    // extent swallows stream 2's keyword — losing (b) silently
    val c1 = "BT (a) Tj ET"
    val c2 = "BT (b) Tj ET"
    val gap = "% a long comment padding the inter-object gap well " +
      "past stream one's declared length\n"
    val two = (s"%PDF-1.4\n" +
      s"1 0 obj << /Length ${c1.length} >>\nstream\n$c1\nendstream\nendobj\n" +
      gap +
      s"2 0 obj << /Length ${c2.length} >>\nstream\n$c2\nendstream\nendobj\n")
      .getBytes("US-ASCII")
    assert(extract(two) === "ab")
    // a Flate stream whose dict carries a NESTED sub-dictionary
    // after /Filter: nearest-<< scanning would see only the sub-dict
    // (no /Filter) and emit raw deflate bytes as text
    val content = "BT (deep) Tj ET".getBytes("UTF-8")
    val defl = {
      val d = new java.util.zip.Deflater()
      d.setInput(content); d.finish()
      val buf = new Array[Byte](256)
      val n = d.deflate(buf); d.end()
      java.util.Arrays.copyOf(buf, n)
    }
    val nested = (s"%PDF-1.4\n1 0 obj << /Filter /FlateDecode " +
      s"/DecodeParms << /Predictor 1 /Columns 5 >> " +
      s"/Length ${defl.length} >>\nstream\n").getBytes("US-ASCII") ++
      defl ++ "\nendstream\nendobj\n".getBytes("US-ASCII")
    assert(extract(nested) === "deep")
    // a nested sub-dict whose own /Length PRECEDES the stream dict's
    // top-level /Length must not win the extent scan (it would
    // truncate the decoded text to the sub-dict's value)
    val c3 = "BT (good) Tj ET"
    val nestedLen = (s"%PDF-1.4\n1 0 obj << " +
      s"/DecodeParms << /Length 3 /Columns 5 >> " +
      s"/Length ${c3.length} >>\nstream\n$c3\nendstream\nendobj\n")
      .getBytes("US-ASCII")
    assert(extract(nestedLen) === "good")
    // string literals inside the dict must not fool the top-level
    // scan: a '<<' inside (…) is not a dict opener, and a string
    // containing the bytes "/Length 3" is not a key
    val c4 = "BT (strs) Tj ET"
    val strLit = (s"%PDF-1.4\n1 0 obj << /T (note <<x>> \\) /Length 3) " +
      s"/U <4142> /Length ${c4.length} >>\nstream\n$c4\nendstream\nendobj\n")
      .getBytes("US-ASCII")
    assert(extract(strLit) === "strs")
    // UNBALANCED dict tokens inside strings must not derail the
    // governing-dict walk either — '(see >> here)' once pushed the
    // backward balance into the previous object
    val c5 = "BT (unb) Tj ET"
    val unbal = (s"%PDF-1.4\n0 9 obj << /X 1 >> endobj\n" +
      s"1 0 obj << /T (see >> here) /U (open <<) " +
      s"/Length ${c5.length} >>\nstream\n$c5\nendstream\nendobj\n")
      .getBytes("US-ASCII")
    assert(extract(unbal) === "unb")
    // a BOUNDARY token inside the dict's own string: the string-blind
    // boundary search lands mid-string, the walk detects the stray
    // and retries from the real boundary
    val c6 = "BT (bnd) Tj ET"
    val bnd = (s"%PDF-1.4\n0 9 obj << /X 1 >> endobj\n" +
      s"1 0 obj << /T (see endstream here) " +
      s"/Length ${c6.length} >>\nstream\n$c6\nendstream\nendobj\n")
      .getBytes("US-ASCII")
    assert(extract(bnd) === "bnd")
    // a % comment with an unmatched '(' or '<' before the dict is
    // prose, not a string/hex opener
    val c7 = "BT (cmt) Tj ET"
    val cmt = (s"%PDF-1.4\n1 0 obj\n% note (draft <x\n<< " +
      s"/Length ${c7.length} >>\nstream\n$c7\nendstream\nendobj\n")
      .getBytes("US-ASCII")
    assert(extract(cmt) === "cmt")
    // a dict-less stream must not adopt the PREVIOUS object's dict
    val orphan = (s"%PDF-1.4\n" +
      s"1 0 obj << /Length 4 /Filter /LZWDecode >> endobj\n" +
      s"2 0 obj\nstream\nBT (raw) Tj ET\nendstream\nendobj\n")
      .getBytes("US-ASCII")
    assert(extract(orphan) === "raw") // treated as unfiltered
  }

  test("Spark surface: vfs_pdf_text registers for SQL; synthesizePdf is a zero-shuffle kernel whose extraction inverts the text column") {
    val spark = GraftTest.spark
    import spark.implicits._
    graft.functions.registerAll(spark)
    val docs = Seq((1L, "alpha\nbeta"), (2L, ""), (3L, "x(y)z\\w"))
      .toDF("doc_id", "text")
    val pdfs = graft.operators.Pdf.synthesizePdf(docs)
    val back = pdfs
      .select($"doc_id", graft.functions.vfs_pdf_text($"pdf").as("t"))
      .join(docs, "doc_id")
      .filter($"t" =!= $"text")
    assert(back.count() === 0L, "extraction must invert the synthesis")
    pdfs.createOrReplaceTempView("pdf_t")
    val viaSql = spark.sql(
      "SELECT vfs_pdf_text(pdf) AS t FROM pdf_t WHERE doc_id = 1")
      .as[String].head()
    assert(viaSql === "alpha\nbeta")
  }
}
