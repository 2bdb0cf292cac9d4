package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.CharsetKernel

/** WHATWG charset sniffing + decoding: tier order (BOM → Content-Type
  * → meta prescan → windows-1252), label normalization, replacement
  * decoding, the encoder twin, and the Spark surface (Column + SQL,
  * null content types). */
class CharsetSpec extends AnyFunSuite {

  private def detect(body: Array[Byte], ct: String): String =
    CharsetKernel.detect(body,
      if (ct == null) null else UTF8String.fromString(ct)).toString
  private def dec(body: Array[Byte], ct: String): String =
    CharsetKernel.decode(body,
      if (ct == null) null else UTF8String.fromString(ct)).toString
  private def enc(text: String, label: String): Array[Byte] =
    CharsetKernel.encode(UTF8String.fromString(text),
      UTF8String.fromString(label))

  test("tier 1 — a BOM wins over every declaration and is stripped") {
    val bom = Array(0xef.toByte, 0xbb.toByte, 0xbf.toByte)
    val body = bom ++ "café".getBytes("UTF-8")
    // the header LIES (cp1252) — the BOM must still win
    assert(detect(body, "text/html; charset=windows-1252") === "UTF-8")
    assert(dec(body, "text/html; charset=windows-1252") === "café")
    // UTF-16 BOMs, both endiannesses, BOM stripped
    val le = Array(0xff.toByte, 0xfe.toByte) ++ "hi".getBytes("UTF-16LE")
    val be = Array(0xfe.toByte, 0xff.toByte) ++ "hi".getBytes("UTF-16BE")
    assert(detect(le, null) === "UTF-16LE" && dec(le, null) === "hi")
    assert(detect(be, null) === "UTF-16BE" && dec(be, null) === "hi")
  }

  test("tier 2 — Content-Type charset parameter: bare, quoted, case-insensitive, unknown labels fall through") {
    val cp = "café €".getBytes("windows-1252")
    assert(detect(cp, "text/html; charset=windows-1252") ===
      "windows-1252")
    assert(dec(cp, "text/html; charset=windows-1252") === "café €")
    assert(detect(cp, "text/html; CHARSET=\"ISO-8859-1\"") ===
      "windows-1252") // the WHATWG latin1→cp1252 mapping
    assert(detect(cp, "text/html; charset='latin1'") === "windows-1252")
    val sjis = "日本語".getBytes("Shift_JIS")
    assert(dec(sjis, "text/html; charset=shift_jis") === "日本語")
    // unknown label: the TIER falls through (here to the fallback)
    assert(detect(cp, "text/html; charset=klingon") === "windows-1252")
    assert(detect("abc".getBytes("UTF-8"), "text/html") ===
      "windows-1252") // no parameter at all
  }

  test("tier 3 — meta prescan: <meta charset>, http-equiv content, comments skipped, 1024-byte window, UTF-16 labels read as UTF-8") {
    val metaSjis = ("<html><head><meta charset=\"shift_jis\"></head>" +
      "<body>日本語</body>").getBytes("Shift_JIS")
    assert(detect(metaSjis, null) === "Shift_JIS")
    assert(dec(metaSjis, null).contains("日本語"))
    val httpEquiv = ("<meta http-equiv=\"Content-Type\" " +
      "content=\"text/html; charset=windows-1252\"><p>café €")
      .getBytes("windows-1252")
    assert(detect(httpEquiv, null) === "windows-1252")
    assert(dec(httpEquiv, null).endsWith("café €"))
    // a commented-out declaration must NOT win
    val commented = ("<!-- <meta charset=\"shift_jis\"> -->" +
      "<meta charset=\"windows-1252\"><p>x").getBytes("windows-1252")
    assert(detect(commented, null) === "windows-1252")
    // an EARLIER non-declaration occurrence of the word "charset"
    // in the same tag must not hide the real declaration behind it
    val decoy = ("<meta data-x=\"charset note\" http-equiv=" +
      "\"content-type\" content=\"text/html; charset=shift_jis\">" +
      "<p>x").getBytes("Shift_JIS")
    assert(detect(decoy, null) === "Shift_JIS")
    assert(detect("abc".getBytes("UTF-8"),
      "text/html; charset=klingon; charset=utf-8") === "UTF-8")
    // beyond the 1024-byte prescan window the meta is invisible
    val far = (" " * 1100 + "<meta charset=\"shift_jis\">")
      .getBytes("US-ASCII")
    assert(detect(far, null) === "windows-1252")
    // a meta cannot declare UTF-16 (ASCII markup that scanned this
    // far is not UTF-16) — read as UTF-8 per WHATWG
    val u16 = "<meta charset=\"utf-16\"><p>ok".getBytes("UTF-8")
    assert(detect(u16, null) === "UTF-8")
    // the transport layer OUTRANKS the meta
    assert(detect(metaSjis, "text/html; charset=utf-8") === "UTF-8")
  }

  test("tier 3 honors ONLY the charset attribute or http-equiv=content-type content — decoy attributes and quoted '>' cannot fool the prescan") {
    // a description meta whose CONTENT mentions charset= is NOT a
    // declaration (WHATWG honors only the charset attribute or the
    // http-equiv=content-type pragma's content)
    val decoyMeta = ("<meta name=\"description\" content=\"use " +
      "charset=gbk for fun\"><p>x").getBytes("windows-1252")
    assert(detect(decoyMeta, null) === "windows-1252")
    // a content attribute WITHOUT the pragma is not a declaration
    val noPragma = ("<meta content=\"text/html; charset=gbk\">" +
      "<p>x").getBytes("windows-1252")
    assert(detect(noPragma, null) === "windows-1252")
    // a '>' inside a quoted attribute value does not end the tag —
    // the real declaration after it still wins
    val gtInQuote = ("<meta data-x=\"a > b\" http-equiv=" +
      "\"content-type\" content=\"text/html; charset=shift_jis\">" +
      "<p>x").getBytes("Shift_JIS")
    assert(detect(gtInQuote, null) === "Shift_JIS")
    // unquoted attribute values (valid HTML5) parse in both shapes
    assert(detect("<meta charset=shift_jis><p>x".getBytes("Shift_JIS"),
      null) === "Shift_JIS")
    assert(detect(("<meta http-equiv=content-type " +
      "content=\"text/html; charset=shift_jis\"><p>x")
      .getBytes("Shift_JIS"), null) === "Shift_JIS")
    // the pragma match is exact: a different http-equiv value does
    // not promote its content
    assert(detect(("<meta http-equiv=\"refresh\" " +
      "content=\"0; url=x?charset=gbk\"><p>x")
      .getBytes("windows-1252"), null) === "windows-1252")
  }

  test("tier 4 — windows-1252 fallback decodes undeclared bytes; malformed sequences replace, never fail") {
    val cp = "café €!".getBytes("windows-1252")
    assert(detect(cp, null) === "windows-1252")
    assert(dec(cp, null) === "café €!")
    // a declared-UTF-8 body with an invalid sequence → U+FFFD
    val bad = "ok ".getBytes("UTF-8") ++ Array(0xc3.toByte) // truncated
    assert(dec(bad, "text/html; charset=utf-8") === "ok �")
  }

  test("UTF-8 well-formedness scan (the zero-copy fast-path guard): RFC 3629 edges") {
    def wf(bytes: Int*): Boolean = CharsetKernel
      .isWellFormedUtf8(bytes.map(_.toByte).toArray, 0)
    assert(wf("plain ascii".getBytes("UTF-8").map(_ & 0xff).toSeq: _*))
    assert(wf("日本語 café 😀".getBytes("UTF-8").map(_ & 0xff).toSeq: _*))
    assert(!wf(0x80)) // bare continuation
    assert(!wf(0xc0, 0xaf)) // overlong 2-byte
    assert(!wf(0xc1, 0xbf)) // overlong 2-byte
    assert(!wf(0xe0, 0x80, 0x80)) // overlong 3-byte
    assert(wf(0xe0, 0xa0, 0x80)) // U+0800, minimal 3-byte
    assert(!wf(0xed, 0xa0, 0x80)) // surrogate U+D800
    assert(wf(0xed, 0x9f, 0xbf)) // U+D7FF, last before surrogates
    assert(!wf(0xf0, 0x80, 0x80, 0x80)) // overlong 4-byte
    assert(wf(0xf0, 0x90, 0x80, 0x80)) // U+10000, minimal 4-byte
    assert(wf(0xf4, 0x8f, 0xbf, 0xbf)) // U+10FFFF, the ceiling
    assert(!wf(0xf4, 0x90, 0x80, 0x80)) // > U+10FFFF
    assert(!wf(0xf5, 0x80, 0x80, 0x80)) // F5 lead never valid
    assert(!wf(0xc3)) // truncated tail
    assert(!wf(0xe2, 0x82)) // truncated 3-byte
    // decode parity: a well-formed body returns its exact bytes
    // (zero copy), an ill-formed one goes through the replacing
    // decoder — both visible through the public decode
    val good = "mixed 日本 €".getBytes("UTF-8")
    assert(dec(good, "text/html; charset=utf-8") === "mixed 日本 €")
  }

  test("encoder twin round-trips every supported family; unknown labels fail loudly") {
    for ((text, label) <- Seq(
      ("naïve café €", "windows-1252"), ("日本語テスト", "shift_jis"),
      ("中文文本", "gbk"), ("中文文本", "big5"), ("한국어", "euc-kr"),
      ("русский", "koi8-r"), ("mixed ascii", "utf-8"),
      ("pair 😀 astral", "utf-8"))) {
      val bytes = enc(text, label)
      assert(dec(bytes, s"text/html; charset=$label") === text,
        s"label=$label")
    }
    val e = intercept[IllegalArgumentException](enc("x", "klingon"))
    assert(e.getMessage.contains("[GRAFT]"))
  }

  test("Spark surface: codegen'd over a frame, null content_type reads as absent (Column and SQL forms)") {
    val spark = GraftTest.spark
    import spark.implicits._
    val df = Seq(
      (1L, "café €", "windows-1252",
        "text/html; charset=windows-1252"),
      (2L, "日本語", "shift_jis", null),
      (3L, "plain", "utf-8", null))
      .toDF("id", "text", "label", "ct")
      .withColumn("page",
        when($"id" === 2L, concat(
          graft.functions.vfs_charset_encode(
            lit("<meta charset=shift_jis>"), $"label"),
          graft.functions.vfs_charset_encode($"text", $"label")))
        .otherwise(graft.functions.vfs_charset_encode($"text", $"label")))
    val out = df.select($"id",
        graft.functions.vfs_charset_detect($"page", $"ct").as("cs"),
        graft.functions.vfs_charset_decode($"page", $"ct").as("t"))
      .as[(Long, String, String)].collect().sortBy(_._1)
    assert(out(0) === ((1L, "windows-1252", "café €")))
    assert(out(1)._2 === "Shift_JIS")
    assert(out(1)._3.endsWith("日本語"))
    // id 3 undeclared pure-ASCII: the cp1252 fallback is lossless
    assert(out(2) === ((3L, "windows-1252", "plain")))
    // SQL registration, including the null-ct coalesce
    df.createOrReplaceTempView("cs_pages")
    val sql = spark.sql("SELECT id, vfs_charset_detect(page, ct) cs," +
      " vfs_charset_decode(page, ct) t FROM cs_pages WHERE id = 2")
      .as[(Long, String, String)].collect()
    assert(sql.head._2 === "Shift_JIS" && sql.head._3.endsWith("日本語"))
  }
}
