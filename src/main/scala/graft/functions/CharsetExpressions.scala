package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.{Charset, CharsetDecoder, CharsetEncoder, CodingErrorAction}

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Charset-aware page-body decoding — the WHATWG Encoding sniff the
  * WARC→HTML chain needs on a real crawl: several percent of
  * CommonCrawl is non-UTF-8 (windows-1252, Shift_JIS, GBK, …), and a
  * hard-coded UTF-8 decode mojibakes those pages, silently degrading
  * every downstream dedup/quality signal. Tier order (the WHATWG
  * "determine the character encoding" steps a browser runs):
  *
  *   1. BOM — EF BB BF → UTF-8, FE FF → UTF-16BE, FF FE → UTF-16LE;
  *      a BOM overrides every declaration (WHATWG "BOM sniffing").
  *   2. The transport layer's `Content-Type` `charset=` parameter
  *      (the HTTP response header a WARC record carries).
  *   3. A `<meta charset=…>` / `http-equiv` declaration within the
  *      first 1024 bytes, scanned as ASCII-superset (the WHATWG
  *      prescan window). UTF-16 labels here are read as UTF-8 — a
  *      page that *decoded* far enough to expose an ASCII meta tag
  *      is not UTF-16 (the WHATWG rule).
  *   4. windows-1252 — the WHATWG fallback for unlabeled content
  *      (every byte maps, so decoding never fails; pure-ASCII pages
  *      decode identically to UTF-8).
  *
  * Unknown labels fail their TIER (fall through), never the row;
  * malformed byte sequences decode with U+FFFD replacement — a crawl
  * payload never fails a stage (the [[HtmlKernel]] stance). Labels
  * normalize through a WHATWG-labels subset covering the encodings
  * the JVM ships ([[CharsetKernel.canonical]]).
  *
  * Scale stance: pure per-row kernels (codegen'd, zero shuffle) with
  * a per-thread decoder memo — charset objects and decoders are
  * reused row over row, the [[RobotsKernel]] parse-memo pattern. */
object CharsetKernel {

  /** WHATWG canonical name ← lowercase label (subset: the labels
    * that resolve to JVM-available charsets; WHATWG maps the whole
    * Latin-1 family — iso-8859-1, ascii, latin1 — to windows-1252). */
  private val Labels: Map[String, String] = {
    def m(canon: String, labels: String*) = labels.map(_ -> canon)
    (m("UTF-8", "utf-8", "utf8", "unicode-1-1-utf-8", "x-unicode20utf8",
        "unicode20utf8") ++
      m("windows-1252", "windows-1252", "cp1252", "x-cp1252", "ascii",
        "us-ascii", "iso-8859-1", "iso8859-1", "iso_8859-1", "latin1",
        "l1", "csisolatin1", "iso-ir-100", "ibm819", "cp819",
        "iso8859-1:1987", "iso_8859-1:1987") ++
      m("Shift_JIS", "shift_jis", "shift-jis", "sjis", "x-sjis",
        "ms_kanji", "ms932", "windows-31j", "csshiftjis") ++
      m("EUC-JP", "euc-jp", "x-euc-jp", "cseucpkdfmtjapanese") ++
      m("GBK", "gbk", "x-gbk", "gb2312", "gb_2312", "gb_2312-80",
        "chinese", "csgb2312", "csiso58gb231280", "iso-ir-58") ++
      m("gb18030", "gb18030") ++
      m("Big5", "big5", "big5-hkscs", "cn-big5", "x-x-big5", "csbig5") ++
      m("EUC-KR", "euc-kr", "korean", "ksc_5601", "ks_c_5601-1987",
        "ks_c_5601-1989", "ksc5601", "csksc56011987", "iso-ir-149",
        "windows-949", "cseuckr") ++
      m("UTF-16LE", "utf-16", "utf-16le") ++
      m("UTF-16BE", "utf-16be") ++
      m("windows-1250", "windows-1250", "cp1250", "x-cp1250") ++
      m("windows-1251", "windows-1251", "cp1251", "x-cp1251") ++
      m("windows-1253", "windows-1253", "cp1253", "x-cp1253") ++
      m("windows-1254", "windows-1254", "cp1254", "x-cp1254",
        "iso-8859-9", "iso8859-9", "latin5", "l5") ++
      m("windows-1255", "windows-1255", "cp1255", "x-cp1255") ++
      m("windows-1256", "windows-1256", "cp1256", "x-cp1256") ++
      m("windows-1257", "windows-1257", "cp1257", "x-cp1257") ++
      m("windows-1258", "windows-1258", "cp1258", "x-cp1258") ++
      m("ISO-8859-2", "iso-8859-2", "iso8859-2", "latin2", "l2") ++
      m("ISO-8859-5", "iso-8859-5", "iso8859-5", "cyrillic") ++
      m("ISO-8859-7", "iso-8859-7", "iso8859-7", "greek", "greek8") ++
      m("ISO-8859-15", "iso-8859-15", "iso8859-15", "latin9", "l9") ++
      m("KOI8-R", "koi8-r", "koi8", "koi") ++
      m("TIS-620", "tis-620", "windows-874", "iso-8859-11",
        "iso8859-11")).toMap
  }

  /** Canonical charset for a label, null when unrecognized (the tier
    * falls through — never a row failure). */
  private[graft] def canonical(label: String): String =
    Labels.getOrElse(label.trim.toLowerCase, null)

  private val Fallback = "windows-1252"

  /** Per-thread Charset memo — Charset.forName walks a provider
    * lookup; a crawl frame hits the same handful of names row after
    * row. */
  private val charsets =
    new ThreadLocal[java.util.HashMap[String, Charset]] {
      override def initialValue() =
        new java.util.HashMap[String, Charset]()
    }

  private def charsetOf(name: String): Charset = {
    val memo = charsets.get()
    var cs = memo.get(name)
    if (cs == null) { cs = Charset.forName(name); memo.put(name, cs) }
    cs
  }

  /** BOM charset: (name, bomLength), or null. UTF-16 checks run
    * FIRST for FE FF / FF FE; EF BB BF is UTF-8. */
  private def bomOf(b: Array[Byte]): (String, Int) =
    if (b.length >= 3 && (b(0) & 0xff) == 0xef && (b(1) & 0xff) == 0xbb &&
      (b(2) & 0xff) == 0xbf) ("UTF-8", 3)
    else if (b.length >= 2 && (b(0) & 0xff) == 0xfe &&
      (b(1) & 0xff) == 0xff) ("UTF-16BE", 2)
    else if (b.length >= 2 && (b(0) & 0xff) == 0xff &&
      (b(1) & 0xff) == 0xfe) ("UTF-16LE", 2)
    else null

  /** The `charset=` parameter of a Content-Type value (quoted or
    * bare, case-insensitive), null when absent/unrecognized. */
  private def fromContentType(ct: String): String = {
    if (ct == null) return null
    val lower = ct.toLowerCase
    // EVERY "charset" occurrence is tried until one parses to a
    // known label: a non-declaration use of the word earlier in the
    // text (a data- attribute, prose in a content value) must not
    // hide the real declaration behind it
    var at = lower.indexOf("charset")
    while (at >= 0) {
      val hit = charsetValueAt(lower, at + "charset".length)
      if (hit != null) return hit
      at = lower.indexOf("charset", at + 1)
    }
    null
  }

  /** The canonical charset of a `= value` tail at `from` (after the
    * word "charset"), null when this occurrence is not a
    * declaration or the label is unknown. */
  private def charsetValueAt(lower: String, from: Int): String = {
    var i = from
    while (i < lower.length && lower.charAt(i) == ' ') i += 1
    if (i >= lower.length || lower.charAt(i) != '=') return null
    i += 1
    while (i < lower.length && lower.charAt(i) == ' ') i += 1
    val quoted = i < lower.length &&
      (lower.charAt(i) == '"' || lower.charAt(i) == '\'')
    // a quoted value runs to its quote; a bare value ends at any
    // delimiter — including a quote, because inside a meta tag the
    // charset= often sits in a QUOTED content attribute
    // (content="text/html; charset=x") whose closing quote is not
    // part of the label
    def bareEnd(c: Char) = c == ';' || c == ' ' || c == '\t' ||
      c == '"' || c == '\'' || c == '>'
    if (quoted) {
      val quote = lower.charAt(i)
      i += 1
      var end = i
      while (end < lower.length && lower.charAt(end) != quote) end += 1
      canonical(lower.substring(i, end))
    } else {
      var end = i
      while (end < lower.length && !bareEnd(lower.charAt(end))) end += 1
      canonical(lower.substring(i, end))
    }
  }

  /** WHATWG prescan (simplified): within the first 1024 bytes read
    * as ASCII-superset, the FIRST `<meta` tag that declares an
    * encoding the WHATWG way — a bare `charset` ATTRIBUTE
    * (`<meta charset="x">`), or a `content` attribute's
    * `charset=` parameter when the tag also carries
    * `http-equiv=content-type` (the pragma form). A `charset=`
    * substring anywhere ELSE — a description's prose, a data-
    * attribute — is NOT a declaration and must not win the tier
    * (WHATWG honors only those two attribute shapes). Comments are
    * skipped so a commented-out declaration cannot win, and the
    * tag's closing `>` is located QUOTE-AWARE — a `>` inside a
    * quoted attribute value does not end the tag. */
  private def fromMeta(b: Array[Byte]): String = {
    val n = math.min(b.length, 1024)
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) { sb.append((b(i) & 0xff).toChar); i += 1 }
    val s = sb.toString.toLowerCase
    var pos = 0
    while (pos < s.length) {
      val cm = s.indexOf("<!--", pos)
      val mt = s.indexOf("<meta", pos)
      if (mt < 0) return null
      if (cm >= 0 && cm < mt) {
        val end = s.indexOf("-->", cm + 4)
        pos = if (end < 0) s.length else end + 3
      } else {
        val end = tagEnd(s, mt + 5)
        val cs = metaTagCharset(s.substring(mt + 5, end))
        if (cs != null) {
          // a meta tag cannot declare UTF-16 — ASCII markup that
          // scanned this far is not UTF-16 (the WHATWG rule)
          return if (cs.startsWith("UTF-16")) "UTF-8" else cs
        }
        pos = end + 1
      }
    }
    null
  }

  /** Index of the tag-closing '>' at or after `from`, honoring
    * quoted attribute values (a '>' inside quotes is content);
    * s.length when unclosed. */
  private def tagEnd(s: String, from: Int): Int = {
    var i = from
    var quote: Char = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) { if (c == quote) quote = 0 }
      else if (c == '"' || c == '\'') quote = c
      else if (c == '>') return i
      i += 1
    }
    s.length
  }

  /** The declared charset of ONE meta tag's attribute text
    * (lowercased, between `<meta` and the closing '>'), or null:
    * walks the attributes, then applies the WHATWG rule — a
    * `charset` attribute's value wins; otherwise the `content`
    * attribute's `charset=` parameter counts only when an
    * `http-equiv` attribute says `content-type`. */
  private def metaTagCharset(attrs: String): String = {
    var charsetAttr: String = null
    var contentAttr: String = null
    var pragma = false
    var i = 0
    while (i < attrs.length) {
      // skip to an attribute-name start
      while (i < attrs.length && !isNameChar(attrs.charAt(i))) i += 1
      if (i < attrs.length) {
        val nameAt = i
        while (i < attrs.length && isNameChar(attrs.charAt(i))) i += 1
        val name = attrs.substring(nameAt, i)
        // optional = value
        var j = i
        while (j < attrs.length &&
          Character.isWhitespace(attrs.charAt(j))) j += 1
        var value = ""
        if (j < attrs.length && attrs.charAt(j) == '=') {
          j += 1
          while (j < attrs.length &&
            Character.isWhitespace(attrs.charAt(j))) j += 1
          if (j < attrs.length &&
            (attrs.charAt(j) == '"' || attrs.charAt(j) == '\'')) {
            val q = attrs.charAt(j)
            var end = j + 1
            while (end < attrs.length && attrs.charAt(end) != q) end += 1
            value = attrs.substring(j + 1, end)
            i = if (end < attrs.length) end + 1 else attrs.length
          } else {
            var end = j
            while (end < attrs.length &&
              !Character.isWhitespace(attrs.charAt(end)) &&
              attrs.charAt(end) != '"' && attrs.charAt(end) != '\'')
              end += 1
            value = attrs.substring(j, end)
            i = end
          }
        } else i = j
        name match {
          case "charset" if charsetAttr == null => charsetAttr = value
          case "http-equiv" if value.trim == "content-type" =>
            pragma = true
          case "content" if contentAttr == null => contentAttr = value
          case _ => ()
        }
      }
    }
    if (charsetAttr != null) canonical(charsetAttr)
    else if (pragma && contentAttr != null) fromContentType(contentAttr)
    else null
  }

  // attribute names: letters, digits, '-' (http-equiv), '_' — the
  // shapes real markup uses; '/' and whitespace delimit
  private def isNameChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == '-' ||
      c == '_'

  /** The charset [[decode]] will use, as its WHATWG canonical name —
    * surfaced as a column so pipelines can stratify by encoding. */
  def detect(body: Array[Byte], contentType: UTF8String): UTF8String = {
    val bom = bomOf(body)
    val name =
      if (bom != null) bom._1
      else {
        val ct = fromContentType(
          if (contentType == null) null else contentType.toString)
        if (ct != null) ct
        else {
          val meta = fromMeta(body)
          if (meta != null) meta else Fallback
        }
      }
    UTF8String.fromString(name)
  }

  /** body bytes → STRING through the sniffed charset, BOM stripped,
    * malformed sequences replaced with U+FFFD (never a row failure).
    * UTF-8 fast path: a Spark string IS UTF-8 bytes, so a
    * well-formed UTF-8 body (the overwhelming CC majority) returns
    * without the bytes→UTF-16→bytes round trip the CharsetDecoder
    * route pays — one validation scan, then zero re-encode; only
    * ill-formed UTF-8 falls through to the replacing decoder. */
  def decode(body: Array[Byte], contentType: UTF8String): UTF8String = {
    val bom = bomOf(body)
    val (name, skip) =
      if (bom != null) bom
      else (detect(body, contentType).toString, 0)
    if (name == "UTF-8" && isWellFormedUtf8(body, skip))
      return UTF8String.fromBytes(body, skip, body.length - skip)
    val dec: CharsetDecoder = charsetOf(name).newDecoder()
      .onMalformedInput(CodingErrorAction.REPLACE)
      .onUnmappableCharacter(CodingErrorAction.REPLACE)
    val out = dec.decode(
      ByteBuffer.wrap(body, skip, body.length - skip)).toString
    UTF8String.fromString(out)
  }

  /** One-pass RFC 3629 well-formedness scan (rejects overlongs,
    * surrogates, > U+10FFFF, truncated tails) — the fast-path guard:
    * bytes that pass are exactly what the replacing decoder would
    * emit unchanged, so returning them as-is is behavior-identical. */
  private[graft] def isWellFormedUtf8(b: Array[Byte], from: Int): Boolean = {
    var i = from
    val n = b.length
    while (i < n) {
      val c = b(i) & 0xff
      if (c < 0x80) i += 1
      else if (c < 0xc2) return false // continuation/overlong lead
      else if (c < 0xe0) { // 2-byte
        if (i + 1 >= n || (b(i + 1) & 0xc0) != 0x80) return false
        i += 2
      } else if (c < 0xf0) { // 3-byte
        if (i + 2 >= n) return false
        val c1 = b(i + 1) & 0xff
        // E0 needs A0..BF (overlong); ED caps at 9F (surrogates)
        val lo = if (c == 0xe0) 0xa0 else 0x80
        val hi = if (c == 0xed) 0x9f else 0xbf
        if (c1 < lo || c1 > hi || (b(i + 2) & 0xc0) != 0x80) return false
        i += 3
      } else if (c < 0xf5) { // 4-byte
        if (i + 3 >= n) return false
        val c1 = b(i + 1) & 0xff
        // F0 needs 90..BF (overlong); F4 caps at 8F (> U+10FFFF)
        val lo = if (c == 0xf0) 0x90 else 0x80
        val hi = if (c == 0xf4) 0x8f else 0xbf
        if (c1 < lo || c1 > hi || (b(i + 2) & 0xc0) != 0x80 ||
          (b(i + 3) & 0xc0) != 0x80) return false
        i += 4
      } else return false // F5..FF never valid
    }
    true
  }

  /** STRING → bytes in `label`'s charset — the encoder twin every
    * graft codec ships (fixture synthesis; unencodable characters
    * replace, unknown labels fail LOUDLY: an author-chosen label is
    * builder input, not crawl dirt). */
  def encode(text: UTF8String, label: UTF8String): Array[Byte] = {
    val name = canonical(label.toString)
    if (name == null) throw new IllegalArgumentException(
      s"[GRAFT] vfs_charset_encode: unknown charset label '$label'")
    val enc: CharsetEncoder = charsetOf(name).newEncoder()
      .onMalformedInput(CodingErrorAction.REPLACE)
      .onUnmappableCharacter(CodingErrorAction.REPLACE)
    val bb = enc.encode(java.nio.CharBuffer.wrap(text.toString))
    val out = new Array[Byte](bb.remaining())
    bb.get(out)
    out
  }
}

/** (body BINARY, content_type STRING) → STRING canonical charset
  * name per the WHATWG sniff order (BOM → header → meta prescan →
  * windows-1252). Registered as `vfs_charset_detect`. */
case class CharsetDetect(body: Expression, contentType: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def left: Expression = body
  override def right: Expression = contentType
  override def inputTypes: Seq[org.apache.spark.sql.graft.shims.AbstractDataType] =
    Seq(BinaryType, StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "vfs_charset_detect"
  override def nullSafeEval(b: Any, ct: Any): Any =
    CharsetKernel.detect(b.asInstanceOf[Array[Byte]],
      ct.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, ct) =>
      s"graft.functions.CharsetKernel.detect($b, $ct)")
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(body = l, contentType = r)
}

/** (body BINARY, content_type STRING) → STRING decoded text through
  * the sniffed charset, BOM stripped, malformed bytes replaced.
  * Registered as `vfs_charset_decode`. */
case class CharsetDecode(body: Expression, contentType: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def left: Expression = body
  override def right: Expression = contentType
  override def inputTypes: Seq[org.apache.spark.sql.graft.shims.AbstractDataType] =
    Seq(BinaryType, StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "vfs_charset_decode"
  override def nullSafeEval(b: Any, ct: Any): Any =
    CharsetKernel.decode(b.asInstanceOf[Array[Byte]],
      ct.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, ct) =>
      s"graft.functions.CharsetKernel.decode($b, $ct)")
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(body = l, contentType = r)
}

/** (text STRING, charset_label STRING) → BINARY — the encoder twin
  * ([[CharsetKernel.encode]]); fixture synthesis and corpus export.
  * Registered as `vfs_charset_encode`. */
case class CharsetEncode(text: Expression, label: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def left: Expression = text
  override def right: Expression = label
  override def inputTypes: Seq[org.apache.spark.sql.graft.shims.AbstractDataType] =
    Seq(StringType, StringType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "vfs_charset_encode"
  override def nullSafeEval(t: Any, l: Any): Any =
    CharsetKernel.encode(t.asInstanceOf[UTF8String],
      l.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, l) =>
      s"graft.functions.CharsetKernel.encode($t, $l)")
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(text = l, label = r)
}
