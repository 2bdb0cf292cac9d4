package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** PDF → text extraction — the other giant crawl payload class after
  * HTML, as one pure per-row kernel. SCOPE (a decision, not an
  * omission): content streams stored raw or FlateDecode-compressed,
  * text shown through the standard operators (Tj, TJ, ', ", with
  * Td/TD/T* as line moves) in BT…ET text objects, literal strings
  * (nested parens, all escapes, octal, line continuations) and hex
  * strings, bytes decoded as UTF-8. That covers text-first PDFs
  * whose strings carry the document bytes directly; font-encoded
  * PDFs (/ToUnicode CMaps, subset embeddings) transform bytes
  * through per-font tables that are not oracle-pinnable without a
  * font stack, so streams under OTHER filters (DCT, CCITT, LZW) and
  * non-UTF-8 font encodings are SKIPPED silently — like
  * [[HtmlKernel]], this is a tolerant extractor for untrusted crawl
  * bytes, never a validator, and a damaged object must not fail a
  * 100 TB stage.
  *
  * The exact assembly contract, pinned by the `web_pdf_extract`
  * oracle row: shown strings append in operator order; each line
  * move (Td/TD/T*, and the pre-show move of '/") appends one
  * newline IF any show operator has run (so the initial positioning
  * Td emits nothing, but a leading empty line survives); every
  * operator clears the operand stack. */
object PdfKernel {

  /** Extracted text of every text object across all decodable
    * content streams, in document order. */
  def text(pdf: Array[Byte]): UTF8String = {
    val out = new java.io.ByteArrayOutputStream(256)
    var shown = false
    streams(pdf).foreach { data =>
      extractOps(data, out,
        () => shown = true,
        () => if (shown) out.write('\n'))
    }
    UTF8String.fromBytes(out.toByteArray)
  }

  /** Every decodable stream payload in document order: raw streams
    * as-is, /FlateDecode inflated, other filters skipped. Stream
    * extent comes from a DIRECT /Length when present (compressed
    * bytes may contain the literal "endstream"); an indirect or
    * absent length falls back to the endstream scan. */
  private def streams(pdf: Array[Byte]): Seq[Array[Byte]] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var pos = 0
    while (pos >= 0 && pos < pdf.length) {
      val at = indexOfStreamKeyword(pdf, pos)
      if (at < 0) pos = -1
      else {
        var dataAt = at + "stream".length
        if (dataAt < pdf.length && pdf(dataAt) == '\r') dataAt += 1
        if (dataAt < pdf.length && pdf(dataAt) == '\n') dataAt += 1
        // the governing dictionary: the OUTERMOST << balanced against
        // the >> runs between it and the stream keyword — a plain
        // nearest-<< scan would pick up a nested sub-dictionary
        // (/DecodeParms << … >>) and miss the real /Filter
        val dictAt = governingDictStart(pdf, at)
        val dict =
          if (dictAt < 0) ""
          else new String(pdf, dictAt, at - dictAt, "ISO-8859-1")
        // restrict the /Length scan to the dict's TOP-LEVEL keys: a
        // nested sub-dictionary (/DecodeParms << /Length n >>) that
        // precedes the stream's own /Length would otherwise win the
        // regex and mis-size the stream extent
        val direct = DirectLength.findFirstMatchIn(stripNestedDicts(dict))
          .map(_.group(1).toInt)
        val dataEnd = direct match {
          case Some(n) if n >= 0 && dataAt + n.toLong <= pdf.length =>
            dataAt + n
          case _ =>
            val e = indexOfToken(pdf, "endstream", dataAt)
            if (e < 0) pdf.length
            else {
              var t = e
              if (t > dataAt && pdf(t - 1) == '\n') t -= 1
              if (t > dataAt && pdf(t - 1) == '\r') t -= 1
              t
            }
        }
        val raw = java.util.Arrays.copyOfRange(pdf, dataAt, dataEnd)
        val hasFilter = dict.contains("/Filter")
        val flate = dict.contains("/FlateDecode")
        if (!hasFilter) out += raw
        else if (flate) inflate(raw).foreach(out += _)
        // other filters: skipped (tolerant contract)
        // resume AFTER this stream's endstream keyword — resuming at
        // dataEnd would re-match the "stream" suffix of "endstream"
        // and the phantom could swallow the next real stream
        val endAt = indexOfToken(pdf, "endstream", dataEnd)
        pos = if (endAt < 0) pdf.length else endAt + "endstream".length
      }
    }
    out.toSeq
  }

  /** Next occurrence of the `stream` KEYWORD (not the tail of
    * `endstream`) at or after `from`. */
  private def indexOfStreamKeyword(pdf: Array[Byte], from: Int): Int = {
    var p = from
    while (p >= 0) {
      val at = indexOfToken(pdf, "stream", p)
      if (at < 0) return -1
      val isEnd = at >= 3 && pdf(at - 3) == 'e' && pdf(at - 2) == 'n' &&
        pdf(at - 1) == 'd'
      if (!isEnd) return at
      p = at + "stream".length
    }
    -1
  }

  /** Start of the dictionary governing the stream keyword at `at`:
    * walk FORWARD from the previous object boundary, STRING-AWARE
    * (a `>>` or `<<` inside a (…) string or <hex> literal is
    * content, not a dict delimiter — a backward balance walk cannot
    * know whether it stands inside a string, so it ran blind and a
    * `(see >> here)` literal made it adopt the PREVIOUS object's
    * dict): the governing opener is the last top-level `<<` whose
    * dict closes before the keyword, or the innermost still-open
    * `<<` (malformed unclosed dict — adopt it). -1 when the region
    * holds no dict (do not adopt an earlier object's).
    *
    * The boundary search itself is string-BLIND (backward scans
    * cannot know they stand inside a literal), so a boundary token
    * inside the dict's own string — `(see endstream here)` — can
    * place the scan start MID-string and lose the dict; when a walk
    * finds nothing, it RETRIES from the next-earlier boundary (the
    * string-aware forward walk from a real boundary reads straight
    * through such literals), a few boundaries deep. Perfect lexing
    * of adversarial PDFs is out of scope (the kernel's tolerant
    * contract); the retry covers the realistic accident. */
  private def governingDictStart(pdf: Array[Byte], at: Int): Int = {
    var bound = at
    var tries = 0
    while (tries < 4) {
      // next object boundary (endobj/endstream) strictly before bound
      var b = bound - 1
      var scanStart = 0
      var found = false
      while (b >= 0 && !found) {
        if (pdf(b) == 'e' &&
          (tokenAt(pdf, b, "endobj") || tokenAt(pdf, b, "endstream"))) {
          scanStart = b; found = true
        }
        b -= 1
      }
      val (hit, stray) = dictWalk(pdf, scanStart, at)
      if (hit >= 0) return hit
      // retry from an earlier boundary ONLY on mid-string evidence
      // (a stray ')' or unmatched '>>' right of the boundary) — a
      // dict-LESS stream from a REAL boundary must stay -1, never
      // adopt the previous object's dict
      if (!found || !stray) return -1
      bound = scanStart
      tries += 1
    }
    -1
  }

  /** Forward string/hex/comment-aware dict scan over [from, at):
    * (opener of the last closed top-level dict, else the innermost
    * still-open one, else -1; whether a STRAY ')' or unmatched '>>'
    * was seen — the signature of a scan that started inside a
    * literal). */
  private def dictWalk(pdf: Array[Byte], from: Int,
      at: Int): (Int, Boolean) = {
    var i = from
    var lastTop = -1 // opener of the last CLOSED top-level dict
    var stray = false
    val stack = new java.util.ArrayDeque[Integer]()
    while (i < at) {
      val c = pdf(i)
      if (c == '%') {
        // comment: to end of line (a '(' or '<' inside one is prose)
        while (i < at && pdf(i) != '\n' && pdf(i) != '\r') i += 1
      } else if (c == '(') {
        var pd = 1
        i += 1
        while (i < at && pd > 0) {
          if (pdf(i) == '\\' && i + 1 < at) i += 2
          else {
            if (pdf(i) == '(') pd += 1
            else if (pdf(i) == ')') pd -= 1
            i += 1
          }
        }
      } else if (c == ')') {
        stray = true; i += 1
      } else if (c == '<' && i + 1 < at && pdf(i + 1) == '<') {
        stack.push(i); i += 2
      } else if (c == '<') {
        while (i < at && pdf(i) != '>') i += 1
        if (i < at) i += 1
      } else if (c == '>' && i + 1 < at && pdf(i + 1) == '>') {
        if (!stack.isEmpty) {
          val open = stack.pop()
          if (stack.isEmpty) lastTop = open
        } else stray = true
        i += 2
      } else i += 1
    }
    (if (!stack.isEmpty) stack.peek() else lastTop, stray)
  }

  private def tokenAt(b: Array[Byte], at: Int, tok: String): Boolean = {
    if (at + tok.length > b.length) return false
    var j = 0
    while (j < tok.length) {
      if (b(at + j) != tok.charAt(j)) return false
      j += 1
    }
    true
  }

  // a direct /Length 123 (not an indirect "123 0 R" reference)
  private val DirectLength = """/Length\s+(\d+)\s*(?![\d\s]*R)""".r

  /** The dict text with every NESTED `<< … >>` span blanked to
    * spaces (offsets preserved), so key scans see top-level entries
    * only. String literals `(…)` (balanced parens, backslash
    * escapes) and hex strings `<…>` are blanked at EVERY depth and
    * never counted as dict delimiters — a `<<` inside a string must
    * not push the depth, and a top-level string containing the bytes
    * "/Length 3" must not fool the key regex. The outermost
    * `<<`/`>>` pair is kept — `dict` starts at the governing
    * opener. */
  private def stripNestedDicts(dict: String): String = {
    val sb = new java.lang.StringBuilder(dict)
    var depth = 0
    var i = 0
    while (i < sb.length) {
      val c = sb.charAt(i)
      if (c == '(') {
        // string literal: blank through the balanced close
        var pd = 1
        sb.setCharAt(i, ' '); i += 1
        while (i < sb.length && pd > 0) {
          val sc = sb.charAt(i)
          if (sc == '\\' && i + 1 < sb.length) {
            sb.setCharAt(i, ' '); sb.setCharAt(i + 1, ' '); i += 2
          } else {
            if (sc == '(') pd += 1
            else if (sc == ')') pd -= 1
            sb.setCharAt(i, ' '); i += 1
          }
        }
      } else if (c == '<' && i + 1 < sb.length && sb.charAt(i + 1) == '<') {
        depth += 1
        if (depth > 1) { sb.setCharAt(i, ' '); sb.setCharAt(i + 1, ' ') }
        i += 2
      } else if (c == '<') {
        // hex string: blank to its '>'
        while (i < sb.length && sb.charAt(i) != '>') {
          sb.setCharAt(i, ' '); i += 1
        }
        if (i < sb.length) { sb.setCharAt(i, ' '); i += 1 }
      } else if (c == '>' && i + 1 < sb.length && sb.charAt(i + 1) == '>') {
        if (depth > 1) { sb.setCharAt(i, ' '); sb.setCharAt(i + 1, ' ') }
        depth = math.max(0, depth - 1)
        i += 2
      } else {
        if (depth > 1) sb.setCharAt(i, ' ')
        i += 1
      }
    }
    sb.toString
  }

  private def indexOfToken(b: Array[Byte], tok: String, from: Int): Int = {
    val t = tok.getBytes("US-ASCII")
    var i = math.max(0, from)
    while (i + t.length <= b.length) {
      var j = 0
      while (j < t.length && b(i + j) == t(j)) j += 1
      if (j == t.length) return i
      i += 1
    }
    -1
  }
  private def inflate(bytes: Array[Byte]): Option[Array[Byte]] =
    try {
      val inf = new java.util.zip.Inflater()
      inf.setInput(bytes)
      val out = new java.io.ByteArrayOutputStream(bytes.length * 4)
      val buf = new Array[Byte](8192)
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n == 0 && inf.needsInput()) return None // truncated
        out.write(buf, 0, n)
      }
      inf.end()
      Some(out.toByteArray)
    } catch { case _: java.util.zip.DataFormatException => None }

  /** One pass over a content stream: literal/hex strings collect on
    * an operand stack; Tj, TJ, quote and double-quote show; Td, TD,
    * T-star and the quotes line-move; every operator clears the
    * stack. Text only INSIDE BT..ET. */
  private def extractOps(s: Array[Byte], out: java.io.ByteArrayOutputStream,
      onShow: () => Unit, newline: () => Unit): Unit = {
    val pending = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var inText = false
    def show(): Unit = {
      onShow()
      pending.foreach(b => out.write(b, 0, b.length))
      pending.clear()
    }
    var i = 0
    while (i < s.length) {
      val c = s(i).toChar
      if (c == '%') { // comment to EOL
        while (i < s.length && s(i) != '\n' && s(i) != '\r') i += 1
      } else if (c == '(') {
        val (bytes, next) = literalString(s, i)
        if (inText) pending += bytes
        i = next
      } else if (c == '<' && i + 1 < s.length && s(i + 1) == '<') {
        // inline dictionary: skip to the matching >>
        var depth = 1
        i += 2
        while (i + 1 < s.length && depth > 0) {
          if (s(i) == '<' && s(i + 1) == '<') { depth += 1; i += 2 }
          else if (s(i) == '>' && s(i + 1) == '>') { depth -= 1; i += 2 }
          else i += 1
        }
      } else if (c == '<') {
        val (bytes, next) = hexString(s, i)
        if (inText) pending += bytes
        i = next
      } else if (c.isLetter || c == '\'' || c == '"' || c == '*') {
        var j = i
        while (j < s.length && !isDelim(s(j))) j += 1
        val tok = new String(s, i, j - i, "US-ASCII")
        tok match {
          case "BT" => inText = true; pending.clear()
          case "ET" => inText = false; pending.clear()
          case "Tj" if inText => show()
          case "TJ" if inText => show()
          case "'" if inText => newline(); show()
          case "\"" if inText => newline(); show()
          case "Td" | "TD" | "T*" if inText => newline(); pending.clear()
          case _ => pending.clear() // any other operator clears operands
        }
        i = j
      } else i += 1
    }
  }

  private def isDelim(b: Byte): Boolean = {
    val c = b.toChar
    c == ' ' || c == '\t' || c == '\r' || c == '\n' || c == '\f' ||
      c == 0 || c == '(' || c == ')' || c == '<' || c == '>' ||
      c == '[' || c == ']' || c == '{' || c == '}' || c == '/' || c == '%'
  }

  /** Literal string starting at the '(' — nested unescaped parens
    * balance; escapes per the PDF string grammar. Returns (bytes,
    * index past the closing paren). */
  private def literalString(s: Array[Byte], from: Int): (Array[Byte], Int) = {
    val out = new java.io.ByteArrayOutputStream(32)
    var depth = 1
    var i = from + 1
    while (i < s.length && depth > 0) {
      val c = s(i)
      if (c == '\\' && i + 1 < s.length) {
        val e = s(i + 1).toChar
        e match {
          case 'n' => out.write('\n'); i += 2
          case 'r' => out.write('\r'); i += 2
          case 't' => out.write('\t'); i += 2
          case 'b' => out.write('\b'); i += 2
          case 'f' => out.write('\f'); i += 2
          case '(' => out.write('('); i += 2
          case ')' => out.write(')'); i += 2
          case '\\' => out.write('\\'); i += 2
          case '\r' => // line continuation (swallow optional \n)
            i += 2
            if (i < s.length && s(i) == '\n') i += 1
          case '\n' => i += 2
          case d if d >= '0' && d <= '7' =>
            var v = 0
            var n = 0
            i += 1
            while (n < 3 && i < s.length &&
              s(i) >= '0' && s(i) <= '7') {
              v = v * 8 + (s(i) - '0'); i += 1; n += 1
            }
            out.write(v & 0xff)
          case other => out.write(other); i += 2 // unknown: drop the \
        }
      } else if (c == '(') { depth += 1; out.write('('); i += 1 }
      else if (c == ')') {
        depth -= 1
        if (depth > 0) out.write(')')
        i += 1
      } else { out.write(c); i += 1 }
    }
    (out.toByteArray, i)
  }

  /** Hex string starting at the '<' — whitespace-tolerant pairs, an
    * odd final digit pads with 0. Returns (bytes, index past '>'). */
  private def hexString(s: Array[Byte], from: Int): (Array[Byte], Int) = {
    val out = new java.io.ByteArrayOutputStream(16)
    var i = from + 1
    var hi = -1
    while (i < s.length && s(i) != '>') {
      val c = s(i).toChar
      val v = Character.digit(c, 16)
      if (v >= 0) {
        if (hi < 0) hi = v
        else { out.write((hi << 4) | v); hi = -1 }
      }
      i += 1
    }
    if (hi >= 0) out.write(hi << 4)
    ((out.toByteArray, if (i < s.length) i + 1 else i))
  }
}

/** BINARY → STRING extracted PDF text ([[PdfKernel.text]]).
  * Registered as `vfs_pdf_text`. */
case class PdfText(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graft.shims.AbstractDataType] =
    Seq(BinaryType)
  override def dataType: DataType = StringType
  override def prettyName: String = "vfs_pdf_text"
  override def nullSafeEval(v: Any): Any =
    PdfKernel.text(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PdfKernel.text($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
