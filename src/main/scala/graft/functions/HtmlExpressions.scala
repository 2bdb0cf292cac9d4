package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic HTML → text extraction — the WET-style step at the
  * front of every web-corpus pipeline (strip markup, keep prose), as
  * ONE pure per-row kernel shared by the interpreted and codegen
  * paths. This is a tolerant extractor for UNTRUSTED markup, not a
  * validator: malformed input (unclosed tags/comments/scripts) is
  * handled silently and deterministically (drop to end-of-input),
  * never loudly — a crawl page must never fail a stage. The exact
  * contract, pinned by the oracle rows:
  *
  *   - `<!-- … -->` comments and the full content of
  *     `<script>`/`<style>` elements are dropped (case-insensitive,
  *     attribute-tolerant; an embedded `"</script>"` inside the
  *     script text ends it — the HTML5 parsing rule);
  *   - every other tag is dropped; BLOCK-level tags (p, div, br, li,
  *     tr, h1–h6, table, ul, ol, dl, dt, dd, section, article,
  *     header, footer, blockquote, pre, hr, form, nav, aside) emit a
  *     newline so prose blocks stay separated; quoted attribute
  *     values may contain `>` without ending the tag;
  *   - character references decode: named amp/lt/gt/quot/apos
  *     (+ nbsp → plain space) and numeric `&#NNN;` / `&#xHH;`
  *     (any valid code point); an unrecognized or unterminated
  *     reference passes through literally;
  *   - whitespace normalizes: runs of spaces/tabs/CRs collapse to
  *     one space, every line trims, blank lines drop, lines join
  *     with single newlines.
  */
object HtmlKernel {
  private val Block: Set[String] = Set("p", "div", "br", "li", "tr",
    "h1", "h2", "h3", "h4", "h5", "h6", "table", "ul", "ol", "dl",
    "dt", "dd", "section", "article", "header", "footer",
    "blockquote", "pre", "hr", "form", "nav", "aside")

  /** Page-chrome containers whose TEXT the main-content variant
    * suppresses (the WET-adjacent heuristic: menus, cookie banners,
    * footers, search forms live here and would otherwise feed every
    * downstream scorer). Depth-counted, so nested chrome and chrome
    * inside chrome close correctly; an UNCLOSED chrome tag suppresses
    * to end-of-input — the same tolerant drop-to-end stance as an
    * unclosed script. */
  private val Chrome: Set[String] =
    Set("nav", "aside", "header", "footer", "form")

  /** Lower-case tag name starting at `i` (after '<' and optional
    * '/'), empty when none. */
  private def tagNameAt(s: String, i: Int): String = {
    var j = i
    val sb = new java.lang.StringBuilder(8)
    while (j < s.length && sb.length < 10 &&
      (s.charAt(j).isLetterOrDigit)) {
      sb.append(Character.toLowerCase(s.charAt(j)))
      j += 1
    }
    sb.toString
  }

  /** Index just past the closing '>' of a tag starting at the '<',
    * honoring quoted attribute values; s.length when unclosed. */
  private def skipTag(s: String, from: Int): Int = {
    var i = from + 1
    var quote: Char = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) { if (c == quote) quote = 0 }
      else if (c == '"' || c == '\'') quote = c
      else if (c == '>') return i + 1
      i += 1
    }
    s.length
  }

  /** Index of the end of `</name` + '>' at or after `from`
    * (case-insensitive, with a NAME BOUNDARY: `</scripty>` must not
    * close `<script>` — the char after the name has to be '>' or
    * whitespace, the HTML5 end-tag rule); s.length when absent. */
  private def skipRawElement(s: String, from: Int, name: String): Int = {
    val close = "</" + name
    var i = from
    while (i < s.length) {
      if (s.charAt(i) == '<' && i + close.length <= s.length &&
        s.regionMatches(true, i, close, 0, close.length) &&
        (i + close.length == s.length || {
          val c = s.charAt(i + close.length)
          c == '>' || c == ' ' || c == '\t' || c == '\n' || c == '\r'
        })) {
        val after = i + close.length
        // the close tag may carry whitespace before '>'
        var j = after
        while (j < s.length && s.charAt(j) != '>') j += 1
        return if (j < s.length) j + 1 else s.length
      }
      i += 1
    }
    s.length
  }

  /** Decode one character reference starting at the '&' in s(i);
    * appends to out and returns the index after the reference, or
    * appends '&' and returns i+1 when it is not a valid reference.
    * Shared with [[SitemapKernel]] — ONE entity decoder (a diverged
    * copy already shipped an off-by-one once). */
  private[functions] def decodeRef(s: String, i: Int,
      out: java.lang.StringBuilder): Int = {
    val semi = s.indexOf(';', i + 1)
    if (semi < 0 || semi - i > 12) { out.append('&'); return i + 1 }
    val body = s.substring(i + 1, semi)
    body match {
      case "amp" => out.append('&'); semi + 1
      case "lt" => out.append('<'); semi + 1
      case "gt" => out.append('>'); semi + 1
      case "quot" => out.append('"'); semi + 1
      case "apos" => out.append('\''); semi + 1
      case "nbsp" => out.append(' '); semi + 1
      case b if b.length >= 2 && b.charAt(0) == '#' =>
        val hex = b.charAt(1) == 'x' || b.charAt(1) == 'X'
        val digits = if (hex) b.substring(2) else b.substring(1)
        val cp = try {
          if (digits.isEmpty) -1
          else Integer.parseInt(digits, if (hex) 16 else 10)
        } catch { case _: NumberFormatException => -1 }
        if (cp == 0 || (cp >= 0xd800 && cp <= 0xdfff)) {
          // HTML5 reference decoding: NUL and surrogate code points
          // become U+FFFD — a lone surrogate would make the output
          // ill-formed UTF-8 downstream
          out.append('�'); semi + 1
        } else if (cp > 0 && cp <= 0x10ffff) {
          out.appendCodePoint(cp); semi + 1
        } else { out.append('&'); i + 1 }
      case _ => out.append('&'); i + 1
    }
  }

  /** Raw extraction pass: markup dropped, entities decoded, block
    * newlines inserted — BEFORE whitespace normalization. With
    * `mainOnly`, text inside [[Chrome]] containers is suppressed
    * (tags still parse — script/style bodies inside chrome must not
    * leak when the chrome closes mid-element). */
  private def extractRaw(s: String,
      mainOnly: Boolean = false): java.lang.StringBuilder = {
    val out = new java.lang.StringBuilder(s.length / 2)
    // entity decodes while suppressed land here (the reference must
    // still consume its input span) and are discarded
    lazy val scratch = new java.lang.StringBuilder(4)
    var chromeDepth = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '<') {
        if (s.regionMatches(false, i, "<!--", 0, 4)) {
          val end = s.indexOf("-->", i + 4)
          i = if (end < 0) s.length else end + 3
        } else if (i + 1 < s.length &&
          (s.charAt(i + 1).isLetter || s.charAt(i + 1) == '/' ||
            s.charAt(i + 1) == '!' || s.charAt(i + 1) == '?')) {
          val isClose = s.charAt(i + 1) == '/'
          val nameAt = if (isClose) i + 2 else i + 1
          val rawName = tagNameAt(s, nameAt)
          // custom elements (<script-x>, <p-card>) are NOT the
          // built-in tag their name prefixes — same boundary rule as
          // the close-tag scan
          val name =
            if (nameAt + rawName.length < s.length &&
              s.charAt(nameAt + rawName.length) == '-') ""
            else rawName
          val after = skipTag(s, i)
          if ((name == "script" || name == "style") && !isClose)
            i = skipRawElement(s, after, name)
          else {
            if (mainOnly && Chrome(name)) {
              // <nav/> is NOT self-closing: HTML5 tree construction
              // ignores the trailing slash on non-void elements (all
              // chrome tags are non-void), so it OPENS the element —
              // honoring it would also false-positive on an unquoted
              // attribute value ending in '/'
              if (isClose) { if (chromeDepth > 0) chromeDepth -= 1 }
              else chromeDepth += 1
            }
            if (Block(name) && chromeDepth == 0) out.append('\n')
            i = after
          }
        } else { if (chromeDepth == 0) out.append('<'); i += 1 }
      } else if (c == '&')
        i = decodeRef(s, i, if (chromeDepth == 0) out
          else { scratch.setLength(0); scratch })
      else { if (chromeDepth == 0) out.append(c); i += 1 }
    }
    out
  }

  /** Whitespace normalization (see the contract above). */
  private def normalize(raw: CharSequence): String = {
    val sb = new java.lang.StringBuilder(raw.length)
    val line = new java.lang.StringBuilder(80)
    def flush(): Unit = {
      // trim the collected line; emit when non-empty
      var a = 0
      var b = line.length
      while (a < b && line.charAt(a) == ' ') a += 1
      while (b > a && line.charAt(b - 1) == ' ') b -= 1
      if (b > a) {
        if (sb.length > 0) sb.append('\n')
        sb.append(line, a, b)
      }
      line.setLength(0)
    }
    var i = 0
    var pendingSpace = false
    while (i < raw.length) {
      val c = raw.charAt(i)
      if (c == '\n') { flush(); pendingSpace = false }
      else if (c == ' ' || c == '\t' || c == '\r') pendingSpace = true
      else {
        if (pendingSpace && line.length > 0) line.append(' ')
        pendingSpace = false
        line.append(c)
      }
      i += 1
    }
    flush()
    sb.toString
  }

  def text(html: UTF8String): UTF8String =
    UTF8String.fromString(normalize(extractRaw(html.toString)))

  /** Main-content variant: identical contract to [[text]] except
    * that text inside [[Chrome]] containers (nav, aside, header,
    * footer, form) is suppressed. [[text]] stays the WET-parity
    * extraction; this is the curation-default ([[Chrome]] outweighs
    * prose on real crawl pages, and page-unique chrome — a cookie
    * banner, a search form — escapes the corpus-frequency
    * boilerplate pass by construction). */
  def textMain(html: UTF8String): UTF8String =
    UTF8String.fromString(
      normalize(extractRaw(html.toString, mainOnly = true)))

  /** Content of the FIRST `<title>` element (entity-decoded,
    * whitespace-normalized), or NULL when absent. */
  def title(html: UTF8String): UTF8String = {
    val s = html.toString
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '<' &&
        s.regionMatches(true, i, "<title", 0, 6) &&
        // NAME BOUNDARY: <title-bar>/<titlex> are different elements
        (i + 6 >= s.length || {
          val c = s.charAt(i + 6)
          !c.isLetterOrDigit && c != '-'
        })) {
        val after = skipTag(s, i)
        val end = skipRawElement(s, after, "title")
        // end points past "</title>"; body is [after, start-of-close)
        val close = s.lastIndexOf('<', math.max(after, end - 1))
        val body = if (close > after) s.substring(after, close)
          else if (end == s.length) s.substring(after)
          else ""
        return UTF8String.fromString(
          normalize(extractRaw(body)).replace('\n', ' '))
      }
      i += 1
    }
    null
  }

  /** Every href attribute value of an `<a>` tag, in document order
    * (entity-decoded, untrimmed-quotes removed). */
  def links(html: UTF8String): Array[UTF8String] = {
    val s = html.toString
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '<' && i + 2 < s.length &&
        (s.charAt(i + 1) == 'a' || s.charAt(i + 1) == 'A') &&
        !s.charAt(i + 2).isLetterOrDigit && s.charAt(i + 2) != '-') {
        val after = skipTag(s, i)
        val tag = s.substring(i, math.min(after, s.length))
        val m = LinkHref.findFirstMatchIn(tag)
        m.foreach { g =>
          val raw = attrVal(g)
          val dec = new java.lang.StringBuilder(raw.length)
          var j = 0
          while (j < raw.length) {
            if (raw.charAt(j) == '&') j = decodeRef(raw, j, dec)
            else { dec.append(raw.charAt(j)); j += 1 }
          }
          out += UTF8String.fromString(dec.toString)
        }
        i = after
      } else i += 1
    }
    out.toArray
  }

  // the lookbehind guards against matching the 'href=' tail of a
  // DIFFERENT attribute name (data-href=, xhref=); the third
  // alternative accepts UNQUOTED values (valid HTML5 — browsers
  // parse `<meta name=robots content=noindex>`, and a compliance
  // gate that misses a stated opt-out because the author skipped
  // quotes is costlier than over-matching)
  private val LinkHref =
    """(?is)(?<![\w-])href\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s"'>]+))""".r

  /** The matched attribute value from any of the three alternatives
    * (double-quoted / single-quoted / unquoted). */
  private def attrVal(g: scala.util.matching.Regex.Match): String =
    Option(g.group(1)).orElse(Option(g.group(2))).getOrElse(g.group(3))

  /** content of the FIRST `<meta name="X" content="…">` whose name
    * matches case-insensitively (entities decoded, quoted attrs,
    * attribute order free), null when absent — the robots
    * opt-out/noai directives, description, generator. `http-equiv`
    * metas are NOT matched (different attribute, different
    * semantics — charset handling owns those). */
  def metaContent(html: UTF8String, name: UTF8String): UTF8String = {
    val s = html.toString
    val want = name.toString
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '<' &&
        s.regionMatches(true, i, "<meta", 0, 5) &&
        (i + 5 >= s.length || {
          val c = s.charAt(i + 5)
          !c.isLetterOrDigit && c != '-'
        })) {
        val after = skipTag(s, i)
        val tag = s.substring(i, math.min(after, s.length))
        val nm = MetaNameAttr.findFirstMatchIn(tag).map(attrVal)
        if (nm.exists(_.equalsIgnoreCase(want))) {
          return MetaContentAttr.findFirstMatchIn(tag)
            .map(g => UTF8String.fromString(decodeAttr(attrVal(g))))
            .orNull
        }
        i = after
      } else i += 1
    }
    null
  }

  /** href of the FIRST `<link>` whose rel list contains the token
    * `canonical` (space-separated, case-insensitive — rel is a
    * token LIST per HTML), entities decoded; null when absent. The
    * canonical-consolidation dedup signal: the author's own
    * statement of which URL is the page's identity. */
  def canonical(html: UTF8String): UTF8String = {
    val s = html.toString
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '<' &&
        s.regionMatches(true, i, "<link", 0, 5) &&
        (i + 5 >= s.length || {
          val c = s.charAt(i + 5)
          !c.isLetterOrDigit && c != '-'
        })) {
        val after = skipTag(s, i)
        val tag = s.substring(i, math.min(after, s.length))
        val rel = LinkRelAttr.findFirstMatchIn(tag).map(attrVal)
        val isCanonical = rel.exists(_.split("\\s+")
          .exists(_.equalsIgnoreCase("canonical")))
        if (isCanonical) {
          val href = LinkHref.findFirstMatchIn(tag).map(attrVal)
          href match {
            case Some(h) => return UTF8String.fromString(decodeAttr(h))
            case None => () // rel=canonical without href: keep looking
          }
        }
        i = after
      } else i += 1
    }
    null
  }

  /** attribute-value entity decode shared by the meta/link readers
    * (the [[links]] inline loop predates it). */
  private def decodeAttr(raw: String): String = {
    val dec = new java.lang.StringBuilder(raw.length)
    var j = 0
    while (j < raw.length) {
      if (raw.charAt(j) == '&') j = decodeRef(raw, j, dec)
      else { dec.append(raw.charAt(j)); j += 1 }
    }
    dec.toString
  }

  // quoted-or-unquoted, like [[LinkHref]] (the unquoted alternative
  // is load-bearing for the opt-out gate: valid-HTML5
  // `<meta name=robots content=noindex>` must not slip through)
  private val MetaNameAttr =
    """(?is)(?<![\w-])name\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s"'>]+))""".r
  private val MetaContentAttr =
    """(?is)(?<![\w-])content\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s"'>]+))""".r
  private val LinkRelAttr =
    """(?is)(?<![\w-])rel\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s"'>]+))""".r
}

/** STRING → STRING extracted prose ([[HtmlKernel.text]]).
  * Registered as `vfs_html_text`. */
case class HtmlText(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graft.shims.AbstractDataType] =
    Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "vfs_html_text"
  override def nullSafeEval(v: Any): Any =
    HtmlKernel.text(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HtmlKernel.text($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** STRING → STRING extracted prose with page chrome suppressed
  * ([[HtmlKernel.textMain]] — nav/aside/header/footer/form text
  * dropped, the curation-default scoping). Registered as
  * `vfs_html_main_text`. */
case class HtmlMainText(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graft.shims.AbstractDataType] =
    Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "vfs_html_main_text"
  override def nullSafeEval(v: Any): Any =
    HtmlKernel.textMain(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HtmlKernel.textMain($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** STRING → STRING first-title extraction, NULL when no `<title>`.
  * Registered as `vfs_html_title`. */
case class HtmlTitle(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graft.shims.AbstractDataType] =
    Seq(StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "vfs_html_title"
  override def nullSafeEval(v: Any): Any =
    HtmlKernel.title(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = graft.functions.HtmlKernel.title($c);
      |${ev.isNull} = ${ev.value} == null;
    """.stripMargin)
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** STRING → ARRAY<STRING> of `<a href>` values in document order.
  * Registered as `vfs_html_links` — feeds the URL-curation family
  * (normalize → dedup → domain caps) straight from raw pages. */
case class HtmlLinks(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graft.shims.AbstractDataType] =
    Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "vfs_html_links"
  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(
      HtmlKernel.links(v.asInstanceOf[UTF8String]).asInstanceOf[Array[Any]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.HtmlKernel.links($c))")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** (html, meta_name) → STRING content of the first matching
  * `<meta name=… content=…>`, NULL when absent ([[HtmlKernel
  * .metaContent]]) — the robots/noai opt-out directives,
  * description, generator. Registered as `vfs_html_meta`. */
case class HtmlMeta(html: Expression, name: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def left: Expression = html
  override def right: Expression = name
  override def inputTypes: Seq[org.apache.spark.sql.graft.shims.AbstractDataType] =
    Seq(StringType, StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "vfs_html_meta"
  override def nullSafeEval(h: Any, n: Any): Any =
    HtmlKernel.metaContent(h.asInstanceOf[UTF8String],
      n.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (h, n) => s"""
      |${ev.value} = graft.functions.HtmlKernel.metaContent($h, $n);
      |${ev.isNull} = ${ev.value} == null;
    """.stripMargin)
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(html = l, name = r)
}

/** html → STRING href of the first `<link rel=canonical>`, NULL
  * when absent ([[HtmlKernel.canonical]]) — the author-declared
  * page identity, the canonical-consolidation dedup signal.
  * Registered as `vfs_html_canonical`. */
case class HtmlCanonical(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graft.shims.AbstractDataType] =
    Seq(StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "vfs_html_canonical"
  override def nullSafeEval(v: Any): Any =
    HtmlKernel.canonical(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = graft.functions.HtmlKernel.canonical($c);
      |${ev.isNull} = ${ev.value} == null;
    """.stripMargin)
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
