package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** robots.txt evaluation (RFC 9309) — the crawl-politeness gate of a
  * web-curation pipeline, as a pure per-row kernel:
  *
  *   - groups are runs of `User-agent:` lines followed by their
  *     rules; comments (`#` to end of line) strip first; keys are
  *     case-insensitive; a user-agent line after rules starts a NEW
  *     group;
  *   - group selection (RFC 9309 §2.2.1 most-specific match): an
  *     exact case-insensitive token match wins; otherwise the group
  *     whose token is the LONGEST prefix of the crawler's product
  *     token applies (`mybot-news` obeys a `User-agent: mybot` group
  *     — a robots token LONGER than the crawler's token never
  *     matches); when none match, the `*` groups apply; when neither
  *     exists, everything is allowed;
  *   - rule matching: `*` matches any octet sequence, `$` anchors the
  *     pattern end; among matching rules the LONGEST pattern (in
  *     octets, `$` excluded) wins, allow beating disallow on ties —
  *     the RFC's most-specific-match rule; empty patterns are
  *     ignored; no matching rule means allowed;
  *   - `Crawl-delay:` is group-scoped like allow/disallow (decimal
  *     seconds, surfaced as integer MILLIseconds; the last valid
  *     value in the selected group wins); `Sitemap:` is a global
  *     record per the sitemaps protocol — collected file-wide in
  *     document order, never group-scoped, and it does NOT end a
  *     user-agent run; other unknown directives are skipped.
  *
  * Parsing is memoized per thread on the robots text (a crawl frame
  * carries ONE robots body per domain across many URL rows, and
  * domain-sorted input hits the memo almost every row). */
object RobotsKernel {

  final case class Rule(allow: Boolean, pattern: String,
      regex: java.util.regex.Pattern, weight: Int)

  /** Rules and crawl-delays per lowercase user-agent token ('*'
    * included), plus the file-global sitemap URLs. `delayMilli`
    * holds only groups that declared a valid Crawl-delay. */
  final case class Parsed(groups: Map[String, Vector[Rule]],
      delayMilli: Map[String, Long], sitemaps: Vector[String])

  private def compile(pattern: String): java.util.regex.Pattern = {
    val anchored = pattern.endsWith("$")
    val body = if (anchored) pattern.dropRight(1) else pattern
    val sb = new StringBuilder("^")
    body.split("\\*", -1).zipWithIndex.foreach { case (part, i) =>
      if (i > 0) sb.append(".*")
      if (part.nonEmpty) sb.append(java.util.regex.Pattern.quote(part))
    }
    if (anchored) sb.append("$")
    java.util.regex.Pattern.compile(sb.toString,
      java.util.regex.Pattern.DOTALL)
  }

  private[graft] def parse(robots: String): Parsed = {
    val groups = scala.collection.mutable.Map
      .empty[String, Vector[Rule]].withDefaultValue(Vector.empty)
    val delays = scala.collection.mutable.Map.empty[String, Long]
    val sitemaps = scala.collection.mutable.ArrayBuffer.empty[String]
    var currentUas = List.empty[String]
    var inRules = false
    robots.split("\n", -1).foreach { line0 =>
      val hash = line0.indexOf('#')
      val line = (if (hash >= 0) line0.substring(0, hash) else line0).trim
      val colon = line.indexOf(':')
      if (colon > 0) {
        val key = line.substring(0, colon).trim.toLowerCase
        val value = line.substring(colon + 1).trim
        key match {
          case "user-agent" =>
            if (inRules) { currentUas = Nil; inRules = false }
            val ua = value.toLowerCase
            currentUas ::= ua
            // materialize the group even when every rule turns out
            // empty: per RFC 9309 a matched group with an empty
            // Disallow allows EVERYTHING — the agent must not fall
            // through to the '*' group
            groups(ua) = groups(ua)
          case "allow" | "disallow" =>
            inRules = true
            if (value.nonEmpty && currentUas.nonEmpty) {
              val anchored = value.endsWith("$")
              val weight =
                if (anchored) value.length - 1 else value.length
              val r = Rule(key == "allow", value, compile(value), weight)
              currentUas.foreach(ua => groups(ua) = groups(ua) :+ r)
            }
          case "crawl-delay" =>
            // group-scoped like allow/disallow; decimal seconds →
            // milli, invalid values skipped (tolerant parse)
            inRules = true
            if (currentUas.nonEmpty) try {
              val sec = java.lang.Double.parseDouble(value)
              if (sec >= 0 && sec <= 1e6) {
                val milli = math.round(sec * 1000.0)
                currentUas.foreach(ua => delays(ua) = milli)
              }
            } catch { case _: NumberFormatException => () }
          case "sitemap" =>
            // a GLOBAL record (sitemaps protocol): collected
            // file-wide and deliberately NOT ending a user-agent run
            if (value.nonEmpty) sitemaps += value
          case _ => () // unknown directives: skipped
        }
      }
    }
    Parsed(groups.toMap, delays.toMap, sitemaps.toVector)
  }

  /** RFC 9309 §2.2.1 group selection for a crawler product token
    * (already lowercased): exact match, else the longest group token
    * that is a PREFIX of the crawler token, else '*', else none. */
  private def selectUa(parsed: Parsed, ua: String): Option[String] = {
    if (parsed.groups.contains(ua)) return Some(ua)
    var best: String = null
    parsed.groups.keysIterator.foreach { t =>
      if (t != "*" && t.length < ua.length && ua.startsWith(t) &&
        (best == null || t.length > best.length)) best = t
    }
    if (best != null) Some(best)
    else if (parsed.groups.contains("*")) Some("*")
    else None
  }

  // per-thread single-entry memo: a curation frame carries one robots
  // body per domain, and domain-clustered input repeats it row after
  // row — the common case is a hit
  private val memo = new ThreadLocal[(String, Parsed)]

  private def parsedOf(robots: String): Parsed = {
    val m = memo.get()
    if (m != null && (m._1 eq robots) || m != null && m._1 == robots) m._2
    else {
      val p = parse(robots)
      memo.set((robots, p))
      p
    }
  }

  /** True when `path` is fetchable for `userAgent` under `robots`. */
  def allowed(robots: UTF8String, userAgent: UTF8String,
      path: UTF8String): Boolean = {
    val parsed = parsedOf(robots.toString)
    val ua = userAgent.toString.toLowerCase
    val rules = selectUa(parsed, ua)
      .map(parsed.groups).getOrElse(Vector.empty)
    if (rules.isEmpty) return true
    val p = path.toString
    var best: Rule = null
    rules.foreach { r =>
      if (r.regex.matcher(p).find() &&
        (best == null || r.weight > best.weight ||
          (r.weight == best.weight && r.allow && !best.allow)))
        best = r
    }
    best == null || best.allow
  }

  /** Crawl-delay for `userAgent`'s selected group in integer
    * MILLIseconds, or null when the group declares none (a
    * politeness scheduler treats absence as "no constraint", which
    * 0 must not alias). Group selection is the same most-specific
    * walk [[allowed]] uses, so delay and fetchability can never
    * disagree about which group applies. */
  def crawlDelayMilli(robots: UTF8String,
      userAgent: UTF8String): java.lang.Long = {
    val parsed = parsedOf(robots.toString)
    val ua = userAgent.toString.toLowerCase
    selectUa(parsed, ua).flatMap(parsed.delayMilli.get) match {
      case Some(m) => java.lang.Long.valueOf(m)
      case None => null
    }
  }

  /** Every `Sitemap:` URL in document order (global records — never
    * scoped to a user-agent group). */
  def sitemaps(robots: UTF8String): Array[UTF8String] =
    parsedOf(robots.toString).sitemaps
      .map(UTF8String.fromString).toArray
}

/** (robots_txt, user_agent, path) → BOOLEAN fetchable, per RFC 9309
  * ([[RobotsKernel]]). Registered as `vfs_robots_allowed`. */
case class RobotsAllowed(robots: Expression, userAgent: Expression,
    path: Expression) extends TernaryExpression with ExpectsInputTypes {
  override def first: Expression = robots
  override def second: Expression = userAgent
  override def third: Expression = path
  override def inputTypes: Seq[org.apache.spark.sql.graft.shims.AbstractDataType] =
    Seq(StringType, StringType, StringType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "vfs_robots_allowed"
  override def nullSafeEval(r: Any, ua: Any, p: Any): Any =
    RobotsKernel.allowed(r.asInstanceOf[UTF8String],
      ua.asInstanceOf[UTF8String], p.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (r, ua, p) =>
      s"graft.functions.RobotsKernel.allowed($r, $ua, $p)")
  override protected def withNewChildrenInternal(f: Expression,
      s: Expression, t: Expression): Expression =
    copy(robots = f, userAgent = s, path = t)
}

/** (robots_txt, user_agent) → BIGINT crawl-delay in milliseconds for
  * the agent's selected group, NULL when none is declared
  * ([[RobotsKernel.crawlDelayMilli]]). Registered as
  * `vfs_robots_crawl_delay`. */
case class RobotsCrawlDelay(robots: Expression, userAgent: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def left: Expression = robots
  override def right: Expression = userAgent
  override def inputTypes: Seq[org.apache.spark.sql.graft.shims.AbstractDataType] =
    Seq(StringType, StringType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "vfs_robots_crawl_delay"
  override def nullSafeEval(r: Any, ua: Any): Any = {
    val v = RobotsKernel.crawlDelayMilli(r.asInstanceOf[UTF8String],
      ua.asInstanceOf[UTF8String])
    if (v == null) null else v.longValue()
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val d = ctx.freshName("graftDelay")
    nullSafeCodeGen(ctx, ev, (r, ua) => s"""
      |java.lang.Long $d =
      |  graft.functions.RobotsKernel.crawlDelayMilli($r, $ua);
      |${ev.isNull} = $d == null;
      |${ev.value} = ${ev.isNull} ? -1L : $d.longValue();
    """.stripMargin)
  }
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(robots = l, userAgent = r)
}

/** Sitemap XML parsing — the step AFTER [[RobotsKernel.sitemaps]]
  * hands a politeness pipeline its sitemap URLs: extract every
  * `<loc>` value from a urlset OR sitemapindex document
  * (sitemaps.org protocol) in document order, XML entities decoded
  * (amp/lt/gt/quot/apos + numeric), values trimmed. Tolerant of
  * malformed markup like [[HtmlKernel]] (an unclosed loc runs to
  * end-of-input; a crawl payload never fails a stage) — together
  * with the URL-curation family this closes the crawl loop:
  * robots → sitemaps → frontier → normalize/dedup/cap. */
object SitemapKernel {
  def locs(xml: UTF8String): Array[UTF8String] =
    entries(xml).map(_._1)

  /** `<lastmod>` values POSITIONALLY ALIGNED with [[locs]] — "" when
    * a loc carries none (containsNull-free arrays; zip the two with
    * arrays_zip / posexplode). The pairing heuristic is the
    * sitemaps.org element order: the lastmod claimed by a loc is the
    * first `<lastmod>` between that loc's end and the NEXT `<loc`
    * (lastmod follows loc inside the same url/sitemap container, and
    * stopping at the next loc prevents claiming a sibling's). */
  def lastmods(xml: UTF8String): Array[UTF8String] =
    entries(xml).map(_._2)

  // per-thread single-entry memo (the RobotsKernel pattern): the
  // documented usage pairs vfs_sitemap_locs with vfs_sitemap_lastmods
  // over the SAME xml column, which would otherwise run the full
  // document walk twice per row
  private val memo = new ThreadLocal[(UTF8String, Array[(UTF8String, UTF8String)])]

  /** The shared walk: (loc, lastmod-or-"") pairs in document order,
    * memoized per thread on the xml value. */
  private def entries(xml: UTF8String): Array[(UTF8String, UTF8String)] = {
    val m = memo.get()
    if (m != null && m._1 == xml) return m._2
    val computed = entriesWalk(xml)
    memo.set((xml.clone(), computed))
    computed
  }

  private def entriesWalk(xml: UTF8String): Array[(UTF8String, UTF8String)] = {
    val s = xml.toString
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(UTF8String, UTF8String)]
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '<' &&
        s.regionMatches(true, i, "<loc", 0, 4) &&
        // NAME BOUNDARY: <location>/<loc-x> are different elements
        (i + 4 >= s.length || {
          val c = s.charAt(i + 4)
          !c.isLetterOrDigit && c != '-' && c != '_'
        })) {
        // past the open tag's '>'
        var j = i + 4
        while (j < s.length && s.charAt(j) != '>') j += 1
        // a self-closed <loc/> has no body at all
        val selfClosed = j < s.length && j > i && s.charAt(j - 1) == '/'
        val bodyAt = if (j < s.length) j + 1 else s.length
        // CDATA is found BEFORE the close-tag scan: a CDATA section
        // may itself contain the bytes '</loc' (its content is
        // literal per XML), so the ']]>' terminator bounds the value
        // and only then does the close-tag search resume
        var cdAt = bodyAt
        while (cdAt < s.length && s.charAt(cdAt).isWhitespace) cdAt += 1
        val isCdata = !selfClosed &&
          s.regionMatches(false, cdAt, "<![CDATA[", 0, 9)
        // an unterminated CDATA runs to end-of-input (the tolerant
        // unclosed-loc stance)
        val cdEnd = if (isCdata) s.indexOf("]]>", cdAt + 9) else -1
        // the close-tag scan starts past the CDATA value (a '</loc'
        // inside it is content, not markup) — ONE scan serves both
        // the value slice and the loop advance
        val scanFrom =
          if (isCdata) { if (cdEnd < 0) s.length else cdEnd + 3 }
          else bodyAt
        val close = if (selfClosed) bodyAt else indexOfClose(s, scanFrom)
        val value =
          if (isCdata)
            (if (cdEnd < 0) s.substring(cdAt + 9)
             else s.substring(cdAt + 9, cdEnd)).trim
          else if (selfClosed) ""
          else
            // terminate at THIS element's close tag specifically —
            // the first '</' would cut nested markup short
            decodeXml(s.substring(bodyAt,
              if (close < 0) s.length else close).trim).trim
        val after = if (close < 0) s.length else close
        // dangling/self-closed/empty loc elements carry no URL —
        // never emit an empty-string frontier row. The lastmod claim
        // tries the forward scan first (the XSD order: loc, then
        // lastmod), then the backward within-container scan — real-
        // world sitemaps write <lastmod> BEFORE <loc> inside a <url>
        // entry and parsers accept it; without the backward claim
        // every such lastmod would shift to the PREVIOUS entry.
        if (value.nonEmpty) {
          val fwd = lastmodAfter(s, after)
          val lm = if (fwd.nonEmpty) fwd else lastmodBefore(s, i)
          out += ((UTF8String.fromString(value),
            UTF8String.fromString(lm)))
        }
        i = after
      } else i += 1
    }
    out.toArray
  }

  /** Case-insensitive open/close-tag token at `i` with a NAME
    * BOUNDARY after it (`<url` must not match `<urlset`, `<sitemap`
    * must not match `<sitemapindex`). */
  private def tokenAt(s: String, i: Int, tok: String): Boolean =
    s.regionMatches(true, i, tok, 0, tok.length) &&
      (i + tok.length >= s.length || {
        val c = s.charAt(i + tok.length)
        !c.isLetterOrDigit && c != '-' && c != '_'
      })

  /** Decoded body of the `<lastmod>` element whose open tag starts
    * at `i`; "" for self-closed/empty. */
  private def lastmodBodyAt(s: String, i: Int): String = {
    var j = i + 8
    while (j < s.length && s.charAt(j) != '>') j += 1
    val selfClosed = j < s.length && j > i && s.charAt(j - 1) == '/'
    if (selfClosed) return ""
    val bodyAt = if (j < s.length) j + 1 else s.length
    var end = bodyAt
    while (end < s.length && s.charAt(end) != '<') end += 1
    decodeXml(s.substring(bodyAt, end).trim).trim
  }

  /** The first `<lastmod>` body after `from` WITHIN the current
    * entry: the scan stops at the next `<loc` open tag AND at any
    * entry-container boundary (`<url`/`</url`/`<sitemap`/
    * `</sitemap`, name-bounded — `<urlset`/`<sitemapindex` are
    * different elements), "" when absent — a lastmod in the NEXT
    * container entry must not be claimed by this one. Entities
    * decoded, trimmed (ISO dates in practice, but authors escape). */
  private def lastmodAfter(s: String, from: Int): String = {
    var i = from
    while (i < s.length) {
      if (s.charAt(i) == '<') {
        if (tokenAt(s, i, "<loc") || tokenAt(s, i, "<url") ||
          tokenAt(s, i, "</url") || tokenAt(s, i, "<sitemap") ||
          tokenAt(s, i, "</sitemap"))
          return "" // the entry's extent ends — nothing claimed
        if (tokenAt(s, i, "<lastmod")) return lastmodBodyAt(s, i)
      }
      i += 1
    }
    ""
  }

  /** The backward claim: a `<lastmod>` BEFORE the loc within the
    * same `<url>`/`<sitemap>` container (the accepted real-world
    * order the XSD does not prescribe). Scans backward from the
    * loc's open tag at `locAt` for the nearest boundary; only an
    * entry-OPEN (`<url`/`<sitemap`) admits a claim — any other
    * boundary (a previous entry's close, a sibling loc, flat
    * container-less lists) yields "" so a flat
    * `<loc/><lastmod/><loc/>` sequence can never double-claim. */
  private def lastmodBefore(s: String, locAt: Int): String = {
    var i = locAt - 1
    while (i >= 0) {
      if (s.charAt(i) == '<') {
        if (tokenAt(s, i, "<url") || tokenAt(s, i, "<sitemap")) {
          var j = i
          while (j < locAt) {
            if (s.charAt(j) == '<' && tokenAt(s, j, "<lastmod"))
              return lastmodBodyAt(s, j)
            j += 1
          }
          return ""
        }
        if (tokenAt(s, i, "</url") || tokenAt(s, i, "</sitemap") ||
          tokenAt(s, i, "<loc") || tokenAt(s, i, "</loc")) return ""
      }
      i -= 1
    }
    ""
  }

  /** Index of `</loc` (case-insensitive, name-bounded) at or after
    * `from`; -1 when absent. */
  private def indexOfClose(s: String, from: Int): Int = {
    var i = from
    while (i < s.length) {
      if (s.charAt(i) == '<' &&
        s.regionMatches(true, i, "</loc", 0, 5) &&
        (i + 5 >= s.length || {
          val c = s.charAt(i + 5)
          !c.isLetterOrDigit && c != '-' && c != '_'
        })) return i
      i += 1
    }
    -1
  }

  /** XML entity decode via the ONE shared reference decoder
    * ([[HtmlKernel.decodeRef]] — named + numeric/hex, full code-point
    * range, unterminated refs pass through literally). */
  private def decodeXml(v: String): String = {
    if (v.indexOf('&') < 0) return v
    val out = new java.lang.StringBuilder(v.length)
    var i = 0
    while (i < v.length) {
      if (v.charAt(i) == '&') i = HtmlKernel.decodeRef(v, i, out)
      else { out.append(v.charAt(i)); i += 1 }
    }
    out.toString
  }
}

/** sitemap_xml → ARRAY<STRING> of `<loc>` URLs in document order
  * ([[SitemapKernel.locs]]). Registered as `vfs_sitemap_locs`. */
case class SitemapLocs(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graft.shims.AbstractDataType] =
    Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "vfs_sitemap_locs"
  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(
      SitemapKernel.locs(v.asInstanceOf[UTF8String]).asInstanceOf[Array[Any]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.SitemapKernel.locs($c))")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** sitemap_xml → ARRAY<STRING> of `<lastmod>` values positionally
  * aligned with [[SitemapLocs]]' output ("" when a loc carries none
  * — zip the two with arrays_zip/posexplode); the recrawl
  * scheduler's change signal ([[SitemapKernel.lastmods]]).
  * Registered as `vfs_sitemap_lastmods`. */
case class SitemapLastmods(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graft.shims.AbstractDataType] =
    Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "vfs_sitemap_lastmods"
  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(
      SitemapKernel.lastmods(v.asInstanceOf[UTF8String])
        .asInstanceOf[Array[Any]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.SitemapKernel.lastmods($c))")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** robots_txt → ARRAY<STRING> of `Sitemap:` URLs in document order
  * ([[RobotsKernel.sitemaps]]). Registered as `vfs_robots_sitemaps`. */
case class RobotsSitemaps(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graft.shims.AbstractDataType] =
    Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "vfs_robots_sitemaps"
  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(
      RobotsKernel.sitemaps(v.asInstanceOf[UTF8String]).asInstanceOf[Array[Any]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.RobotsKernel.sitemaps($c))")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
