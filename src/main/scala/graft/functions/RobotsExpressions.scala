package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** robots.txt evaluation (RFC 9309) — the crawl-politeness gate of a
  * web-curation pipeline, as a pure per-row kernel:
  *
  *   - groups are runs of `User-agent:` lines followed by their
  *     rules; comments (`#` to end of line) strip first; keys are
  *     case-insensitive; a user-agent line after rules starts a NEW
  *     group;
  *   - group selection: every group naming the product token
  *     (case-insensitive exact match) merges; when none match, the
  *     `*` groups apply; when neither exists, everything is allowed;
  *   - rule matching: `*` matches any octet sequence, `$` anchors the
  *     pattern end; among matching rules the LONGEST pattern (in
  *     octets, `$` excluded) wins, allow beating disallow on ties —
  *     the RFC's most-specific-match rule; empty patterns are
  *     ignored; no matching rule means allowed;
  *   - unknown directives (crawl-delay, sitemap) are skipped.
  *
  * Parsing is memoized per thread on the robots text (a crawl frame
  * carries ONE robots body per domain across many URL rows, and
  * domain-sorted input hits the memo almost every row). */
object RobotsKernel {

  final case class Rule(allow: Boolean, pattern: String,
      regex: java.util.regex.Pattern, weight: Int)

  /** Rules per lowercase user-agent token ('*' included). */
  final case class Parsed(groups: Map[String, Vector[Rule]])

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
          case _ => () // crawl-delay, sitemap, unknown: skipped
        }
      }
    }
    Parsed(groups.toMap)
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
    val rules = parsed.groups.getOrElse(ua,
      parsed.groups.getOrElse("*", Vector.empty))
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
