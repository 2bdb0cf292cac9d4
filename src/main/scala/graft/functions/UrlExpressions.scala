package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** STRING host → STRING registered domain (eTLD+1) under a
  * public-suffix SNAPSHOT fixed at plan time — the full-fidelity
  * variant of [[graft.operators.WebCuration.registeredDomain]], whose
  * frozen 46-entry head treats every hosting-platform suffix
  * (`github.io`, `blogspot.com`, `netlify.app` — all public-suffix
  *-list entries) as an ordinary domain and so collapses thousands of
  * unrelated sites into one "publisher" for per-domain capping.
  *
  * Longest-match-wins over the snapshot, the PSL algorithm:
  * registered domain = one label + the longest listed suffix of the
  * host. Plain entries match exactly; wildcard entries (`*.foo`)
  * match any single label + `foo`; exception rules (`!bar.foo`)
  * override — a host matching an exception (itself or as a suffix)
  * registers AT the exception's own labels (PSL semantics: the
  * exception names a registrable domain carved out of a wildcard),
  * so the full unmodified public_suffix_list.dat loads once comments
  * and blanks are stripped. Two deliberate divergences from strict
  * PSL, both keeping rows attributable for curation: a host that IS
  * a listed suffix returns itself (strict PSL says "no registrable
  * domain"), and a host whose TLD is absent from the snapshot falls
  * back to the last-two-labels rule (the head expression's stance)
  * instead of NULL.
  *
  * Scale shape: the snapshot (~10k entries for the full list) ships
  * INSIDE the expression once per task via `addReferenceObj` and
  * deserializes into a per-executor hash set — each row costs one
  * label split + O(labels) hash probes. A `map(...)` literal was
  * rejected: Catalyst's `GetMapValue` on a literal map is a LINEAR
  * scan, O(|snapshot|) per candidate per row. `defineCodeGen` keeps
  * the projection inside whole-stage codegen.
  */
case class PslDomain(child: Expression, suffixes: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {
  PslDomain.validate(suffixes)
  // built on the driver, shipped inside the expression; the transient
  // lazy index rebuilds once per executor, not per row (the
  // [[TermCounts.Lookup]] pattern)
  private val lookup = new PslDomain.Lookup(suffixes.toArray)
  override def inputTypes: Seq[org.apache.spark.sql.graft.shims.AbstractDataType] =
    Seq(StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vfs_psl_domain"

  override def nullSafeEval(h: Any): Any =
    PslDomain.domain(h.asInstanceOf[UTF8String], lookup)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pslLookup", lookup,
      classOf[PslDomain.Lookup].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PslDomain.domain($c, $ref)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object PslDomain {

  private[graft] def validate(suffixes: Seq[String]): Unit = {
    require(suffixes.nonEmpty, "[GRAFT] vfs_psl_domain: empty snapshot")
    suffixes.foreach { s0 =>
      val s = if (s0.startsWith("!")) s0.drop(1) else s0
      require(s.nonEmpty && !s.contains("/") && !s.contains("!") &&
          !s.exists(_.isWhitespace) && !s.startsWith(".") &&
          !s.endsWith(".") &&
          (!s.contains("*") || (s.startsWith("*.") &&
            !s.drop(2).contains("*") && s.length > 2)) &&
          !(s0.startsWith("!") && s.contains("*")),
        s"[GRAFT] vfs_psl_domain: bad snapshot entry '$s0' — plain " +
          "suffixes, '*.parent' wildcards and '!exception' rules " +
          "only (strip comments and blank lines when loading the list)")
    }
  }

  /** The four derived structures, built together and published as ONE
    * immutable object — see [[Lookup.index]] for why. */
  private[PslDomain] final class Index(
      val exact: java.util.HashSet[String],
      val wild: java.util.HashSet[String],
      val exceptions: java.util.HashSet[String],
      val maxLabels: Int)

  /** Serializable snapshot with a transient lazily-built index —
    * one exact-suffix set, one wildcard-PARENT set (`*.foo` is
    * stored as `foo` and matched against the candidate one label
    * shorter), one exception set (`!bar.foo` stored as `bar.foo`),
    * and the longest rule's label count. Entries are lowercased at
    * build time; hosts arrive lowercased from `urlHost`.
    *
    * All four fields publish through a SINGLE [[Index]] holder
    * assigned last: separate lazily-assigned fields would be a
    * cross-field data race — a thread sharing a built instance could
    * observe the sets published while the non-volatile `maxLabels`
    * was still 0, silently capping the suffix walk at two labels.
    * The holder's final fields are safe to read once the holder
    * reference is visible (JMM final-field semantics); a racing
    * reader seeing `null` rebuilds — idempotent, the index is a pure
    * function of `entries`. */
  final class Lookup(val entries: Array[String]) extends Serializable {
    @transient private var built: Index = _

    private[PslDomain] def index: Index = {
      var b = built
      if (b == null) {
        val e = new java.util.HashSet[String](entries.length * 2)
        val w = new java.util.HashSet[String]()
        val x = new java.util.HashSet[String]()
        var mx = 1
        var i = 0
        while (i < entries.length) {
          val s = entries(i).toLowerCase(java.util.Locale.ROOT)
          val labels = 1 + s.count(_ == '.')
          if (s.startsWith("!")) x.add(s.substring(1))
          else if (s.startsWith("*.")) w.add(s.substring(2))
          else e.add(s)
          if (labels > mx) mx = labels
          i += 1
        }
        b = new Index(e, w, x, mx)
        built = b
      }
      b
    }
  }

  /** static entry for codegen: lowercase (snapshot entries are
    * lowercased at build time — a raw mixed-case host column must not
    * silently miss every rule and fall to the two-label rule), one
    * split, one incremental suffix walk (longest match wins),
    * O(labels) hash probes. Output is the canonical lowercase form on
    * every path. */
  def domain(host: UTF8String, lk: Lookup): UTF8String = {
    val h = host.toString.toLowerCase(java.util.Locale.ROOT)
    val labels = h.split('.')
    val n = labels.length
    if (n <= 1) return UTF8String.fromString(h)
    // suffix strings of the last k labels, built incrementally
    val sfx = new Array[String](n + 1)
    sfx(0) = ""
    var k = 1
    while (k <= n) {
      sfx(k) =
        if (k == 1) labels(n - 1)
        else labels(n - k) + "." + sfx(k - 1)
      k += 1
    }
    val idx = lk.index
    val ex = idx.exact
    val wl = idx.wild
    val xc = idx.exceptions
    // a wildcard rule's own match is one label LONGER than its
    // parent, so depth k can match via wild(sfx(k-1)); cap the walk
    // at maxLabels + 1 to cover that
    val kMax = math.min(n, idx.maxLabels + 1)
    var best = 0
    k = 1
    while (k <= kMax) {
      // an exception names a REGISTRABLE domain carved out of a
      // wildcard: any host under (or equal to) it registers AT the
      // exception's own labels — it overrides every suffix rule
      if (xc.contains(sfx(k))) return UTF8String.fromString(sfx(k))
      if (ex.contains(sfx(k)) || (k >= 2 && wl.contains(sfx(k - 1))))
        best = k
      k += 1
    }
    if (best == 0) UTF8String.fromString(sfx(2)) // unlisted TLD: 2-label rule
    // host IS a suffix — documented divergence (sfx(n) == the
    // lowercased whole host)
    else if (best == n) UTF8String.fromString(sfx(n))
    else UTF8String.fromString(sfx(best + 1))
  }
}

/** STRING url → STRING lowercased scheme, NULL when the string has no
  * `scheme://` prefix — the kernel form of
  * [[graft.operators.WebCuration.urlScheme]]'s
  * `regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1)` chain.
  *
  * Why a kernel: the scheme/host/domain columns are built
  * COMPOSITIONALLY (host references scheme three times, domain
  * references host three times, …) and Catalyst expression trees
  * share nothing — every reference re-inlines the whole subtree, so
  * one `urlDomain` occurrence carried ~40 regexp nodes and a plan
  * with a handful of occurrences (filter + window key + group key)
  * blew Janino's 64 KB method limit and dropped the WHOLE STAGE to
  * interpreted eval (measured on the r18 lap probe: the domain-cap
  * stage at 17–24 process-CPU-seconds for 5 000 rows, with the "Code
  * grows beyond 64 KB" fallback in the log). Each kernel is ONE
  * scan of the string — constant generated-code size and no regex
  * machinery on the hot path.
  *
  * Parity with the regex form (spec-pinned in UrlKernelParitySpec):
  * the scheme class is ASCII, so the manual ASCII lowercase equals
  * `lower()`; the greedy `[A-Za-z0-9+.-]*` run cannot contain ':',
  * so the first non-class char must start `://` or there is no
  * match. */
case class UrlSchemeOf(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graft.shims.AbstractDataType] =
    Seq(StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def prettyName: String = "vfs_url_scheme"
  override def nullSafeEval(u: Any): Any =
    UrlKernel.scheme(u.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.UrlKernel.scheme($c);
      ${ev.isNull} = (${ev.value} == null);
    """)
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** STRING url → STRING canonical host (lowercased, userinfo and the
  * scheme's default port stripped, one leading `www.` stripped), NULL
  * when there is no scheme or the host comes out empty — the kernel
  * form of [[graft.operators.WebCuration.urlHost]]'s regex chain.
  * See [[UrlSchemeOf]] for why a kernel; parity notes on
  * [[UrlKernel.host]]. */
case class UrlHostOf(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graft.shims.AbstractDataType] =
    Seq(StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def prettyName: String = "vfs_url_host"
  override def nullSafeEval(u: Any): Any =
    UrlKernel.host(u.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.UrlKernel.host($c);
      ${ev.isNull} = (${ev.value} == null);
    """)
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** STRING host → STRING eTLD+1 under the frozen two-level-suffix
  * head — the kernel form of
  * [[graft.operators.WebCuration.registeredDomain]]'s two anchored
  * regexes + CASE. Matching is CASE-SENSITIVE like the regexes (the
  * suffix set is lowercase; [[UrlHostOf]] lowercases upstream).
  * Suffixes ship inside the expression ([[PslDomain]]'s
  * addReferenceObj pattern); every entry must be exactly two labels
  * (that is what `SuffixAltRe` encodes — the regex alternation
  * matches label + "." + entry at END, so the kernel probes the last
  * TWO labels against the set and takes three when a non-empty label
  * precedes). */
case class RegisteredDomainHead(child: Expression,
    suffixes: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {
  require(suffixes.nonEmpty &&
      suffixes.forall(s => s.count(_ == '.') == 1 && !s.startsWith(".") &&
        !s.endsWith(".") && s.nonEmpty),
    "[GRAFT] vfs_registered_domain: two-label suffixes only")
  private val lookup = new RegisteredDomainHead.Lookup(suffixes.toArray)
  override def inputTypes: Seq[org.apache.spark.sql.graft.shims.AbstractDataType] =
    Seq(StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def prettyName: String = "vfs_registered_domain"
  override def nullSafeEval(h: Any): Any =
    RegisteredDomainHead.domain(h.asInstanceOf[UTF8String], lookup)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("rdLookup", lookup,
      classOf[RegisteredDomainHead.Lookup].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.RegisteredDomainHead.domain($c, $ref)")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object RegisteredDomainHead {
  /** Serializable suffix snapshot, transient lazily-built set (the
    * [[PslDomain.Lookup]] pattern — single-assignment publish, racing
    * readers rebuild idempotently). */
  final class Lookup(val entries: Array[String]) extends Serializable {
    @transient private var built: java.util.HashSet[String] = _
    private[RegisteredDomainHead] def set: java.util.HashSet[String] = {
      var b = built
      if (b == null) {
        b = new java.util.HashSet[String](entries.length * 2)
        entries.foreach(b.add)
        built = b
      }
      b
    }
  }

  /** static entry for codegen. Replicates, in order:
    * `three = regexp_extract(host, "([^.]+\\.(?:alt))$", 1)` — last
    * TWO labels equal a listed suffix AND a non-empty dot-free label
    * precedes them;
    * `two = regexp_extract(host, "([^.]+\\.[^.]+)$", 1)` — last two
    * labels, both non-empty;
    * `CASE three≠'' → three, two≠'' → two, ELSE host`. */
  def domain(host: UTF8String, lk: Lookup): UTF8String = {
    val h = host.toString
    val n = h.length
    // last dot and second-last dot positions
    val d1 = h.lastIndexOf('.')
    if (d1 < 0) return host                  // no dot: two fails → host
    val d2 = h.lastIndexOf('.', d1 - 1)
    // two-label tail "a.b" with both labels non-empty and dot-free:
    // label1 = (d2, d1), label2 = (d1, n)
    val twoOk = d1 > d2 + 1 && d1 < n - 1
    if (twoOk && lk.set.contains(h.substring(d2 + 1))) {
      // listed suffix: take three labels when a non-empty label
      // precedes (chars (d3, d2) with d3 the next dot leftward)
      if (d2 >= 1) {
        val d3 = h.lastIndexOf('.', d2 - 1)
        if (d2 > d3 + 1)
          return UTF8String.fromString(h.substring(d3 + 1))
      }
      // no preceding label: three fails, two matched (it IS listed)
      return UTF8String.fromString(h.substring(d2 + 1))
    }
    if (twoOk) UTF8String.fromString(h.substring(d2 + 1))
    else host                                // two fails → host
  }
}

/** STRING url → STRING canonical dedup key — the kernel form of
  * [[graft.operators.WebCuration.normalizeUrl]]: scheme + "://" +
  * host + trailing-slash-stripped path + "?" + the sorted surviving
  * query params (tracking params dropped), NULL for non-URLs. One
  * pass over the string instead of the regex chain (whose
  * scheme/host subtrees alone re-inlined ~30 regexp nodes) plus an
  * INTERPRETED higher-order filter running one regex find per param.
  *
  * Exact-parity contract (spec-pinned in KernelParitySpec): the
  * original chain's regexes use `$`, which in Java matches before a
  * FINAL line terminator — so inputs containing any of the six Java
  * line-terminator chars take a slow path built on the ORIGINAL
  * pattern strings through the same java.util.regex engine
  * (identical by construction); the fast path handles
  * terminator-free strings (every real URL) with plain scans.
  * Tracking-param matching replicates
  * `^(utm_[^=&]*|fbclid|gclid|msclkid|ref|mc_eid)(=.*)?$`: the name
  * (before the first '=') is utm_-prefixed or one of the listed
  * literals. Param sort order is `array_sort`'s UTF8String BYTE
  * order. */
case class NormalizeUrlOf(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graft.shims.AbstractDataType] =
    Seq(StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def prettyName: String = "vfs_normalize_url"
  override def nullSafeEval(u: Any): Any =
    UrlKernel.normalize(u.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.UrlKernel.normalize($c);
      ${ev.isNull} = (${ev.value} == null);
    """)
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Shared per-row URL parsing for the kernel expressions. All
  * delimiters are ASCII, so Java char indexing is safe on any UTF-16
  * content; lowercasing of the HOST goes through
  * `UTF8String.toLowerCase` — byte-for-byte what `lower()` produces —
  * while the scheme's character class is pure ASCII and uses the
  * manual table. */
object UrlKernel {
  /** end index (exclusive) of a leading `scheme` whose `://` follows,
    * or -1 — `^[A-Za-z][A-Za-z0-9+.-]*://`. The class excludes ':',
    * so the greedy run is the unique candidate. */
  private def schemeEnd(s: String): Int = {
    if (s.isEmpty) return -1
    val c0 = s.charAt(0)
    if (!((c0 >= 'A' && c0 <= 'Z') || (c0 >= 'a' && c0 <= 'z')))
      return -1
    var i = 1
    while (i < s.length && {
      val c = s.charAt(i)
      (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
        (c >= '0' && c <= '9') || c == '+' || c == '.' || c == '-'
    }) i += 1
    if (s.regionMatches(i, "://", 0, 3)) i else -1
  }

  private def asciiLower(s: String): String = {
    var i = 0
    var needs = false
    while (i < s.length && !needs) {
      val c = s.charAt(i)
      if (c >= 'A' && c <= 'Z') needs = true else i += 1
    }
    if (!needs) return s
    val a = s.toCharArray
    var j = i
    while (j < a.length) {
      val c = a(j)
      if (c >= 'A' && c <= 'Z') a(j) = (c + 32).toChar
      j += 1
    }
    new String(a)
  }

  def scheme(u: UTF8String): UTF8String = {
    val s = u.toString
    val se = schemeEnd(s)
    if (se < 0) null else UTF8String.fromString(asciiLower(s.substring(0, se)))
  }

  // the ORIGINAL normalizeUrl patterns, for the rare slow path (the
  // kernel's fast path requires a terminator-free string; these give
  // bit-exact `$`/`.` line-terminator behavior through the same
  // engine the column form used)
  private val PathRe = java.util.regex.Pattern.compile("^([^?]*)")
  private val TrailSlashRe = java.util.regex.Pattern.compile("/+$")
  private val RawQRe = java.util.regex.Pattern.compile("\\?(.*)$")
  private val TrackRe = java.util.regex.Pattern.compile(
    graft.operators.WebCuration.TrackingParamRe)

  private def hasLineTerminator(s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\n' || c == '\r' || c == '\u0085' || c == '\u2028' ||
        c == '\u2029') return true
      i += 1
    }
    false
  }

  /** unsigned UTF-8 byte order — what array_sort does for strings */
  private val utf8Ord: java.util.Comparator[String] =
    (a: String, b: String) => java.util.Arrays.compareUnsigned(
      a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      b.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  private def isTracking(p: String): Boolean = {
    if (hasLineTerminator(p)) return TrackRe.matcher(p).find()
    val eq = p.indexOf('=')
    val name = if (eq >= 0) p.substring(0, eq) else p
    name.startsWith("utm_") || name == "fbclid" || name == "gclid" ||
      name == "msclkid" || name == "ref" || name == "mc_eid"
  }

  def normalize(u: UTF8String): UTF8String = {
    val s = u.toString
    val se = schemeEnd(s)
    if (se < 0) return null
    val hostU = host(u)
    if (hostU == null) return null
    val scheme = asciiLower(s.substring(0, se))
    // pathq: after the authority, up to the fragment
    var j = se + 3
    while (j < s.length && {
      val c = s.charAt(j); c != '/' && c != '?' && c != '#'
    }) j += 1
    var hEnd = s.indexOf('#', j)
    if (hEnd < 0) hEnd = s.length
    val pathq = s.substring(j, hEnd)
    var path: String = null
    var rawq: String = null
    if (hasLineTerminator(pathq)) {
      // slow path: the original regexes verbatim
      val pm = PathRe.matcher(pathq)
      val p0 = if (pm.find()) pm.group(1) else ""
      path = TrailSlashRe.matcher(p0).replaceAll("")
      val qm = RawQRe.matcher(pathq)
      rawq = if (qm.find()) qm.group(1) else ""
    } else {
      val qi = pathq.indexOf('?')
      var p0 = if (qi >= 0) pathq.substring(0, qi) else pathq
      var e = p0.length
      while (e > 0 && p0.charAt(e - 1) == '/') e -= 1
      path = if (e == p0.length) p0 else p0.substring(0, e)
      rawq = if (qi >= 0) pathq.substring(qi + 1) else ""
    }
    // split('&', keep empties) → drop empties + tracking → byte sort
    val kept = new java.util.ArrayList[String]()
    if (rawq.nonEmpty) {
      var st = 0
      var i = 0
      while (i <= rawq.length) {
        if (i == rawq.length || rawq.charAt(i) == '&') {
          if (i > st) {
            val p = rawq.substring(st, i)
            if (!isTracking(p)) kept.add(p)
          }
          st = i + 1
        }
        i += 1
      }
    }
    kept.sort(utf8Ord)
    val sb = new java.lang.StringBuilder(
      scheme.length + 3 + s.length)
    sb.append(scheme).append("://").append(hostU.toString).append(path)
    if (!kept.isEmpty) {
      sb.append('?')
      var i = 0
      while (i < kept.size) {
        if (i > 0) sb.append('&')
        sb.append(kept.get(i))
        i += 1
      }
    }
    UTF8String.fromString(sb.toString)
  }

  def host(u: UTF8String): UTF8String = {
    val s = u.toString
    val se = schemeEnd(s)
    if (se < 0) return null                  // no scheme → NULL
    // authority = chars after "://" until '/', '?', '#' or end
    val start = se + 3
    var j = start
    while (j < s.length && {
      val c = s.charAt(j); c != '/' && c != '?' && c != '#'
    }) j += 1
    var auth = s.substring(start, j)
    // strip userinfo through the FIRST '@' (`^[^@]*@` cannot cross
    // an '@'); case-independent, so stripping before the lowercase
    // matches the regex order exactly
    val at = auth.indexOf('@')
    if (at >= 0) auth = auth.substring(at + 1)
    // lower() parity: UTF8String.toLowerCase, not Java's
    var h = UTF8String.fromString(auth).toLowerCase.toString
    val sch = asciiLower(s.substring(0, se))
    if (sch == "http" && h.endsWith(":80"))
      h = h.substring(0, h.length - 3)
    else if (sch == "https" && h.endsWith(":443"))
      h = h.substring(0, h.length - 4)
    if (h.startsWith("www.")) h = h.substring(4)
    if (h.isEmpty) null else UTF8String.fromString(h)
  }
}

/** Per-JVM cache of table-backed PSL snapshots, keyed by the
  * `vfs_psl_domain_table` source string: Spark re-invokes a function
  * builder on every resolution of every occurrence, and each uncached
  * load is a full read + distinct + gated collect of the snapshot
  * table. Bounded at 8 sources (cleared wholesale beyond that — a
  * session uses ~1); a snapshot REFRESH is a new path or a session
  * restart, which the registry comment documents. */
private[graft] object PslTableCache {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[String]]()
  def load(src: String, f: () => Seq[String]): Seq[String] = {
    val hit = cache.get(src)
    if (hit != null) return hit
    // clear OUTSIDE any compute hook: mutating a ConcurrentHashMap
    // inside computeIfAbsent's mapping function is forbidden
    if (cache.size >= 8) cache.clear()
    val v = f()
    val prev = cache.putIfAbsent(src, v)
    if (prev != null) prev else v
  }
  private[graft] def reset(): Unit = cache.clear()
}
