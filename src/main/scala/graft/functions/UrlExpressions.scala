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
