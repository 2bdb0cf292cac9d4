package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** RFC 3986 §5 reference resolution — the step between link
  * extraction and the URL frontier: `vfs_html_links` hands back
  * hrefs AS WRITTEN (routinely relative), and the frontier loop
  * ([[graft.operators.UrlIndex]], the curation family) needs them
  * absolute against the page URL. One pure per-row kernel
  * implementing the §5.2.2 transform exactly: scheme/authority/
  * path/query/fragment split (§3's first-match-wins grammar),
  * merge (§5.2.3), and remove_dot_segments (§5.2.4) — including
  * the abnormal-example behaviors (§5.4.2: excess `..` segments
  * drop at the root, dot segments collapse mid-path). No
  * validation, no percent-decoding, no case normalization — this
  * resolves exactly what the author wrote, and
  * [[graft.operators.WebCuration.normalizeUrl]] stays the ONE
  * canonicalization step downstream. */
object UrlResolveKernel {

  /** (scheme incl. ':', authority incl. '//', path, query incl.
    * '?', fragment incl. '#') — each null when ABSENT (an empty
    * query `?` is present-and-empty, the RFC distinction). */
  private final case class Parts(scheme: String, authority: String,
      path: String, query: String, fragment: String)

  private def parse(s: String): Parts = {
    var rest = s
    var fragment: String = null
    val hash = rest.indexOf('#')
    if (hash >= 0) { fragment = rest.substring(hash); rest = rest.substring(0, hash) }
    var query: String = null
    val q = rest.indexOf('?')
    if (q >= 0) { query = rest.substring(q); rest = rest.substring(0, q) }
    var scheme: String = null
    val colon = rest.indexOf(':')
    if (colon > 0) {
      val head = rest.substring(0, colon)
      // RFC 3986 scheme is ASCII-ONLY ALPHA / DIGIT / +-. — a
      // Unicode-aware isLetter would misread a non-ASCII first path
      // segment containing ':' as an absolute URI
      def alpha(c: Char) =
        (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
      val ok = alpha(head.charAt(0)) && head.forall(c =>
        alpha(c) || (c >= '0' && c <= '9') ||
          c == '+' || c == '-' || c == '.')
      // a colon BEFORE the first '/' with a valid scheme head is a
      // scheme; "a/b:c" is a path
      val firstSlash = rest.indexOf('/')
      if (ok && (firstSlash < 0 || firstSlash > colon)) {
        scheme = head; rest = rest.substring(colon + 1)
      }
    }
    var authority: String = null
    if (rest.startsWith("//")) {
      var end = 2
      while (end < rest.length && rest.charAt(end) != '/' &&
        rest.charAt(end) != '?' && rest.charAt(end) != '#') end += 1
      authority = rest.substring(0, end)
      rest = rest.substring(end)
    }
    Parts(scheme, authority, rest, query, fragment)
  }

  /** §5.2.4 remove_dot_segments. */
  private[graft] def removeDotSegments(path: String): String = {
    val out = new scala.collection.mutable.ArrayBuffer[String]()
    var in = path
    while (in.nonEmpty) {
      if (in.startsWith("../")) in = in.substring(3)
      else if (in.startsWith("./")) in = in.substring(2)
      else if (in.startsWith("/./")) in = "/" + in.substring(3)
      else if (in == "/.") in = "/"
      else if (in.startsWith("/../")) {
        in = "/" + in.substring(4)
        if (out.nonEmpty) out.remove(out.length - 1)
      } else if (in == "/..") {
        in = "/"
        if (out.nonEmpty) out.remove(out.length - 1)
      } else if (in == "." || in == "..") in = ""
      else {
        // move the first segment (through any leading '/', up to
        // but excluding the next '/') to the output
        val from = if (in.startsWith("/")) 1 else 0
        val slash = in.indexOf('/', from)
        if (slash < 0) { out += in; in = "" }
        else { out += in.substring(0, slash); in = in.substring(slash) }
      }
    }
    out.mkString
  }

  /** §5.2.3 merge. */
  private def merge(base: Parts, refPath: String): String =
    if (base.authority != null && base.path.isEmpty) "/" + refPath
    else {
      val slash = base.path.lastIndexOf('/')
      if (slash < 0) refPath
      else base.path.substring(0, slash + 1) + refPath
    }

  def resolve(base: UTF8String, ref: UTF8String): UTF8String = {
    val b = parse(base.toString)
    val r = parse(ref.toString)
    val t =
      if (r.scheme != null)
        Parts(r.scheme, r.authority, removeDotSegments(r.path),
          r.query, r.fragment)
      else if (r.authority != null)
        Parts(b.scheme, r.authority, removeDotSegments(r.path),
          r.query, r.fragment)
      else if (r.path.isEmpty)
        Parts(b.scheme, b.authority, b.path,
          if (r.query != null) r.query else b.query, r.fragment)
      else if (r.path.startsWith("/"))
        Parts(b.scheme, b.authority, removeDotSegments(r.path),
          r.query, r.fragment)
      else
        Parts(b.scheme, b.authority,
          removeDotSegments(merge(b, r.path)), r.query, r.fragment)
    val sb = new java.lang.StringBuilder(base.numBytes() + ref.numBytes())
    if (t.scheme != null) sb.append(t.scheme).append(':')
    if (t.authority != null) sb.append(t.authority)
    sb.append(t.path)
    if (t.query != null) sb.append(t.query)
    if (t.fragment != null) sb.append(t.fragment)
    UTF8String.fromString(sb.toString)
  }
}

/** (base_url, reference) → STRING absolute URL per RFC 3986 §5.
  * Registered as `vfs_url_resolve`. */
case class UrlResolve(base: Expression, ref: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def left: Expression = base
  override def right: Expression = ref
  override def inputTypes: Seq[org.apache.spark.sql.graft.shims.AbstractDataType] =
    Seq(StringType, StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "vfs_url_resolve"
  override def nullSafeEval(b: Any, r: Any): Any =
    UrlResolveKernel.resolve(b.asInstanceOf[UTF8String],
      r.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, r) =>
      s"graft.functions.UrlResolveKernel.resolve($b, $r)")
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(base = l, ref = r)
}
