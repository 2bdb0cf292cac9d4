package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.shims

/** URL-level curation for web-crawl corpora — the steps every
  * web-scale training pipeline runs BEFORE any content-based pass
  * (CCNet, Raffel et al. 2020 §2.2, Penedo et al. 2023 "RefinedWeb"
  * §3.1: URL filtering and URL-keyed dedup remove whole fetches for
  * cents before MinHash ever shingles a byte). No counterpart in the
  * reference (`vfs/src/vfs/vector.rs` — vectors only); this is the
  * brief's training-data-pipeline surface.
  *
  * Everything here is a per-row codegen'd string projection (zero
  * shuffle) except the two set-level verbs: [[urlDedup]] is one hash
  * aggregate on the normalized URL, and [[capPerDomain]] rides
  * [[Sampling.rankedTopN]]'s bounded-histogram threshold path — a
  * mega-domain (half the crawl is one CDN) never becomes a
  * single-task window sort.
  *
  * Normalization is DETERMINISTIC and engine-portable (the DuckDB
  * oracle reproduces it with the same regexes): two crawls of the
  * same page under `HTTP://WWW.Host.com:80/a/?utm_source=x` and
  * `http://host.com/a` collapse to one key. Canonical form — lowered
  * scheme and host, userinfo and default port stripped, one leading
  * `www.` stripped, fragment dropped, tracking params
  * (`utm_*`/`fbclid`/`gclid`/`msclkid`/`ref`/`mc_eid`) dropped,
  * surviving query params BYTE-SORTED (ASCII param names sort
  * identically in Spark's UTF8String order and DuckDB's default list
  * sort; non-ASCII param NAMES are out of contract), trailing path
  * slashes stripped. The result is a dedup KEY, not a fetchable URL.
  */
object WebCuration {

  /** Query params dropped by [[normalizeUrl]]: click/campaign
    * trackers that vary per fetch of the same page. Matched against
    * `name=` and bare `name` forms. */
  val TrackingParamRe: String =
    "^(utm_[^=&]*|fbclid|gclid|msclkid|ref|mc_eid)(=.*)?$"

  /** Two-level public suffixes [[registeredDomain]] recognizes — the
    * high-traffic entries of the public-suffix list, frozen so the
    * column is a pure function (a full PSL snapshot would ride a
    * broadcast lookup; these cover the common crawl head). */
  val TwoLevelSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.in", "net.in", "org.in", "co.nz", "org.nz", "net.nz",
    "com.br", "org.br", "net.br", "com.cn", "org.cn", "net.cn",
    "com.mx", "com.tr", "com.sg", "com.hk", "com.tw", "com.ar",
    "co.za", "co.kr", "or.kr", "com.my", "com.ph", "com.vn",
    "com.pl", "com.ru", "co.th", "co.id", "com.eg", "com.sa")

  private val SchemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"

  /** Lowercased scheme, or NULL for a string with no `scheme://`
    * prefix (relative references are not curatable URLs). One kernel
    * node ([[graft.functions.UrlSchemeOf]]); [[urlSchemeRegex]] is
    * the original regex chain it is spec-pinned against. */
  def urlScheme(url: Column): Column =
    shims.column(graft.functions.UrlSchemeOf(shims.expression(url)))

  /** The pre-r18 regex form of [[urlScheme]], kept as the parity
    * oracle for the kernel (UrlKernelParitySpec compares the two on
    * adversarial and generated inputs). */
  private[graft] def urlSchemeRegex(url: Column): Column = {
    val s = regexp_extract(url, SchemeRe, 1)
    when(s =!= "", lower(s))
  }

  /** Canonical host: lowercased, userinfo and the scheme's DEFAULT
    * port stripped (`:80` under http, `:443` under https — an
    * explicit non-default port is kept, it addresses a different
    * origin), one leading `www.` stripped. NULL when [[urlScheme]]
    * is NULL or the authority is empty. One kernel node
    * ([[graft.functions.UrlHostOf]] — the compositional regex form
    * re-inlined ~40 regexp nodes per occurrence and blew codegen's
    * 64 KB method limit in any plan using the domain as a filter or
    * key; see the kernel's scaladoc). [[urlHostRegex]] is the
    * original chain it is spec-pinned against. */
  def urlHost(url: Column): Column =
    shims.column(graft.functions.UrlHostOf(shims.expression(url)))

  /** The pre-r18 regex form of [[urlHost]] — parity oracle only. */
  private[graft] def urlHostRegex(url: Column): Column = {
    val hp = lower(regexp_replace(
      regexp_extract(url, SchemeRe + "([^/?#]*)", 2), "^[^@]*@", ""))
    val noPort = when(urlSchemeRegex(url) === "http",
        regexp_replace(hp, ":80$", ""))
      .when(urlSchemeRegex(url) === "https",
        regexp_replace(hp, ":443$", ""))
      .otherwise(hp)
    val h = regexp_replace(noPort, "^www\\.", "")
    when(urlSchemeRegex(url).isNotNull && h =!= "", h)
  }

  /** Anchored extractor for "label + listed two-level suffix" — the
    * suffix alternation is compiled INTO the regex (one pattern
    * object per task) instead of a 46-way IN over split-array
    * gymnastics: the expression-tree form repeated the whole host
    * derivation per array access and blew up every plan the domain
    * appears in (filters, window partition keys, group keys). */
  private val SuffixAltRe: String =
    "([^.]+\\.(?:" +
      TwoLevelSuffixes.map(_.replace(".", "\\.")).mkString("|") +
      "))$"

  /** eTLD+1 under the frozen [[TwoLevelSuffixes]] head: the last two
    * host labels, or three when the last two are a listed two-level
    * suffix (`news.bbc.co.uk` → `bbc.co.uk`). Hosts with a single
    * label (intranet names, IPs stay as-is under the 2-label rule)
    * pass through whole. */
  def registeredDomain(host: Column): Column =
    shims.column(graft.functions.RegisteredDomainHead(
      shims.expression(host), TwoLevelSuffixes))

  /** The pre-r18 regex form of [[registeredDomain]] — parity oracle
    * only (the DuckDB mirror still derives from [[domainRegexes]],
    * which is unchanged). */
  private[graft] def registeredDomainRegex(host: Column): Column = {
    val three = regexp_extract(host, SuffixAltRe, 1)
    val two = regexp_extract(host, "([^.]+\\.[^.]+)$", 1)
    when(three =!= "", three).when(two =!= "", two).otherwise(host)
  }

  /** The two [[registeredDomain]] patterns for the oracle mirror —
    * interpolated into the DuckDB CTE so the derivations share one
    * source of truth. */
  private[graft] def domainRegexes: (String, String) =
    (SuffixAltRe, "([^.]+\\.[^.]+)$")

  /** [[registeredDomain]] straight off a URL column. */
  def urlDomain(url: Column): Column = registeredDomain(urlHost(url))

  /** Curated public-suffix snapshot for fixtures and specs: the
    * frozen [[TwoLevelSuffixes]] head, the TLDs those entries imply,
    * the generic TLD head, and the hosting-platform suffixes whose
    * ABSENCE is the head expression's known failure mode (`u1.github
    * .io` and `u2.github.io` are unrelated publishers; the head
    * collapses both into "github.io" and [[capPerDomain]] then caps
    * them as one). Production loads the full list via
    * [[pslFromTable]]; this constant exists so derivations that must
    * agree (engine, oracle, spec) share one source of truth. */
  val PslSampleSnapshot: Seq[String] =
    TwoLevelSuffixes ++
      TwoLevelSuffixes.map(_.split('.').last).distinct ++
      Seq("com", "org", "net", "edu", "gov", "io", "app", "dev",
        "info", "biz", "co", "me", "us", "ca", "de", "fr", "it", "es",
        "nl", "se", "no", "fi", "ch", "at") ++
      Seq("github.io", "blogspot.com", "netlify.app", "pages.dev",
        "web.app", "firebaseapp.com", "herokuapp.com", "vercel.app",
        "wordpress.com", "tumblr.com", "neocities.org", "glitch.me")

  /** Fixture snapshot exercising the two rule kinds
    * [[pslDomainRegexes]] loudly refuses to compile — a `*.parent`
    * wildcard and a `!exception` carve-out (the `*.ck` / `!www.ck`
    * shape of the real list) — so their longest-match semantics can
    * be hash-matched against an independent engine via a HAND-derived
    * oracle CASE (hard-coded for this fixture), not just spec-pinned.
    * `!portal.ck` rather than `!www.ck` because [[urlHost]] strips
    * one leading `www.`, which would erase the exception host before
    * the walk ever saw it. */
  val PslWildSnapshot: Seq[String] =
    Seq("com", "ck", "*.ck", "!portal.ck")

  /** [[registeredDomain]] under a public-suffix SNAPSHOT — the
    * full-fidelity eTLD+1 ([[graft.functions.PslDomain]]: longest
    * listed suffix + one label, `*.parent` wildcards honored,
    * unlisted TLDs fall back to the head's two-label rule). The
    * snapshot ships inside the expression and probes a per-executor
    * hash set — still a pure per-row codegen projection, zero
    * shuffle, usable as a filter/group/window key like the head
    * form. On hosts whose suffix the frozen head covers the two
    * derivations agree (spec-pinned); they diverge exactly on the
    * entries the head is missing — which is the point. */
  def registeredDomainPsl(host: Column, psl: Seq[String]): Column =
    shims.column(graft.functions.PslDomain(shims.expression(host), psl))

  /** [[registeredDomainPsl]] straight off a URL column. */
  def urlDomainPsl(url: Column, psl: Seq[String]): Column =
    registeredDomainPsl(urlHost(url), psl)

  /** Load a public-suffix snapshot from a DataFrame (one `suffix`
    * string column — e.g. the parsed public_suffix_list.dat landed in
    * parquet) into the plan-time Seq [[registeredDomainPsl]] wants.
    * The collect is LOUDLY gated ([[BroadcastGate.requireCollectFits]]
    * — the real list is ~10k entries, far under any budget, but a
    * caller pointing this at the wrong table must not OOM the
    * driver); only comment lines and blanks must be stripped upstream
    * — plain suffixes, `*.parent` wildcards AND `!exception` rules
    * all load ([[graft.functions.PslDomain]] validates and names the
    * first bad entry; stripping exceptions would silently move
    * exception-carved hosts onto the wildcard path). Sorted for
    * deterministic plans. */
  def pslFromTable(df: DataFrame): Seq[String] = {
    require(df.columns.contains("suffix"),
      "[GRAFT] pslFromTable: need a 'suffix' column")
    val slim = df.select(col("suffix")).distinct()
    val n = slim.count()
    BroadcastGate.requireCollectFits(n, 0, "public-suffix snapshot",
      "A public-suffix list is ~10k rows; check the input table.")
    val vals = slim.collect().map(_.getString(0))
    // a NULL suffix is parse junk (a lenient CSV load's artifact):
    // fail HERE with the contract error, not with a bare NPE from the
    // lazy index build on an executor
    require(!vals.contains(null),
      "[GRAFT] pslFromTable: NULL suffix row — strip comments, blanks " +
        "and malformed lines when loading the list")
    vals.sorted.toSeq
  }

  /** The oracle mirror of [[registeredDomainPsl]] for PLAIN-entry
    * snapshots: anchored "one label + listed suffix" regexes grouped
    * by suffix label count, LONGEST group first — a CASE chain over
    * these, then the two-label fallback, reproduces longest-match-
    * wins exactly (for fixtures whose hosts are never themselves bare
    * suffixes; wildcard rules are spec-covered on the Scala side
    * only). Shared with the DuckDB derivation so the two cannot
    * drift. */
  private[graft] def pslDomainRegexes(psl: Seq[String]): Seq[String] = {
    // LOUD on both rule kinds the regexes cannot express: a '*.'
    // entry would need a per-depth wildcard branch and a '!' entry
    // would compile into an inert alternative that can never match —
    // either way the oracle would silently diverge from the engine
    require(psl.forall(s => !s.startsWith("*.") && !s.startsWith("!")),
      "[GRAFT] pslDomainRegexes: plain-entry snapshots only")
    psl.groupBy(_.count(_ == '.')).toSeq.sortBy(-_._1).map {
      case (_, group) =>
        "([^.]+\\.(?:" +
          group.sorted.map(_.replace(".", "\\.")).mkString("|") +
          "))$"
    }
  }

  /** The canonical dedup key (header comment has the full rule list).
    * NULL for non-URLs — a null key joins nothing and groups apart,
    * so malformed rows never collapse with real ones. Pure per-row
    * projection; the query-param lambda runs interpreted (HOF), but
    * over an already-staged short string, not a re-derived one. */
  def normalizeUrl(url: Column): Column =
    shims.column(graft.functions.NormalizeUrlOf(shims.expression(url)))

  /** The pre-r18 regex-chain form of [[normalizeUrl]] — parity oracle
    * only (KernelParitySpec; the kernel's scaladoc argues the exact
    * equivalence, including the Java `$`-before-final-terminator
    * slow path). */
  private[graft] def normalizeUrlRegex(url: Column): Column = {
    val scheme = urlSchemeRegex(url)
    val host = urlHostRegex(url)
    // path+query end at the fragment; path ends at the query
    val pathq = regexp_extract(url, SchemeRe + "[^/?#]*([^#]*)", 2)
    val path = regexp_replace(regexp_extract(pathq, "^([^?]*)", 1),
      "/+$", "")
    val rawq = regexp_extract(pathq, "\\?(.*)$", 1)
    val kept = array_sort(filter(split(rawq, "&"), p =>
      p =!= "" && !p.rlike(TrackingParamRe)))
    val q = array_join(kept, "&")
    when(scheme.isNotNull && host.isNotNull,
      concat(scheme, lit("://"), host, path,
        when(q =!= "", concat(lit("?"), q)).otherwise(lit(""))))
  }

  /** URL-keyed exact dedup: group the corpus by [[normalizeUrl]],
    * keep the member with the smallest `idCol` as `keeper` and report
    * the group size — ONE hash aggregate (map-side combined), the
    * cheapest whole-fetch dedup a crawl gets. Rows whose URL fails to
    * normalize (NULL key) are dropped: an unaddressable fetch has no
    * dedup identity. */
  def urlDedup(df: DataFrame, urlCol: String = "url",
      idCol: String = "doc_id"): DataFrame = {
    val key = normalizeUrl(col(urlCol))
    df.filter(key.isNotNull)
      .groupBy(key.as("norm_url"))
      .agg(min(col(idCol)).as("keeper"),
        count(lit(1)).as("cnt"))
  }

  /** URL-keyed keep-first SURVIVORS — the row form of [[urlDedup]]:
    * within each normalized-URL group only the row with the smallest
    * `idCol` survives, all columns intact. Unaddressable rows (NULL
    * key) pass through whole — they duplicate nothing. One window
    * over the normalized key; group sizes are duplicate
    * multiplicities (small by nature), so no skewed partition — and
    * the NULL-key rows are split out BEFORE the window rather than
    * riding it as one giant all-NULL partition. */
  def urlKeepFirst(df: DataFrame, urlCol: String = "url",
      idCol: String = "doc_id"): DataFrame = {
    WorkCols.requireFree(df, "__nu", "__rn")
    val staged = df.withColumn("__nu", normalizeUrl(col(urlCol)))
    val keyed = staged.filter(col("__nu").isNotNull)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__nu")).orderBy(col(idCol).asc)
    keyed.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
      .unionByName(staged.filter(col("__nu").isNull))
      .drop("__nu")
  }

  /** Per-registered-domain cap — head-domain downsampling ("no single
    * domain contributes more than n pages"): keep each domain's `n`
    * rows with the SMALLEST `rank` (LongType; pass e.g.
    * `-col("quality_milli")` to keep the highest-quality pages), ties
    * to the smallest `tiebreak`. Delegates to [[Sampling.rankedTopN]]
    * — bounded-histogram selection for the low-cardinality-domain
    * regime, never a single-task sort on a mega-domain.
    * Unattributable rows (URL normalizes to NULL) pass through WHOLE
    * — no domain means no cap applies, the same stance as
    * [[urlKeepFirst]] and the blocklist filters (rankedTopN alone
    * would silently turn the cap into a malformed-URL filter). Rows
    * with a NULL rank in an attributed domain still drop
    * (rankedTopN's contract — no rank, no place in a top-n). */
  def capPerDomain(df: DataFrame, urlCol: String, rank: Column,
      tiebreak: Column, n: Int, bandCap: Long = 100000L,
      maxStrata: Int = 512): DataFrame = {
    val d = urlDomain(col(urlCol))
    // no isNotNull pre-filter on the rankedTopN side: it already
    // excludes NULL strata on both paths, and a pre-filter would ride
    // every refinement scan as one more full-corpus domain evaluation
    Sampling.rankedTopN(df, d, rank, tiebreak, n, bandCap, maxStrata)
      .unionByName(df.filter(d.isNull))
  }

  /** [[capPerDomain]] with the full-fidelity PSL domain
    * ([[urlDomainPsl]]) AND the expensive-stratum recipe automated:
    * the domain derivation (URL regexes + suffix walk) runs ONCE into
    * a materialized slim frame ([[Sampling.rankedTopNMaterialized]] —
    * the optimizer re-inlines a staged work column into every
    * refinement pass otherwise; ScaleProbe measured the
    * expression-form cost at ~10× on a 5M-URL mega-domain), survivors
    * semi-join back by `idCol` (must be unique and non-null — the
    * rankedTopNMaterialized contract; `checkIds = true` enforces it
    * over the materialized slim frame). `reliable = true` checkpoints
    * the slim frame to fault-tolerant storage so a 100 TB cap job
    * survives executor loss — both flags pass straight through to
    * [[Sampling.rankedTopNMaterialized]], durability/retention story
    * there. Unattributable rows pass through whole, as in
    * [[capPerDomain]]. */
  def capPerDomainPsl(df: DataFrame, urlCol: String, psl: Seq[String],
      rank: Column, tiebreak: Column, idCol: String, n: Int,
      bandCap: Long = 100000L, maxStrata: Int = 512,
      reliable: Boolean = false, checkIds: Boolean = false): DataFrame = {
    val d = urlDomainPsl(col(urlCol), psl)
    Sampling.rankedTopNMaterialized(df, d, rank, tiebreak, idCol, n,
        bandCap, maxStrata, reliable, checkIds)
      // the domain is NULL iff the host is (the suffix walk never
      // nulls a non-null host), so the pass-through filter re-derives
      // only the host — not the whole suffix walk — per row
      .unionByName(df.filter(urlHost(col(urlCol)).isNull))
  }

  /** Drop rows whose registered domain is on a literal blocklist —
    * the inline form for human-sized lists (an `isin` predicate,
    * pushed into the scan stage, zero shuffle). */
  def blocklistFilter(df: DataFrame, urlCol: String,
      blocked: Seq[String]): DataFrame = {
    require(blocked.nonEmpty, "[GRAFT] blocklistFilter: empty list")
    val d = urlDomain(col(urlCol))
    df.filter(d.isNull || !d.isInCollection(blocked))
  }

  /** Drop rows whose registered domain appears in a blocklist TABLE
    * (one `domain` string column) — the form for real blocklists
    * (millions of rows): a LEFT ANTI join, broadcast-hinted iff the
    * caller KNOWS the list size and it fits the byte budget
    * ([[BroadcastGate.gated]], the `allowedSide` convention: 32-ish
    * bytes/domain ≈ dim 0 overhead rows); unknown size (`blockedRows
    * < 0`, the default) leaves the strategy to the planner/AQE. */
  def blocklistFilterTable(df: DataFrame, urlCol: String,
      blocked: DataFrame, blockedRows: Long = -1L): DataFrame = {
    require(blocked.columns.contains("domain"),
      "[GRAFT] blocklistFilterTable: need a 'domain' column")
    val slim = blocked.select(col("domain")).distinct()
    val side =
      if (blockedRows >= 0L) BroadcastGate.gated(slim, blockedRows, 0)
      else slim
    df.join(side, urlDomain(col(urlCol)) === side("domain"),
      "left_anti")
  }

  /** robots.txt fetchability gate (RFC 9309 — the crawl-politeness
    * filter): keep URL rows whose path the host's robots rules allow
    * for `userAgent`. `robots` is the per-host rules table
    * (host, robots_txt) a fetcher maintains; hosts with NO robots
    * row pass (the fetch-failed/absent default the RFC prescribes).
    * One hash join on the lowercased host — robots bodies are
    * KB-sized and one-per-domain, so the table broadcasts under AQE
    * when small and stays a plain shuffled join when not; rule
    * evaluation is the codegen'd
    * [[graft.functions.RobotsAllowed]] kernel with a per-thread
    * parse memo (domain-clustered crawl frames hit it row after
    * row). The matched path includes the query string (`?…`) — RFC
    * 9309 matches on the URI path-and-query. */
  /** The robots table slimmed to (`__rhost`, `__robots`), one row
    * per lowercased host, with the uniqueness contract enforced
    * INSIDE the returned plan: duplicate host rows would fan every
    * URL row out (and carry conflicting verdicts) through the left
    * join, so a per-host count feeds a `raise_error` branch that
    * fires when the plan executes — no eager validation job at
    * operator-construction time (robots frames can be large or
    * expensive to recompute, and the returned plan may never run).
    *
    * PRUNING CAVEAT (applies to every in-plan raise_error guard in
    * this file — here, [[politenessSchedule]]'s maxPerHost and
    * [[resolveRedirects]]' duplicate-edge): the guard lives in the
    * column it protects, so an action that lets Catalyst PRUNE that
    * column (a bare `count()`, a select that drops the guarded
    * output) skips the check — duplicate robots rows then resolve
    * to an arbitrary `first()` verdict silently. [[robotsFilter]]
    * always evaluates `__robots` in its filter, so IT cannot prune
    * the guard; callers of the schedule/redirect operators get the
    * contract exactly when they consume the operator's output
    * columns, which is what the operators exist to produce. */
  private def slimRobots(robots: DataFrame, op: String): DataFrame =
    robots.select(lower(col("host")).as("__rhost"),
        col("robots_txt").as("__r0"))
      .groupBy(col("__rhost"))
      .agg(count(lit(1)).as("__rcnt"), first(col("__r0")).as("__r1"))
      .select(col("__rhost"),
        when(col("__rcnt") > 1, raise_error(concat(
            lit(s"[GRAFT] $op: duplicate host rows in the robots " +
              "table ("), col("__rhost"), lit(")"))))
          .otherwise(col("__r1")).as("__robots"))

  def robotsFilter(urls: DataFrame, robots: DataFrame,
      userAgent: String, urlCol: String = "url"): DataFrame = {
    require(robots.columns.contains("host") &&
      robots.columns.contains("robots_txt"),
      "[GRAFT] robotsFilter: robots needs (host, robots_txt) columns")
    require(userAgent.nonEmpty, "[GRAFT] robotsFilter: empty user agent")
    val host = lower(parse_url(col(urlCol), lit("HOST")))
    // bare-host URLs: parse_url PATH yields the EMPTY string (not
    // NULL) — RFC 9309 matches the empty path as '/'
    val path = concat(
      coalesce(nullif(parse_url(col(urlCol), lit("PATH")), lit("")),
        lit("/")),
      coalesce(concat(lit("?"),
        parse_url(col(urlCol), lit("QUERY"))), lit("")))
    val slim = slimRobots(robots, "robotsFilter")
    urls.join(slim, host === col("__rhost"), "left")
      .filter(col("__robots").isNull ||
        graft.functions.vfs_robots_allowed(col("__robots"),
          lit(userAgent), path))
      .drop("__rhost", "__robots")
  }

  /** Per-host fetch schedule under each host's Crawl-delay — the
    * step AFTER [[robotsFilter]] in a polite fetcher: every URL gets
    * its host's delay (`vfs_robots_crawl_delay` through the same
    * most-specific UA group walk; hosts with no robots row or no
    * declared delay get `defaultDelayMilli`), a deterministic
    * per-host ordinal `fetch_seq` (ordered by `orderCol` —
    * discovery id, priority rank, whatever the frontier carries),
    * and `fetch_at_milli` = (fetch_seq − 1) · delay, the earliest
    * polite offset from the host's crawl start.
    *
    * Scale stance: the per-host ordinal is a genuine sequence (a
    * window over the host partition — one exchange + per-host sort),
    * and that is the RIGHT cost here because politeness itself
    * bounds the useful fan: a host scheduled at 1 fetch/sec caps out
    * at ~86k fetches/day, so cap the per-host frontier FIRST
    * ([[capPerDomain]] / [[capPerDomainPsl]]) and schedule the
    * survivors — composing the two is the documented recipe, not an
    * optimization opportunity inside this operator. `maxPerHost`
    * (> 0) turns that recipe into a LOUD contract: an in-plan
    * raise_error fires when any host's ordinal exceeds it — the
    * uncapped-mega-host mistake fails at execution naming the host
    * instead of silently sorting a hundred-million-row partition.
    * The guard rides `fetch_seq`: an action that prunes that column
    * skips it (see [[slimRobots]]' pruning caveat) — consume the
    * schedule columns, which is what this operator is for. */
  def politenessSchedule(urls: DataFrame, robots: DataFrame,
      userAgent: String, defaultDelayMilli: Long = 1000L,
      urlCol: String = "url",
      orderCol: String = "doc_id",
      maxPerHost: Long = 0L): DataFrame = {
    require(robots.columns.contains("host") &&
      robots.columns.contains("robots_txt"),
      "[GRAFT] politenessSchedule: robots needs (host, robots_txt)")
    require(userAgent.nonEmpty,
      "[GRAFT] politenessSchedule: empty user agent")
    require(defaultDelayMilli >= 0,
      "[GRAFT] politenessSchedule: negative default delay")
    // the output columns must not silently clobber (or duplicate)
    // caller columns — a frontier frame that already carries `host`
    // would otherwise come back with TWO host columns and fail on
    // first reference downstream
    Seq("host", "delay_milli", "fetch_seq", "fetch_at_milli")
      .foreach(c => require(!urls.columns.contains(c),
        s"[GRAFT] politenessSchedule: input already has a '$c' " +
          "column — rename it first (the schedule emits that name)"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__host")).orderBy(col(orderCol).asc)
    val seq0 = row_number().over(w).cast("long")
    val seq =
      if (maxPerHost <= 0) seq0
      else when(seq0 > maxPerHost, raise_error(concat(
          lit("[GRAFT] politenessSchedule: host "), col("__host"),
          lit(s" exceeds maxPerHost=$maxPerHost — cap the frontier " +
            "first (capPerDomain/capPerDomainPsl)"))))
        .otherwise(seq0)
    politenessStage(urls, robots, userAgent, defaultDelayMilli, urlCol,
        "politenessSchedule")
      .withColumn("fetch_seq", seq)
      .withColumn("fetch_at_milli",
        (col("fetch_seq") - 1L) * col("delay_milli"))
      .withColumnRenamed("__host", "host")
  }

  /** Redirect-chain resolution — the step between the WARC walk and
    * URL canonicalization on a real crawl: 3xx responses carry a
    * `Location` (surfaced by [[Warc.records]], routinely RELATIVE —
    * absolutize with `vfs_url_resolve(target_uri, location)` when
    * building the edge table), and corpus keys should be the FINAL
    * destination, not the hop. Maps `urlCol` to `final_url` after up
    * to `maxHops` hops, the hops taken as `n_hops`, and
    * `redirect_unresolved` — true iff `final_url` STILL sits on an
    * outgoing edge (one more join after the loop): a chain that
    * legitimately resolves in exactly `maxHops` hops reads false,
    * while a too-deep or cyclic one reads true — `n_hops` alone
    * cannot tell them apart. Real crawlers cap at 5-10 hops too, so
    * the bound is the semantics, not a shortcut.
    *
    * Scale stance: `maxHops` LEFT JOINS against the slim (from, to)
    * edge table — a STATIC plan, no driver iteration; the edge side
    * is redirect-sized (≪ corpus) and broadcasts under AQE, so each
    * hop is a map-side join at crawl scale. Duplicate from-URL edges
    * fail loudly in-plan (the [[robotsFilter]] contract — they would
    * fan rows out and carry conflicting destinations); the guard
    * rides `final_url`, so an action that prunes that column skips
    * it (see [[slimRobots]]' pruning caveat). */
  def resolveRedirects(urls: DataFrame, redirects: DataFrame,
      maxHops: Int = 3, urlCol: String = "url",
      fromCol: String = "from_url", toCol: String = "to_url"): DataFrame = {
    require(maxHops >= 1 && maxHops <= 16,
      "[GRAFT] resolveRedirects: maxHops must be in [1, 16] — each " +
        "hop is one join in a static plan")
    require(redirects.columns.contains(fromCol) &&
      redirects.columns.contains(toCol),
      s"[GRAFT] resolveRedirects: redirects needs ($fromCol, $toCol)")
    Seq("final_url", "n_hops", "redirect_unresolved").foreach(c =>
      require(!urls.columns.contains(c),
        s"[GRAFT] resolveRedirects: input already has a '$c' column"))
    WorkCols.requireFree(urls, "__cur", "__nh", "__rf", "__rt")
    val slim = redirects
      .select(col(fromCol).as("__rf0"), col(toCol).as("__rt0"))
      .groupBy(col("__rf0"))
      .agg(count(lit(1)).as("__rc"), first(col("__rt0")).as("__rt1"))
      .select(col("__rf0").as("__rf"),
        when(col("__rc") > 1, raise_error(concat(
            lit("[GRAFT] resolveRedirects: duplicate from-URL edges " +
              "for "), col("__rf0"))))
          .otherwise(col("__rt1")).as("__rt"))
    var cur = urls.withColumn("__cur", col(urlCol))
      .withColumn("__nh", lit(0L))
    var hop = 0
    while (hop < maxHops) {
      cur = cur.join(slim, col("__cur") === col("__rf"), "left")
        .withColumn("__nh",
          when(col("__rt").isNotNull, col("__nh") + 1L)
            .otherwise(col("__nh")))
        .withColumn("__cur", coalesce(col("__rt"), col("__cur")))
        .drop("__rf", "__rt")
      hop += 1
    }
    // the unresolved probe: does the FINAL url still redirect?
    cur.join(slim, col("__cur") === col("__rf"), "left")
      .withColumn("redirect_unresolved", col("__rt").isNotNull)
      .drop("__rf", "__rt")
      .withColumnRenamed("__cur", "final_url")
      .withColumnRenamed("__nh", "n_hops")
  }

  /** Opt-out compliance gate — the data-governance step an LLM
    * training pipeline runs BEFORE any content enters the corpus:
    * drop pages whose robots DIRECTIVES ask out. Directives come
    * from the page's `<meta name="robots">` (via `vfs_html_meta`)
    * and, when the caller passes `headerCol`, an `X-Robots-Tag`
    * response-header column; both are comma-separated token lists
    * matched case-insensitively and whitespace-tolerantly. The
    * default tokens are `noindex` plus the emerging AI opt-outs
    * `noai`/`noimageai` — honoring an author's noindex for training
    * data is the conservative reading of the directive. A page with
    * NO directives passes (absence is not consent either way — the
    * gate enforces stated opt-outs, it does not construct consent).
    * One codegen projection + a filter: zero shuffle, scales as a
    * scan. */
  def optOutFilter(pages: DataFrame, htmlCol: String = "html",
      headerCol: String = null,
      tokens: Seq[String] = Seq("noindex", "noai", "noimageai")): DataFrame = {
    require(tokens.nonEmpty, "[GRAFT] optOutFilter: empty token list")
    require(pages.columns.contains(htmlCol),
      s"[GRAFT] optOutFilter: no '$htmlCol' column")
    if (headerCol != null) require(pages.columns.contains(headerCol),
      s"[GRAFT] optOutFilter: no '$headerCol' column")
    val toks = array(tokens.map(t => lit(t.toLowerCase)): _*)
    def optedOut(c: Column): Column = c.isNotNull &&
      arrays_overlap(transform(split(c, ","), x => lower(trim(x))),
        toks)
    val metaDirectives =
      graft.functions.vfs_html_meta(col(htmlCol), lit("robots"))
    val out = optedOut(metaDirectives) ||
      (if (headerCol == null) lit(false) else optedOut(col(headerCol)))
    pages.filter(!out)
  }

  /** The recrawl set from sitemap change signals — the scheduling
    * step a standing crawl runs daily: `entries` carries exploded
    * (url, lastmod) pairs (from `vfs_sitemap_locs` zipped with
    * `vfs_sitemap_lastmods`; lastmod "" when the loc declared none),
    * `crawled` is the last-crawl ledger (url, crawled_at). Keeps
    * URLs never crawled (reason `never_crawled`) or whose declared
    * lastmod postdates the last crawl (reason `modified`). The
    * comparison is on INSTANTS, not strings: both sides cast to
    * timestamp (W3C datetime with a UTC offset — which sitemaps.org
    * allows — orders correctly this way; plain dates read as
    * midnight; lexicographic compare would mis-order mixed-offset
    * values and silently skip a stale page). An unparseable lastmod
    * is no change evidence (kept only when never crawled); a URL
    * whose ledger dates are ALL unparseable has no usable crawl
    * record — recrawl, conservatively, as `never_crawled`. A loc
    * with NO lastmod
    * is kept only when never crawled: absence is not change
    * evidence. Duplicate ledger rows fold to the LATEST crawl
    * (max crawled_at) — re-crawling bumps the ledger, so newest-wins
    * is the semantics, not a tiebreak. One hash agg on the ledger +
    * one left join — scales. */
  def recrawlSet(entries: DataFrame, crawled: DataFrame,
      urlCol: String = "url", lastmodCol: String = "lastmod",
      crawledUrlCol: String = "url",
      crawledAtCol: String = "crawled_at"): DataFrame = {
    require(crawled.columns.contains(crawledUrlCol) &&
      crawled.columns.contains(crawledAtCol),
      s"[GRAFT] recrawlSet: crawled needs ($crawledUrlCol, $crawledAtCol)")
    require(!entries.columns.contains("recrawl_reason"),
      "[GRAFT] recrawlSet: input already has a 'recrawl_reason' column")
    WorkCols.requireFree(entries, "__cu", "__ca")
    // the ledger folds on INSTANTS too (a string max would let a
    // +14:00-offset or garbage value outrank the real latest crawl);
    // try_to_timestamp reads malformed values as NULL instead of
    // throwing under ANSI mode ("" is the aligned-lastmods absent
    // marker and must stay non-evidence, not an error), and max
    // ignores them — a URL whose ledger rows are ALL unparseable
    // reads as never crawled (conservative: recrawl it)
    val slim = crawled
      .select(col(crawledUrlCol).as("__cu"),
        try_to_timestamp(col(crawledAtCol)).as("__ca0"))
      .groupBy(col("__cu")).agg(max(col("__ca0")).as("__ca"))
    val lmT = try_to_timestamp(col(lastmodCol))
    entries.join(slim, col(urlCol) === col("__cu"), "left")
      .filter(col("__ca").isNull || (lmT.isNotNull && lmT > col("__ca")))
      .withColumn("recrawl_reason",
        when(col("__ca").isNull, lit("never_crawled"))
          .otherwise(lit("modified")))
      .drop("__cu", "__ca")
  }

  /** [[recrawlSet]] extended with CONDITIONAL-REQUEST evidence — the
    * stronger change signal a standing crawl has: the previous
    * fetch's own `Last-Modified`/`ETag` response headers (the
    * ledger's validators) against a fresh probe sweep's (both
    * surfaced by [[Warc.records]]' `last_modified`/`etag` columns).
    * `crawled` is the ledger (url, crawled_at, etag, last_modified);
    * `probes` is the latest probe's headers per URL (url, etag,
    * last_modified) — one row per URL, duplicate probe rows fail
    * loudly in-plan (conflicting validator evidence; the
    * [[robotsFilter]] contract). "" means absent on every validator
    * column (the [[Warc.records]] convention; NULLs coalesce to "").
    *
    * Decision ladder per entry URL, most-authoritative first —
    * validators are compared as OPAQUE BYTES (RFC 9110 §8.8.1: a
    * changed validator means changed representation; parsing HTTP
    * dates would add failure modes without evidence):
    *
    *   1. never in the ledger (or no parseable crawl date) → keep,
    *      `never_crawled`;
    *   2. both sides carry an ETag: differ → keep
    *      `validator_changed`; match → SKIP even if the sitemap
    *      lastmod moved (the strong validator outranks the sitemap's
    *      self-declared hint);
    *   3. else both sides carry Last-Modified: differ → keep
    *      `validator_changed`; match → skip;
    *   4. else the [[recrawlSet]] sitemap rule: parseable lastmod
    *      postdating the last crawl → keep `modified`; else skip.
    *
    * Same shape as [[recrawlSet]]: one hash agg per side table + two
    * left joins — scales. */
  def recrawlSetConditional(entries: DataFrame, crawled: DataFrame,
      probes: DataFrame, urlCol: String = "url",
      lastmodCol: String = "lastmod", crawledUrlCol: String = "url",
      crawledAtCol: String = "crawled_at",
      crawledEtagCol: String = "etag",
      crawledLastModCol: String = "last_modified",
      probeUrlCol: String = "url", probeEtagCol: String = "etag",
      probeLastModCol: String = "last_modified"): DataFrame = {
    require(crawled.columns.contains(crawledUrlCol) &&
      crawled.columns.contains(crawledAtCol) &&
      crawled.columns.contains(crawledEtagCol) &&
      crawled.columns.contains(crawledLastModCol),
      s"[GRAFT] recrawlSetConditional: crawled needs ($crawledUrlCol, " +
        s"$crawledAtCol, $crawledEtagCol, $crawledLastModCol)")
    require(probes.columns.contains(probeUrlCol) &&
      probes.columns.contains(probeEtagCol) &&
      probes.columns.contains(probeLastModCol),
      s"[GRAFT] recrawlSetConditional: probes needs ($probeUrlCol, " +
        s"$probeEtagCol, $probeLastModCol)")
    require(!entries.columns.contains("recrawl_reason"),
      "[GRAFT] recrawlSetConditional: input already has a " +
        "'recrawl_reason' column")
    WorkCols.requireFree(entries, "__cu", "__ca", "__ce", "__cl",
      "__pu", "__pe", "__pl")
    // newest-wins ledger fold WITH the winning crawl's validators
    // riding along: max over (instant, etag, lastmod) structs — the
    // unparseable-date sentinel keeps struct fields non-null (cross-
    // engine null-in-struct ordering differs), while the separate
    // max(instant) keeps the all-unparseable → never_crawled stance
    val caT = try_to_timestamp(col(crawledAtCol))
    val slimC = crawled
      .select(col(crawledUrlCol).as("__cu"), caT.as("__ca0"),
        struct(
          coalesce(caT, to_timestamp(lit("1900-01-01"))).as("t"),
          coalesce(col(crawledEtagCol), lit("")).as("e"),
          coalesce(col(crawledLastModCol), lit("")).as("l")).as("__s"))
      .groupBy(col("__cu"))
      .agg(max(col("__ca0")).as("__ca"), max(col("__s")).as("__sm"))
      .select(col("__cu"), col("__ca"), col("__sm.e").as("__ce"),
        col("__sm.l").as("__cl"))
    val slimP = probes
      .select(col(probeUrlCol).as("__pu0"),
        coalesce(col(probeEtagCol), lit("")).as("__pe0"),
        coalesce(col(probeLastModCol), lit("")).as("__pl0"))
      .groupBy(col("__pu0"))
      .agg(count(lit(1)).as("__pc"), max(col("__pe0")).as("__pe1"),
        max(col("__pl0")).as("__pl1"))
      .select(col("__pu0").as("__pu"),
        when(col("__pc") > 1, raise_error(concat(
            lit("[GRAFT] recrawlSetConditional: duplicate probe rows " +
              "for "), col("__pu0"))))
          .otherwise(col("__pe1")).as("__pe"),
        col("__pl1").as("__pl"))
    val lmT = try_to_timestamp(col(lastmodCol))
    val pe = coalesce(col("__pe"), lit(""))
    val ce = coalesce(col("__ce"), lit(""))
    val pl = coalesce(col("__pl"), lit(""))
    val cl = coalesce(col("__cl"), lit(""))
    val etagPair = pe =!= "" && ce =!= ""
    val lmPair = pl =!= "" && cl =!= ""
    val decision =
      when(col("__ca").isNull, lit("never_crawled"))
        .when(etagPair && pe =!= ce, lit("validator_changed"))
        .when(etagPair, lit(null).cast("string")) // matched → skip
        .when(lmPair && pl =!= cl, lit("validator_changed"))
        .when(lmPair, lit(null).cast("string")) // matched → skip
        .when(lmT.isNotNull && lmT > col("__ca"), lit("modified"))
        .otherwise(lit(null).cast("string"))
    entries.join(slimC, col(urlCol) === col("__cu"), "left")
      .join(slimP, col(urlCol) === col("__pu"), "left")
      .withColumn("recrawl_reason", decision)
      .filter(col("recrawl_reason").isNotNull)
      .drop("__cu", "__ca", "__ce", "__cl", "__pu", "__pe", "__pl")
  }

  /** Per-stage drop accounting across the governance gates — the
    * report a compliance review asks for (the [[Dedup]] DropReport
    * pattern, applied to the three consent/policy filters): the
    * pipeline order is domain blocklist → robots fetchability
    * ([[robotsFilter]]'s RFC 9309 gate) → stated opt-out directives
    * ([[optOutFilter]]'s meta/header tokens). Emits one row per
    * stage with (stage ordinal, stage name, rows_in, rows_out,
    * dropped) — sequential semantics, so each stage's `rows_in` is
    * the previous stage's `rows_out` and a row dropped by an earlier
    * gate is not re-counted by a later one.
    *
    * ONE scan: the three verdicts are computed as flags in a single
    * projection (the robots verdict rides the same slim left join as
    * [[robotsFilter]]), folded by one aggregate, and unpivoted to
    * stage rows in-plan — no per-stage job, no collect. */
  def governanceReport(pages: DataFrame, robots: DataFrame,
      blocked: Seq[String], userAgent: String,
      urlCol: String = "url", htmlCol: String = "html",
      headerCol: String = null,
      tokens: Seq[String] = Seq("noindex", "noai", "noimageai")): DataFrame = {
    require(blocked.nonEmpty, "[GRAFT] governanceReport: empty blocklist")
    require(tokens.nonEmpty, "[GRAFT] governanceReport: empty token list")
    require(robots.columns.contains("host") &&
      robots.columns.contains("robots_txt"),
      "[GRAFT] governanceReport: robots needs (host, robots_txt)")
    require(userAgent.nonEmpty,
      "[GRAFT] governanceReport: empty user agent")
    require(pages.columns.contains(urlCol) &&
      pages.columns.contains(htmlCol),
      s"[GRAFT] governanceReport: need '$urlCol' and '$htmlCol' columns")
    if (headerCol != null) require(pages.columns.contains(headerCol),
      s"[GRAFT] governanceReport: no '$headerCol' column")
    val d = urlDomain(col(urlCol))
    val isBlocked = d.isNotNull && d.isInCollection(blocked)
    val host = lower(parse_url(col(urlCol), lit("HOST")))
    val path = concat(
      coalesce(nullif(parse_url(col(urlCol), lit("PATH")), lit("")),
        lit("/")),
      coalesce(concat(lit("?"),
        parse_url(col(urlCol), lit("QUERY"))), lit("")))
    val robotsAllowed = col("__robots").isNull ||
      graft.functions.vfs_robots_allowed(col("__robots"),
        lit(userAgent), path)
    val toks = array(tokens.map(t => lit(t.toLowerCase)): _*)
    def optedOut(c: Column): Column = c.isNotNull &&
      arrays_overlap(transform(split(c, ","), x => lower(trim(x))),
        toks)
    val out = optedOut(
        graft.functions.vfs_html_meta(col(htmlCol), lit("robots"))) ||
      (if (headerCol == null) lit(false) else optedOut(col(headerCol)))
    WorkCols.requireFree(pages, "__rhost", "__robots")
    val slim = slimRobots(robots, "governanceReport")
    val flagged = pages
      .join(slim, host === col("__rhost"), "left")
      .select(isBlocked.as("__b"), robotsAllowed.as("__ra"),
        out.as("__o"))
    // the sums coalesce so an EMPTY corpus reports three zero rows
    // instead of NULL arithmetic
    val agg = flagged.agg(
      count(lit(1)).as("n0"),
      coalesce(sum(when(col("__b"), 1L).otherwise(0L)), lit(0L))
        .as("d1"),
      coalesce(sum(when(!col("__b") && !col("__ra"), 1L)
        .otherwise(0L)), lit(0L)).as("d2"),
      coalesce(sum(when(!col("__b") && col("__ra") && col("__o"), 1L)
        .otherwise(0L)), lit(0L)).as("d3"))
    agg.select(explode(array(
        struct(lit(1L).as("stage"), lit("blocklist").as("stage_name"),
          col("n0").as("rows_in"),
          (col("n0") - col("d1")).as("rows_out"),
          col("d1").as("dropped")),
        struct(lit(2L).as("stage"), lit("robots").as("stage_name"),
          (col("n0") - col("d1")).as("rows_in"),
          (col("n0") - col("d1") - col("d2")).as("rows_out"),
          col("d2").as("dropped")),
        struct(lit(3L).as("stage"), lit("optout").as("stage_name"),
          (col("n0") - col("d1") - col("d2")).as("rows_in"),
          (col("n0") - col("d1") - col("d2") - col("d3"))
            .as("rows_out"),
          col("d3").as("dropped")))).as("s"))
      .select(col("s.stage"), col("s.stage_name"), col("s.rows_in"),
        col("s.rows_out"), col("s.dropped"))
  }

  /** The host + crawl-delay staging [[politenessSchedule]] and the
    * streaming twin ([[graft.streaming.Ingest.politenessStream]])
    * share: the lowercased host as `__host`, the resolved per-host
    * delay as `delay_milli` (declared Crawl-delay through the UA
    * group walk, else the default) — everything except the ordinal
    * assignment, which is a batch window in one and stateful fold in
    * the other. */
  private[graft] def politenessStage(urls: DataFrame, robots: DataFrame,
      userAgent: String, defaultDelayMilli: Long, urlCol: String,
      op: String): DataFrame = {
    val host = lower(parse_url(col(urlCol), lit("HOST")))
    val slim = slimRobots(robots, op)
    urls.withColumn("__host", host)
      .join(slim, col("__host") === col("__rhost"), "left")
      .withColumn("delay_milli",
        coalesce(
          graft.functions.vfs_robots_crawl_delay(col("__robots"),
            lit(userAgent)),
          lit(defaultDelayMilli)))
      .drop("__rhost", "__robots")
  }
}
