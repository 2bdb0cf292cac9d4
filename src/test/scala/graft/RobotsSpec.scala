package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.RobotsKernel

/** robots.txt evaluation (RFC 9309): group selection, the
  * longest-match rule with allow-on-tie, wildcards and anchors,
  * tolerant parsing, and the join-shaped operator. */
class RobotsSpec extends AnyFunSuite {

  private def allowed(robots: String, ua: String, path: String): Boolean =
    RobotsKernel.allowed(UTF8String.fromString(robots),
      UTF8String.fromString(ua), UTF8String.fromString(path))

  test("group selection: exact UA (case-insensitive) beats *, * is the fallback, no group allows everything; a UA line after rules starts a new group") {
    val robots =
      """User-agent: *
        |Disallow: /all
        |
        |User-agent: FooBot
        |User-agent: BarBot
        |Disallow: /foo
        |
        |User-agent: QuxBot
        |Disallow: /qux
        |""".stripMargin
    assert(!allowed(robots, "foobot", "/foo/x"))
    assert(allowed(robots, "FOOBOT", "/all/x")) // its group, not *
    assert(!allowed(robots, "BarBot", "/foo/x")) // multi-UA group
    assert(!allowed(robots, "somebody", "/all/x")) // * fallback
    assert(allowed(robots, "somebody", "/foo/x"))
    assert(!allowed(robots, "QuxBot", "/qux")) // post-rules UA = new group
    assert(allowed(robots, "QuxBot", "/foo/x"))
    assert(allowed("# only comments\n", "anybot", "/anything"))
  }

  test("longest match wins; allow beats disallow on equal length; empty patterns are ignored") {
    val robots =
      """User-agent: *
        |Disallow: /page
        |Allow: /page/sub
        |Disallow:
        |Allow: /dual
        |Disallow: /dual
        |""".stripMargin
    assert(!allowed(robots, "b", "/page"))
    assert(!allowed(robots, "b", "/pagex")) // prefix match
    assert(allowed(robots, "b", "/page/sub/deep")) // longer allow
    assert(allowed(robots, "b", "/dual/x")) // tie -> allow
    assert(allowed(robots, "b", "/elsewhere")) // no rule -> allowed
  }

  test("wildcards and anchors: * spans octets, $ pins the end, multiple stars compose; paths are case-sensitive") {
    val robots =
      """User-Agent: *
        |Disallow: /*.pdf$
        |Disallow: /a*b*c
        |Disallow: /CASE
        |""".stripMargin
    assert(!allowed(robots, "b", "/docs/x.pdf"))
    assert(allowed(robots, "b", "/docs/x.pdf?dl=1")) // $ pins the end
    assert(!allowed(robots, "b", "/aXXbYYc"))
    assert(!allowed(robots, "b", "/abc"))
    assert(allowed(robots, "b", "/acb"))
    assert(!allowed(robots, "b", "/CASE/f"))
    assert(allowed(robots, "b", "/case/f")) // path case matters
  }

  test("tolerant parsing: comments strip, unknown directives skip, rules before any UA line are dropped") {
    val robots =
      """Disallow: /orphan
        |Sitemap: https://x.example/sitemap.xml
        |User-agent: bot # trailing comment
        |Crawl-delay: 10
        |Disallow: /x # comment after value
        |""".stripMargin
    assert(allowed(robots, "bot", "/orphan")) // orphan rule ignored
    assert(!allowed(robots, "bot", "/x/y"))
    assert(allowed(robots, "bot", "/y"))
  }

  test("RFC 9309 §2.2.1 most-specific UA group: exact beats prefix, prefix beats *, a LONGER robots token never claims a shorter crawler token") {
    val robots =
      """User-agent: mybot
        |Disallow: /img
        |
        |User-agent: mybot-news
        |Disallow: /news
        |
        |User-agent: mybot-news-eu
        |Disallow: /eu
        |
        |User-agent: *
        |Disallow: /
        |""".stripMargin
    // exact token match wins outright
    assert(!allowed(robots, "mybot-news", "/news/x"))
    assert(allowed(robots, "mybot-news", "/img/x"))
    // no exact group: the LONGEST prefix group applies (mybot-news,
    // not mybot) — exact-only selection would fall to '*' (block all)
    assert(!allowed(robots, "mybot-news-de", "/news/x"))
    assert(allowed(robots, "mybot-news-de", "/img/x"))
    // a shorter prefix still beats '*'
    assert(!allowed(robots, "mybot-img", "/img/x"))
    assert(allowed(robots, "mybot-img", "/news/x"))
    // robots token longer than the crawler token must NOT match:
    // plain "mybot" obeys its own group, never mybot-news's
    assert(allowed(robots, "mybot", "/news/x"))
    // unrelated agents still get '*'
    assert(!allowed(robots, "somebot", "/anything"))
  }

  test("crawl-delay: group-scoped via the same UA walk, decimal seconds to milli, NULL when the selected group declares none; sitemaps are global") {
    def delay(robots: String, ua: String): Option[Long] =
      Option(RobotsKernel.crawlDelayMilli(
        UTF8String.fromString(robots), UTF8String.fromString(ua)))
        .map(_.longValue())
    val robots =
      """Sitemap: https://x.example/s1.xml
        |User-agent: mybot
        |Crawl-delay: 1.5
        |Disallow: /img
        |
        |User-agent: quietbot
        |Disallow: /q
        |
        |User-agent: *
        |Crawl-delay: 10
        |Sitemap: https://x.example/s2.xml
        |Disallow: /x
        |""".stripMargin
    assert(delay(robots, "mybot") === Some(1500L))
    assert(delay(robots, "MyBot-News") === Some(1500L)) // prefix walk
    // quietbot's group exists but declares no delay: NULL, not '*'s
    assert(delay(robots, "quietbot") === None)
    assert(delay(robots, "otherbot") === Some(10000L)) // '*'
    // the Sitemap line inside the '*' group must not end its run:
    // the Disallow after it still belongs to '*'
    assert(!allowed(robots, "otherbot", "/x/y"))
    val maps = RobotsKernel.sitemaps(UTF8String.fromString(robots))
      .map(_.toString).toSeq
    assert(maps === Seq("https://x.example/s1.xml",
      "https://x.example/s2.xml"))
    // invalid delay values are skipped, not zeroed
    assert(delay("User-agent: a\nCrawl-delay: soon\n", "a") === None)
    // crawl-delay is rule-like: a UA line after it starts a NEW group
    val split = "User-agent: a\nCrawl-delay: 2\nUser-agent: b\nDisallow: /p\n"
    assert(delay(split, "a") === Some(2000L))
    assert(delay(split, "b") === None)
    assert(allowed(split, "a", "/p/x")) // a's group has no rules
    assert(!allowed(split, "b", "/p/x"))
  }

  test("a full User-Agent string matches its product-token group naturally (the token is a prefix of the whole UA string)") {
    val robots = "User-agent: mybot\nDisallow: /img\n" +
      "User-agent: *\nDisallow: /\n"
    assert(!allowed(robots, "MyBot/2.1 (+https://x.example/bot)", "/img/a"))
    assert(allowed(robots, "MyBot/2.1 (+https://x.example/bot)", "/doc"))
  }

  test("sitemap XML: <loc> values in document order across urlset and sitemapindex, entity decode, trim, name boundary, unclosed loc to end") {
    import graft.functions.SitemapKernel
    def locs(xml: String): Seq[String] =
      SitemapKernel.locs(UTF8String.fromString(xml)).map(_.toString).toSeq
    assert(locs("""<?xml version="1.0"?><urlset>
      |<url><loc>https://a/1?x=1&amp;y=2</loc></url>
      |<url><loc>
      |  https://a/2 </loc></url></urlset>""".stripMargin) ===
      Seq("https://a/1?x=1&y=2", "https://a/2"))
    // a sitemap INDEX lists child sitemaps through the same element
    assert(locs("<sitemapindex><sitemap><loc>https://a/s1.xml</loc>" +
      "</sitemap><sitemap><loc>https://a/s2.xml</loc></sitemap>" +
      "</sitemapindex>") === Seq("https://a/s1.xml", "https://a/s2.xml"))
    // <location>/<loc-x> are different elements; numeric refs decode
    assert(locs("<location>no</location><loc>https://a/&#47;p</loc>") ===
      Seq("https://a//p"))
    // unclosed loc runs to end-of-input (tolerant, deterministic)
    assert(locs("<loc>https://a/tail") === Seq("https://a/tail"))
    assert(locs("<urlset></urlset>") === Seq.empty)
    // CDATA-wrapped values (real sitemap generators emit these) are
    // literal per XML — no entity decode, the '</' inside must not
    // cut the value short
    assert(locs("<url><loc><![CDATA[https://a/x?y=1&z=2]]></loc></url>") ===
      Seq("https://a/x?y=1&z=2"))
    // a CDATA value CONTAINING the bytes '</loc' stays whole — the
    // ']]>' terminator bounds the value, not the first '</loc'
    assert(locs("<loc><![CDATA[https://a/p?t=</loc>x]]></loc>" +
      "<loc>https://a/next</loc>") ===
      Seq("https://a/p?t=</loc>x", "https://a/next"))
    // whitespace before the CDATA section is tolerated; an
    // unterminated CDATA runs to end-of-input
    assert(locs("<loc>  <![CDATA[https://a/ws]]>  </loc>") ===
      Seq("https://a/ws"))
    assert(locs("<loc><![CDATA[https://a/open") === Seq("https://a/open"))
    // 8-char numeric reference bodies and astral refs decode (the
    // shared HtmlKernel decoder — a diverged cap-8 copy rejected
    // &#0000038; once)
    assert(locs("<loc>https://a/&#0000038;b</loc>") === Seq("https://a/&b"))
    assert(locs("<loc>https://a/&#x10FFFF;</loc>") ===
      Seq("https://a/" + new String(Character.toChars(0x10FFFF))))
    // dangling '<loc' at EOF, self-closed, and empty elements emit
    // NO frontier row (never an empty-string URL)
    assert(locs("<urlset><url><loc") === Seq.empty)
    assert(locs("<url><loc/></url>") === Seq.empty)
    assert(locs("<loc></loc><loc>https://a/ok</loc>") ===
      Seq("https://a/ok"))
  }

  test("Spark surface: vfs_robots_crawl_delay and vfs_robots_sitemaps register for SQL") {
    val spark = GraftTest.spark
    import spark.implicits._
    graft.functions.registerAll(spark)
    Seq("User-agent: *\nCrawl-delay: 0.25\nSitemap: https://s/a.xml\n")
      .toDF("r").createOrReplaceTempView("robots_t")
    val row = spark.sql(
      """SELECT vfs_robots_crawl_delay(r, 'anybot') AS d,
        |  size(vfs_robots_sitemaps(r)) AS n FROM robots_t""".stripMargin)
      .head()
    assert(row.getLong(0) === 250L)
    assert(row.getInt(1) === 1)
  }

  test("an empty-Disallow group still claims its agent: allow-all, NOT fallthrough to *") {
    val robots =
      """User-agent: mybot
        |Disallow:
        |
        |User-agent: *
        |Disallow: /
        |""".stripMargin
    // RFC 9309: mybot's matched group (one empty disallow = allow
    // everything) applies; falling through to '*' would block all
    assert(allowed(robots, "mybot", "/x"))
    assert(!allowed(robots, "otherbot", "/x"))
  }

  test("bare-host URLs match as path '/' (parse_url yields the empty string, not NULL)") {
    val spark = GraftTest.spark
    import spark.implicits._
    val kept = graft.operators.WebCuration.robotsFilter(
      Seq((1L, "https://blocked.example"),
        (2L, "https://blocked.example/")).toDF("doc_id", "url"),
      Seq(("blocked.example", "User-agent: *\nDisallow: /\n"))
        .toDF("host", "robots_txt"), "bot")
    assert(kept.count() === 0L,
      "a fully-disallowed host must block its bare-host URL too")
  }

  test("sitemap lastmods: positionally aligned with locs, claimed only within the same element, entities decoded, absent/self-closed/dangling safe") {
    def lm(x: String): Seq[String] = graft.functions.SitemapKernel
      .lastmods(UTF8String.fromString(x)).toSeq.map(_.toString)
    def lc(x: String): Seq[String] = graft.functions.SitemapKernel
      .locs(UTF8String.fromString(x)).toSeq.map(_.toString)
    val two = "<urlset><url><loc>https://a/p</loc>" +
      "<lastmod>2026-01-15</lastmod></url>" +
      "<url><loc>https://a/q</loc></url></urlset>"
    assert(lc(two) === Seq("https://a/p", "https://a/q"))
    assert(lm(two) === Seq("2026-01-15", ""))
    // a lastmod BEFORE the next loc belongs to the current one; one
    // AFTER the next loc opens must not be claimed backward
    assert(lm("<loc>https://a/1</loc><loc>https://a/2</loc>" +
      "<lastmod>2026-03-01</lastmod>") === Seq("", "2026-03-01"))
    // entity decode + trim; self-closed lastmod is absent
    assert(lm("<loc>https://a/x</loc><lastmod> 2026&#45;02-01 " +
      "</lastmod>") === Seq("2026-02-01"))
    assert(lm("<loc>https://a/y</loc><lastmod/>") === Seq(""))
    // dangling lastmod at EOF is tolerated
    assert(lm("<loc>https://a/z</loc><lastmod>2026-04") ===
      Seq("2026-04"))
    // name boundary: <lastmodified> is a different element
    assert(lm("<loc>https://a/w</loc>" +
      "<lastmodified>nope</lastmodified>") === Seq(""))
    // sitemapindex entries pair the same way
    assert(lm("<sitemapindex><sitemap><loc>https://a/s.xml</loc>" +
      "<lastmod>2026-05-01</lastmod></sitemap></sitemapindex>") ===
      Seq("2026-05-01"))
  }

  test("sitemap lastmods: a <lastmod> BEFORE <loc> inside a <url>/<sitemap> container is claimed by ITS entry, never shifted to the previous one") {
    def lm(x: String): Seq[String] = graft.functions.SitemapKernel
      .lastmods(UTF8String.fromString(x)).toSeq.map(_.toString)
    // lastmod-first in the SECOND entry: the pre-fix walk attributed
    // it to the FIRST entry (forward scan stopped only at <loc)
    assert(lm("<urlset><url><loc>https://a/p</loc></url>" +
      "<url><lastmod>2026-06-01</lastmod><loc>https://a/q</loc>" +
      "</url></urlset>") === Seq("", "2026-06-01"))
    // both orders in one file pair correctly
    assert(lm("<urlset><url><loc>https://a/p</loc>" +
      "<lastmod>2026-01-01</lastmod></url>" +
      "<url><lastmod>2026-02-01</lastmod><loc>https://a/q</loc>" +
      "</url></urlset>") === Seq("2026-01-01", "2026-02-01"))
    // sitemapindex containers admit the backward claim too (and the
    // name boundary keeps <sitemapindex> from reading as <sitemap>)
    assert(lm("<sitemapindex><sitemap><lastmod>2026-03-01</lastmod>" +
      "<loc>https://a/s.xml</loc></sitemap></sitemapindex>") ===
      Seq("2026-03-01"))
    // flat container-less lists never claim backward — a preceding
    // lastmod belongs to the PREVIOUS loc's forward extent or nothing
    assert(lm("<lastmod>2026-04-01</lastmod><loc>https://a/x</loc>") ===
      Seq(""))
    // forward wins when an entry carries lastmods on both sides
    assert(lm("<url><lastmod>2026-01-01</lastmod>" +
      "<loc>https://a/p</loc><lastmod>2026-02-02</lastmod></url>") ===
      Seq("2026-02-02"))
    // the forward claim must not cross the entry's close into a
    // FOLLOWING container's lastmod
    assert(lm("<urlset><url><loc>https://a/p</loc></url>" +
      "<url><loc>https://a/q</loc>" +
      "<lastmod>2026-07-01</lastmod></url></urlset>") ===
      Seq("", "2026-07-01"))
  }

  test("duplicate host rows in the robots table fail loudly instead of fanning URLs out") {
    val spark = GraftTest.spark
    import spark.implicits._
    // the guard lives INSIDE the plan (no eager validation job at
    // construction time) — it fires when the plan executes
    val plan = graft.operators.WebCuration.robotsFilter(
      Seq((1L, "https://a.example/x")).toDF("doc_id", "url"),
      Seq(("a.example", "User-agent: *\nDisallow: /p\n"),
        ("a.example", "User-agent: *\nAllow: /\n"))
        .toDF("host", "robots_txt"), "bot")
    val e = intercept[Exception] { plan.count() }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(m => m.contains("[GRAFT]") &&
      m.contains("duplicate host")))
  }

  test("robotsFilter operator: hosts without a robots row pass, the query string participates in matching, survivors are exact") {
    val spark = GraftTest.spark
    import spark.implicits._
    val urls = Seq(
      (1L, "https://a.example/keep"),
      (2L, "https://a.example/private/x"),
      (3L, "https://a.example/search?q=term"),
      (4L, "https://norobots.example/anything")).toDF("doc_id", "url")
    val robots = Seq(("a.example",
      "User-agent: *\nDisallow: /private\nDisallow: /search?q=*\n"))
      .toDF("host", "robots_txt")
    val kept = graft.operators.WebCuration
      .robotsFilter(urls, robots, "GraftBot")
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(kept === Seq(1L, 4L))
    assert(intercept[IllegalArgumentException](
      graft.operators.WebCuration.robotsFilter(urls,
        robots.select($"host"), "x"))
      .getMessage.contains("[GRAFT]"))
  }
}
