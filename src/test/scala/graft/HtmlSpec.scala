package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.HtmlKernel

/** HTML → text extraction: the tolerant-markup contract (script/
  * style/comment drops, entity decoding, block newlines, whitespace
  * normalization), title and link extraction, and the Spark
  * surface. The corpus-scale arithmetic is oracle-pinned
  * (web_html_extract / web_html_links). */
class HtmlSpec extends AnyFunSuite {

  private def text(s: String): String =
    HtmlKernel.text(UTF8String.fromString(s)).toString
  private def title(s: String): String =
    Option(HtmlKernel.title(UTF8String.fromString(s)))
      .map(_.toString).orNull
  private def links(s: String): Seq[String] =
    HtmlKernel.links(UTF8String.fromString(s)).map(_.toString).toSeq
  private def mainText(s: String): String =
    HtmlKernel.textMain(UTF8String.fromString(s)).toString

  test("entities: named, numeric, hex, nbsp; unknown and unterminated pass through literally") {
    assert(text("a&amp;b &lt;x&gt; &quot;q&quot; &apos;s&apos;") ===
      "a&b <x> \"q\" 's'")
    assert(text("&#72;&#101;&#x6C;&#X6C;o") === "Hello")
    assert(text("caf&#233;") === "café")
    assert(text("snow &#x2603;") === "snow ☃") // BMP hex
    assert(text("clef &#x1D11E;") === "clef 𝄞") // astral
    assert(text("a&nbsp;&nbsp;b") === "a b") // nbsp -> space, collapsed
    assert(text("5 &x; 6") === "5 &x; 6")    // unknown named
    assert(text("fish &chips") === "fish &chips") // no semicolon
    assert(text("&#xZZ; &#; &#x110000;") === "&#xZZ; &#; &#x110000;")
  }

  test("script/style content drops wholesale, including markup-looking strings; close tags may carry whitespace") {
    assert(text("a<script>if(x<1){y=\"<p>no</p>\";}</script>b") === "ab")
    assert(text("a<style>p>span{x:1}</style>b") === "ab")
    assert(text("a<SCRIPT src=\"x.js\">z</SCRIPT\n>b") === "ab")
    // unclosed script drops to end-of-input, silently
    assert(text("a<script>forever") === "a")
    // a CLOSE script tag alone is just a dropped tag
    assert(text("a</script>b") === "ab")
  }

  test("comments, quoted '>' in attributes, unclosed structures: tolerant and deterministic") {
    assert(text("a<!-- <p>gone</p> -->b") === "ab")
    assert(text("a<!-- unclosed") === "a")
    assert(text("""a<img alt="5 > 4">b""") === "ab")
    assert(text("a<img alt='x>y'>b") === "ab")
    assert(text("a<div unclosed") === "a")
    assert(text("2 < 3 and <4") === "2 < 3 and <4") // bare '<' is text
  }

  test("block tags separate lines; inline tags do not; whitespace normalizes") {
    assert(text("<p>one</p><p>two</p>") === "one\ntwo")
    assert(text("a<b>bold</b>c") === "aboldc")
    assert(text("x<br>y") === "x\ny")
    assert(text("  lots \t of \r space  ") === "lots of space")
    assert(text("<div>\n\n\n  a  \n\n<p></p>\n b </div>") === "a\nb")
    assert(text("<ul><li>i1</li><li>i2</li></ul>") === "i1\ni2")
  }

  test("custom elements are not the built-ins they prefix; surrogate references become U+FFFD") {
    // <script-x> is a CUSTOM element, not a raw-text script
    assert(text("a<script-x>visible</script-x>b") === "avisibleb")
    // </scripty> does not close <script>; the real close tag does
    assert(text("a<script>x</scripty>y</script>b") === "ab")
    // <title-bar> is not a title
    assert(title("<title-bar>Menu</title-bar><title>Real</title>") ===
      "Real")
    assert(title("<title-bar>Menu</title-bar>") === null)
    // <a-card> is not an anchor
    assert(links("""<a-card href="/no">x</a-card>""") === Seq.empty)
    // data-href must not shadow the real href
    assert(links("""<a data-href="/pixel" href="/real">x</a>""") ===
      Seq("/real"))
    // NUL and surrogate numeric references: U+FFFD, never ill-formed
    // UTF-8 in the output
    assert(text("a&#xD800;b&#0;c") === "a�b�c")
  }

  test("main-content scoping: chrome containers drop (cookie form, nav, footer), <main> prose and title stay; full extraction is untouched") {
    val page = "<html><head><title>T</title></head><body>" +
      "<nav><a href=\"/\">Home</a> About</nav>" +
      "<form>We use cookies <input value=\"ok\"> Accept</form>" +
      "<main><h1>Head</h1><p>prose &amp; more</p></main>" +
      "<footer>(c) site</footer></body></html>"
    assert(mainText(page) === "T\nHead\nprose & more")
    // the WET-parity extraction keeps every chrome line
    assert(text(page) ===
      "T\nHome About\nWe use cookies Accept\nHead\nprose & more\n(c) site")
  }

  test("main-content scoping: nested chrome depth-counts, script inside chrome never leaks, unclosed chrome drops to end, self-closing chrome is a no-op") {
    // nested: the inner </nav> must not reopen the outer header
    assert(mainText("<header>top <nav>menu</nav> still chrome</header>" +
      "<p>kept</p>") === "kept")
    // a script body inside chrome stays dropped even though the
    // chrome closes mid-walk
    assert(mainText("<aside>x<script>if(a<b){c()}</script>y</aside>" +
      "<p>kept</p>") === "kept")
    // unclosed chrome suppresses to end-of-input (the unclosed-script
    // stance); a stray close tag at depth 0 is ignored
    assert(mainText("<p>kept</p><nav>menu forever") === "kept")
    assert(mainText("</footer><p>kept</p>") === "kept")
    // '<nav/>' OPENS the element (HTML5 ignores the trailing slash
    // on non-void elements) — suppression runs until its close tag
    assert(mainText("<nav/>menu</nav><p>kept</p>") === "kept")
    assert(mainText("<nav/><p>dropped</p>") === "")
    // an unquoted attribute value ending in '/' must not be misread
    // as self-closing either
    assert(mainText("<nav data-x=a/>menu</nav><p>kept</p>") === "kept")
    // entity inside chrome is consumed (not half-emitted) and dropped
    assert(mainText("<nav>a&amp;b</nav><p>x&amp;y</p>") === "x&y")
  }

  test("pageExtractBatch(mainOnly): chrome-suppressed text lands, the link frontier keeps nav links, replay overwrites identically") {
    val spark = GraftTest.spark
    import spark.implicits._
    val pages = Seq(
      (1L, "<body><nav><a href=\"/x\">X</a> menu</nav>" +
        "<main><p>prose one</p></main><footer>f1</footer></body>"),
      (2L, "<body><form>cookies</form><p>prose two</p></body>"))
      .toDF("doc_id", "html")
    val out = java.nio.file.Files
      .createTempDirectory("page-main").toString
    graft.streaming.Ingest.pageExtractBatch(pages, 7L, out,
      mainOnly = true)
    val docs = spark.read.parquet(s"$out/docs/batch=7")
      .select($"doc_id", $"text").as[(Long, String)]
      .collect().toMap
    assert(docs(1L) === "prose one") // nav + footer suppressed
    assert(docs(2L) === "prose two") // form suppressed
    // the frontier still carries the nav link (chrome-INDEPENDENT)
    val links = spark.read.parquet(s"$out/links/batch=7")
      .select($"href").as[String].collect().toSeq
    assert(links === Seq("/x"))
    // replay lands identical bytes
    graft.streaming.Ingest.pageExtractBatch(pages, 7L, out,
      mainOnly = true)
    assert(spark.read.parquet(s"$out/docs/batch=7").count() === 2L)
  }

  test("Spark surface: vfs_html_main_text registers for SQL and matches the kernel") {
    val spark = GraftTest.spark
    import spark.implicits._
    graft.functions.registerAll(spark)
    val page = "<body><nav>menu</nav><p>prose</p></body>"
    Seq(page).toDF("html").createOrReplaceTempView("html_main_t")
    val got = spark.sql(
      "SELECT vfs_html_main_text(html) AS t FROM html_main_t")
      .as[String].head()
    assert(got === "prose")
    val col = Seq(page).toDF("html")
      .select(graft.functions.vfs_html_main_text($"html").as("t"))
      .as[String].head()
    assert(col === "prose")
  }

  test("title: first wins, entities decode, absent is NULL, attributes tolerated") {
    assert(title("<html><head><title>A &amp; B</title></head>") === "A & B")
    assert(title("<title> x </title><title>y</title>") === "x")
    assert(title("<TITLE lang=\"en\">hi\nthere</TITLE>") === "hi there")
    assert(title("<p>no title</p>") === null)
  }

  test("links: both quote styles, entity decode, document order, anchors without href skipped") {
    val html = """<a href="https://a.example/x?p=1&amp;q=2">1</a>
      |<A HREF='/rel/path'>2</A> <a name="anchor">3</a>
      |<a class="z" href="#frag">4</a>""".stripMargin
    assert(links(html) ===
      Seq("https://a.example/x?p=1&q=2", "/rel/path", "#frag"))
    assert(links("<p>none</p>") === Seq.empty)
  }

  test("pageExtractStream: two micro-batches land docs + link frontier batch-addressed; replay overwrites identically") {
    val spark = GraftTest.spark
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val out = java.nio.file.Files
      .createTempDirectory("page-stream").toString
    val ck = java.nio.file.Files
      .createTempDirectory("page-stream-ck").toString
    def page(n: Int) =
      s"<html><title>t$n</title><p>body $n</p>" +
        s"<a href='/l/$n'>x</a></html>"
    val stream = MemoryStream[(Long, String)]
    val q = graft.streaming.Ingest.pageExtractStream(
      stream.toDF().toDF("doc_id", "html"), out, ck,
      trigger = org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("50 milliseconds"))
    try {
      stream.addData((1L, page(1)), (2L, page(2)))
      q.processAllAvailable()
      assert(spark.read.parquet(s"$out/docs/batch=0")
        .select($"doc_id", $"title", $"text")
        .as[(Long, String, String)].collect().sorted.toSeq ===
        Seq((1L, "t1", "t1\nbody 1\nx"), (2L, "t2", "t2\nbody 2\nx")))
      assert(spark.read.parquet(s"$out/links/batch=0")
        .select($"doc_id", $"href").as[(Long, String)]
        .collect().sorted.toSeq === Seq((1L, "/l/1"), (2L, "/l/2")))
      stream.addData((3L, page(3)))
      q.processAllAvailable()
      assert(spark.read.parquet(s"$out/links/batch=1").count() === 1L)
    } finally q.stop()
    // replay of batch 1 overwrites with identical rows
    val before = spark.read.parquet(s"$out/docs/batch=1")
      .collect().map(_.toSeq).toSeq
    graft.streaming.Ingest.pageExtractBatch(
      Seq((3L, page(3))).toDF("doc_id", "html"), 1L, out)
    assert(spark.read.parquet(s"$out/docs/batch=1")
      .collect().map(_.toSeq).toSeq === before)
  }

  test("Spark surface: SQL registration, codegen over a parquet scan, links feed URL normalization") {
    val spark = GraftTest.spark
    import spark.implicits._
    graft.functions.registerAll(spark)
    val dir = java.nio.file.Files
      .createTempDirectory("html-spec").toString + "/pages"
    Seq((1L, "<p>Hello &amp; welcome</p><a href='https://ex.org/a'>x</a>"),
      (2L, "<script>x</script><title>T</title><p>Body</p>"))
      .toDF("doc_id", "html").write.parquet(dir)
    spark.read.parquet(dir).createOrReplaceTempView("pages")
    val rows = spark.sql(
      "SELECT doc_id, vfs_html_text(html) AS t, vfs_html_title(html) " +
        "AS ti, vfs_html_links(html) AS l FROM pages ORDER BY doc_id")
      .collect()
    assert(rows(0).getString(1) === "Hello & welcome\nx")
    assert(rows(0).getString(2) === null)
    assert(rows(0).getSeq[String](3) === Seq("https://ex.org/a"))
    assert(rows(1).getString(1) === "T\nBody") // <p> is a block break
    assert(rows(1).getString(2) === "T")
    // codegen: the expression runs inside a WholeStageCodegen span
    // over the parquet scan (the `*(n)` prefix marker)
    val plan = spark.read.parquet(dir)
      .select(graft.functions.vfs_html_text($"html"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"expected codegen span:\n$plan")
  }
  test("metaContent: name match case-insensitive, attribute order free, entities decoded, http-equiv NOT matched, first wins") {
    import org.apache.spark.unsafe.types.UTF8String
    def meta(h: String, n: String): String = {
      val r = graft.functions.HtmlKernel.metaContent(
        UTF8String.fromString(h), UTF8String.fromString(n))
      if (r == null) null else r.toString
    }
    assert(meta("<meta name=\"robots\" content=\"noindex, noai\">",
      "robots") === "noindex, noai")
    // attribute order reversed + single quotes + case
    assert(meta("<meta content='A &amp; B' NAME='Description'>",
      "description") === "A & B")
    // http-equiv is a DIFFERENT attribute — not matched by name
    assert(meta("<meta http-equiv=\"robots\" content=\"x\">",
      "robots") === null)
    // first matching meta wins; a different name does not match
    assert(meta("<meta name=\"robots\" content=\"first\">" +
      "<meta name=\"robots\" content=\"second\">", "robots") ===
      "first")
    assert(meta("<meta name=\"viewport\" content=\"w\">",
      "robots") === null)
    // <metadata> is a different element (name boundary)
    assert(meta("<metadata name=\"robots\" content=\"x\"/>",
      "robots") === null)
    assert(meta("<p>no metas</p>", "robots") === null)
  }

  test("canonical: rel token-list match, href extraction, entities, absent/hrefless safe") {
    import org.apache.spark.unsafe.types.UTF8String
    def canon(h: String): String = {
      val r = graft.functions.HtmlKernel.canonical(
        UTF8String.fromString(h))
      if (r == null) null else r.toString
    }
    assert(canon("<link rel=\"canonical\" href=\"https://a/c?x=1&amp;y=2\">")
      === "https://a/c?x=1&y=2")
    // rel is a token LIST; case-insensitive; attribute order free
    assert(canon("<link href='https://a/c' rel='alternate CANONICAL'>")
      === "https://a/c")
    // stylesheet links and hrefless canonicals are skipped; the NEXT
    // canonical still wins
    assert(canon("<link rel=\"stylesheet\" href=\"/s.css\">" +
      "<link rel=\"canonical\">" +
      "<link rel=\"canonical\" href=\"https://a/real\">") ===
      "https://a/real")
    assert(canon("<link rel=\"alternate\" href=\"/x\">") === null)
    assert(canon("<p>none</p>") === null)
  }

  test("unquoted attribute values (valid HTML5) parse in meta/link/href extraction — a quote-less stated opt-out cannot slip the gate") {
    import org.apache.spark.unsafe.types.UTF8String
    def meta(h: String, n: String): String = {
      val r = graft.functions.HtmlKernel.metaContent(
        UTF8String.fromString(h), UTF8String.fromString(n))
      if (r == null) null else r.toString
    }
    def canon(h: String): String = {
      val r = graft.functions.HtmlKernel.canonical(
        UTF8String.fromString(h))
      if (r == null) null else r.toString
    }
    // browsers parse these; the opt-out gate must too
    assert(meta("<meta name=robots content=noindex,noai>",
      "robots") === "noindex,noai")
    // unquoted values end at whitespace / '>' — trailing attrs and
    // the tag close are not part of the value
    assert(meta("<meta name=robots content=noindex data-x=1>",
      "robots") === "noindex")
    assert(canon("<link rel=canonical href=https://a/c>") ===
      "https://a/c")
    // mixed quoting within one tag
    assert(canon("<link rel=canonical href=\"https://a/q\">") ===
      "https://a/q")
    assert(meta("<meta name=\"robots\" content=none>", "robots") ===
      "none")
    // unquoted href in the links walk
    val links = graft.functions.HtmlKernel
      .links(UTF8String.fromString(
        "<a href=/x>x</a><a href=\"/y\">y</a>"))
      .toSeq.map(_.toString)
    assert(links === Seq("/x", "/y"))
  }

  test("optOutFilter: meta robots + header directives drop pages, token-exact and whitespace-tolerant; absence passes") {
    val spark = GraftTest.spark
    import spark.implicits._
    val pages = Seq(
      (1L, "<meta name=\"robots\" content=\"index, follow\"><p>a</p>", null),
      (2L, "<meta name=\"robots\" content=\"noindex\"><p>b</p>", null),
      (3L, "<meta name='robots' content=' NOAI , index'><p>c</p>", null),
      (4L, "<p>d</p>", null),
      (5L, "<p>e</p>", "noai"),
      // token-EXACT: 'noindexing' is not 'noindex'
      (6L, "<meta name=\"robots\" content=\"noindexing\"><p>f</p>", null))
      .toDF("doc_id", "html", "x_robots_tag")
    val kept = graft.operators.WebCuration
      .optOutFilter(pages, headerCol = "x_robots_tag")
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(kept === Seq(1L, 4L, 6L))
    // without the header column, header-only opt-outs pass through
    val keptNoHdr = graft.operators.WebCuration
      .optOutFilter(pages.drop("x_robots_tag"))
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(keptNoHdr === Seq(1L, 4L, 5L, 6L))
  }
}
