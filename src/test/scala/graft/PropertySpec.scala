package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{QuantizeMath, TextHash}
import graft.operators.TopKBuffer

/** Property tests for the scalar kernels (SURVEY §5 upgrade plan):
  * quantize/dequantize bounds, top-k invariants, fingerprint behavior.
  * Uses scalacheck directly (the scalatest bridge isn't in the offline
  * dependency cache). These exercise the exact code the Catalyst
  * expressions call from both interpreted and generated paths. */
class PropertySpec extends AnyFunSuite {

  private def check(name: String)(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(500), p)
    assert(r.passed, s"$name: ${r.status}")
  }

  test("quantize: output within [-128,127]; nearest for in-range") {
    check("bounds")(Prop.forAll(Gen.chooseNum(-10.0f, 10.0f,
        0.0f, 0.5f / 127, -0.5f / 127)) { v =>
      val q = QuantizeMath.quantizeLane(v, 127.0f, clamp = false)
      val scaled = v.toDouble * 127.0
      q >= -128 && q <= 127 &&
        (scaled.abs >= 127 || math.abs(scaled - q) <= 0.5 + 1e-9)
    })
  }

  test("quantize with clamp never exceeds [-127, 127]") {
    check("clamp")(Prop.forAll(Gen.chooseNum(-1e30f, 1e30f)) { v =>
      val q = QuantizeMath.quantizeLane(v, 127.0f, clamp = true)
      q >= -127 && q <= 127
    })
  }

  test("quantize saturates (never wraps) without clamp") {
    check("saturate")(Prop.forAll(Gen.chooseNum(1.01f, 1e30f)) { v =>
      QuantizeMath.quantizeLane(v, 127.0f, clamp = false) == 127.toByte &&
        QuantizeMath.quantizeLane(-v, 127.0f, clamp = false) == (-128).toByte
    })
  }

  test("dequantize(quantize(v)) within half-step for |v| <= 1") {
    check("roundtrip")(Prop.forAll(Gen.chooseNum(-1.0f, 1.0f)) { v =>
      val rt = QuantizeMath.dequantizeLane(
        QuantizeMath.quantizeLane(v, 127.0f, clamp = false), 127.0f)
      math.abs(v - rt) <= 0.5f / 127.0f + 1e-6f
    })
  }

  test("NaN quantizes to 0 (Rust `as i8` semantics)") {
    assert(QuantizeMath.quantizeLane(Float.NaN, 127.0f, clamp = false) === 0.toByte)
  }

  test("TopKBuffer equals sorted-take-k of the stream, any order") {
    val gen = for {
      k <- Gen.choose(1, 8)
      xs <- Gen.listOf(Gen.zip(Gen.chooseNum(0.0, 100.0), Gen.choose(0L, 50L)))
    } yield (k, xs)
    check("topk")(Prop.forAll(gen) { case (k, xs) =>
      val buf = new TopKBuffer(k)
      xs.foreach { case (d, i) => buf.add(d, i) }
      buf.sorted.toList == xs.sorted.take(k)
    })
  }

  test("TopKBuffer merge == single buffer over concatenation") {
    val pairs = Gen.listOf(Gen.zip(Gen.chooseNum(0.0, 10.0), Gen.choose(0L, 20L)))
    check("merge")(Prop.forAll(Gen.choose(1, 6), pairs, pairs) { (k, xs, ys) =>
      val a = new TopKBuffer(k)
      xs.foreach { case (d, i) => a.add(d, i) }
      val b = new TopKBuffer(k)
      ys.foreach { case (d, i) => b.add(d, i) }
      a.merge(b)
      val all = new TopKBuffer(k)
      (xs ++ ys).foreach { case (d, i) => all.add(d, i) }
      a.sorted.toList == all.sorted.toList
    })
  }

  test("TopK serialization round-trips") {
    check("serde")(Prop.forAll(
        Gen.listOf(Gen.zip(Gen.chooseNum(0.0, 10.0), Gen.choose(0L, 99L)))) { xs =>
      val agg = graft.operators.TopKByDistance(null, null, 5)
      val buf = new TopKBuffer(5)
      xs.foreach { case (d, i) => buf.add(d, i) }
      val back = agg.deserialize(agg.serialize(buf))
      back.sorted.toList == buf.sorted.toList
    })
  }

  test("fingerprint: deterministic and content-sensitive") {
    check("fnv")(Prop.forAll(Gen.alphaNumStr, Gen.alphaNumStr) { (a, b) =>
      val fa = TextHash.fnv1a(a.getBytes("UTF-8"))
      fa == TextHash.fnv1a(a.getBytes("UTF-8")) &&
        (a == b || fa != TextHash.fnv1a(b.getBytes("UTF-8")))
    })
  }

  test("minShingle falls back to whole-string hash under k") {
    assert(TextHash.minShingle("xy".getBytes, 4) ===
      TextHash.fnv1a("xy".getBytes))
    // min over shingles: adding content can only lower-or-keep the min
    val base = "abcdefgh"
    val more = base + "zzzz"
    assert(TextHash.minShingle(more.getBytes, 4) <=
      TextHash.minShingle(base.getBytes, 4))
  }

  test("MinHashSig.sig == reference over wordSet's exact token model") {
    // the oracle-parity claim: the native signature kernel tokenizes
    // EXACTLY like Dedup.wordSet (lower, trim spaces only, regex \s+
    // split keeping leading/trailing empties) and takes signed minima
    // of a_i*h+b_i. Reference implementation built independently here.
    val coeffs = graft.functions.MinHashSig.coefficients(16)
    def reference(text: String): Seq[Long] = {
      val lowered = text.toLowerCase(java.util.Locale.ROOT)
      val trimmed = {
        var lo = 0; var hi = lowered.length
        while (lo < hi && lowered.charAt(lo) == ' ') lo += 1
        while (hi > lo && lowered.charAt(hi - 1) == ' ') hi -= 1
        lowered.substring(lo, hi)
      }
      val toks = trimmed.split("\\s+", -1).toSet
      coeffs.map { case (a, b) =>
        toks.foldLeft(Long.MaxValue) { (m, w) =>
          val h = TextHash.fnv1a(
            w.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          math.min(m, a * h + b)
        }
      }
    }
    val wsChars = Gen.oneOf(' ', '\t', '\n', '\r', '\u000B', '\f')
    val token = Gen.nonEmptyListOf(
      Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('é', 'ü', '中', 'A', 'Z')))
      .map(_.mkString)
    val text = for {
      parts <- Gen.listOf(Gen.oneOf(token, wsChars.map(_.toString)))
    } yield parts.mkString
    check("sig parity")(Prop.forAll(text) { t =>
      graft.functions.MinHashSig
        .sig(org.apache.spark.unsafe.types.UTF8String.fromString(t), 16)
        .toLongArray().toSeq == reference(t)
    })
  }

  test("BPE encodeWord: decode inverts for arbitrary words under " +
      "arbitrary learned merges; output never empty") {
    import graft.operators.Bpe
    val word = Gen.nonEmptyListOf(
      Gen.oneOf(Gen.alphaLowerChar, Gen.oneOf('é', 'ß', '中', '7')))
      .map(_.mkString).suchThat(_.nonEmpty)
    // arbitrary merge tables: pairs of short lowercase fragments with
    // sequential ranks — encodeWord must stay total and invertible
    // whether or not the pairs ever apply
    val frag = Gen.choose(1, 3).flatMap(n =>
      Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
    val merges = Gen.listOf(Gen.zip(frag, frag)).map(_.distinct)
    check("bpe roundtrip")(Prop.forAll(word, merges) { (w, ms) =>
      val ranks = ms.zipWithIndex.toMap
      val toks = Bpe.encodeWord(w, ranks)
      toks.nonEmpty && Bpe.bpeDecode(toks) == w
    })
  }

  test("bpeEncode LRU memo: eviction never changes output " +
      "(cap=2 ≡ effectively-unbounded over repeating Zipf-ish docs)") {
    import graft.operators.Bpe
    import graft.operators.Bpe.BpeModel
    val spark = GraftTest.spark
    import spark.implicits._
    // repetitive vocabulary so a tiny cap actually evicts and re-admits
    // hot words many times per partition
    val vocab = Vector("alpha", "beta", "gamma", "delta", "ep")
    val docs = (0L until 40L).map { i =>
      val words = (0 until 30).map(j => vocab(((i + j) % 5).toInt))
      (i, words.mkString(" "))
    }.toDF("doc_id", "text").repartition(2)
    val model = BpeModel(Vector(("a", "l"), ("al", "p"), ("b", "e"),
      ("g", "a"), ("d", "e")))
    def run(cap: Int) =
      Bpe.bpeEncode(docs, model, memoCap = cap)
        .orderBy(org.apache.spark.sql.functions.col("doc_id"))
        .collect().map(r => (r.getLong(0), r.getSeq[String](1).toSeq))
        .toSeq
    assert(run(2) == run(1 << 20))
  }

  test("stripRepeatedLines kernel properties: idempotent, kept line " +
      "set preserved, first-occurrence order") {
    // the per-doc semantics as a scala reference (the operator's
    // distributed agg must agree — PipelineSpec pins that; here the
    // reference itself is property-checked so the pin means something)
    def strip(text: String): String =
      text.split("\n", -1).distinct.mkString("\n")
    val line = Gen.listOf(Gen.alphaNumChar).map(_.mkString)
    val text = Gen.listOf(line).map(_.mkString("\n"))
    check("strip idempotent")(Prop.forAll(text) { t =>
      strip(strip(t)) == strip(t)
    })
    check("strip set + order")(Prop.forAll(text) { t =>
      val kept = strip(t).split("\n", -1).toSeq
      val orig = t.split("\n", -1).toSeq
      kept.toSet == orig.toSet && kept == orig.distinct
    })
  }

  test("binary sign packing: bit i == v(i) > 0, padding zero, word count") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import graft.functions.BinaryQuantMath
    val vec = Gen.chooseNum(0, 200).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-2.0f, 2.0f, 0.0f, Float.NaN)))
    check("pack bits")(Prop.forAll(vec) { v =>
      val w = BinaryQuantMath.pack(new GenericArrayData(v.toArray))
      val nWords = (v.length + 63) / 64
      w.length == nWords &&
        v.indices.forall(i =>
          ((w(i >>> 6) >>> (i & 63)) & 1L) == (if (v(i) > 0f) 1L else 0L)) &&
        // padding bits beyond n stay zero (same-dim vectors always
        // compare over identical padding)
        (v.length until nWords * 64).forall(i =>
          ((w(i >>> 6) >>> (i & 63)) & 1L) == 0L)
    })
  }

  test("hamming over packed words: sign-mismatch count, metric axioms") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import graft.functions.BinaryQuantMath
    def packed(v: Seq[Float]) =
      new GenericArrayData(BinaryQuantMath.pack(
        new GenericArrayData(v.toArray)))
    val pair = for {
      n <- Gen.chooseNum(0, 150)
      a <- Gen.listOfN(n, Gen.chooseNum(-2.0f, 2.0f, 0.0f))
      b <- Gen.listOfN(n, Gen.chooseNum(-2.0f, 2.0f, 0.0f))
      c <- Gen.listOfN(n, Gen.chooseNum(-2.0f, 2.0f, 0.0f))
    } yield (a, b, c)
    check("mismatch count + axioms")(Prop.forAll(pair) { case (a, b, c) =>
      def h(x: Seq[Float], y: Seq[Float]) =
        BinaryQuantMath.hamming(packed(x), packed(y))
      val want = a.zip(b).count { case (x, y) => (x > 0f) != (y > 0f) }
      h(a, b) == want.toLong &&
        h(a, a) == 0L &&
        h(a, b) == h(b, a) &&
        h(a, c) <= h(a, b) + h(b, c) // triangle inequality
    })
  }

  test("PDF: extract(encodePdf(text)) == text for arbitrary multi-line content, raw and Flate") {
    import org.apache.spark.unsafe.types.UTF8String
    // lines mix prose with the grammar's hazard characters: parens,
    // backslashes, tabs, CRs, unicode incl. astral (surrogate pairs)
    val lineChar = Gen.frequency(
      8 -> Gen.alphaNumChar,
      2 -> Gen.oneOf('(', ')', '\\', ' ', '\t', '\r', '&', '<'),
      1 -> Gen.oneOf('é', 'ß', '中', '\ud83d'.toString.charAt(0)))
    // build lines from full CODE POINTS so arbitrary text stays
    // well-formed UTF-16 (the encoder never repairs broken input)
    val line = Gen.listOf(Gen.frequency(
      8 -> lineChar.map(_.toString).suchThat(s =>
        !Character.isHighSurrogate(s.charAt(0))),
      1 -> Gen.const("😀"))).map(_.mkString)
    val text = Gen.chooseNum(0, 6).flatMap(n =>
      Gen.listOfN(n, line).map(_.mkString("\n")))
    check("pdf roundtrip")(Prop.forAll(text, Gen.oneOf(true, false)) {
      (t, flate) =>
        graft.functions.PdfKernel.text(
          graft.operators.Pdf.encodePdf(t, flate)).toString == t
    })
  }

  test("WARC: every body coding (identity/chunked/gzip/chunked-over-gzip) round-trips arbitrary page bytes") {
    val payload = Gen.listOf(Gen.chooseNum(0, 255)).map(_.map(_.toByte).toArray)
    check("warc codings")(Prop.forAll(payload, Gen.chooseNum(0, 3)) {
      (html, coding) =>
        val recs = graft.operators.Warc.parseArchive(
          graft.operators.Warc.encodeArchive("https://x/a", html,
            bodyCoding = coding))
        recs(2)._3.body.toSeq == html.toSeq
    })
  }

  test("dechunk(chunkEncode(bytes)) is the identity for any byte content") {
    val bytes = Gen.listOf(Gen.chooseNum(0, 255)).map(_.map(_.toByte).toArray)
    check("chunk roundtrip")(Prop.forAll(bytes) { b =>
      graft.operators.Warc.dechunk(
        graft.operators.Warc.chunkEncode(b)).toSeq == b.toSeq
    })
  }

  test("URL resolution: resolving an already-absolute reference is the identity, and every resolved relative ref is absolute under the base scheme") {
    import org.apache.spark.unsafe.types.UTF8String
    def res(b: String, r: String) =
      graft.functions.UrlResolveKernel.resolve(
        UTF8String.fromString(b), UTF8String.fromString(r)).toString
    val seg = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
    val base = for {
      h <- seg; p <- Gen.listOf(seg)
    } yield s"https://$h.example" + p.map("/" + _).mkString
    val rel = for {
      dots <- Gen.chooseNum(0, 3)
      segs <- Gen.nonEmptyListOf(seg)
    } yield (Seq.fill(dots)("..") ++ segs).mkString("/")
    check("absolute identity")(Prop.forAll(base) { b =>
      res(b, b) == b
    })
    check("relative becomes absolute")(Prop.forAll(base, rel) { (b, r) =>
      val out = res(b, r)
      out.startsWith("https://") && !out.contains("/../")
    })
  }
}
