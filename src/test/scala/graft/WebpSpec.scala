package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MediaCodec
import graft.operators.MediaCodec.{Vp8lBitWriter, Vp8lClOrder}

/** WebP VP8L: encoder↔decoder duals plus HAND-BUILT bitstreams for
  * every decode path the literal-only encoder never emits — simple
  * two-symbol codes, LZ77 (direct and 2-D-mapped distances), the
  * color cache, code-length repeats 16/17/18, and all four
  * transforms. No ImageIO referee exists for WebP in a stock JVM, so
  * the fixtures pin the bitstream against hand-computed pixels (the
  * documented stance in the codec's section header). */
class WebpSpec extends AnyFunSuite {

  // ---- spec-side stream builders ------------------------------------

  /** DEFLATE canonical code values for a lengths map: (code, len)
    * per symbol, assigned by (length, symbol) ascending. */
  private def canon(lengths: Map[Int, Int]): Map[Int, (Int, Int)] = {
    var code = 0
    var prevLen = 0
    lengths.toSeq.sortBy { case (s, l) => (l, s) }.map { case (s, l) =>
      code <<= (l - prevLen)
      prevLen = l
      val c = code
      code += 1
      s -> (c, l)
    }.toMap
  }

  private def header(bw: Vp8lBitWriter, w: Int, h: Int): Unit = {
    bw.putBits(w - 1, 14); bw.putBits(h - 1, 14)
    bw.putBits(0, 1); bw.putBits(0, 3)
  }

  /** Simple prefix code with one symbol (zero bits per read). */
  private def single(bw: Vp8lBitWriter, sym: Int): Unit = {
    bw.putBits(1, 1); bw.putBits(0, 1)
    val is8 = if (sym > 1) 1 else 0
    bw.putBits(is8, 1); bw.putBits(sym, if (is8 == 1) 8 else 1)
  }

  /** Simple prefix code with two symbols (one bit per read;
    * canonical: the SMALLER symbol gets code 0). */
  private def pair(bw: Vp8lBitWriter, s0: Int, s1: Int): Unit = {
    bw.putBits(1, 1); bw.putBits(1, 1)
    bw.putBits(1, 1); bw.putBits(s0, 8); bw.putBits(s1, 8)
  }

  /** Full-form prefix code emission for arbitrary lengths: zero runs
    * via 17/18 (short ones as literal 0s), each nonzero length as
    * its own CL symbol, a complete equal-weight CL code, max_symbol
    * bounding the reads. Returns the canonical codes for emitting
    * the symbols themselves. */
  private def fullCode(bw: Vp8lBitWriter,
      lengths: Map[Int, Int]): Map[Int, (Int, Int)] = {
    val last = lengths.keys.max
    // CL read sequence: (clSymbol, extraBitCount, extraValue)
    val seq = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int)]
    var s = 0
    while (s <= last) {
      lengths.get(s) match {
        case Some(l) => seq += ((l, 0, 0)); s += 1
        case None =>
          var run = 0
          while (s + run <= last && !lengths.contains(s + run)) run += 1
          s += run
          while (run > 0) {
            if (run >= 11) {
              val take = math.min(run, 138)
              seq += ((18, 7, take - 11)); run -= take
            } else if (run >= 3) { seq += ((17, 3, run - 3)); run = 0 }
            else { seq += ((0, 0, 0)); run -= 1 }
          }
      }
    }
    val used = seq.map(_._1).distinct.sorted
    val clLengths: Map[Int, Int] =
      if (used.length == 1) Map(used.head -> 1)
      else {
        val k = used.length
        var b = 1
        while ((1 << b) < k) b += 1
        val x = (1 << b) - k // symbols at length b-1
        used.zipWithIndex.map { case (sym, i) =>
          sym -> (if (i < x) b - 1 else b) }.toMap
      }
    val numCl = used.map(Vp8lClOrder.indexOf(_)).max + 1
    bw.putBits(0, 1)          // full form
    bw.putBits(numCl - 4, 4)
    var i = 0
    while (i < numCl) {
      bw.putBits(clLengths.getOrElse(Vp8lClOrder(i), 0), 3)
      i += 1
    }
    // max_symbol = number of CL reads
    bw.putBits(1, 1)
    bw.putBits(6, 3)          // length_nbits = 14
    bw.putBits(seq.length - 2, 14)
    val clCodes = canon(clLengths)
    val clSingle = used.length == 1
    seq.foreach { case (sym, ebN, ebV) =>
      if (!clSingle) { val (c, l) = clCodes(sym); bw.putCode(c, l) }
      if (ebN > 0) bw.putBits(ebV, ebN)
    }
    canon(lengths)
  }

  private def put(bw: Vp8lBitWriter, codes: Map[Int, (Int, Int)],
      sym: Int): Unit = { val (c, l) = codes(sym); bw.putCode(c, l) }

  private def rgbaOf(bytes: Array[Byte]): Seq[(Int, Int, Int, Int)] = {
    val ras = MediaCodec.decodeWebp(bytes)
    assert(ras.channelOrder == "RGBA")
    ras.pixels.grouped(4).map(p =>
      (p(0) & 0xff, p(1) & 0xff, p(2) & 0xff, p(3) & 0xff)).toSeq
  }

  // ---- encoder/decoder duals ----------------------------------------

  test("roundtrip: encodeWebpLossless -> decodeWebp recovers exact pixels at awkward sizes") {
    for ((w, h) <- Seq((1, 1), (4, 2), (33, 7), (16, 16))) {
      val px = Array.tabulate(w * h * 3)(i => ((i * 37 + 11) % 251).toByte)
      val ras = MediaCodec.decodeWebp(MediaCodec.encodeWebpLossless(px, w, h))
      assert((ras.width, ras.height) === (w, h), s"$w x $h")
      val rgb = MediaCodec.toRgb(ras)
      assert(rgb.pixels.toSeq === px.toSeq, s"$w x $h")
    }
    assert(intercept[IllegalArgumentException](
      MediaCodec.encodeWebpLossless(new Array[Byte](3), 16385, 1))
      .getMessage.contains("[GRAFT]"))
  }

  test("sniff: our encoder's output sniffs as image/webp; WAV still sniffs as audio/wav") {
    val webp = MediaCodec.encodeWebpLossless(new Array[Byte](12), 4, 1)
    assert(graft.functions.MediaSniff.sniff(webp).toString === "image/webp")
    val wav = MediaCodec.encodeWav(Array[Byte](1, 2, 3))
    assert(graft.functions.MediaSniff.sniff(wav).toString === "audio/wav")
  }

  // ---- hand-built bitstreams ----------------------------------------

  test("two-symbol simple codes: literal pixels decode with one bit per channel read") {
    val bw = new Vp8lBitWriter
    header(bw, 2, 1)
    bw.putBits(0, 1); bw.putBits(0, 1); bw.putBits(0, 1) // no T/C/M
    pair(bw, 10, 20)   // green
    single(bw, 5)      // red
    single(bw, 7)      // blue
    single(bw, 255)    // alpha
    single(bw, 0)      // distance
    bw.putBits(0, 1)   // green 10 (smaller symbol -> code 0)
    bw.putBits(1, 1)   // green 20
    assert(rgbaOf(MediaCodec.vp8lContainer(bw.toBytes)) ===
      Seq((5, 10, 7, 255), (5, 20, 7, 255)))
  }

  test("LZ77 direct distance: a length-3 copy at distance 1 replicates the first pixel") {
    val bw = new Vp8lBitWriter
    header(bw, 4, 1)
    bw.putBits(0, 1); bw.putBits(0, 1); bw.putBits(0, 1)
    // green: literal 9 OR length-code 2 (length 3) — symbol 258 is
    // beyond the 8-bit simple-code field, so the full form it is
    val g = fullCode(bw, Map(9 -> 1, 258 -> 1))
    single(bw, 2); single(bw, 3); single(bw, 255)
    single(bw, 13)     // distance prefix symbol 13: 96 + eb(5) + 1
    put(bw, g, 9)      // literal green 9
    put(bw, g, 258)    // -> length 3
    bw.putBits(24, 5)  // distance value 96+24+1 = 121 -> direct dist 1
    assert(rgbaOf(MediaCodec.vp8lContainer(bw.toBytes)) ===
      Seq.fill(4)((2, 9, 3, 255)))
  }

  test("LZ77 2-D distance map: code value 1 = (0,1) copies the row above") {
    val bw = new Vp8lBitWriter
    header(bw, 2, 2)
    bw.putBits(0, 1); bw.putBits(0, 1); bw.putBits(0, 1)
    // green: 50 (len 1), 60 (len 2), 257 = length-code 1 -> length 2
    val g = fullCode(bw, Map(50 -> 1, 60 -> 2, 257 -> 2))
    single(bw, 4); single(bw, 6); single(bw, 255)
    single(bw, 0)      // distance prefix symbol 0 -> value 1 -> map (0,1)
    put(bw, g, 50); put(bw, g, 60)
    put(bw, g, 257)    // length 2, distance = 0*?; (0,1) -> dy*w+dx = 2
    assert(rgbaOf(MediaCodec.vp8lContainer(bw.toBytes)) ===
      Seq((4, 50, 6, 255), (4, 60, 6, 255),
        (4, 50, 6, 255), (4, 60, 6, 255)))
  }

  test("color cache: a cache hit replays the inserted pixel") {
    val argb = (255 << 24) | (200 << 16) | (100 << 8) | 50
    val cacheBits = 4
    val idx = (0x1e35a7bd * argb) >>> (32 - cacheBits)
    val bw = new Vp8lBitWriter
    header(bw, 3, 1)
    bw.putBits(0, 1)            // no transforms
    bw.putBits(1, 1)            // color cache
    bw.putBits(cacheBits, 4)
    bw.putBits(0, 1)            // no meta
    // green alphabet 256+24+16: literal 100 and cache symbol 280+idx
    val g = fullCode(bw, Map(100 -> 1, (280 + idx) -> 1))
    single(bw, 200); single(bw, 50); single(bw, 255)
    single(bw, 0)
    put(bw, g, 100)             // literal -> inserted into the cache
    put(bw, g, 280 + idx)       // cache hit
    put(bw, g, 280 + idx)       // and again
    assert(rgbaOf(MediaCodec.vp8lContainer(bw.toBytes)) ===
      Seq.fill(3)((200, 100, 50, 255)))
  }

  test("code-length repeat 16 extends the previous length; 17/18 run zeros (via the generic writer)") {
    // 16: hand-emitted — lengths [2,2,3,3,3,3] over greens 0..5
    val bw = new Vp8lBitWriter
    header(bw, 6, 1)
    bw.putBits(0, 1); bw.putBits(0, 1); bw.putBits(0, 1)
    bw.putBits(0, 1)            // green: full form
    bw.putBits(5, 4)            // num_code_lengths = 9 (covers 16@8)
    val clLens = Map(2 -> 1, 3 -> 2, 16 -> 2)
    for (i <- 0 until 9)
      bw.putBits(clLens.getOrElse(Vp8lClOrder(i), 0), 3)
    bw.putBits(1, 1)            // max_symbol = 4 reads
    bw.putBits(0, 3)            // nbits = 2
    bw.putBits(2, 2)            // 2 + 2 = 4
    val cl = canon(clLens)
    put(bw, cl, 2); put(bw, cl, 2); put(bw, cl, 3)
    put(bw, cl, 16); bw.putBits(0, 2) // repeat prev len (3) x3
    single(bw, 1); single(bw, 2); single(bw, 255); single(bw, 0)
    val g = canon(Map(0 -> 2, 1 -> 2, 2 -> 3, 3 -> 3, 4 -> 3, 5 -> 3))
    for (sym <- 0 to 5) put(bw, g, sym)
    assert(rgbaOf(MediaCodec.vp8lContainer(bw.toBytes)) ===
      (0 to 5).map(sym => (1, sym, 2, 255)))
  }

  test("subtract-green transform: red and blue re-add the green channel") {
    val bw = new Vp8lBitWriter
    header(bw, 1, 1)
    bw.putBits(1, 1); bw.putBits(2, 2) // transform: subtract-green
    bw.putBits(0, 1)                   // no more transforms
    bw.putBits(0, 1); bw.putBits(0, 1) // no cache, no meta
    single(bw, 10); single(bw, 20); single(bw, 30); single(bw, 255)
    single(bw, 0)
    // one literal pixel, zero bits (all codes single-symbol)
    assert(rgbaOf(MediaCodec.vp8lContainer(bw.toBytes)) ===
      Seq((30, 10, 40, 255)))
  }

  test("predictor transform: mode rides the sub-image green channel; residuals add mod 256") {
    val bw = new Vp8lBitWriter
    header(bw, 2, 2)
    bw.putBits(1, 1); bw.putBits(0, 2) // transform: predictor
    bw.putBits(0, 3)                   // size_bits = 2 -> one 4x4 block
    // sub-image 1x1: mode 2 (T) in the green channel
    bw.putBits(0, 1)                   // sub: no cache
    single(bw, 2); single(bw, 0); single(bw, 0); single(bw, 0)
    single(bw, 0)
    bw.putBits(0, 1)                   // main: no more transforms
    bw.putBits(0, 1); bw.putBits(0, 1) // no cache, no meta
    // residuals: p0 = (10,20,30,a0) with pred 0xff000000 -> a res 0;
    // the rest predict the finished neighbor exactly -> all-zero res
    pair(bw, 0, 20); pair(bw, 0, 10); pair(bw, 0, 30)
    single(bw, 0)                      // alpha residual always 0
    single(bw, 0)
    put(bw, canon(Map(0 -> 1, 20 -> 1)), 20)
    put(bw, canon(Map(0 -> 1, 10 -> 1)), 10)
    put(bw, canon(Map(0 -> 1, 30 -> 1)), 30)
    for (_ <- 1 to 3) {
      bw.putBits(0, 1); bw.putBits(0, 1); bw.putBits(0, 1)
    }
    assert(rgbaOf(MediaCodec.vp8lContainer(bw.toBytes)) ===
      Seq.fill(4)((10, 20, 30, 255)))
  }

  test("color transform: green_to_red delta from the signed per-block element") {
    val bw = new Vp8lBitWriter
    header(bw, 1, 1)
    bw.putBits(1, 1); bw.putBits(1, 2) // transform: color
    bw.putBits(0, 3)                   // size_bits = 2
    // sub 1x1: cte blue channel = green_to_red = 32 -> delta = green
    bw.putBits(0, 1)
    single(bw, 0); single(bw, 0); single(bw, 32); single(bw, 0)
    single(bw, 0)
    bw.putBits(0, 1)
    bw.putBits(0, 1); bw.putBits(0, 1)
    single(bw, 5); single(bw, 7); single(bw, 9); single(bw, 255)
    single(bw, 0)
    // red = (7 + (32*5 >> 5)) & 0xff = 12; blue unchanged
    assert(rgbaOf(MediaCodec.vp8lContainer(bw.toBytes)) ===
      Seq((12, 5, 9, 255)))
  }

  test("color indexing with pixel bundling: a 2-entry palette packs 8 pixels per coded byte") {
    val bw = new Vp8lBitWriter
    header(bw, 8, 1)
    bw.putBits(1, 1); bw.putBits(3, 2) // transform: color indexing
    bw.putBits(1, 8)                   // palette size - 1 = 1
    // palette image 2x1, delta-coded: P0 = (255,10,20,30); P1 delta
    // = (0, 90, 80, 70) -> P1 = (255, 100, 100, 100)
    bw.putBits(0, 1)                   // palette sub: no cache
    pair(bw, 20, 80); pair(bw, 10, 90); pair(bw, 30, 70)
    pair(bw, 0, 255); single(bw, 0)
    // entry 0: g=20, r=10, b=30, a=255; entry 1 delta: g=80, r=90,
    // b=70, a=0
    put(bw, canon(Map(20 -> 1, 80 -> 1)), 20)
    put(bw, canon(Map(10 -> 1, 90 -> 1)), 10)
    put(bw, canon(Map(30 -> 1, 70 -> 1)), 30)
    put(bw, canon(Map(0 -> 1, 255 -> 1)), 255)
    put(bw, canon(Map(20 -> 1, 80 -> 1)), 80)
    put(bw, canon(Map(10 -> 1, 90 -> 1)), 90)
    put(bw, canon(Map(30 -> 1, 70 -> 1)), 70)
    put(bw, canon(Map(0 -> 1, 255 -> 1)), 0)
    // close the transform loop, then main (coded width 1): green
    // byte 0b01011010 = indices [0,1,0,1,1,0,1,0] LSB-first
    bw.putBits(0, 1)                   // no more transforms
    bw.putBits(0, 1); bw.putBits(0, 1) // no cache, no meta
    single(bw, 0x5a); single(bw, 0); single(bw, 0); single(bw, 0)
    single(bw, 0)
    val p0 = (10, 20, 30, 255)
    val p1 = (100, 100, 100, 255)
    assert(rgbaOf(MediaCodec.vp8lContainer(bw.toBytes)) ===
      Seq(p0, p1, p0, p1, p1, p0, p1, p0))
  }

  test("meta prefix codes: two groups select different literal codes per 4-pixel block") {
    val bw = new Vp8lBitWriter
    header(bw, 8, 1)
    bw.putBits(0, 1)                   // no transforms
    bw.putBits(0, 1)                   // no cache
    bw.putBits(1, 1)                   // meta prefix
    bw.putBits(0, 3)                   // meta bits = 2 -> meta 2x1
    // meta image: greens 0 and 1 (group indices)
    bw.putBits(0, 1)
    pair(bw, 0, 1); single(bw, 0); single(bw, 0); single(bw, 0)
    single(bw, 0)
    bw.putBits(0, 1); bw.putBits(1, 1) // meta pixels: group 0, group 1
    // group 0 codes
    single(bw, 11); single(bw, 12); single(bw, 13); single(bw, 255)
    single(bw, 0)
    // group 1 codes
    single(bw, 21); single(bw, 22); single(bw, 23); single(bw, 255)
    single(bw, 0)
    // 8 literal pixels, all zero bits (single-symbol codes)
    assert(rgbaOf(MediaCodec.vp8lContainer(bw.toBytes)) ===
      (Seq.fill(4)((12, 11, 13, 255)) ++ Seq.fill(4)((22, 21, 23, 255))))
  }

  test("adversarial input: every prefix truncation throws loudly; VP8/VP8X payloads are rejected") {
    val good = MediaCodec.encodeWebpLossless(
      Array.tabulate(24)(i => (i * 11 % 251).toByte), 4, 2)
    for (k <- 1 until good.length) {
      val e = intercept[Exception](
        MediaCodec.decodeWebp(java.util.Arrays.copyOf(good, k)))
      assert(e.getMessage != null && e.getMessage.contains("[GRAFT]"),
        s"truncation at $k")
    }
    val lossy = good.clone()
    lossy(12) = 'V'; lossy(13) = 'P'; lossy(14) = '8'; lossy(15) = ' '
    assert(intercept[IllegalArgumentException](
      MediaCodec.decodeWebp(lossy)).getMessage.contains("VP8 "))
    assert(intercept[IllegalArgumentException](
      MediaCodec.decodeWebp("RIFFxxxxNOPE".getBytes("US-ASCII")))
      .getMessage.contains("[GRAFT]"))
  }

  test("Spark path: WebP stats equal the truecolor-PNG stats (shared geometry); dHash and sniff routing line up") {
    val spark = GraftTest.spark
    import spark.implicits._
    import graft.operators.{MediaRecord, Multimodal}
    val docs = Seq((1L, "webp shares the 4-wide RGB geometry with png"),
      (2L, "xy")).toDF("doc_id", "text")
    def stats(media: org.apache.spark.sql.Dataset[MediaRecord]) =
      Multimodal.decodeStats(spark, media)
        .collect().map(s => s.doc_id ->
          (s.width, s.height, s.n_samples, s.c0_milli, s.c1_milli,
            s.c2_milli)).toMap
    assert(stats(Multimodal.synthesizeWebp(docs)) ===
      stats(Multimodal.synthesizePng(docs)))
    // same pixels as PNG fingerprint identically through decodeRaster
    val w = 8; val h = 12
    val px = Array.tabulate(w * h * 3)(i => ((i * 13 + 5) % 256).toByte)
    val webpB = MediaCodec.encodeWebpLossless(px, w, h)
    val pngB = MediaCodec.encodePng(px, w, h)
    val media = Seq(
      MediaRecord(1L, webpB, "image/webp", webpB.length.toLong),
      MediaRecord(2L, pngB, "image/png", pngB.length.toLong)).toDS()
    val sigs = Multimodal.imageFingerprint(spark, media)
      .select($"doc_id", $"sig").as[(Long, Long)].collect().toMap
    assert(sigs(1L) === sigs(2L))
    // sniff-routed ingestion lands the unlabeled blob in the family
    val routed = Multimodal.withSniffedFormat(
      Seq((9L, webpB)).toDF("doc_id", "media"))
    assert(routed.collect().head.format === "image/webp")
  }
}
