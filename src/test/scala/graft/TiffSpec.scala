package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.MediaCodec

/** TIFF codec: the early-change LZW duals, PackBits duals, IFD/strip
  * round trips in both byte orders, the horizontal predictor,
  * photometric-0 inversion, interop both ways against the JDK's
  * independent TIFF plugin, and the Spark-side synthesizer path. */
class TiffSpec extends AnyFunSuite {

  private def rgb(w: Int, h: Int)(f: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val out = new Array[Byte](w * h * 3)
    var i = 0
    while (i < w * h) {
      val (r, g, b) = f(i % w, i / w)
      out(3 * i) = r.toByte; out(3 * i + 1) = g.toByte
      out(3 * i + 2) = b.toByte
      i += 1
    }
    out
  }

  test("TIFF LZW: encode/decode are exact duals across resets, KwKwK runs, and noisy content") {
    val cases = Seq(
      Array.fill(64)(7.toByte),                                  // KwKwK
      Array.tabulate(30000)(i =>                                 // forces
        if (i % 1000 < 500) (i % 251).toByte                     // 12-bit
        else ((i * i + 13) % 256).toByte),                       // + reset
      Array.tabulate(5)(_.toByte),
      "to be or not to be, that is the question".getBytes("US-ASCII"))
    for (data <- cases) {
      val enc = MediaCodec.tiffLzwEncode(data)
      assert(MediaCodec.tiffLzwDecode(enc, data.length).toSeq === data.toSeq)
    }
    // compression happens on repetitive content
    val rep = Array.tabulate(10000)(i => (i % 4).toByte)
    assert(MediaCodec.tiffLzwEncode(rep).length < rep.length)
    // truncation and under-declared targets throw
    val enc = MediaCodec.tiffLzwEncode(rep)
    assert(intercept[IllegalArgumentException](
      MediaCodec.tiffLzwDecode(enc.take(3), 10000))
      .getMessage.contains("[GRAFT]"))
    assert(intercept[IllegalArgumentException](
      MediaCodec.tiffLzwDecode(enc, 9999)).getMessage.contains("[GRAFT]"))
  }

  test("PackBits: duals on literals/runs, the -128 no-op is skipped, overruns throw") {
    val data = Array[Byte](1, 2, 3, 3, 3, 3, 4, 5, 5, 6) ++
      Array.fill(200)(9.toByte) ++ Array.tabulate(130)(i => (i % 7).toByte)
    val enc = MediaCodec.packBitsEncode(data)
    assert(MediaCodec.packBitsDecode(enc, data.length).toSeq === data.toSeq)
    assert(enc.length < data.length)
    // -128 is a no-op the decoder must skip
    val withNoop = Array[Byte](-128) ++ enc
    assert(MediaCodec.packBitsDecode(withNoop, data.length).toSeq
      === data.toSeq)
    assert(intercept[IllegalArgumentException](
      MediaCodec.packBitsDecode(enc, data.length + 1))
      .getMessage.contains("[GRAFT]"))
  }

  test("round trips: RGB/gray, uncompressed/PackBits, single and multi-strip") {
    val w = 5; val h = 7
    val px = rgb(w, h)((x, y) => (x * 40, y * 30, (x + y) * 17))
    for (packBits <- Seq(false, true); rps <- Seq(0, 2, 3)) {
      val bytes = MediaCodec.encodeTiff(px, w, h, channels = 3,
        packBits = packBits, rowsPerStrip = rps)
      val ras = MediaCodec.decodeTiff(bytes)
      assert(ras.width === w && ras.height === h &&
        ras.channelOrder === "RGB")
      assert(ras.pixels.toSeq === px.toSeq, s"packBits=$packBits rps=$rps")
    }
    val gray = Array.tabulate(w * h)(i => (i * 11 % 256).toByte)
    for (packBits <- Seq(false, true)) {
      val ras = MediaCodec.decodeTiff(
        MediaCodec.encodeTiff(gray, w, h, channels = 1,
          packBits = packBits, rowsPerStrip = 2))
      assert(ras.channelOrder === "GRAY")
      assert(ras.pixels.toSeq === gray.toSeq)
    }
  }

  test("interop OUT: ImageIO decodes our uncompressed and PackBits multi-strip files to the exact pixels") {
    val w = 9; val h = 6
    val px = rgb(w, h)((x, y) => (x * 28 % 256, y * 41 % 256, (x * y) % 256))
    for (packBits <- Seq(false, true)) {
      val bytes = MediaCodec.encodeTiff(px, w, h, channels = 3,
        packBits = packBits, rowsPerStrip = 2)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(img != null, "ImageIO must parse our TIFF output")
      assert(img.getWidth === w && img.getHeight === h)
      for (y <- 0 until h; x <- 0 until w) {
        val o = (y * w + x) * 3
        val p = img.getRGB(x, y)
        assert(((p >> 16) & 0xff) === (px(o) & 0xff), s"R ($x,$y)")
        assert(((p >> 8) & 0xff) === (px(o + 1) & 0xff), s"G ($x,$y)")
        assert((p & 0xff) === (px(o + 2) & 0xff), s"B ($x,$y)")
      }
    }
  }

  test("interop IN: ImageIO-written TIFFs (none, LZW, PackBits compression) decode to ImageIO's own pixels") {
    val w = 33; val h = 21
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 23 % 256) << 16) | ((y * 37 % 256) << 8)
        | ((x * y + 5) % 256))
    for (comp <- Seq(None, Some("LZW"), Some("PackBits"))) {
      val wr = javax.imageio.ImageIO
        .getImageWritersByFormatName("tiff").next()
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      wr.setOutput(ios)
      val param = wr.getDefaultWriteParam
      comp.foreach { c =>
        param.setCompressionMode(
          javax.imageio.ImageWriteParam.MODE_EXPLICIT)
        param.setCompressionType(c)
      }
      wr.write(null, new javax.imageio.IIOImage(img, null, null), param)
      ios.close(); wr.dispose()
      val bytes = bos.toByteArray
      val ras = MediaCodec.decodeTiff(bytes)
      assert(ras.width === w && ras.height === h, s"comp=$comp")
      val rgbRas = MediaCodec.toRgb(ras)
      val ref = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      for (y <- 0 until h; x <- 0 until w) {
        val o = (y * w + x) * 3
        val p = ref.getRGB(x, y)
        assert((rgbRas.pixels(o) & 0xff) === ((p >> 16) & 0xff),
          s"R ($x,$y) comp=$comp")
        assert((rgbRas.pixels(o + 1) & 0xff) === ((p >> 8) & 0xff),
          s"G ($x,$y) comp=$comp")
        assert((rgbRas.pixels(o + 2) & 0xff) === (p & 0xff),
          s"B ($x,$y) comp=$comp")
      }
    }
  }

  // hand-built fixtures: predictor 2 + LZW, big-endian, photometric 0

  private def u16le(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def u32le(v: Int) = u16le(v & 0xffff) ++ u16le((v >> 16) & 0xffff)

  /** Minimal little-endian gray TIFF with explicit compression,
    * predictor, and photometric — the tag combinations our encoder
    * doesn't emit. Single strip. */
  private def handTiff(w: Int, h: Int, strip: Array[Byte],
      compression: Int, predictor: Int, photometric: Int,
      orientation: Int = 0): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write("II".getBytes("US-ASCII")); out.write(u16le(42))
    val dataStart = 8
    val ifdOffset = dataStart + strip.length + (strip.length % 2)
    out.write(u32le(ifdOffset))
    out.write(strip)
    if (strip.length % 2 != 0) out.write(0)
    def tag(id: Int, typ: Int, count: Int, value: Int): Array[Byte] =
      u16le(id) ++ u16le(typ) ++ u32le(count) ++
        (if (typ == 3) u16le(value) ++ u16le(0) else u32le(value))
    val tags = Seq(
      tag(256, 4, 1, w), tag(257, 4, 1, h), tag(258, 3, 1, 8),
      tag(259, 3, 1, compression), tag(262, 3, 1, photometric),
      tag(273, 4, 1, dataStart)) ++
      (if (orientation > 0) Seq(tag(274, 3, 1, orientation))
       else Seq.empty) ++ Seq(
      tag(277, 3, 1, 1),
      tag(278, 4, 1, h), tag(279, 4, 1, strip.length),
      tag(317, 3, 1, predictor))
    out.write(u16le(tags.length))
    tags.foreach(out.write)
    out.write(u32le(0))
    out.toByteArray
  }

  test("horizontal predictor 2 under LZW: differences accumulate left-to-right per row") {
    val w = 6; val h = 3
    val px = Array.tabulate(w * h)(i => ((i * 13 + 40) % 256).toByte)
    // difference-encode each row, then LZW the strip
    val diff = px.clone()
    for (y <- 0 until h; x <- (w - 1) until 0 by -1)
      diff(y * w + x) =
        (px(y * w + x) - px(y * w + x - 1)).toByte
    val bytes = handTiff(w, h, MediaCodec.tiffLzwEncode(diff),
      compression = 5, predictor = 2, photometric = 1)
    val ras = MediaCodec.decodeTiff(bytes)
    assert(ras.channelOrder === "GRAY")
    assert(ras.pixels.toSeq === px.toSeq)
    // ImageIO agrees on the same hand-built file (raw raster samples
    // — getRGB on a gray image applies a nonlinear gray→sRGB map)
    val ref = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    assert(ref != null)
    for (y <- 0 until h; x <- 0 until w)
      assert(ref.getRaster.getSample(x, y, 0) === (px(y * w + x) & 0xff))
  }

  test("photometric 0 (WhiteIsZero) inverts; big-endian (MM) files parse; adversarial input rejected") {
    val w = 4; val h = 2
    val px = Array.tabulate(w * h)(i => (i * 30).toByte)
    val inv = handTiff(w, h, px, compression = 1, predictor = 1,
      photometric = 0)
    assert(MediaCodec.decodeTiff(inv).pixels.toSeq ===
      px.toSeq.map(b => (255 - (b & 0xff)).toByte))
    // big-endian: byte-swap the hand fixture's multi-byte fields by
    // rebuilding with MM order
    def u16be(v: Int) = Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def u32be(v: Int) = u16be((v >> 16) & 0xffff) ++ u16be(v & 0xffff)
    val out = new java.io.ByteArrayOutputStream()
    out.write("MM".getBytes("US-ASCII")); out.write(u16be(42))
    out.write(u32be(8 + px.length))
    out.write(px)
    def tagBe(id: Int, typ: Int, count: Int, value: Int): Array[Byte] =
      u16be(id) ++ u16be(typ) ++ u32be(count) ++
        (if (typ == 3) u16be(value) ++ u16be(0) else u32be(value))
    val tags = Seq(
      tagBe(256, 4, 1, w), tagBe(257, 4, 1, h), tagBe(258, 3, 1, 8),
      tagBe(259, 3, 1, 1), tagBe(262, 3, 1, 1), tagBe(273, 4, 1, 8),
      tagBe(277, 3, 1, 1), tagBe(278, 4, 1, h),
      tagBe(279, 4, 1, px.length))
    out.write(u16be(tags.length)); tags.foreach(out.write)
    out.write(u32be(0))
    val mm = MediaCodec.decodeTiff(out.toByteArray)
    assert(mm.width === w && mm.height === h &&
      mm.pixels.toSeq === px.toSeq)
    // adversarial: bad order mark, bad magic, truncations
    assert(intercept[IllegalArgumentException](MediaCodec.decodeTiff(
      "XXYZ1234".getBytes("US-ASCII"))).getMessage.contains("[GRAFT]"))
    val good = MediaCodec.encodeTiff(px, w, h, channels = 1)
    val badMagic = good.clone(); badMagic(2) = 43
    assert(intercept[IllegalArgumentException](
      MediaCodec.decodeTiff(badMagic)).getMessage.contains("[GRAFT]"))
    // (the final 4 bytes are the next-IFD pointer, which a
    // first-IFD-only decoder legitimately never reads)
    for (n <- 1 until good.length - 4) {
      val e = intercept[IllegalArgumentException](
        MediaCodec.decodeTiff(good.take(n)))
      assert(e.getMessage.contains("[GRAFT]"), s"prefix $n")
    }
    // absurd dimensions via a patched width field must throw, not
    // allocate: tag 256 is the FIRST IFD entry; its value field sits
    // at ifdOffset + 2 + 8
    val ifdOff = ((good(4) & 0xff) | ((good(5) & 0xff) << 8) |
      ((good(6) & 0xff) << 16) | ((good(7) & 0xff) << 24))
    val evil = good.clone()
    val vf = ifdOff + 2 + 8
    evil(vf) = -1; evil(vf + 1) = -1; evil(vf + 2) = -1; evil(vf + 3) = 0x2a
    assert(intercept[IllegalArgumentException](
      MediaCodec.decodeTiff(evil)).getMessage.contains("[GRAFT]"))
  }

  test("synthesizer caps at 2^20 rows: an oversized doc truncates to the decoder's own dimension guard") {
    val spark = GraftTest.spark
    import spark.implicits._
    // 13,000,000 bytes -> 1,083,333 rows pre-cap, beyond decodeTiff's
    // h <= 2^20 guard; the cap keeps the synthesizer's output
    // decodable and the oracle mirrors with least()
    val big = "abcdefghijkl" * (13000000 / 12)
    val st = graft.operators.Multimodal.decodeStats(spark,
        graft.operators.Multimodal.synthesizeTiff(
          Seq((1L, big)).toDF("doc_id", "text")))
      .collect().head
    assert(st.height === (1 << 20) && st.n_samples === 4L * (1 << 20))
    val pb = big.getBytes("UTF-8").take(12 * (1 << 20)).map(_ & 0xff)
    val expect = math.round(
      pb.indices.collect { case i if i % 3 == 0 => pb(i).toLong }.sum
        * 1000.0 / (255.0 * (pb.length / 3)))
    assert(st.c0_milli === expect)
  }

  test("TIFF orientation: native tag 274 read; exifAware dHash uprights a rotated TIFF duplicate") {
    val spark = GraftTest.spark
    import spark.implicits._
    import graft.operators.{MediaRecord, Multimodal}
    // asymmetric gray content so rotation changes the naive dHash
    val w = 6; val h = 4
    val upright = Array.tabulate(w * h)(i =>
      (((i % w) * 41 + (i / w) * 17 + (i % w) * (i / w) * 29) % 256).toByte)
    // camera-stored: upright rotated 270 CW, tagged 6 (rotate 90 CW
    // to display) — gray replicates to RGB before orientation, so
    // build the stored gray by orienting the replicated raster and
    // taking every third byte
    val rep = new Array[Byte](w * h * 3)
    for (i <- 0 until w * h) {
      rep(3 * i) = upright(i); rep(3 * i + 1) = upright(i)
      rep(3 * i + 2) = upright(i)
    }
    val storedRgb = MediaCodec.orientRgb(rep, w, h, 8)
    val storedGray = Array.tabulate(storedRgb.width * storedRgb.height)(
      i => storedRgb.pixels(3 * i))
    val tagged = handTiff(storedRgb.width, storedRgb.height,
      storedGray, compression = 1, predictor = 1, photometric = 1,
      orientation = 6)
    assert(MediaCodec.tiffOrientation(tagged) === 6)
    val plain = MediaCodec.encodeTiff(upright, w, h, channels = 1)
    assert(MediaCodec.tiffOrientation(plain) === 1)
    val media = Seq(
      MediaRecord(1L, plain, "image/tiff", plain.length.toLong),
      MediaRecord(2L, tagged, "image/tiff", tagged.length.toLong)).toDS()
    val naive = Multimodal.imageFingerprint(spark, media)
      .select($"doc_id", $"sig").as[(Long, Long)].collect().toMap
    assert(naive(1L) !== naive(2L))
    val aware = Multimodal.imageFingerprint(spark, media,
        exifAware = true)
      .select($"doc_id", $"sig").as[(Long, Long)].collect().toMap
    assert(aware(1L) === aware(2L),
      "TIFF tag 274 must upright the rotated duplicate")
  }

  test("Spark path: TIFF stats equal the truecolor-PNG stats (shared geometry); dHash is TIFF/PNG invariant") {
    val spark = GraftTest.spark
    import spark.implicits._
    import graft.operators.{MediaRecord, Multimodal}
    val docs = Seq((1L, "tiff and png share the 4-wide RGB geometry"),
      (2L, "xy")).toDF("doc_id", "text")
    def stats(media: org.apache.spark.sql.Dataset[MediaRecord]) =
      Multimodal.decodeStats(spark, media)
        .collect().map(s => s.doc_id ->
          (s.width, s.height, s.n_samples, s.c0_milli, s.c1_milli,
            s.c2_milli)).toMap
    val png = stats(Multimodal.synthesizePng(docs))
    assert(stats(Multimodal.synthesizeTiff(docs)) === png)
    assert(stats(Multimodal.synthesizeTiff(docs, packBits = true)) === png)
    // same pixels as PNG fingerprint identically through decodeRaster
    val w = 8; val h = 12
    val px = rgb(w, h)((x, y) => (x * 31 % 256, y * 17 % 256, 50))
    val tif = MediaCodec.encodeTiff(px, w, h, channels = 3,
      packBits = true, rowsPerStrip = 3)
    val pngB = MediaCodec.encodePng(px, w, h)
    val media = Seq(
      MediaRecord(1L, tif, "image/tiff", tif.length.toLong),
      MediaRecord(2L, pngB, "image/png", pngB.length.toLong)).toDS()
    val sigs = Multimodal.imageFingerprint(spark, media)
      .select($"doc_id", $"sig").as[(Long, Long)].collect().toMap
    assert(sigs(1L) === sigs(2L))
  }

  test("encoder orientation tag: written as 274, read back, ignored by decode; synthesizeTiffRotated twins hash-match their uprights for all 8 orientations") {
    val spark = GraftTest.spark
    import spark.implicits._
    import graft.operators.Multimodal
    val w = 4; val h = 6
    val px = rgb(w, h)((x, y) => (x * 61 % 256, y * 37 % 256, (x + y) * 13 % 256))
    for (k <- 1 to 8) {
      val inv = k match { case 6 => 8; case 8 => 6; case o => o }
      val stored = MediaCodec.orientRgb(px, w, h, inv)
      val t = MediaCodec.encodeTiff(stored.pixels, stored.width,
        stored.height, channels = 3, orientation = k)
      assert(MediaCodec.tiffOrientation(t) === k, s"orientation $k")
      // decode reads the STORED raster as-is (the tag is metadata)
      val ras = MediaCodec.decodeTiff(t)
      assert((ras.width, ras.height) === (stored.width, stored.height))
      assert(ras.pixels.toSeq === stored.pixels.toSeq)
      // uprighting restores the original exactly
      val up = MediaCodec.orientRgb(ras.pixels, ras.width, ras.height, k)
      assert(up.pixels.toSeq === px.toSeq, s"upright under $k")
    }
    assert(intercept[IllegalArgumentException](
      MediaCodec.encodeTiff(px, w, h, orientation = 9))
      .getMessage.contains("[GRAFT]"))
    // the synthesizer family: ids 0..7 cycle k = 1..8; every rotated
    // twin must fingerprint identically to its upright original
    val docs = (0L to 7L).map(i =>
      (i, s"orientation fixture payload number $i with enough bytes"))
      .toDF("doc_id", "text")
    val upSigs = Multimodal.imageFingerprint(spark,
        Multimodal.synthesizeTiff(docs), exifAware = true)
      .select($"doc_id", $"sig").as[(Long, Long)].collect().toMap
    val rotSigs = Multimodal.imageFingerprint(spark,
        Multimodal.synthesizeTiffRotated(docs), exifAware = true)
      .select($"doc_id", $"sig").as[(Long, Long)].collect().toMap
    assert(rotSigs === upSigs)
    // exif-blind, the axis-swapping orientations (id 4..7 -> k 5..8)
    // must NOT all match — the tag is load-bearing
    val blind = Multimodal.imageFingerprint(spark,
        Multimodal.synthesizeTiffRotated(docs))
      .select($"doc_id", $"sig").as[(Long, Long)].collect().toMap
    assert((4L to 7L).exists(i => blind(i) !== upSigs(i)),
      "an exif-blind read of axis-swapped storage must change some sig")
  }
}
