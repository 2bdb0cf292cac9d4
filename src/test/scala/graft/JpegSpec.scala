package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MediaCodec

/** Baseline JPEG codec: exact round trips on block-constant content,
  * bounded loss on general content, BOTH-direction interop with the
  * JDK's independent ImageIO codec, subsampling geometry, restart
  * markers, and adversarial input. */
class JpegSpec extends AnyFunSuite {

  private def gray(w: Int, h: Int)(f: (Int, Int) => Int): Array[Byte] =
    Array.tabulate(w * h)(i => f(i % w, i / w).toByte)

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

  test("gray block-constant content round-trips EXACTLY at q = 8") {
    // every 8x8 block constant: bytes 0, 1, 127, 128, 254, 255 all
    // appear — DC = 8*(c-128) quantizes losslessly, ACs are 0
    val blocks = Array(0, 1, 37, 127, 128, 200, 254, 255)
    val w = 16; val h = 8 * blocks.length / 2
    val px = gray(w, h)((x, y) => blocks((y / 8) * 2 + x / 8))
    val jpg = MediaCodec.encodeJpegGray(px, w, h)
    val r = MediaCodec.decodeJpeg(jpg)
    assert(r.width === w && r.height === h && r.channelOrder === "GRAY")
    assert(r.pixels.toSeq === px.toSeq)
  }

  test("color 4:4:4 block-constant content decodes to the pinned YCbCr round trip") {
    // gamut corners + grays: the decoded value is exactly
    // yccToRgb(rgbToYcc(...)) — the chain the DuckDB oracle mirrors
    val colors = Array((255, 0, 0), (0, 255, 0), (0, 0, 255),
      (255, 255, 255), (0, 0, 0), (128, 128, 128), (12, 200, 99),
      (255, 255, 0))
    val w = 8; val h = 8 * colors.length
    val px = rgb(w, h)((_, y) => colors(y / 8))
    val jpg = MediaCodec.encodeJpeg(px, w, h)
    val r = MediaCodec.decodeJpeg(jpg)
    assert(r.width === w && r.height === h && r.channelOrder === "RGB")
    val expect = rgb(w, h) { (_, y) =>
      val (cr, cg, cb) = colors(y / 8)
      val (yy, ccb, ccr) = MediaCodec.rgbToYcc(cr, cg, cb)
      MediaCodec.yccToRgb(yy, ccb, ccr)
    }
    assert(r.pixels.toSeq === expect.toSeq)
  }

  test("color 4:2:0 macroblock-constant content: subsample + replication upsample round-trip exactly") {
    val colors = Array((10, 20, 30), (255, 0, 128), (90, 180, 240))
    val w = 16; val h = 16 * colors.length
    val px = rgb(w, h)((_, y) => colors(y / 16))
    val jpg = MediaCodec.encodeJpeg(px, w, h, subsample = true)
    val r = MediaCodec.decodeJpeg(jpg)
    assert(r.width === w && r.height === h)
    val expect = rgb(w, h) { (_, y) =>
      val (cr, cg, cb) = colors(y / 16)
      val (yy, ccb, ccr) = MediaCodec.rgbToYcc(cr, cg, cb)
      MediaCodec.yccToRgb(yy, ccb, ccr)
    }
    assert(r.pixels.toSeq === expect.toSeq)
  }

  test("non-multiple-of-MCU dimensions: edge-replicated padding crops back to the declared size") {
    val w = 13; val h = 11 // pads to 16x16 in both modes
    val px = rgb(w, h)((x, y) => (x * 19 % 256, y * 23 % 256,
      (x + y) * 31 % 256))
    for (sub <- Seq(false, true)) {
      val r = MediaCodec.decodeJpeg(MediaCodec.encodeJpeg(px, w, h,
        subsample = sub, q = 1))
      assert(r.width === w && r.height === h,
        s"dims must crop back (subsample=$sub)")
      assert(r.pixels.length === w * h * 3)
    }
  }

  test("general content at q = 1 is near-lossless; loss grows with q") {
    val w = 24; val h = 16
    // smooth gradient — the content JPEG is built for
    val px = rgb(w, h)((x, y) => (x * 10, y * 12, 128))
    def maxErr(q: Int, sub: Boolean): Int = {
      val r = MediaCodec.decodeJpeg(
        MediaCodec.encodeJpeg(px, w, h, sub, q))
      px.indices.map(i =>
        math.abs((px(i) & 0xff) - (r.pixels(i) & 0xff))).max
    }
    val e1 = maxErr(1, sub = false)
    assert(e1 <= 6, s"q=1 4:4:4 should be near-lossless, max err $e1")
    val e420 = maxErr(1, sub = true)
    assert(e420 <= 24, s"q=1 4:2:0 smooth gradient, max err $e420")
    assert(maxErr(64, sub = false) >= e1)
  }

  test("interop OUT: the JDK's ImageIO decodes our gray fixture to the exact bytes") {
    val blocks = Array(5, 99, 180, 251)
    val w = 8; val h = 8 * blocks.length
    val px = gray(w, h)((_, y) => blocks(y / 8))
    val jpg = MediaCodec.encodeJpegGray(px, w, h)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(jpg))
    assert(img != null, "ImageIO must parse our JFIF output")
    assert(img.getWidth === w && img.getHeight === h)
    for (y <- 0 until h; x <- 0 until w) {
      val v = img.getRaster.getSample(x, y, 0)
      assert(v === (px(y * w + x) & 0xff),
        s"ImageIO disagrees at ($x,$y)")
    }
  }

  test("interop OUT: ImageIO decodes our color fixture within 1 LSB of the pinned chain") {
    val colors = Array((200, 30, 60), (0, 128, 255))
    val w = 8; val h = 8 * colors.length
    val px = rgb(w, h)((_, y) => colors(y / 8))
    val jpg = MediaCodec.encodeJpeg(px, w, h)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(jpg))
    assert(img != null && img.getWidth === w && img.getHeight === h)
    val ours = MediaCodec.decodeJpeg(jpg).pixels
    for (y <- 0 until h; x <- 0 until w) {
      val argb = img.getRGB(x, y)
      val o = (y * w + x) * 3
      // YCbCr->RGB rounding differs by implementation; the DCT side
      // is exact, so any disagreement is the final conversion's +-1
      assert(math.abs(((argb >> 16) & 0xff) - (ours(o) & 0xff)) <= 1)
      assert(math.abs(((argb >> 8) & 0xff) - (ours(o + 1) & 0xff)) <= 1)
      assert(math.abs((argb & 0xff) - (ours(o + 2) & 0xff)) <= 1)
    }
  }

  test("interop IN: our decoder parses an independently-encoded ImageIO JPEG (markers, tables, 4:2:0)") {
    val w = 40; val h = 24
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, (x * 6 << 16) | (y * 10 << 8) | 128)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos))
    val jpg = bos.toByteArray
    val r = MediaCodec.decodeJpeg(jpg)
    assert(r.width === w && r.height === h && r.channelOrder === "RGB")
    // lossy at ImageIO's default quality: compare against ImageIO's
    // OWN decode of the same bytes, channel tolerance for the
    // conversion/upsampling differences between conformant decoders
    val ref = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(jpg))
    var worst = 0
    for (y <- 0 until h; x <- 0 until w) {
      val argb = ref.getRGB(x, y)
      val o = (y * w + x) * 3
      worst = math.max(worst, math.abs(((argb >> 16) & 0xff) -
        (r.pixels(o) & 0xff)))
      worst = math.max(worst, math.abs(((argb >> 8) & 0xff) -
        (r.pixels(o + 1) & 0xff)))
      worst = math.max(worst,
        math.abs((argb & 0xff) - (r.pixels(o + 2) & 0xff)))
    }
    assert(worst <= 32,
      s"independent decode should broadly agree, worst channel delta $worst")
  }

  test("interop IN: restart markers (DRI/RSTn) from an ImageIO writer decode correctly") {
    // ImageIO's writer param can force restart intervals via JPEG
    // metadata; simpler and writer-independent: craft the stream by
    // re-encoding OUR gray fixture with restarts injected through the
    // encoder's own pieces is not exposed — so instead verify the
    // decoder against ImageIO output, which for some writers includes
    // DRI. If this writer emits none, the test still pins the plain
    // path end-to-end on a 4:2:0 photographic-shape image.
    val w = 64; val h = 48
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * y) % 256 << 16) | ((x * 3) % 256 << 8) |
        (y * 5) % 256)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos))
    val r = MediaCodec.decodeJpeg(bos.toByteArray)
    assert(r.width === w && r.height === h)
  }

  test("restart markers: our encoder's DRI/RSTn stream round-trips exactly and ImageIO agrees") {
    val colors = Array((10, 20, 30), (255, 0, 128), (90, 180, 240),
      (0, 0, 0), (250, 250, 250))
    val w = 8; val h = 8 * colors.length // 5 MCUs in 4:4:4
    val px = rgb(w, h)((_, y) => colors(y / 8))
    val expect = rgb(w, h) { (_, y) =>
      val (cr, cg, cb) = colors(y / 8)
      val (yy, ccb, ccr) = MediaCodec.rgbToYcc(cr, cg, cb)
      MediaCodec.yccToRgb(yy, ccb, ccr)
    }
    // interval 1 (an RST after EVERY MCU — max resync density, the
    // rstIdx cycle wraps nowhere on 5 MCUs) and 2 (partial last group)
    for (ri <- Seq(1, 2)) {
      val jpg = MediaCodec.encodeJpeg(px, w, h, subsample = false,
        q = 8, restartInterval = ri)
      val r = MediaCodec.decodeJpeg(jpg)
      assert(r.pixels.toSeq === expect.toSeq, s"restartInterval=$ri")
      // an independent decoder accepts the DRI/RST stream too
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(jpg))
      assert(img != null && img.getWidth === w && img.getHeight === h)
    }
    // the rstIdx 0..7 wrap: 10 MCUs at interval 1 crosses RST7→RST0
    val colors10 = Array.tabulate(10)(i => (i * 25, 255 - i * 25, 128))
    val px10 = rgb(8, 80)((_, y) => colors10(y / 8))
    val jpg10 = MediaCodec.encodeJpeg(px10, 8, 80,
      subsample = false, q = 8, restartInterval = 1)
    val r10 = MediaCodec.decodeJpeg(jpg10)
    val expect10 = rgb(8, 80) { (_, y) =>
      val (cr, cg, cb) = colors10(y / 8)
      val (yy, ccb, ccr) = MediaCodec.rgbToYcc(cr, cg, cb)
      MediaCodec.yccToRgb(yy, ccb, ccr)
    }
    assert(r10.pixels.toSeq === expect10.toSeq)
  }

  private def imageIoJpeg(img: java.awt.image.BufferedImage,
      progressive: Boolean): Array[Byte] = {
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("jpg").next()
    val param = writer.getDefaultWriteParam
    if (progressive) param.setProgressiveMode(
      javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    writer.dispose(); ios.close()
    bos.toByteArray
  }

  private def hasSof2(jpg: Array[Byte]): Boolean =
    jpg.indices.dropRight(1).exists(i =>
      (jpg(i) & 0xff) == 0xff && (jpg(i + 1) & 0xff) == 0xc2)

  test("interop IN: PROGRESSIVE color (SOF2 multi-scan with successive approximation) decodes to ImageIO's own pixels") {
    val w = 40; val h = 24
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, (x * 6 << 16) | (y * 10 << 8) | ((x + y) * 3))
    val jpg = imageIoJpeg(img, progressive = true)
    assert(hasSof2(jpg), "writer must have produced a SOF2 stream")
    val r = MediaCodec.decodeJpeg(jpg)
    assert(r.width === w && r.height === h && r.channelOrder === "RGB")
    val ref = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(jpg))
    var worst = 0
    for (y <- 0 until h; x <- 0 until w) {
      val argb = ref.getRGB(x, y)
      val o = (y * w + x) * 3
      worst = math.max(worst, math.abs(((argb >> 16) & 0xff) -
        (r.pixels(o) & 0xff)))
      worst = math.max(worst, math.abs(((argb >> 8) & 0xff) -
        (r.pixels(o + 1) & 0xff)))
      worst = math.max(worst,
        math.abs((argb & 0xff) - (r.pixels(o + 2) & 0xff)))
    }
    assert(worst <= 32,
      s"progressive decode should agree with the reference decoder, " +
        s"worst channel delta $worst")
    // and it must agree with the BASELINE encode of the same image to
    // the same tolerance (the progression changes coding, not content)
    val base = MediaCodec.decodeJpeg(imageIoJpeg(img, progressive = false))
    var worstVsBase = 0
    for (i <- r.pixels.indices)
      worstVsBase = math.max(worstVsBase,
        math.abs((r.pixels(i) & 0xff) - (base.pixels(i) & 0xff)))
    assert(worstVsBase <= 32, s"worst vs baseline $worstVsBase")
  }

  test("interop IN: PROGRESSIVE grayscale decodes to ImageIO's own pixels exactly-ish") {
    val w = 32; val h = 16
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, (x * 8 + y) % 256)
    val jpg = imageIoJpeg(img, progressive = true)
    assert(hasSof2(jpg))
    val r = MediaCodec.decodeJpeg(jpg)
    assert(r.width === w && r.height === h && r.channelOrder === "GRAY")
    val ref = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(jpg))
    var worst = 0
    for (y <- 0 until h; x <- 0 until w)
      worst = math.max(worst, math.abs(ref.getRaster.getSample(x, y, 0) -
        (r.pixels(y * w + x) & 0xff)))
    // single-component: no color-conversion divergence, only IDCT
    // rounding differences between conformant decoders
    assert(worst <= 2, s"gray progressive worst delta $worst")
  }

  test("progressive vs baseline across sizes: IDENTICAL coefficients decode bit-for-bit the same; gray tracks the reference within 2") {
    // The sharpest cross-check available: the writer quantizes the
    // SAME coefficients for both progression modes (same tables, same
    // quality) — progressive is a lossless reorganization of the
    // entropy layer — so OUR decode of the progressive bytes must
    // equal OUR decode of the baseline bytes EXACTLY, at any content.
    // (A vs-ImageIO pixel comparison on color noise is NOT a valid
    // oracle at these sizes: conformant decoders legitimately differ
    // by chroma-upsampling filter — replication here, triangular in
    // libjpeg-lineage — by far more than any coding effect.)
    for ((w, h, seed) <- Seq((8, 8, 1), (17, 13, 2), (64, 48, 3),
        (15, 40, 4), (40, 15, 5))) {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var st = seed * 2654435761L
      for (y <- 0 until h; x <- 0 until w) {
        st = st * 6364136223846793005L + 1442695040888963407L
        img.setRGB(x, y, ((st >>> 40) & 0xffffff).toInt)
      }
      val prog = imageIoJpeg(img, progressive = true)
      assert(hasSof2(prog))
      val base = imageIoJpeg(img, progressive = false)
      val rp = MediaCodec.decodeJpeg(prog)
      val rb = MediaCodec.decodeJpeg(base)
      assert(rp.width === w && rp.height === h)
      assert(rp.pixels.toSeq === rb.pixels.toSeq,
        s"$w x $h: progressive decode must equal baseline bit-for-bit")
    }
    // GRAYSCALE noise has no chroma-upsampling ambiguity: our decode
    // must track the reference decoder within IDCT rounding
    for ((w, h, seed) <- Seq((17, 13, 7), (40, 15, 8))) {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      var st = seed * 2654435761L
      for (y <- 0 until h; x <- 0 until w) {
        st = st * 6364136223846793005L + 1442695040888963407L
        img.getRaster.setSample(x, y, 0, ((st >>> 40) & 0xff).toInt)
      }
      for (progressive <- Seq(false, true)) {
        val jpg = imageIoJpeg(img, progressive)
        val r = MediaCodec.decodeJpeg(jpg)
        val ref = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(jpg))
        var worst = 0
        for (y <- 0 until h; x <- 0 until w)
          worst = math.max(worst,
            math.abs(ref.getRaster.getSample(x, y, 0) -
              (r.pixels(y * w + x) & 0xff)))
        assert(worst <= 2,
          s"gray $w x $h progressive=$progressive worst delta $worst")
      }
    }
  }

  test("adversarial input is rejected with [GRAFT] errors") {
    val good = MediaCodec.encodeJpegGray(gray(8, 8)((_, _) => 100), 8, 8)
    // bad magic
    assert(intercept[IllegalArgumentException](
      MediaCodec.decodeJpeg(good.drop(2))).getMessage.contains("[GRAFT]"))
    // truncated entropy data
    assert(intercept[IllegalArgumentException](
      MediaCodec.decodeJpeg(good.dropRight(8)))
      .getMessage.contains("[GRAFT]"))
    // a BASELINE scan header under a flipped SOF2 marker is invalid
    // progressive structure (DC scan must have Se = 0) — loud, not
    // mis-decoded
    val prog = good.clone()
    val sofAt = {
      var i = 2
      while (!((prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0))
        i += 1
      i
    }
    prog(sofAt + 1) = 0xc2.toByte
    assert(intercept[IllegalArgumentException](
      MediaCodec.decodeJpeg(prog)).getMessage.contains("[GRAFT]"))
    // PNG/BMP bytes are not JPEG
    val png = MediaCodec.encodePng(rgb(4, 3)((_, _) => (1, 2, 3)), 4, 3)
    assert(intercept[IllegalArgumentException](
      MediaCodec.decodeJpeg(png)).getMessage.contains("[GRAFT]"))
  }

  test("encoder rejects bad inputs") {
    intercept[IllegalArgumentException](
      MediaCodec.encodeJpeg(new Array[Byte](5), 2, 2))
    intercept[IllegalArgumentException](
      MediaCodec.encodeJpeg(new Array[Byte](12), 2, 2, q = 0))
    intercept[IllegalArgumentException](
      MediaCodec.encodeJpegGray(new Array[Byte](3), 2, 2))
  }

  test("synthesizers cap at the 16-bit SOF field: a >8191-byte doc truncates to the cap instead of corrupting the header") {
    val spark = GraftTest.spark
    import spark.implicits._
    // 10,000 bytes of ASCII — pre-cap this would write height 80000
    // into the 16-bit SOF field (mod-65536 truncation, corrupt file)
    val big = "abcdefgh" * 1250
    val docs = Seq((1L, big)).toDF("doc_id", "text")
    val media = graft.operators.Multimodal.synthesizeJpeg(docs)
    val st = graft.operators.Multimodal.decodeStats(spark, media)
      .collect().head
    assert(st.height === 8 * 8191 && st.n_samples === 64L * 8191)
    // decoded mean == mean of the FIRST 8191 payload bytes (the
    // truncation the oracle mirrors)
    val bytes = big.getBytes("UTF-8").take(8191)
    val expect = math.round(
      bytes.map(_ & 0xff).map(_.toLong).sum * 1000.0 / (255.0 * 8191))
    assert(st.c0_milli === expect)
    // color caps fire too: 4:4:4 at 8191 blocks (needs > 24,573
    // bytes), 4:2:0 at 4095 macroblocks (> 12,285 bytes)
    val c444 = graft.operators.Multimodal.synthesizeJpegColor(
      Seq((1L, big * 3)).toDF("doc_id", "text"))
    val h444 = graft.operators.Multimodal.decodeStats(spark, c444)
      .collect().head.height
    assert(h444 === 8 * 8191)
    val c420 = graft.operators.Multimodal.synthesizeJpeg420(
      Seq((1L, big * 2)).toDF("doc_id", "text"))
    val h420 = graft.operators.Multimodal.decodeStats(spark, c420)
      .collect().head.height
    assert(h420 === 16 * 4095)
  }

  test("dHash is decode-format invariant: the same pixels as PNG and exact-JPEG fingerprint identically") {
    val spark = GraftTest.spark
    import spark.implicits._
    import graft.operators.{MediaRecord, Multimodal}
    // block-constant 16x16 (exact under q=8), rising luma left-to-right
    val w = 16; val h = 16
    val px = rgb(w, h)((x, y) => {
      val v = (x / 8) * 120 + (y / 8) * 7 + 10
      (v, v, v)
    })
    val jpg = MediaCodec.encodeJpeg(px, w, h)
    val png = MediaCodec.encodePng(px, w, h)
    val media = Seq(
      MediaRecord(1L, jpg, "image/jpeg", jpg.length.toLong),
      MediaRecord(2L, png, "image/png", png.length.toLong)).toDS()
    val sigs = Multimodal.imageFingerprint(spark, media)
      .select($"doc_id", $"sig").as[(Long, Long)].collect().toMap
    // the JPEG round-trips exactly (gray constant blocks), so the
    // dHash must match the lossless PNG of the same raster bit-for-bit
    assert(sigs(1L) === sigs(2L))
  }

  test("image near-dup over JPEG: a lossy re-encode pairs with its source, distinct content does not") {
    val spark = GraftTest.spark
    import spark.implicits._
    import graft.operators.{MediaRecord, Multimodal}
    val w = 32; val h = 32
    // smooth gradient — a dHash-stable shape
    val px = rgb(w, h)((x, y) => (x * 8, y * 8, (x + y) * 4))
    val a = MediaCodec.encodeJpeg(px, w, h, subsample = false, q = 2)
    // the SAME content re-encoded lossier + 4:2:0 — the near-dup case
    val b = MediaCodec.encodeJpeg(px, w, h, subsample = true, q = 24)
    // unrelated content (inverted gradient)
    val px2 = rgb(w, h)((x, y) => (255 - x * 8, 255 - y * 8, x * 8))
    val c = MediaCodec.encodeJpeg(px2, w, h, q = 2)
    val media = Seq(
      MediaRecord(1L, a, "image/jpeg", a.length.toLong),
      MediaRecord(2L, b, "image/jpeg", b.length.toLong),
      MediaRecord(3L, c, "image/jpeg", c.length.toLong)).toDS()
    val pairs = Multimodal.imageNearDupPairs(spark, media,
        maxHamming = 3)
      .select($"a", $"b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)),
      s"expected exactly the re-encode pair, got $pairs")
  }

  test("EXIF orientation: tag read from APP1 (both byte orders), all 8 transforms exact, corrupt blocks loud") {
    val w = 4; val h = 2
    // distinct pixel per position — any transform error shows
    val px = rgb(w, h)((x, y) => (y * w * 3 + x * 3,
      y * w * 3 + x * 3 + 1, y * w * 3 + x * 3 + 2))
    def pxAt(ras: MediaCodec.Raster, x: Int, y: Int): Int =
      ras.pixels((y * ras.width + x) * 3) & 0xff
    // hand-check the geometric family: 6 = rotate 90 CW puts the
    // input's bottom-left at the output's top-left
    val r6 = MediaCodec.orientRgb(px, w, h, 6)
    assert(r6.width === h && r6.height === w)
    assert(pxAt(r6, 0, 0) === pxAt(MediaCodec.Raster(w, h, "RGB", px),
      0, h - 1))
    // every orientation round-trips through its inverse (1↔1, 2↔2,
    // 3↔3, 4↔4, 5↔5, 6↔8, 7↔7, 8↔6)
    val inverse = Map(1 -> 1, 2 -> 2, 3 -> 3, 4 -> 4, 5 -> 5,
      6 -> 8, 7 -> 7, 8 -> 6)
    for ((o, inv) <- inverse) {
      val fwd = MediaCodec.orientRgb(px, w, h, o)
      val back = MediaCodec.orientRgb(fwd.pixels, fwd.width,
        fwd.height, inv)
      assert(back.pixels.toSeq === px.toSeq, s"orientation $o")
    }
    // tag read: absent -> 1; spliced k -> k; decoder still parses the
    // spliced file (APP1 is skipped by the marker walk)
    val plain = MediaCodec.encodeJpeg(px, w, h)
    assert(MediaCodec.jpegOrientation(plain) === 1)
    for (k <- 1 to 8) {
      val tagged = MediaCodec.withJpegOrientation(plain, k)
      assert(MediaCodec.jpegOrientation(tagged) === k)
      assert(MediaCodec.decodeJpeg(tagged).width === w)
    }
    // big-endian (MM) Exif blob: hand-swap the spliced APP1's TIFF
    val le = MediaCodec.withJpegOrientation(plain, 6)
    val be = le.clone()
    // TIFF header starts at offset 12 (SOI 2 + APP1 hdr 4 + Exif\0\0 6)
    val t = 12
    be(t) = 'M'; be(t + 1) = 'M'
    be(t + 2) = 0; be(t + 3) = 42          // magic
    be(t + 4) = 0; be(t + 5) = 0; be(t + 6) = 0; be(t + 7) = 8
    be(t + 8) = 0; be(t + 9) = 1           // count
    be(t + 10) = 1; be(t + 11) = 18.toByte // tag 274
    be(t + 12) = 0; be(t + 13) = 3         // SHORT
    be(t + 14) = 0; be(t + 15) = 0; be(t + 16) = 0; be(t + 17) = 1
    be(t + 18) = 0; be(t + 19) = 6; be(t + 20) = 0; be(t + 21) = 0
    assert(MediaCodec.jpegOrientation(be) === 6)
    // a PRESENT-but-corrupt Exif block throws
    val bad = le.clone(); bad(t) = 'X'
    assert(intercept[IllegalArgumentException](
      MediaCodec.jpegOrientation(bad)).getMessage.contains("[GRAFT]"))
    assert(intercept[IllegalArgumentException](
      MediaCodec.jpegOrientation("GIF89a".getBytes("US-ASCII")))
      .getMessage.contains("[GRAFT]"))
  }

  test("marker-walk fuzz: APP1 at every non-canonical position real writers produce still yields the orientation") {
    val w = 16; val h = 16
    val px = rgb(w, h)((x, y) => { val v = (x * 9 + y * 5) % 200; (v, v, v) })
    val plain = MediaCodec.encodeJpeg(px, w, h)
    // the canonical splicer's APP1 segment: FFE1 + the 34-byte body
    // (the length field counts itself) = 36 bytes total
    def app1Of(o: Int): Array[Byte] = java.util.Arrays.copyOfRange(
      MediaCodec.withJpegOrientation(plain, o), 2, 38)
    def insertAt(jpeg: Array[Byte], pos: Int,
        seg: Array[Byte]): Array[Byte] = {
      val out = new Array[Byte](jpeg.length + seg.length)
      System.arraycopy(jpeg, 0, out, 0, pos)
      System.arraycopy(seg, 0, out, pos, seg.length)
      System.arraycopy(jpeg, pos, out, pos + seg.length,
        jpeg.length - pos)
      out
    }
    // position of the first occurrence of a marker in the header walk
    def posOf(jpeg: Array[Byte], marker: Int): Int = {
      var pos = 2
      while (pos + 4 <= jpeg.length) {
        val m = jpeg(pos + 1) & 0xff
        if (m == marker) return pos
        val len = ((jpeg(pos + 2) & 0xff) << 8) | (jpeg(pos + 3) & 0xff)
        pos += 2 + len
      }
      fail(s"marker $marker not found")
    }
    val exif6 = app1Of(6)
    // after DQT, after SOF, right before SOS — late-writer layouts
    for (marker <- Seq(0xc0, 0xda)) {
      val v = insertAt(plain, posOf(plain, marker), exif6)
      assert(MediaCodec.jpegOrientation(v) === 6, f"before $marker%02x")
      assert(MediaCodec.decodeJpeg(v).pixels.toSeq ===
        MediaCodec.decodeJpeg(plain).pixels.toSeq, f"decode $marker%02x")
    }
    // a COM segment and a non-Exif APP1 (XMP) BEFORE the Exif APP1
    val com = Array[Byte](0xff.toByte, 0xfe.toByte, 0, 4, 'h', 'i')
    val xmpBody = "http://ns.adobe.com/xap/1.0/ x".getBytes("US-ASCII")
    val xmp = Array[Byte](0xff.toByte, 0xe1.toByte,
      ((xmpBody.length + 2) >> 8).toByte,
      ((xmpBody.length + 2) & 0xff).toByte) ++ xmpBody
    val cluttered = insertAt(insertAt(
      MediaCodec.withJpegOrientation(plain, 7), 2, com), 2, xmp)
    assert(MediaCodec.jpegOrientation(cluttered) === 7)
    assert(MediaCodec.decodeJpeg(cluttered).width === w)
    // 0xFF fill bytes padding the marker
    val fill = insertAt(MediaCodec.withJpegOrientation(plain, 3), 2,
      Array[Byte](0xff.toByte, 0xff.toByte))
    assert(MediaCodec.jpegOrientation(fill) === 3)
    // duplicate Exif APP1s: the FIRST wins (the walk stops there)
    val dup = insertAt(MediaCodec.withJpegOrientation(plain, 5), 2,
      app1Of(2))
    assert(MediaCodec.jpegOrientation(dup) === 2)
    // and the exif-aware fingerprint is splice-position invariant
    val spark = GraftTest.spark
    import spark.implicits._
    import graft.operators.{MediaRecord, Multimodal}
    val canonical = MediaCodec.withJpegOrientation(plain, 6)
    val late = insertAt(plain, posOf(plain, 0xda), exif6)
    val media = Seq(
      MediaRecord(1L, canonical, "image/jpeg", canonical.length.toLong),
      MediaRecord(2L, late, "image/jpeg", late.length.toLong)).toDS()
    val sigs = Multimodal.imageFingerprint(spark, media,
        exifAware = true)
      .select($"doc_id", $"sig").as[(Long, Long)].collect().toMap
    assert(sigs(1L) === sigs(2L))
  }

  test("exifAware dHash: a rotated-capture duplicate fingerprints identically to the upright original; without it, it differs") {
    val spark = GraftTest.spark
    import spark.implicits._
    import graft.operators.{MediaRecord, Multimodal}
    // 32x32 block-constant (exact at q=8) with a 4x4 macro pattern
    // whose cross term breaks rotational symmetry of the horizontal
    // delta SIGNS (dHash reads only horizontal gradients — a plain
    // two-gradient fixture keeps the same signs under rotation)
    val w = 32; val h = 32
    val px = rgb(w, h)((x, y) => {
      val bx = x / 8; val by = y / 8
      val v = (bx * 53 + by * 19 + bx * by * 31) % 200 + 20
      (v, v, v)
    })
    val upright = MediaCodec.encodeJpeg(px, w, h)
    // camera-rotated capture: stored pixels are the upright image
    // rotated 270 CW (orientation 8's transform), tagged 6 so
    // uprighting (rotate 90 CW) restores the original
    val stored = MediaCodec.orientRgb(px, w, h, 8)
    val rotated = MediaCodec.withJpegOrientation(
      MediaCodec.encodeJpeg(stored.pixels, stored.width, stored.height),
      6)
    val media = Seq(
      MediaRecord(1L, upright, "image/jpeg", upright.length.toLong),
      MediaRecord(2L, rotated, "image/jpeg", rotated.length.toLong)).toDS()
    val naive = Multimodal.imageFingerprint(spark, media)
      .select($"doc_id", $"sig").as[(Long, Long)].collect().toMap
    assert(naive(1L) !== naive(2L),
      "rotation must change the naive dHash for this fixture")
    val aware = Multimodal.imageFingerprint(spark, media,
        exifAware = true)
      .select($"doc_id", $"sig", $"width").as[(Long, Long, Int)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(aware(1L) === aware(2L),
      "EXIF-aware dHash must match the upright original exactly")
    assert(aware(2L)._2 === w, "reported dims are post-uprighting")
  }
}
