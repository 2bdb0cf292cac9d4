package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MediaCodec

/** GIF codec: LZW encode/decode duals (variable width, clear/EOI,
  * KwKwK), single-frame and animated round-trips, the 4-pass
  * interlace inversion, GCE transparency and disposal compositing,
  * interop both ways against the JDK's independent ImageIO GIF
  * codec, and the Spark-side synthesizer → stats/frames paths the
  * oracle rows ride. */
class GifSpec extends AnyFunSuite {

  /** palette entry i = ((i·7)%256, (i·13)%256, (i·29)%256) — the
    * synthesizer palette, here as (r,g,b) ints for expectations. */
  private def pal(i: Int): (Int, Int, Int) =
    (i * 7 % 256, i * 13 % 256, i * 29 % 256)

  private val palette768: Array[Byte] = Array.tabulate(768) { j =>
    val i = j / 3
    (j % 3 match {
      case 0 => i * 7 % 256
      case 1 => i * 13 % 256
      case _ => i * 29 % 256
    }).toByte
  }

  /** Expected full-canvas RGB for index raster `idx`. */
  private def rgbOf(idx: Array[Byte]): Seq[Int] =
    idx.toSeq.flatMap { b =>
      val (r, g, c) = pal(b & 0xff)
      Seq(r, g, c)
    }

  private def pixelsOf(ras: MediaCodec.Raster): Seq[Int] =
    ras.pixels.toSeq.map(_ & 0xff)

  // ---- LZW ----

  test("LZW: encode/decode are exact duals across min code sizes, dictionary resets, and the KwKwK case") {
    // content with long repeats (drives the dictionary through the
    // width bumps to 12 bits and a reset) AND an aaa...-style run
    // whose first emitted pair is the classic KwKwK code
    for (minCode <- Seq(2, 4, 8)) {
      val alpha = 1 << minCode
      val n = 30000
      val data = Array.tabulate(n) { i =>
        if (i < 100) (i / 3 % alpha).toByte          // aab-ish runs
        else if (i % 1000 < 500) (i % alpha).toByte  // cycling
        else ((i * i + 7) % alpha).toByte            // noisy
      }
      val enc = MediaCodec.lzwEncode(data, minCode)
      val dec = MediaCodec.lzwDecode(enc, minCode, n)
      assert(dec.toSeq === data.toSeq, s"minCode $minCode")
      // compression actually happened on the repetitive content
      assert(enc.length < n, s"minCode $minCode: no compression")
    }
    // pure KwKwK: "aaaaaa" with a 1-entry-ahead decoder dictionary
    val run = Array.fill(64)(3.toByte)
    val encRun = MediaCodec.lzwEncode(run, 2)
    assert(MediaCodec.lzwDecode(encRun, 2, 64).toSeq === run.toSeq)
  }

  test("LZW: truncated stream, overrunning expansion, and out-of-range codes are rejected with [GRAFT] errors") {
    val data = Array.tabulate(100)(i => (i % 4).toByte)
    val enc = MediaCodec.lzwEncode(data, 2)
    assert(intercept[IllegalArgumentException](
      MediaCodec.lzwDecode(enc.take(2), 2, 100))
      .getMessage.contains("[GRAFT]"))
    // declaring FEWER pixels than the stream expands to must throw
    // (an expansion crossing the raster is corruption, not truncation)
    assert(intercept[IllegalArgumentException](
      MediaCodec.lzwDecode(enc, 2, 99)).getMessage.contains("[GRAFT]"))
    // a code far beyond the dictionary: 0xFF bits early in the stream
    val evil = Array[Byte](0xff.toByte, 0xff.toByte, 0xff.toByte)
    assert(intercept[IllegalArgumentException](
      MediaCodec.lzwDecode(evil, 2, 10)).getMessage.contains("[GRAFT]"))
  }

  // ---- single-frame round trip + interlace ----

  test("single-frame GIF round-trips exactly; interlaced storage decodes to the SAME pixels") {
    val w = 7; val h = 11 // odd sizes: all four interlace passes hit
    val idx = Array.tabulate(w * h)(i => ((i * 31 + 5) % 256).toByte)
    val plain = MediaCodec.encodeGif(idx, w, h, palette768)
    val ras = MediaCodec.decodeGif(plain)
    assert(ras.width === w && ras.height === h &&
      ras.channelOrder === "RGB")
    assert(pixelsOf(ras) === rgbOf(idx))
    val inter = MediaCodec.encodeGif(idx, w, h, palette768,
      interlaced = true)
    assert(!java.util.Arrays.equals(plain, inter),
      "interlaced file must differ on disk")
    assert(pixelsOf(MediaCodec.decodeGif(inter)) === rgbOf(idx),
      "4-pass inversion must restore row order exactly")
    // small palettes get padded to the power-of-two table size and
    // sub-8-bit min code sizes (4 colors -> minCode 2)
    val small = Array.tabulate(12)(i => (i % 4).toByte)
    val palSmall = palette768.take(12)
    val ras2 = MediaCodec.decodeGif(
      MediaCodec.encodeGif(small, 4, 3, palSmall))
    assert(pixelsOf(ras2) === rgbOf(small))
  }

  // ---- interop vs the JDK's independent GIF codec ----

  test("interop OUT: ImageIO decodes our plain AND interlaced GIFs to the exact pixels") {
    val w = 9; val h = 13
    val idx = Array.tabulate(w * h)(i => ((i * 17 + 3) % 256).toByte)
    for (interlaced <- Seq(false, true)) {
      val bytes = MediaCodec.encodeGif(idx, w, h, palette768, interlaced)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(img != null, "ImageIO must parse our GIF output")
      assert(img.getWidth === w && img.getHeight === h)
      for (y <- 0 until h; x <- 0 until w) {
        val (r, g, b) = pal(idx(y * w + x) & 0xff)
        val p = img.getRGB(x, y)
        assert(((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff) === ((r, g, b)),
          s"ImageIO disagrees at ($x,$y) interlaced=$interlaced")
      }
    }
  }

  test("interop IN: our decoder parses an independently-encoded ImageIO GIF to ImageIO's own pixels") {
    // TYPE_BYTE_INDEXED: ImageIO's GIF writer accepts it natively and
    // builds its own palette + LZW stream (deferred-clear convention)
    val w = 37; val h = 23
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 29 % 256) << 16) | ((y * 41 % 256) << 8)
        | ((x + y) * 13 % 256))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "gif", bos))
    val ras = MediaCodec.decodeGif(bos.toByteArray)
    assert(ras.width === w && ras.height === h)
    // compare against what ImageIO itself decodes from its own file
    // (the indexed write quantizes, so the source RGB is not the ref)
    val ref = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bos.toByteArray))
    for (y <- 0 until h; x <- 0 until w) {
      val p = ref.getRGB(x, y)
      val o = (y * w + x) * 3
      assert((ras.pixels(o) & 0xff) === ((p >> 16) & 0xff), s"R ($x,$y)")
      assert((ras.pixels(o + 1) & 0xff) === ((p >> 8) & 0xff), s"G ($x,$y)")
      assert((ras.pixels(o + 2) & 0xff) === (p & 0xff), s"B ($x,$y)")
    }
  }

  // ---- hand-built fixtures: transparency, disposal, sub-canvas ----

  /** 255-byte sub-block chunking of LZW data. */
  private def subBlocks(out: java.io.ByteArrayOutputStream,
      data: Array[Byte]): Unit = {
    var off = 0
    while (off < data.length) {
      val n = math.min(255, data.length - off)
      out.write(n); out.write(data, off, n); off += n
    }
    out.write(0)
  }

  private def u16(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >> 8) & 0xff)
  }

  /** Hand-assemble a GIF89a: 4-entry palette (entries pal(0..3)),
    * background index 0, frames as (left, top, w, h, indices,
    * transparentIdx or -1, disposal). */
  private def handGif(sw: Int, sh: Int,
      frames: Seq[(Int, Int, Int, Int, Array[Byte], Int, Int)]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    u16(out, sw); u16(out, sh)
    out.write(0x80 | 0x01) // GCT present, 4 entries (sizeField 1)
    out.write(0)           // background index 0
    out.write(0)           // aspect
    out.write(palette768, 0, 12)
    frames.foreach { case (left, top, w, h, idx, tIdx, disposal) =>
      out.write(0x21); out.write(0xf9); out.write(4)
      out.write((disposal << 2) | (if (tIdx >= 0) 1 else 0))
      u16(out, 4)
      out.write(if (tIdx >= 0) tIdx else 0)
      out.write(0)
      out.write(0x2c)
      u16(out, left); u16(out, top); u16(out, w); u16(out, h)
      out.write(0) // no LCT, not interlaced
      out.write(2) // min code size
      subBlocks(out, MediaCodec.lzwEncode(idx, 2))
    }
    out.write(0x3b)
    out.toByteArray
  }

  test("GCE transparency: transparent pixels leave the background canvas untouched") {
    val bytes = handGif(2, 2, Seq(
      (0, 0, 2, 2, Array[Byte](1, 2, 3, 2), 2, 0)))
    val ras = MediaCodec.decodeGif(bytes)
    // index 2 is transparent -> those pixels stay at background pal(0)
    assert(pixelsOf(ras) ===
      rgbOf(Array[Byte](1, 0, 3, 0)))
  }

  test("disposal 2 restores the frame region to background; sub-canvas frames composite at their offset") {
    val bytes = handGif(2, 2, Seq(
      (0, 0, 2, 2, Array[Byte](1, 1, 1, 1), -1, 2), // full, then wiped
      (1, 0, 1, 1, Array[Byte](3), -1, 0)))         // one px at (1,0)
    val frames = MediaCodec.decodeGifFrames(bytes)
    assert(frames.size === 2)
    assert(pixelsOf(frames(0)) === rgbOf(Array[Byte](1, 1, 1, 1)))
    // frame 1's disposal-2 wipe runs BEFORE frame 2 lands
    assert(pixelsOf(frames(1)) === rgbOf(Array[Byte](0, 3, 0, 0)))
    // disposal 3 (restore-to-previous) is rejected loudly
    val d3 = handGif(2, 2, Seq(
      (0, 0, 2, 2, Array[Byte](1, 1, 1, 1), -1, 3)))
    assert(intercept[IllegalArgumentException](
      MediaCodec.decodeGifFrames(d3)).getMessage.contains("[GRAFT]"))
  }

  test("adversarial GIF input is rejected with [GRAFT] errors") {
    val good = MediaCodec.encodeGif(Array[Byte](0, 1, 2, 3), 2, 2,
      palette768.take(12))
    // bad signature
    val sig = good.clone(); sig(0) = 'J'.toByte
    assert(intercept[IllegalArgumentException](
      MediaCodec.decodeGif(sig)).getMessage.contains("[GRAFT]"))
    // truncation at every prefix must throw, never mis-decode —
    // including the prefix missing only the 0x3b trailer
    for (n <- 1 until good.length) {
      val e = intercept[IllegalArgumentException](
        MediaCodec.decodeGif(good.take(n)))
      assert(e.getMessage.contains("[GRAFT]"), s"prefix $n")
    }
    // a frame exceeding the logical screen
    val over = handGif(2, 2, Seq(
      (1, 1, 2, 2, Array[Byte](1, 1, 1, 1), -1, 0)))
    assert(intercept[IllegalArgumentException](
      MediaCodec.decodeGif(over)).getMessage.contains("[GRAFT]"))
    // an index outside a 4-entry palette (idx 7 needs minCode 3's
    // alphabet but the table only has 4 entries)
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    u16(out, 2); u16(out, 1)
    out.write(0x80 | 0x01); out.write(0); out.write(0)
    out.write(palette768, 0, 12)
    out.write(0x2c); u16(out, 0); u16(out, 0); u16(out, 2); u16(out, 1)
    out.write(0); out.write(3)
    subBlocks(out, MediaCodec.lzwEncode(Array[Byte](7, 7), 3))
    out.write(0x3b)
    assert(intercept[IllegalArgumentException](
      MediaCodec.decodeGif(out.toByteArray)).getMessage.contains("[GRAFT]"))
    // no image data at all
    val empty = new java.io.ByteArrayOutputStream()
    empty.write("GIF89a".getBytes("US-ASCII"))
    u16(empty, 1); u16(empty, 1)
    empty.write(0); empty.write(0); empty.write(0)
    empty.write(0x3b)
    assert(intercept[IllegalArgumentException](
      MediaCodec.decodeGif(empty.toByteArray)).getMessage.contains("[GRAFT]"))
  }

  test("16-bit dimension guards: oversized encodes are rejected; the synthesizer caps at 65535 rows and the stats mirror the truncation") {
    val spark = GraftTest.spark
    import spark.implicits._
    // encoder: width/height beyond the 16-bit fields must throw, not
    // truncate mod 65536 into a structurally corrupt file
    assert(intercept[IllegalArgumentException](
      MediaCodec.encodeGif(new Array[Byte](4 * 65536), 4, 65536,
        palette768)).getMessage.contains("[GRAFT]"))
    assert(intercept[IllegalArgumentException](
      graft.operators.Multimodal.synthesizeGifAnimated(
        Seq((1L, "x")).toDF("doc_id", "text"), frameRows = 65536))
      .getMessage.contains("[GRAFT]"))
    // synthesizer: a 300,000-byte doc would be height 75,000 pre-cap
    // (gifU16 would write 75000 & 0xffff — a corrupt header); the cap
    // truncates to 65535 rows and the decoded mean is the mean of the
    // FIRST 262,140 payload bytes (the oracle mirrors with least())
    val big = "abcdefgh" * 37500
    val st = graft.operators.Multimodal.decodeStats(spark,
        graft.operators.Multimodal.synthesizeGif(
          Seq((1L, big)).toDF("doc_id", "text")))
      .collect().head
    assert(st.height === 65535 && st.n_samples === 4L * 65535)
    val pb = big.getBytes("UTF-8").take(4 * 65535).map(_ & 0xff)
    val expect = math.round(
      pb.map(b => (b * 7 % 256).toLong).sum * 1000.0 / (255.0 * pb.length))
    assert(st.c0_milli === expect)
  }

  // ---- animation round trip + ImageIO frame agreement ----

  test("animated GIF: full-canvas frames round-trip per frame; ImageIO sees the same frame count") {
    val w = 4; val h = 3
    val f0 = Array.tabulate(w * h)(i => (i % 256).toByte)
    val f1 = Array.tabulate(w * h)(i => ((i * 5 + 1) % 256).toByte)
    val f2 = Array.tabulate(w * h)(i => ((255 - i) % 256).toByte)
    val bytes = MediaCodec.encodeGifAnimated(Seq(f0, f1, f2), w, h,
      palette768, delayCs = 10)
    val frames = MediaCodec.decodeGifFrames(bytes)
    assert(frames.size === 3)
    assert(pixelsOf(frames(0)) === rgbOf(f0))
    assert(pixelsOf(frames(1)) === rgbOf(f1))
    assert(pixelsOf(frames(2)) === rgbOf(f2))
    // the JDK reader agrees on frame count and frame-0 pixels
    val in = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val rd = javax.imageio.ImageIO.getImageReaders(in).next()
    rd.setInput(in)
    assert(rd.getNumImages(true) === 3)
    val img0 = rd.read(0)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = pal(f0(y * w + x) & 0xff)
      val p = img0.getRGB(x, y)
      assert(((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff) === ((r, g, b)))
    }
    rd.dispose()
  }

  // ---- the Spark paths the oracle rows ride ----

  test("synthesizeGif -> decodeStats matches the paletted-PNG modular arithmetic; interlaced twin agrees") {
    val spark = GraftTest.spark
    import spark.implicits._
    val docs = Seq((1L, "hello gif world"), (2L, "xy"),
      (3L, "a longer document with spaces and UNICODE: üñïçødé"))
      .toDF("doc_id", "text")
    def stats(interlaced: Boolean) =
      graft.operators.Multimodal.decodeStats(spark,
        graft.operators.Multimodal.synthesizeGif(docs,
          interlaced = interlaced))
        .collect().map(s => s.doc_id -> s).toMap
    val plain = stats(false)
    for ((id, text) <- Seq((1L, "hello gif world"), (2L, "xy"),
        (3L, "a longer document with spaces and UNICODE: üñïçødé"))) {
      val bs = text.getBytes("UTF-8")
      val m = math.max(4, bs.length - bs.length % 4)
      val pb = java.util.Arrays.copyOf(bs, m).map(_ & 0xff)
      val st = plain(id)
      assert(st.format === "image/gif" && st.width === 4 &&
        st.height === m / 4 && st.n_samples === m.toLong)
      for ((mult, get) <- Seq(
          (7, () => st.c0_milli), (13, () => st.c1_milli),
          (29, () => st.c2_milli))) {
        val expect = math.round(
          pb.map(b => (b * mult % 256).toLong).sum * 1000.0 / (255.0 * m))
        assert(get() === expect, s"doc $id mult $mult")
      }
    }
    // interlaced storage is invisible to the stats (same pixels)
    val inter = stats(true)
    assert(inter.keySet === plain.keySet)
    plain.foreach { case (id, st) =>
      assert(inter(id).c0_milli === st.c0_milli &&
        inter(id).c1_milli === st.c1_milli &&
        inter(id).c2_milli === st.c2_milli, s"doc $id")
    }
  }

  test("synthesizeGifAnimated -> sampleFrames: every-Nth composited frame's means match the payload slices") {
    val spark = GraftTest.spark
    import spark.implicits._
    // 70 bytes -> 9 frames of 8 indices (4x2): frames 0, 4, 8 sampled
    val text = ("The quick brown fox jumps over the lazy dog! " +
      "0123456789 abcdefghij").take(70)
    val docs = Seq((5L, text)).toDF("doc_id", "text")
    val vid = graft.operators.Multimodal.synthesizeGifAnimated(docs,
      frameRows = 2)
    val got = graft.operators.Multimodal.sampleFrames(spark, vid,
      everyN = 4)
      .collect().map(f => f.frame_idx -> f).toMap
    assert(got.keySet === Set(0L, 4L, 8L))
    val bs = text.getBytes("UTF-8")
    val pb = java.util.Arrays.copyOf(bs, 72).map(_ & 0xff)
    for (f <- Seq(0, 4, 8)) {
      val slice = pb.slice(f * 8, f * 8 + 8)
      val st = got(f.toLong)
      assert(st.width === 4 && st.height === 2)
      for ((mult, get) <- Seq(
          (7, () => st.r_milli), (13, () => st.g_milli),
          (29, () => st.b_milli))) {
        val expect = math.round(
          slice.map(b => (b * mult % 256).toLong).sum * 1000.0 / (255.0 * 8))
        assert(get() === expect, s"frame $f mult $mult")
      }
    }
    // GIF rides the image fingerprint family through decodeRaster:
    // the same pixels as paletted PNG fingerprint identically
    import graft.operators.{MediaRecord, Multimodal}
    val idx = Array.tabulate(96)(i => ((i * 31) % 256).toByte)
    val gif = MediaCodec.encodeGif(idx, 8, 12, palette768)
    val png = MediaCodec.encodePngPaletted(idx, 8, 12, palette768)
    val media = Seq(
      MediaRecord(1L, gif, "image/gif", gif.length.toLong),
      MediaRecord(2L, png, "image/png", png.length.toLong)).toDS()
    val sigs = Multimodal.imageFingerprint(spark, media)
      .select($"doc_id", $"sig").as[(Long, Long)].collect().toMap
    assert(sigs(1L) === sigs(2L))
  }
}
