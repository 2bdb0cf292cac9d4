package graft.operators

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** Pure-JVM encoders/decoders for real media formats — WAV (RIFF
  * PCM), BMP (BITMAPINFOHEADER, 24-bpp), PPM (P6), PNG (zlib +
  * scanline filters, 4 color types) and JPEG (sequential DCT,
  * Huffman, YCbCr, 4:4:4/4:2:0; the DECODER handles baseline AND
  * progressive SOF2 scan sequences, the encoder writes baseline) —
  * so the multimodal decode path parses genuine headers, chunk
  * layouts, entropy coding, channel orders and row strides instead
  * of a stand-in byte fold.
  *
  * Codec-scope stance (a decision, not an omission): baseline +
  * progressive Huffman JPEG covers essentially all real web-image
  * corpora and is self-contained + deterministic, so it is IN; so
  * are GIF, TIFF, and WebP's VP8L LOSSLESS stream (pure integer
  * arithmetic, bit-exact by construction). Lossy VP8 is
  * decoder-specified and in principle exact, but it is a full video
  * intra codec (boolean coder, loop filter) — deferred, rejected
  * loudly rather than half-decoded. MP3 and H.264 decode
  * are OUT of scope by design — both specify the bitstream, not the
  * decoder's arithmetic (float MDCT/synthesis filterbanks differ
  * across conformant decoders), so their output is not
  * oracle-pinnable the way every kernel here must be; audio/video
  * near-dup runs on the deterministic WAV-PCM and PPM-stream paths
  * (decode-to-PCM/frames upstream with ffmpeg-class tooling), which
  * [[Multimodal]] documents as the permanent contract. The ISO-BMFF
  * (MP4) CONTAINER walk is IN ([[Mp4]]): duration, track identity,
  * and keyframe byte ranges are integer-exact box parsing like
  * WARC/RIFF, and they are the fetch plan the out-of-scope codec
  * stage consumes.
  *
  * All decoders validate magic numbers and structure and throw
  * IllegalArgumentException with a [GRAFT] message on malformed input
  * (the F1-F3 guard discipline of the store applies to media too).
  */
object MediaCodec {

  /** Decoded audio: PCM samples widened to Int (8-bit unsigned →
    * 0..255; 16-bit signed little-endian → -32768..32767). */
  final case class Pcm(sampleRate: Int, channels: Int, bitsPerSample: Int,
      samples: Array[Int])

  /** Decoded raster: pixel bytes in LOGICAL order — row 0 first
    * (top-down), channels in the format's STORED order per pixel
    * (BMP stores BGR, PPM stores RGB); `channelOrder` says which. */
  final case class Raster(width: Int, height: Int, channelOrder: String,
      pixels: Array[Byte])

  // ---------------------------------------------------------------
  // WAV / RIFF
  // ---------------------------------------------------------------

  /** Canonical 44-byte-header PCM WAV: RIFF + fmt(16) + data. The
    * final data chunk is NOT word-padded (common writer behavior),
    * so the container is exactly 44 + payload bytes. */
  def encodeWav(pcm: Array[Byte], sampleRate: Int = 8000): Array[Byte] = {
    val b = ByteBuffer.allocate(44 + pcm.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes(StandardCharsets.US_ASCII))
    b.putInt(36 + pcm.length)
    b.put("WAVE".getBytes(StandardCharsets.US_ASCII))
    b.put("fmt ".getBytes(StandardCharsets.US_ASCII))
    b.putInt(16)          // PCM fmt chunk size
    b.putShort(1)         // audio format: PCM
    b.putShort(1)         // channels: mono
    b.putInt(sampleRate)
    b.putInt(sampleRate)  // byte rate = rate * channels * bits/8
    b.putShort(1)         // block align
    b.putShort(8)         // bits per sample
    b.put("data".getBytes(StandardCharsets.US_ASCII))
    b.putInt(pcm.length)
    b.put(pcm)
    b.array()
  }

  /** RIFF chunk walker: validates RIFF/WAVE, reads `fmt `, skips
    * unknown chunks (LIST, fact, …), extracts `data`. Handles 8-bit
    * unsigned and 16-bit signed PCM, any channel count. */
  def decodeWav(bytes: Array[Byte]): Pcm = {
    require(bytes.length >= 44, "[GRAFT] wav: truncated header")
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def tag4(): String = {
      val t = new Array[Byte](4); b.get(t)
      new String(t, StandardCharsets.US_ASCII)
    }
    require(tag4() == "RIFF", "[GRAFT] wav: missing RIFF magic")
    b.getInt() // declared riff size; trust actual buffer bounds
    require(tag4() == "WAVE", "[GRAFT] wav: not a WAVE form")
    var fmtSeen = false
    var channels = 0; var rate = 0; var bits = 0
    var data: Array[Byte] = null
    while (data == null && b.remaining() >= 8) {
      val id = tag4()
      val size = b.getInt()
      require(size >= 0 && size <= b.remaining(),
        s"[GRAFT] wav: chunk $id overruns buffer")
      id match {
        case "fmt " =>
          require(size >= 16, "[GRAFT] wav: fmt chunk too small")
          val fmtEnd = b.position() + size
          val audioFormat = b.getShort()
          require(audioFormat == 1,
            s"[GRAFT] wav: only PCM supported, got format $audioFormat")
          channels = b.getShort()
          rate = b.getInt()
          b.getInt(); b.getShort() // byte rate, block align
          bits = b.getShort()
          require(bits == 8 || bits == 16,
            s"[GRAFT] wav: unsupported bit depth $bits")
          b.position(fmtEnd + (size & 1)) // chunks are word-aligned
          fmtSeen = true
        case "data" =>
          require(fmtSeen, "[GRAFT] wav: data chunk before fmt")
          data = new Array[Byte](size)
          b.get(data)
        case _ => // LIST/fact/cue/...: skip, honoring the pad byte
          val next = b.position().toLong + size + (size & 1)
          require(next <= b.limit(),
            s"[GRAFT] wav: chunk $id padding overruns buffer")
          b.position(next.toInt)
      }
    }
    require(data != null, "[GRAFT] wav: no data chunk")
    val samples =
      if (bits == 8) data.map(_ & 0xff)
      else {
        require(data.length % 2 == 0, "[GRAFT] wav: odd 16-bit payload")
        val s = new Array[Int](data.length / 2)
        var i = 0
        while (i < s.length) {
          s(i) = ((data(2 * i) & 0xff) | (data(2 * i + 1) << 8)).toShort.toInt
          i += 1
        }
        s
      }
    Pcm(rate, channels, bits, samples)
  }

  // ---------------------------------------------------------------
  // BMP (BITMAPFILEHEADER + BITMAPINFOHEADER, 24 bpp)
  // ---------------------------------------------------------------

  /** 24-bpp bottom-up BMP. `payload` is stored pixel bytes in logical
    * top-down row order, BGR per pixel, length == width*height*3; the
    * encoder lays rows bottom-up with 4-byte-aligned stride as the
    * format requires. */
  def encodeBmp(payload: Array[Byte], width: Int, height: Int): Array[Byte] = {
    require(width > 0 && height > 0 && payload.length == width * height * 3,
      "[GRAFT] bmp: payload must be width*height*3 bytes")
    val stride = ((width * 3 + 3) / 4) * 4
    val imgSize = stride * height
    val b = ByteBuffer.allocate(54 + imgSize).order(ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte)
    b.putInt(54 + imgSize)   // file size
    b.putInt(0)              // reserved
    b.putInt(54)             // pixel data offset
    b.putInt(40)             // BITMAPINFOHEADER size
    b.putInt(width)
    b.putInt(height)         // positive: bottom-up
    b.putShort(1)            // planes
    b.putShort(24)           // bpp
    b.putInt(0)              // BI_RGB, uncompressed
    b.putInt(imgSize)
    b.putInt(2835).putInt(2835) // 72 DPI
    b.putInt(0).putInt(0)    // palette
    var r = height - 1
    while (r >= 0) {
      b.put(payload, r * width * 3, width * 3)
      var pad = stride - width * 3
      while (pad > 0) { b.put(0: Byte); pad -= 1 }
      r -= 1
    }
    b.array()
  }

  /** Parses the two headers, validates 24-bpp uncompressed, undoes the
    * bottom-up row order and stride padding. Negative biHeight
    * (top-down storage) is honored. */
  def decodeBmp(bytes: Array[Byte]): Raster = {
    require(bytes.length >= 54, "[GRAFT] bmp: truncated header")
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(b.get() == 'B'.toByte && b.get() == 'M'.toByte,
      "[GRAFT] bmp: missing BM magic")
    b.getInt(); b.getInt()
    val dataOffset = b.getInt()
    val headerSize = b.getInt()
    require(headerSize >= 40, "[GRAFT] bmp: pre-BITMAPINFOHEADER bmp")
    val width = b.getInt()
    val rawHeight = b.getInt()
    val bottomUp = rawHeight > 0
    val height = math.abs(rawHeight)
    b.getShort()
    val bpp = b.getShort()
    require(bpp == 24, s"[GRAFT] bmp: only 24 bpp supported, got $bpp")
    val compression = b.getInt()
    require(compression == 0, "[GRAFT] bmp: compressed bmp unsupported")
    // explicit bounds guard BOTH ends and int overflow: a negative
    // dataOffset or a width like 0x2AAAAAAB (width*3 wraps) must fail
    // with the [GRAFT] error, not an ArrayIndexOutOfBounds mid-copy
    require(width > 0 && height > 0 && width <= (1 << 20) &&
      height <= (1 << 20), "[GRAFT] bmp: bad dimensions")
    require(dataOffset >= 54 && dataOffset <= bytes.length,
      "[GRAFT] bmp: bad pixel data offset")
    val stride = ((width.toLong * 3 + 3) / 4 * 4).toInt
    require(dataOffset.toLong + stride.toLong * height <= bytes.length,
      "[GRAFT] bmp: pixel array overruns buffer")
    val out = new Array[Byte](width * height * 3)
    var r = 0
    while (r < height) {
      val srcRow = if (bottomUp) height - 1 - r else r
      System.arraycopy(bytes, dataOffset + srcRow * stride,
        out, r * width * 3, width * 3)
      r += 1
    }
    Raster(width, height, "BGR", out)
  }

  // ---------------------------------------------------------------
  // PPM (P6, binary, maxval 255)
  // ---------------------------------------------------------------

  def encodePpm(payload: Array[Byte], width: Int, height: Int): Array[Byte] = {
    require(width > 0 && height > 0 && payload.length == width * height * 3,
      "[GRAFT] ppm: payload must be width*height*3 bytes")
    val header = s"P6\n$width $height\n255\n"
      .getBytes(StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length + payload.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(payload, 0, out, header.length, payload.length)
    out
  }

  // ---------------------------------------------------------------
  // PNG (8-bit truecolor RGB, non-interlaced; zlib via java.util.zip)
  // ---------------------------------------------------------------

  private val PngSig: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** PNG Paeth predictor (spec §9.4): nearest of left/up/up-left to
    * the linear estimate, ties broken left, up, up-left. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b)
    val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private def pngChunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val b = ByteBuffer.allocate(12 + data.length) // PNG is big-endian
    b.putInt(data.length)
    val tb = typ.getBytes(StandardCharsets.US_ASCII)
    b.put(tb).put(data)
    val crc = new java.util.zip.CRC32()
    crc.update(tb); crc.update(data)
    b.putInt(crc.getValue.toInt)
    b.array()
  }

  /** Bytes per pixel for the supported 8-bit color types: 0 =
    * grayscale, 2 = truecolor RGB, 6 = truecolor + alpha. */
  private def pngBpp(colorType: Int): Int = colorType match {
    case 0 => 1
    case 2 => 3
    case 3 => 1 // palette INDEX per pixel; PLTE holds the RGB triples
    case 6 => 4
    case other => throw new IllegalArgumentException(
      s"[GRAFT] png: unsupported color type $other " +
        "(supported: 0 grayscale, 2 truecolor, 3 paletted, " +
        "6 truecolor+alpha)")
  }

  /** 8-bit truecolor (color type 2) non-interlaced PNG. `payload` is
    * RGB bytes in top-down row order, length == width*height*3. Rows
    * cycle through ALL FIVE scanline filter types (row % 5 =
    * None/Sub/Up/Average/Paeth), so any decode of an encoded image
    * exercises every filter inversion, and IDAT is a genuine zlib
    * stream (java.util.zip.Deflater) — a desktop viewer opens the
    * output. */
  def encodePng(payload: Array[Byte], width: Int, height: Int): Array[Byte] =
    encodePng(payload, width, height, colorType = 2)

  /** 8-bit grayscale (color type 0) variant of [[encodePng]]:
    * `payload` is one luma byte per pixel. */
  def encodePngGray(payload: Array[Byte], width: Int, height: Int): Array[Byte] =
    encodePng(payload, width, height, colorType = 0)

  /** 8-bit RGBA (color type 6) variant of [[encodePng]]: `payload`
    * is R,G,B,A bytes per pixel. */
  def encodePngRgba(payload: Array[Byte], width: Int, height: Int): Array[Byte] =
    encodePng(payload, width, height, colorType = 6)

  /** PALETTED (color type 3) variant of [[encodePng]]: `indices` is
    * one palette index per pixel, `palette` is up-to-256 RGB triples
    * written as a PLTE chunk between IHDR and IDAT. Every index must
    * address a palette entry — an out-of-range index would decode to
    * garbage colors silently, so it is rejected at encode. */
  def encodePngPaletted(indices: Array[Byte], width: Int, height: Int,
      palette: Array[Byte]): Array[Byte] =
    encodePng(indices, width, height, colorType = 3, palette = palette)

  /** Shared encoder over the four supported 8-bit color types. The
    * filter predictors step by the color type's bytes-per-pixel, per
    * PNG spec §9 (for grayscale and paletted the "pixel to the left"
    * is 1 byte back; for RGBA, 4). `palette` is required exactly for
    * color type 3. */
  def encodePng(payload: Array[Byte], width: Int, height: Int,
      colorType: Int, palette: Array[Byte] = null): Array[Byte] = {
    val bpp = pngBpp(colorType)
    require(width > 0 && height > 0 && payload.length == width * height * bpp,
      s"[GRAFT] png: payload must be width*height*$bpp bytes for " +
        s"color type $colorType")
    require((colorType == 3) == (palette != null),
      "[GRAFT] png: palette required iff color type 3")
    if (colorType == 3) {
      require(palette.length >= 3 && palette.length <= 768 &&
        palette.length % 3 == 0,
        "[GRAFT] png: palette must be 1..256 RGB triples")
      val n = palette.length / 3
      var i = 0
      while (i < payload.length) {
        require((payload(i) & 0xff) < n,
          s"[GRAFT] png: palette index ${payload(i) & 0xff} out of " +
            s"range (palette has $n entries)")
        i += 1
      }
    }
    val stride = width * bpp
    // filtered scanlines: 1 filter-type byte + stride bytes per row;
    // predictors read the ORIGINAL neighbor bytes (== the decoder's
    // reconstructed bytes), all arithmetic mod 256
    val raw = new Array[Byte]((stride + 1) * height)
    var r = 0
    while (r < height) {
      val ft = r % 5
      raw(r * (stride + 1)) = ft.toByte
      var x = 0
      while (x < stride) {
        val cur = payload(r * stride + x) & 0xff
        val left = if (x >= bpp) payload(r * stride + x - bpp) & 0xff else 0
        val up = if (r > 0) payload((r - 1) * stride + x) & 0xff else 0
        val ul = if (r > 0 && x >= bpp)
          payload((r - 1) * stride + x - bpp) & 0xff else 0
        val v = ft match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - ((left + up) / 2)
          case _ => cur - paeth(left, up, ul)
        }
        raw(r * (stride + 1) + 1 + x) = v.toByte
        x += 1
      }
      r += 1
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw); defl.finish()
    val zOut = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!defl.finished()) zOut.write(tmp, 0, defl.deflate(tmp))
    defl.end()
    val ihdr = ByteBuffer.allocate(13)
    ihdr.putInt(width).putInt(height)
    ihdr.put(8.toByte)  // bit depth
    ihdr.put(colorType.toByte)
    ihdr.put(0.toByte).put(0.toByte).put(0.toByte) // deflate/adaptive/none
    val parts = Seq(PngSig, pngChunk("IHDR", ihdr.array())) ++
      (if (colorType == 3) Seq(pngChunk("PLTE", palette)) else Nil) ++
      Seq(pngChunk("IDAT", zOut.toByteArray),
        pngChunk("IEND", Array.emptyByteArray))
    val out = new Array[Byte](parts.map(_.length).sum)
    var off = 0
    parts.foreach { p =>
      System.arraycopy(p, 0, out, off, p.length); off += p.length
    }
    out
  }

  /** Chunk walker + zlib inflate + scanline un-filtering. Validates
    * the signature, each chunk's CRC32, IHDR sanity (8-bit grayscale
    * / truecolor / paletted / truecolor+alpha, 16-bit grayscale /
    * truecolor / RGBA — samples reduce to their HIGH byte, the
    * standard 16→8 downconversion; interlace 0 or Adam7 —
    * each of the 7 interlace passes is un-filtered as its own
    * sub-image and scattered onto the pixel grid), and that the
    * inflated stream is exactly the expected per-pass total. Multiple
    * IDAT chunks are concatenated per spec; unknown ancillary chunks
    * are skipped. `channelOrder` of the result is "GRAY", "RGB", or
    * "RGBA" by color type — normalize with [[toRgb]] before any
    * 3-channel kernel. */
  def decodePng(bytes: Array[Byte]): Raster = {
    require(bytes.length >= 8 + 12 + 13,
      "[GRAFT] png: truncated file")
    var i = 0
    while (i < 8) {
      require(bytes(i) == PngSig(i), "[GRAFT] png: missing signature")
      i += 1
    }
    val b = ByteBuffer.wrap(bytes) // big-endian by default
    b.position(8)
    var width = 0; var height = 0; var colorType = -1
    var interlace = 0; var bitDepth = 8
    var ihdrSeen = false; var iendSeen = false
    var plte: Array[Byte] = null
    val idat = new java.io.ByteArrayOutputStream()
    while (!iendSeen && b.remaining() >= 12) {
      val len = b.getInt()
      // long arithmetic: a crafted len near Int.MaxValue must not
      // wrap negative and pass; the bound covers type(4) + CRC(4)
      // so near-boundary truncation errors here, not in b.get
      require(len >= 0 && len.toLong + 8 <= b.remaining(),
        "[GRAFT] png: chunk overruns buffer")
      val tb = new Array[Byte](4); b.get(tb)
      val typ = new String(tb, StandardCharsets.US_ASCII)
      val data = new Array[Byte](len); b.get(data)
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data)
      require(b.getInt() == crc.getValue.toInt,
        s"[GRAFT] png: CRC mismatch in $typ chunk")
      typ match {
        case "IHDR" =>
          require(!ihdrSeen && len == 13, "[GRAFT] png: bad IHDR")
          val h = ByteBuffer.wrap(data)
          width = h.getInt(); height = h.getInt()
          // total-pixel cap (the decodeJpeg stance): per-axis bounds
          // alone admit 2^40-pixel headers whose Int size arithmetic
          // wraps (crafted ~70-byte file -> AIOOBE or multi-GB alloc)
          require(width > 0 && height > 0 && width <= (1 << 20) &&
            height <= (1 << 20) &&
            width.toLong * height <= (1L << 26),
            "[GRAFT] png: bad dimensions (max 2^26 pixels)")
          val depth = h.get(); val ct = h.get()
          require((depth == 8 &&
              (ct == 0 || ct == 2 || ct == 3 || ct == 6)) ||
            (depth == 16 && (ct == 0 || ct == 2 || ct == 6)),
            s"[GRAFT] png: only 8-bit grayscale/truecolor/paletted/" +
              s"RGBA or 16-bit grayscale/truecolor/RGBA supported, " +
              s"got depth=$depth colorType=$ct")
          colorType = ct
          bitDepth = depth
          require(h.get() == 0, "[GRAFT] png: bad compression method")
          require(h.get() == 0, "[GRAFT] png: bad filter method")
          interlace = h.get()
          require(interlace == 0 || interlace == 1,
            s"[GRAFT] png: bad interlace method $interlace")
          ihdrSeen = true
        case "PLTE" =>
          require(ihdrSeen && plte == null && idat.size() == 0,
            "[GRAFT] png: PLTE must appear once, after IHDR, before IDAT")
          require(len >= 3 && len <= 768 && len % 3 == 0,
            "[GRAFT] png: PLTE must hold 1..256 RGB triples")
          plte = data
        case "IDAT" =>
          require(ihdrSeen, "[GRAFT] png: IDAT before IHDR")
          idat.write(data)
        case "IEND" => iendSeen = true
        case _ => // ancillary (tEXt, pHYs, ...): skip
      }
    }
    require(ihdrSeen && iendSeen, "[GRAFT] png: missing IHDR or IEND")
    // filter delta in BYTES: spec 9.2 — "the byte to the left" is
    // channels x bytes-per-sample back, so 16-bit scanlines reuse the
    // byte-level un-filtering verbatim with a doubled stride
    val bpp = pngBpp(colorType) * (bitDepth / 8)
    val stride = width * bpp
    // Adam7 pass geometry (spec 4.5.2): (xStart, yStart, xStep, yStep)
    val passes: Array[(Int, Int, Int, Int)] =
      if (interlace == 0) Array((0, 0, 1, 1))
      else Array((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
        (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
    def passDims(p: (Int, Int, Int, Int)): (Int, Int) = {
      val (x0, y0, dx, dy) = p
      (if (width > x0) (width - x0 + dx - 1) / dx else 0,
        if (height > y0) (height - y0 + dy - 1) / dy else 0)
    }
    // each pass is its own filtered sub-image; ALL passes share one
    // zlib stream, empty passes contribute zero bytes
    val rawLen = passes.map { p =>
      val (pw, ph) = passDims(p)
      if (pw > 0 && ph > 0) (pw * bpp + 1) * ph else 0
    }.sum
    val raw = new Array[Byte](rawLen)
    val infl = new java.util.zip.Inflater()
    infl.setInput(idat.toByteArray)
    var got = 0
    try {
      while (got < rawLen && !infl.finished()) {
        val n =
          try infl.inflate(raw, got, rawLen - got)
          catch {
            case e: java.util.zip.DataFormatException =>
              throw new IllegalArgumentException(
                s"[GRAFT] png: corrupt zlib stream (${e.getMessage})")
          }
        if (n == 0)
          require(infl.finished(),
            "[GRAFT] png: truncated or stalled zlib stream")
        got += n
      }
    } finally infl.end()
    require(got == rawLen,
      s"[GRAFT] png: inflated $got bytes, expected $rawLen")
    // un-filter ONE sub-image at `off` in the inflated stream:
    // predictors read RECONSTRUCTED neighbors, mod 256
    def unfilter(off: Int, wpx: Int, hpx: Int): Array[Byte] = {
      val st = wpx * bpp
      val res = new Array[Byte](st * hpx)
      var r = 0
      while (r < hpx) {
        val ft = raw(off + r * (st + 1)) & 0xff
        require(ft <= 4, s"[GRAFT] png: unknown filter type $ft")
        var x = 0
        while (x < st) {
          val f = raw(off + r * (st + 1) + 1 + x) & 0xff
          val left = if (x >= bpp) res(r * st + x - bpp) & 0xff else 0
          val up = if (r > 0) res((r - 1) * st + x) & 0xff else 0
          val ul = if (r > 0 && x >= bpp)
            res((r - 1) * st + x - bpp) & 0xff else 0
          val v = ft match {
            case 0 => f
            case 1 => f + left
            case 2 => f + up
            case 3 => f + ((left + up) / 2)
            case _ => f + paeth(left, up, ul)
          }
          res(r * st + x) = v.toByte
          x += 1
        }
        r += 1
      }
      res
    }
    // non-interlaced (the overwhelmingly common case): the single
    // pass IS the image — no scatter pass, no second pixel buffer
    val out = if (interlace == 0) unfilter(0, width, height)
    else {
      val o = new Array[Byte](stride * height)
      var off = 0
      passes.foreach { p =>
        val (x0, y0, dx, dy) = p
        val (pw, ph) = passDims(p)
        if (pw > 0 && ph > 0) {
          val sub = unfilter(off, pw, ph)
          off += (pw * bpp + 1) * ph
          // scatter the pass's pixels onto the Adam7 grid
          var j = 0
          while (j < ph) {
            var i2 = 0
            while (i2 < pw) {
              System.arraycopy(sub, (j * pw + i2) * bpp, o,
                ((y0 + j * dy) * width + (x0 + i2 * dx)) * bpp, bpp)
              i2 += 1
            }
            j += 1
          }
        }
      }
      o
    }
    // 16-bit samples reduce to their HIGH byte (the standard 16->8
    // downconversion; v >> 8): every downstream kernel — stats, dHash,
    // resize — operates on 8-bit rasters, and the high byte is what an
    // independent decoder's (sample >> 8) reproduces exactly
    val out8 =
      if (bitDepth == 8) out
      else {
        val o = new Array[Byte](out.length / 2)
        var i = 0
        while (i < o.length) { o(i) = out(2 * i); i += 1 }
        o
      }
    // paletted: expand indices through PLTE at decode — downstream
    // kernels see plain RGB, exactly like truecolor
    if (colorType == 3) {
      require(plte != null, "[GRAFT] png: paletted image missing PLTE")
      val n = plte.length / 3
      val rgb = new Array[Byte](out8.length * 3)
      var i = 0
      while (i < out8.length) {
        val idx = out8(i) & 0xff
        require(idx < n,
          s"[GRAFT] png: palette index $idx out of range ($n entries)")
        rgb(3 * i) = plte(3 * idx)
        rgb(3 * i + 1) = plte(3 * idx + 1)
        rgb(3 * i + 2) = plte(3 * idx + 2)
        i += 1
      }
      return Raster(width, height, "RGB", rgb)
    }
    val order = colorType match {
      case 0 => "GRAY"
      case 2 => "RGB"
      case _ => "RGBA"
    }
    Raster(width, height, order, out8)
  }

  /** Normalize any decoded raster to 3-byte RGB pixels: BGR swaps
    * channels, GRAY replicates luma, RGBA alpha-composites over an
    * opaque `background` (default white) with correct rounding —
    * v = round((c·a + bg·(255−a)) / 255) — so fully transparent
    * pixels read as the background, not as their hidden color. Pure
    * integer arithmetic, mirrored by the DuckDB oracle. */
  def toRgb(ras: Raster, background: Int = 255): Raster = {
    require(background >= 0 && background <= 255,
      "[GRAFT] toRgb: background must be a byte value")
    ras.channelOrder match {
      case "RGB" => ras
      case "BGR" =>
        val p = ras.pixels.clone()
        var i = 0
        while (i < p.length) {
          val t = p(i); p(i) = p(i + 2); p(i + 2) = t
          i += 3
        }
        Raster(ras.width, ras.height, "RGB", p)
      case "GRAY" =>
        val p = new Array[Byte](ras.pixels.length * 3)
        var i = 0
        while (i < ras.pixels.length) {
          val g = ras.pixels(i)
          p(3 * i) = g; p(3 * i + 1) = g; p(3 * i + 2) = g
          i += 1
        }
        Raster(ras.width, ras.height, "RGB", p)
      case "RGBA" =>
        val n = ras.pixels.length / 4
        val p = new Array[Byte](n * 3)
        var i = 0
        while (i < n) {
          val a = ras.pixels(4 * i + 3) & 0xff
          var c = 0
          while (c < 3) {
            val v = ras.pixels(4 * i + c) & 0xff
            p(3 * i + c) =
              ((v * a + background * (255 - a) + 127) / 255).toByte
            c += 1
          }
          i += 1
        }
        Raster(ras.width, ras.height, "RGB", p)
      case other => throw new IllegalArgumentException(
        s"[GRAFT] toRgb: unknown channel order $other")
    }
  }

  /** ASCII header parser with `#` comment support (the part naive
    * implementations get wrong), then raw RGB triplets. Trailing
    * bytes after the pixel data are tolerated (single-image use). */
  def decodePpm(bytes: Array[Byte]): Raster = decodePpmAt(bytes, 0)._1

  /** Parse ONE P6 frame starting at `offset`; returns the raster and
    * the offset one past its pixel data. The building block for
    * concatenated-P6 streams (the `ffmpeg -f image2pipe` ppm video
    * format: frames are whole P6 files laid back to back). */
  def decodePpmAt(bytes: Array[Byte], offset: Int): (Raster, Int) = {
    require(offset >= 0 && offset + 2 <= bytes.length &&
      bytes(offset) == 'P'.toByte && bytes(offset + 1) == '6'.toByte,
      "[GRAFT] ppm: missing P6 magic")
    var pos = offset + 2
    def nextInt(): Int = {
      // skip whitespace and comments
      var inComment = false
      while (pos < bytes.length && {
        val c = bytes(pos).toChar
        if (inComment) { if (c == '\n') inComment = false; true }
        else if (c == '#') { inComment = true; true }
        else c.isWhitespace
      }) pos += 1
      require(pos < bytes.length, "[GRAFT] ppm: truncated header")
      var v = 0
      var any = false
      while (pos < bytes.length && bytes(pos).toChar.isDigit) {
        v = v * 10 + (bytes(pos) - '0'); pos += 1; any = true
        require(v <= (1 << 24), "[GRAFT] ppm: header integer too large")
      }
      require(any, "[GRAFT] ppm: expected integer in header")
      v
    }
    val width = nextInt()
    val height = nextInt()
    val maxval = nextInt()
    require(maxval == 255, s"[GRAFT] ppm: only maxval 255, got $maxval")
    require(width > 0 && height > 0 && width <= (1 << 20) &&
      height <= (1 << 20), "[GRAFT] ppm: bad dimensions")
    pos += 1 // exactly one whitespace byte after maxval per spec
    // long arithmetic: width*height*3 must not wrap negative and
    // sneak past the truncation check
    val nL = width.toLong * height * 3
    require(pos + nL <= bytes.length, "[GRAFT] ppm: pixel data truncated")
    val n = nL.toInt
    val out = new Array[Byte](n)
    System.arraycopy(bytes, pos, out, 0, n)
    (Raster(width, height, "RGB", out), pos + n)
  }

  /** Decode a whole concatenated-P6 stream into its frames. Requires
    * at least one frame and that the stream ends EXACTLY at a frame
    * boundary — a truncated final frame or trailing garbage throws
    * (the decodePpmAt magic/bounds checks), it does not silently
    * yield fewer frames. */
  def decodePpmStream(bytes: Array[Byte]): Seq[Raster] = {
    require(bytes.length >= 2, "[GRAFT] ppm-stream: empty stream")
    val frames = Seq.newBuilder[Raster]
    var off = 0
    while (off < bytes.length) {
      val (r, next) = decodePpmAt(bytes, off)
      frames += r
      off = next
    }
    frames.result()
  }

  // ---------------------------------------------------------------
  // JPEG (baseline sequential DCT, Huffman, YCbCr — ITU-T T.81)
  // ---------------------------------------------------------------

  /** Zig-zag → natural coefficient order (T.81 Figure A.6). */
  private val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  // The typical Huffman tables of T.81 Annex K.3 (the ones every
  // baseline encoder ships): (bits per code length 1..16, symbol
  // values). The encoder emits only symbols its content produces; the
  // decoder always rebuilds tables from the file's own DHT.
  private val DcLumBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcLumVals = (0 to 11).toArray
  private val DcChrBits = Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DcChrVals = (0 to 11).toArray
  private val AcLumBits =
    Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcLumVals = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16,
    0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7,
    0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5,
    0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4,
    0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea,
    0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa)
  private val AcChrBits =
    Array(0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val AcChrVals = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0,
    0x15, 0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34,
    0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3,
    0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2,
    0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9,
    0xea, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa)

  /** cos((2x+1)·u·π/16) lookup shared by FDCT and IDCT. */
  private val DctCos: Array[Array[Double]] = Array.tabulate(8, 8) {
    (u, x) => math.cos((2 * x + 1) * u * math.Pi / 16)
  }
  private val InvSqrt2 = 1.0 / math.sqrt(2.0)

  /** Pinned rounding for every JPEG sample/coefficient decision —
    * floor(x + 0.5), the form a SQL oracle reproduces verbatim
    * (Math.round special-cases one boundary double differently). */
  private def jround(x: Double): Int = math.floor(x + 0.5).toInt

  private def clamp255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  // The pinned JFIF color chains as SCALAR per-channel helpers —
  // the per-PIXEL loops (encoder plane split, decoder RGB emit)
  // call these primitive-returning forms: the tuple forms below
  // box three Ints per pixel, and whether the JIT's escape
  // analysis eliminates that allocation is host/profile-sensitive
  // (the r17 driver host burned 2.3× the CPU of the builder host
  // on identical code — a megapixel image is 3M boxed Integers per
  // conversion pass when scalar replacement doesn't kick in).
  private def yccY(r: Int, g: Int, b: Int): Int =
    clamp255(jround(0.299 * r + 0.587 * g + 0.114 * b))
  private def yccCb(r: Int, g: Int, b: Int): Int =
    clamp255(jround(-0.168736 * r - 0.331264 * g + 0.5 * b + 128))
  private def yccCr(r: Int, g: Int, b: Int): Int =
    clamp255(jround(0.5 * r - 0.418688 * g - 0.081312 * b + 128))
  private def rgbR(y: Int, cr: Int): Int =
    clamp255(jround(y + 1.402 * (cr - 128)))
  private def rgbG(y: Int, cb: Int, cr: Int): Int =
    clamp255(jround(y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)))
  private def rgbB(y: Int, cb: Int): Int =
    clamp255(jround(y + 1.772 * (cb - 128)))

  /** JFIF RGB→YCbCr, integer in/out: floor(x + 0.5) on the pinned
    * left-to-right double chain, clamped (Cb/Cr reach 255.5 at the
    * gamut corners). Tuple convenience over the scalar helpers —
    * specs and cold paths; hot loops use the scalars directly. */
  private[graft] def rgbToYcc(r: Int, g: Int, b: Int): (Int, Int, Int) =
    (yccY(r, g, b), yccCb(r, g, b), yccCr(r, g, b))

  /** JFIF YCbCr→RGB, the decoder's exact chain (mirrored by the
    * DuckDB oracles): floor(x + 0.5), clamp. Tuple convenience over
    * the scalar helpers, as [[rgbToYcc]]. */
  private[graft] def yccToRgb(y: Int, cb: Int, cr: Int): (Int, Int, Int) =
    (rgbR(y, cr), rgbG(y, cb, cr), rgbB(y, cb))

  /** Forward DCT of one level-shifted 8×8 block (row-major ints),
    * quantized by `q` per coefficient — separable double math. For a
    * CONSTANT block every AC quantizes to exactly 0 and the DC
    * round-trips exactly (the synthesizer fixtures' oracle-exactness
    * lever). */
  private def fdctQuant(block: Array[Int], qtab: Array[Int]): Array[Int] = {
    val tmp = new Array[Double](64) // tmp(u, y) = Σ_x s(x,y)·cos_u(x)
    var u = 0
    while (u < 8) {
      var y = 0
      while (y < 8) {
        var s = 0.0
        var x = 0
        while (x < 8) { s += block(y * 8 + x) * DctCos(u)(x); x += 1 }
        tmp(u * 8 + y) = s
        y += 1
      }
      u += 1
    }
    val out = new Array[Int](64)
    u = 0
    while (u < 8) {
      val cu = if (u == 0) InvSqrt2 else 1.0
      var v = 0
      while (v < 8) {
        val cv = if (v == 0) InvSqrt2 else 1.0
        var s = 0.0
        var y = 0
        while (y < 8) { s += tmp(u * 8 + y) * DctCos(v)(y); y += 1 }
        val f = 0.25 * cu * cv * s
        out(v * 8 + u) = jround(f / qtab(v * 8 + u))
        v += 1
      }
      u += 1
    }
    out
  }

  /** Inverse DCT of one dequantized 8×8 block → level-shifted,
    * clamped samples. Zero terms are SKIPPED, which is bit-exact:
    * a skipped term is `cu·0·cos = ±0.0`, the accumulator starts at
    * +0.0 and non-skipped terms are nonzero products (the cos table
    * has no exact zeros), so it can never sit at −0.0 — and
    * `s + (±0.0) == s` for every such s. Quantized blocks are sparse
    * by design (that is what quantization is for), so most of the
    * 2×512 multiply-adds vanish on real data. */
  private def idct(coef: Array[Int]): Array[Int] = {
    val tmp = new Array[Double](64) // tmp(x, v) = Σ_u C(u)·F(u,v)·cos_u(x)
    var x = 0
    while (x < 8) {
      var v = 0
      while (v < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) {
          val c0 = coef(v * 8 + u)
          if (c0 != 0) {
            val cu = if (u == 0) InvSqrt2 else 1.0
            s += cu * c0 * DctCos(u)(x)
          }
          u += 1
        }
        tmp(x * 8 + v) = s
        v += 1
      }
      x += 1
    }
    val out = new Array[Int](64)
    var y = 0
    while (y < 8) {
      var x2 = 0
      while (x2 < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) {
          val t0 = tmp(x2 * 8 + v)
          if (t0 != 0.0) {
            val cv = if (v == 0) InvSqrt2 else 1.0
            s += cv * t0 * DctCos(v)(y)
          }
          v += 1
        }
        out(y * 8 + x2) = clamp255(jround(0.25 * s + 128))
        x2 += 1
      }
      y += 1
    }
    out
  }

  /** Per-scan memo for DC-ONLY blocks (all 63 ACs zero — every block
    * of a flat region, and every block of the constant-color bench
    * fixtures): [[idct]] of such a block depends only on the
    * dequantized DC, so compute it ONCE through the unmodified [[idct]]
    * (bit-identical by construction — no re-derived arithmetic) and
    * reuse the result array by reference (consumers only arraycopy out
    * of it). The r18 JFR profile put `idct` at ~40% of `decodeJpeg`
    * CPU with the fixtures exercising exactly this path. */
  private final class IdctDcMemo {
    private val cache = new java.util.HashMap[Int, Array[Int]]()
    def apply(coef: Array[Int]): Array[Int] = {
      var r = cache.get(coef(0))
      if (r == null) { r = idct(coef); cache.put(coef(0), r) }
      r
    }
  }

  /** Per-encode memo for CONSTANT input blocks (the dual of
    * [[IdctDcMemo]]): [[fdctQuant]] of an all-equal block depends only
    * on the sample value (the qtab is fixed per call), so compute once
    * through the unmodified [[fdctQuant]] and share the array
    * ([[encodeBlock]] only reads it). Non-constant blocks fall through
    * to the plain call. */
  private final class FdctMemo(qtab: Array[Int]) {
    private val cache = new java.util.HashMap[Int, Array[Int]]()
    def apply(block: Array[Int]): Array[Int] = {
      val v0 = block(0)
      var i = 1
      while (i < 64 && block(i) == v0) i += 1
      if (i < 64) return fdctQuant(block, qtab)
      var r = cache.get(v0)
      if (r == null) { r = fdctQuant(block, qtab); cache.put(v0, r) }
      r
    }
  }

  /** Entropy-coded-segment bit writer with 0xFF byte stuffing. */
  private final class JpegBitWriter(out: java.io.ByteArrayOutputStream) {
    private var buf = 0
    private var cnt = 0
    def put(bits: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        buf = (buf << 1) | ((bits >> i) & 1)
        cnt += 1
        if (cnt == 8) {
          out.write(buf)
          if (buf == 0xff) out.write(0x00)
          buf = 0; cnt = 0
        }
        i -= 1
      }
    }
    /** Pad the final partial byte with 1-bits (T.81 F.1.2.3). */
    def flush(): Unit = if (cnt > 0) put((1 << (8 - cnt)) - 1, 8 - cnt)
  }

  /** Canonical Huffman codes from a (bits, values) table: symbol →
    * (code, length). */
  private def huffEncodeTable(bits: Array[Int],
      vals: Array[Int]): Array[(Int, Int)] = {
    val codes = new Array[(Int, Int)](256)
    var code = 0
    var k = 0
    var len = 1
    while (len <= 16) {
      var i = 0
      while (i < bits(len - 1)) {
        codes(vals(k)) = (code, len)
        code += 1; k += 1; i += 1
      }
      code <<= 1
      len += 1
    }
    codes
  }

  private def bitLen(v: Int): Int = 32 - Integer.numberOfLeadingZeros(v)

  /** Huffman-encode one quantized block (natural order): DC diff
    * category + bits, AC run/size symbols with ZRL and EOB. Returns
    * the block's DC for the next prediction. */
  private def encodeBlock(w: JpegBitWriter, coef: Array[Int], pred: Int,
      dcCodes: Array[(Int, Int)], acCodes: Array[(Int, Int)]): Int = {
    def emitSym(codes: Array[(Int, Int)], sym: Int): Unit = {
      val c = codes(sym)
      require(c != null, s"[GRAFT] jpeg: symbol $sym not in Huffman table")
      w.put(c._1, c._2)
    }
    val diff = coef(0) - pred
    val s = if (diff == 0) 0 else bitLen(math.abs(diff))
    emitSym(dcCodes, s)
    if (s > 0) w.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
    var run = 0
    var k = 1
    while (k < 64) {
      val v = coef(ZigZag(k))
      if (v == 0) run += 1
      else {
        while (run > 15) { emitSym(acCodes, 0xf0); run -= 16 }
        val sz = bitLen(math.abs(v))
        emitSym(acCodes, (run << 4) | sz)
        w.put(if (v < 0) v + (1 << sz) - 1 else v, sz)
        run = 0
      }
      k += 1
    }
    if (run > 0) emitSym(acCodes, 0x00)
    coef(0)
  }

  /** Edge-replicated plane extraction: one channel of an
    * interleaved-RGB image into a padded (pw × ph) plane. */
  private def padPlane(src: Array[Int], w: Int, h: Int,
      pw: Int, ph: Int): Array[Int] = {
    val out = new Array[Int](pw * ph)
    var y = 0
    while (y < ph) {
      val sy = math.min(y, h - 1)
      var x = 0
      while (x < pw) {
        out(y * pw + x) = src(sy * w + math.min(x, w - 1))
        x += 1
      }
      y += 1
    }
    out
  }

  private def jpegSeg(out: java.io.ByteArrayOutputStream, marker: Int,
      body: Array[Byte]): Unit = {
    out.write(0xff); out.write(marker)
    val len = body.length + 2
    out.write((len >> 8) & 0xff); out.write(len & 0xff)
    out.write(body, 0, body.length)
  }

  private def dhtBody(tc: Int, th: Int, bits: Array[Int],
      vals: Array[Int]): Array[Byte] = {
    val b = new Array[Byte](1 + 16 + vals.length)
    b(0) = ((tc << 4) | th).toByte
    var i = 0
    while (i < 16) { b(1 + i) = bits(i).toByte; i += 1 }
    i = 0
    while (i < vals.length) { b(17 + i) = vals(i).toByte; i += 1 }
    b
  }

  /** Baseline sequential JPEG encoder — REAL compression: JFIF
    * RGB→YCbCr (integer, pinned rounding), optional 4:2:0 chroma
    * subsampling (2×2 box average, `(sum+2)/4`), forward DCT,
    * FLAT quantization table `q` (all 64 entries — q=8 makes a
    * block-constant input round-trip EXACTLY: DC = 8·(c−128) is an
    * exact double, every AC quantizes to 0), zig-zag, and the Annex
    * K.3 typical Huffman tables with DC-difference and AC run-length
    * coding. Output is a bona fide JFIF file (SOI, APP0, DQT×2,
    * SOF0, DHT×4, optional DRI, SOS, stuffed entropy data, EOI) that
    * desktop decoders open. `payload` is RGB bytes, top-down rows.
    * `restartInterval > 0` emits DRI + RSTn markers every that many
    * MCUs (byte-aligned, DC predictors reset) — the resync points a
    * parallel/fault-tolerant decoder keys on. */
  def encodeJpeg(payload: Array[Byte], width: Int, height: Int,
      subsample: Boolean = false, q: Int = 8,
      restartInterval: Int = 0): Array[Byte] = {
    require(width > 0 && height > 0 &&
      payload.length == width * height * 3,
      "[GRAFT] jpeg: payload must be width*height*3 bytes")
    // SOF records dimensions in 16-bit fields: anything larger would
    // silently truncate mod 65536 into a corrupt file
    require(width <= 65535 && height <= 65535,
      "[GRAFT] jpeg: dimensions exceed the format's 16-bit SOF fields")
    require(q >= 1 && q <= 255, "[GRAFT] jpeg: q must be in [1, 255]")
    require(restartInterval >= 0 && restartInterval <= 65535,
      "[GRAFT] jpeg: restartInterval must be in [0, 65535]")
    // full-resolution YCbCr planes
    val n = width * height
    val yP = new Array[Int](n); val cbP = new Array[Int](n)
    val crP = new Array[Int](n)
    // last-pixel memo: images are full of same-color runs (the bench
    // fixtures are block-constant, photos have flat regions) and the
    // conversion is a pure function of (r,g,b) — reusing the previous
    // pixel's result on an equal input is bit-exact and turns three
    // pinned double chains per pixel into three int compares
    var pr = -1; var pg = -1; var pb = -1
    var py = 0; var pcb = 0; var pcr = 0
    var i = 0
    while (i < n) {
      // scalar helpers, not the tuple form — no per-pixel boxing
      val r = payload(3 * i) & 0xff
      val g = payload(3 * i + 1) & 0xff
      val b = payload(3 * i + 2) & 0xff
      if (r != pr || g != pg || b != pb) {
        py = yccY(r, g, b); pcb = yccCb(r, g, b); pcr = yccCr(r, g, b)
        pr = r; pg = g; pb = b
      }
      yP(i) = py; cbP(i) = pcb; crP(i) = pcr
      i += 1
    }
    val mcu = if (subsample) 16 else 8
    val pw = (width + mcu - 1) / mcu * mcu
    val ph = (height + mcu - 1) / mcu * mcu
    val yPad = padPlane(yP, width, height, pw, ph)
    val (cbPad, crPad, cw, ch) =
      if (!subsample)
        (padPlane(cbP, width, height, pw, ph),
          padPlane(crP, width, height, pw, ph), pw, ph)
      else {
        // 2×2 box average AFTER padding (constant macroblocks stay
        // exact; edges average replicated samples)
        val fcb = padPlane(cbP, width, height, pw, ph)
        val fcr = padPlane(crP, width, height, pw, ph)
        val w2 = pw / 2; val h2 = ph / 2
        val scb = new Array[Int](w2 * h2)
        val scr = new Array[Int](w2 * h2)
        var yy = 0
        while (yy < h2) {
          var xx = 0
          while (xx < w2) {
            val o = 2 * yy * pw + 2 * xx
            scb(yy * w2 + xx) =
              (fcb(o) + fcb(o + 1) + fcb(o + pw) + fcb(o + pw + 1) + 2) / 4
            scr(yy * w2 + xx) =
              (fcr(o) + fcr(o + 1) + fcr(o + pw) + fcr(o + pw + 1) + 2) / 4
            xx += 1
          }
          yy += 1
        }
        (scb, scr, w2, h2)
      }
    val qtab = Array.fill(64)(q)
    def blockAt(plane: Array[Int], pwid: Int, bx: Int, by: Int): Array[Int] = {
      val b = new Array[Int](64)
      var yy = 0
      while (yy < 8) {
        var xx = 0
        while (xx < 8) {
          b(yy * 8 + xx) = plane((by * 8 + yy) * pwid + bx * 8 + xx) - 128
          xx += 1
        }
        yy += 1
      }
      b
    }
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xff); out.write(0xd8) // SOI
    jpegSeg(out, 0xe0, Array[Byte]('J', 'F', 'I', 'F', 0, 1, 1, 0,
      0, 1, 0, 1, 0, 0)) // APP0: JFIF 1.1, no density, no thumbnail
    val dqt0 = new Array[Byte](65); dqt0(0) = 0
    val dqt1 = new Array[Byte](65); dqt1(0) = 1
    var k = 0
    while (k < 64) { // zig-zag order per spec
      dqt0(1 + k) = q.toByte; dqt1(1 + k) = q.toByte; k += 1
    }
    jpegSeg(out, 0xdb, dqt0)
    jpegSeg(out, 0xdb, dqt1)
    val hv1 = if (subsample) 0x22 else 0x11
    jpegSeg(out, 0xc0, Array[Byte](8,
      ((height >> 8) & 0xff).toByte, (height & 0xff).toByte,
      ((width >> 8) & 0xff).toByte, (width & 0xff).toByte,
      3, 1, hv1.toByte, 0, 2, 0x11, 1, 3, 0x11, 1))
    jpegSeg(out, 0xc4, dhtBody(0, 0, DcLumBits, DcLumVals))
    jpegSeg(out, 0xc4, dhtBody(1, 0, AcLumBits, AcLumVals))
    jpegSeg(out, 0xc4, dhtBody(0, 1, DcChrBits, DcChrVals))
    jpegSeg(out, 0xc4, dhtBody(1, 1, AcChrBits, AcChrVals))
    if (restartInterval > 0)
      jpegSeg(out, 0xdd, Array[Byte](
        ((restartInterval >> 8) & 0xff).toByte,
        (restartInterval & 0xff).toByte))
    jpegSeg(out, 0xda, Array[Byte](3, 1, 0x00, 2, 0x11, 3, 0x11,
      0, 63, 0))
    val w = new JpegBitWriter(out)
    val dcLum = huffEncodeTable(DcLumBits, DcLumVals)
    val acLum = huffEncodeTable(AcLumBits, AcLumVals)
    val dcChr = huffEncodeTable(DcChrBits, DcChrVals)
    val acChr = huffEncodeTable(AcChrBits, AcChrVals)
    var predY = 0; var predCb = 0; var predCr = 0
    val fq = new FdctMemo(qtab)
    val mcusY = ph / mcu
    val mcusX = pw / mcu
    var mcusDone = 0
    var rstIdx = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        // restart interval: byte-align (pad bits), emit RSTn, reset
        // the DC predictors — giving a parallel decoder its resync
        // points (T.81 F.1.2.3 / E.1.2)
        if (restartInterval > 0 && mcusDone == restartInterval) {
          w.flush() // byte-align; the writer is reusable after flush
          out.write(0xff); out.write(0xd0 + rstIdx)
          rstIdx = (rstIdx + 1) & 7
          predY = 0; predCb = 0; predCr = 0
          mcusDone = 0
        }
        if (subsample) {
          var by = 0
          while (by < 2) {
            var bx = 0
            while (bx < 2) {
              predY = encodeBlock(w,
                fq(blockAt(yPad, pw, 2 * mx + bx, 2 * my + by)),
                predY, dcLum, acLum)
              bx += 1
            }
            by += 1
          }
        } else {
          predY = encodeBlock(w,
            fq(blockAt(yPad, pw, mx, my)), predY,
            dcLum, acLum)
        }
        predCb = encodeBlock(w,
          fq(blockAt(cbPad, cw, mx, my)), predCb,
          dcChr, acChr)
        predCr = encodeBlock(w,
          fq(blockAt(crPad, cw, mx, my)), predCr,
          dcChr, acChr)
        mcusDone += 1
        mx += 1
      }
      my += 1
    }
    w.flush()
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  /** Grayscale (single-component) baseline JPEG: `payload` is one
    * luma byte per pixel — no color conversion, so a block-constant
    * input decodes back byte-exactly at q = 8. */
  def encodeJpegGray(payload: Array[Byte], width: Int, height: Int,
      q: Int = 8): Array[Byte] = {
    require(width > 0 && height > 0 && payload.length == width * height,
      "[GRAFT] jpeg: payload must be width*height bytes")
    require(width <= 65535 && height <= 65535,
      "[GRAFT] jpeg: dimensions exceed the format's 16-bit SOF fields")
    require(q >= 1 && q <= 255, "[GRAFT] jpeg: q must be in [1, 255]")
    val plane = new Array[Int](payload.length)
    var i = 0
    while (i < plane.length) { plane(i) = payload(i) & 0xff; i += 1 }
    val pw = (width + 7) / 8 * 8
    val ph = (height + 7) / 8 * 8
    val pad = padPlane(plane, width, height, pw, ph)
    val qtab = Array.fill(64)(q)
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xff); out.write(0xd8)
    jpegSeg(out, 0xe0, Array[Byte]('J', 'F', 'I', 'F', 0, 1, 1, 0,
      0, 1, 0, 1, 0, 0))
    val dqt0 = new Array[Byte](65); dqt0(0) = 0
    var k = 0
    while (k < 64) { dqt0(1 + k) = q.toByte; k += 1 }
    jpegSeg(out, 0xdb, dqt0)
    jpegSeg(out, 0xc0, Array[Byte](8,
      ((height >> 8) & 0xff).toByte, (height & 0xff).toByte,
      ((width >> 8) & 0xff).toByte, (width & 0xff).toByte,
      1, 1, 0x11, 0))
    jpegSeg(out, 0xc4, dhtBody(0, 0, DcLumBits, DcLumVals))
    jpegSeg(out, 0xc4, dhtBody(1, 0, AcLumBits, AcLumVals))
    jpegSeg(out, 0xda, Array[Byte](1, 1, 0x00, 0, 63, 0))
    val w = new JpegBitWriter(out)
    val dcLum = huffEncodeTable(DcLumBits, DcLumVals)
    val acLum = huffEncodeTable(AcLumBits, AcLumVals)
    var pred = 0
    val fq = new FdctMemo(qtab)
    val b = new Array[Int](64)
    var by = 0
    while (by < ph / 8) {
      var bx = 0
      while (bx < pw / 8) {
        var yy = 0
        while (yy < 8) {
          var xx = 0
          while (xx < 8) {
            b(yy * 8 + xx) = pad((by * 8 + yy) * pw + bx * 8 + xx) - 128
            xx += 1
          }
          yy += 1
        }
        pred = encodeBlock(w, fq(b), pred, dcLum, acLum)
        bx += 1
      }
      by += 1
    }
    w.flush()
    out.write(0xff); out.write(0xd9)
    out.toByteArray
  }

  /** Canonical Huffman DECODE table (T.81 F.2.2.3): per code length,
    * the min/max code and the index of its first value. */
  private final class JpegHuffTable(bits: Array[Int], val vals: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = Array.fill(17)(-1)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        if (bits(l - 1) > 0) {
          valPtr(l) = k
          minCode(l) = code
          code += bits(l - 1); k += bits(l - 1)
          maxCode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
    }
  }

  /** Entropy-coded-segment bit reader: un-stuffs 0xFF 0x00, refuses
    * markers mid-symbol, resyncs at restart markers. */
  private final class JpegBitReader(data: Array[Byte], var pos: Int) {
    private var buf = 0
    private var cnt = 0
    def nextBit(): Int = {
      if (cnt == 0) {
        require(pos < data.length, "[GRAFT] jpeg: truncated entropy data")
        var b = data(pos) & 0xff; pos += 1
        if (b == 0xff) {
          require(pos < data.length, "[GRAFT] jpeg: truncated after 0xFF")
          val m = data(pos) & 0xff
          require(m == 0x00,
            f"[GRAFT] jpeg: marker 0xFF$m%02X inside entropy data")
          pos += 1
        }
        buf = b; cnt = 8
      }
      cnt -= 1
      (buf >> cnt) & 1
    }
    def receive(s: Int): Int = {
      var v = 0
      var i = 0
      while (i < s) { v = (v << 1) | nextBit(); i += 1 }
      v
    }
    def decodeHuff(t: JpegHuffTable): Int = {
      var code = nextBit()
      var l = 1
      while (code > t.maxCode(l)) {
        require(l < 16, "[GRAFT] jpeg: invalid Huffman code")
        code = (code << 1) | nextBit()
        l += 1
      }
      t.vals(t.valPtr(l) + code - t.minCode(l))
    }
    /** Byte-align and consume the expected RSTn marker. */
    def resync(expect: Int): Unit = {
      cnt = 0
      require(pos + 1 < data.length, "[GRAFT] jpeg: truncated at restart")
      require((data(pos) & 0xff) == 0xff &&
        (data(pos + 1) & 0xff) == 0xd0 + expect,
        "[GRAFT] jpeg: missing restart marker")
      pos += 2
    }
  }

  private def extendSign(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  /** JPEG decoder — baseline (SOF0/SOF1) AND progressive (SOF2):
    * marker walk (APPn/COM skipped), DQT (8/16-bit), DHT (tables may
    * be redefined between scans), DRI/RSTn, 1- or 3-component frames
    * with sampling factors 1–2. Baseline decodes its single
    * interleaved scan streaming (Huffman + DC prediction + AC
    * run-length → dequantize → IDCT per MCU); progressive
    * accumulates RAW coefficients across the scan sequence —
    * interleaved or subset DC scans with successive approximation,
    * single-component AC band scans with EOB runs and the T.81
    * G.1.2.3 correction-bit refinement — then dequantizes + IDCTs
    * once at EOI. A single-component SCAN is non-interleaved per
    * T.81 A.2.2: one 8×8 block per MCU in raster order over the
    * component's own block grid, its declared sampling factors
    * notwithstanding. IDCT is separable double math with the pinned
    * floor(x+0.5) rounding; chroma upsampling is REPLICATION
    * (box/nearest — oracle-reproducible); YCbCr→RGB is the pinned
    * JFIF integer chain. Arithmetic coding, 12-bit precision,
    * hierarchical and lossless modes are rejected loudly. Returns
    * channelOrder "RGB" (3 components) or "GRAY" (1 component). */
  def decodeJpeg(bytes: Array[Byte]): Raster = {
    require(bytes.length >= 4 && (bytes(0) & 0xff) == 0xff &&
      (bytes(1) & 0xff) == 0xd8, "[GRAFT] jpeg: missing SOI marker")
    var pos = 2
    def u8(): Int = {
      require(pos < bytes.length, "[GRAFT] jpeg: truncated header")
      val v = bytes(pos) & 0xff; pos += 1; v
    }
    def u16(): Int = { val h = u8(); (h << 8) | u8() }
    val qtabs = new Array[Array[Int]](4)
    val dcTabs = new Array[JpegHuffTable](4)
    val acTabs = new Array[JpegHuffTable](4)
    var width = 0; var height = 0
    var progressive = false
    // per component: id, h, v, qtab id
    var comps: Array[(Int, Int, Int, Int)] = null
    var restartInterval = 0
    var scanSeen = false
    var ended = false
    // frame-derived state, allocated at the FIRST scan
    var hMax = 0; var vMax = 0; var mcusX = 0; var mcusY = 0
    var planeW: Array[Int] = null  // padded plane width per component
    var planeH: Array[Int] = null
    var planes: Array[Array[Int]] = null // spatial samples (filled at
    // scan time for baseline, from the coefficient store at EOI for
    // progressive)
    var coefs: Array[Array[Int]] = null  // progressive: raw (un-
    // dequantized) coefficients, natural order, per padded block
    var blocksW: Array[Int] = null // padded block grid (mcusX·h)
    var compBw: Array[Int] = null  // NON-padded grid: ceil(cw/8)
    var compBh: Array[Int] = null

    def allocFrameState(): Unit = if (planes == null) {
      // T.81 A.2.2: a SINGLE-component frame's factors only relate
      // components to each other — normalize to 1×1 so its scan
      // decodes in raster order, not MCU-local 2×2 order
      if (comps.length == 1)
        comps = Array((comps(0)._1, 1, 1, comps(0)._4))
      hMax = comps.map(_._2).max
      vMax = comps.map(_._3).max
      mcusX = (width + 8 * hMax - 1) / (8 * hMax)
      mcusY = (height + 8 * vMax - 1) / (8 * vMax)
      // long arithmetic: the 2^26-pixel cap bounds the result, but
      // the intermediate product must not wrap before the check
      planes = comps.map { case (_, h, v, _) =>
        val n = mcusX.toLong * h * 8 * mcusY * v * 8
        require(n <= Int.MaxValue, "[GRAFT] jpeg: plane too large")
        new Array[Int](n.toInt)
      }
      planeW = comps.map { case (_, h, _, _) => mcusX * h * 8 }
      planeH = comps.map { case (_, _, v, _) => mcusY * v * 8 }
      blocksW = comps.map { case (_, h, _, _) => mcusX * h }
      compBw = comps.map { case (_, h, _, _) =>
        ((width.toLong * h + hMax - 1) / hMax + 7).toInt / 8 }
      compBh = comps.map { case (_, _, v, _) =>
        ((height.toLong * v + vMax - 1) / vMax + 7).toInt / 8 }
      if (progressive)
        coefs = comps.indices.map(i =>
          new Array[Int](blocksW(i) * (planeH(i) / 8) * 64)).toArray
    }

    /** One BASELINE interleaved scan: stream blocks straight into the
      * spatial planes. */
    def decodeBaselineScan(scanDc: Array[Int], scanAc: Array[Int]): Int = {
      comps.indices.foreach { i =>
        require(qtabs(comps(i)._4) != null,
          s"[GRAFT] jpeg: missing DQT ${comps(i)._4}")
        require(dcTabs(scanDc(i)) != null && acTabs(scanAc(i)) != null,
          "[GRAFT] jpeg: missing DHT")
      }
      val r = new JpegBitReader(bytes, pos)
      val preds = new Array[Int](comps.length)
      val coef = new Array[Int](64)
      val dcMemo = new IdctDcMemo
      var mcusDone = 0
      var rstIdx = 0
      var my = 0
      while (my < mcusY) {
        var mx = 0
        while (mx < mcusX) {
          if (restartInterval > 0 && mcusDone == restartInterval) {
            r.resync(rstIdx)
            rstIdx = (rstIdx + 1) & 7
            java.util.Arrays.fill(preds, 0)
            mcusDone = 0
          }
          var ci = 0
          while (ci < comps.length) {
            val (_, h, v, tq) = comps(ci)
            val qt = qtabs(tq)
            val dcT = dcTabs(scanDc(ci)); val acT = acTabs(scanAc(ci))
            var by = 0
            while (by < v) {
              var bx = 0
              while (bx < h) {
                java.util.Arrays.fill(coef, 0)
                val s = r.decodeHuff(dcT)
                require(s <= 11, "[GRAFT] jpeg: bad DC size category")
                preds(ci) += extendSign(r.receive(s), s)
                coef(0) = preds(ci) * qt(0)
                var k = 1
                var eob = false
                var acAny = false
                while (k < 64 && !eob) {
                  val rs = r.decodeHuff(acT)
                  val run = rs >> 4; val sz = rs & 0x0f
                  if (sz == 0) {
                    if (run == 15) k += 16 else eob = true
                  } else {
                    k += run
                    require(k < 64, "[GRAFT] jpeg: AC index overrun")
                    coef(ZigZag(k)) =
                      extendSign(r.receive(sz), sz) * qt(ZigZag(k))
                    acAny = true
                    k += 1
                  }
                }
                val px = if (acAny) idct(coef) else dcMemo(coef)
                val pw = planeW(ci)
                val ox = (mx * h + bx) * 8
                val oy = (my * v + by) * 8
                var yy = 0
                while (yy < 8) {
                  System.arraycopy(px, yy * 8, planes(ci),
                    (oy + yy) * pw + ox, 8)
                  yy += 1
                }
                bx += 1
              }
              by += 1
            }
            ci += 1
          }
          mcusDone += 1
          mx += 1
        }
        my += 1
      }
      r.pos
    }

    /** One PROGRESSIVE scan into the coefficient store. */
    def decodeProgressiveScan(scanComp: Array[Int], scanDc: Array[Int],
        scanAc: Array[Int], ss: Int, se: Int, ah: Int, al: Int): Int = {
      val r = new JpegBitReader(bytes, pos)
      var eobrun = 0
      val preds = new Array[Int](scanComp.length)
      var mcusDone = 0
      var rstIdx = 0
      def maybeRestart(): Unit =
        if (restartInterval > 0 && mcusDone == restartInterval) {
          r.resync(rstIdx)
          rstIdx = (rstIdx + 1) & 7
          java.util.Arrays.fill(preds, 0)
          eobrun = 0
          mcusDone = 0
        }
      def dcBlock(si: Int, base: Int): Unit = {
        val c = coefs(scanComp(si))
        if (ah == 0) {
          val s = r.decodeHuff(dcTabs(scanDc(si)))
          require(s <= 11, "[GRAFT] jpeg: bad DC size category")
          preds(si) += extendSign(r.receive(s), s)
          c(base) = preds(si) << al
        } else {
          // successive approximation: append one magnitude bit (OR on
          // the two's-complement representation, the T.81 convention)
          if (r.nextBit() == 1) c(base) |= (1 << al)
        }
      }
      def acFirstBlock(c: Array[Int], base: Int, acT: JpegHuffTable): Unit = {
        if (eobrun > 0) { eobrun -= 1; return }
        var k = ss
        var done = false
        while (k <= se && !done) {
          val rs = r.decodeHuff(acT)
          val run = rs >> 4; val sz = rs & 0x0f
          if (sz == 0) {
            if (run == 15) k += 16
            else {
              eobrun = (1 << run) - 1
              if (run > 0) eobrun += r.receive(run)
              done = true
            }
          } else {
            k += run
            require(k <= se, "[GRAFT] jpeg: AC band overrun")
            c(base + ZigZag(k)) = extendSign(r.receive(sz), sz) << al
            k += 1
          }
        }
      }
      // T.81 G.1.2.3: the correction-bit pass — every NONZERO
      // coefficient crossed in the band reads one refinement bit;
      // `run` counts zero-HISTORY positions before a new ±1·2^al lands
      def acRefineBlock(c: Array[Int], base: Int, acT: JpegHuffTable): Unit = {
        val p1 = 1 << al
        val m1 = -(1 << al)
        def correct(idx: Int): Unit =
          if (r.nextBit() == 1 && (c(idx) & p1) == 0)
            c(idx) += (if (c(idx) >= 0) p1 else m1)
        var k = ss
        if (eobrun == 0) {
          var done = false
          while (k <= se && !done) {
            val rs = r.decodeHuff(acT)
            var run = rs >> 4; val sz = rs & 0x0f
            var newVal = 0
            if (sz == 0) {
              if (run != 15) { // EOB run begins (ZRL keeps run = 15)
                eobrun = 1 << run
                if (run > 0) eobrun += r.receive(run)
                done = true
              }
            } else {
              require(sz == 1,
                "[GRAFT] jpeg: refinement size category must be 1")
              newVal = if (r.nextBit() == 1) p1 else m1
            }
            if (!done) {
              var placed = false
              while (k <= se && !placed) {
                val idx = base + ZigZag(k)
                if (c(idx) != 0) correct(idx)
                else if (run == 0) {
                  if (newVal != 0) c(idx) = newVal
                  placed = true
                } else run -= 1
                k += 1
              }
              // a NEW coefficient (sz == 1) must have found its
              // zero-history slot inside the band; ZRL (sz == 0) may
              // legitimately run out at the band end
              require(placed || sz == 0,
                "[GRAFT] jpeg: refinement run overruns the band")
            }
          }
        }
        if (eobrun > 0) {
          while (k <= se) {
            val idx = base + ZigZag(k)
            if (c(idx) != 0) correct(idx)
            k += 1
          }
          eobrun -= 1
        }
      }
      if (ss == 0 && scanComp.length > 1) {
        // interleaved DC scan over the frame MCU grid; check the
        // tables UP FRONT (every other scan shape does) — a stream
        // naming an undefined DHT must fail loudly, not NPE
        if (ah == 0) scanDc.foreach(id =>
          require(dcTabs(id) != null, "[GRAFT] jpeg: missing DHT"))
        var my = 0
        while (my < mcusY) {
          var mx = 0
          while (mx < mcusX) {
            maybeRestart()
            var si = 0
            while (si < scanComp.length) {
              val ci = scanComp(si)
              val (_, h, v, _) = comps(ci)
              var by = 0
              while (by < v) {
                var bx = 0
                while (bx < h) {
                  dcBlock(si,
                    ((my * v + by) * blocksW(ci) + mx * h + bx) * 64)
                  bx += 1
                }
                by += 1
              }
              si += 1
            }
            mcusDone += 1
            mx += 1
          }
          my += 1
        }
      } else {
        // non-interleaved: one block per MCU in raster order over the
        // single component's OWN block grid
        require(scanComp.length == 1,
          "[GRAFT] jpeg: progressive AC scans are single-component")
        val ci = scanComp(0)
        val c = coefs(ci)
        val acT = if (ss > 0) {
          require(acTabs(scanAc(0)) != null, "[GRAFT] jpeg: missing DHT")
          acTabs(scanAc(0))
        } else null
        if (ss == 0 && ah == 0)
          require(dcTabs(scanDc(0)) != null, "[GRAFT] jpeg: missing DHT")
        var by = 0
        while (by < compBh(ci)) {
          var bx = 0
          while (bx < compBw(ci)) {
            maybeRestart()
            val base = (by * blocksW(ci) + bx) * 64
            if (ss == 0) dcBlock(0, base)
            else if (ah == 0) acFirstBlock(c, base, acT)
            else acRefineBlock(c, base, acT)
            mcusDone += 1
            bx += 1
          }
          by += 1
        }
      }
      r.pos
    }

    while (!ended) {
      var m = u8()
      require(m == 0xff,
        f"[GRAFT] jpeg: expected marker at ${pos - 1}, got 0x$m%02X")
      m = u8()
      while (m == 0xff) m = u8() // fill bytes
      m match {
        case 0xdb => // DQT: one or more tables
          // NB: u16() mutates pos — bind the body length FIRST (a
          // `pos + u16()` would snapshot pos before the side effect)
          val dqtBody = u16() - 2
          val end = pos + dqtBody
          while (pos < end) {
            val pq = u8()
            val prec = pq >> 4; val id = pq & 0x0f
            require(prec <= 1 && id < 4, "[GRAFT] jpeg: bad DQT header")
            val t = new Array[Int](64)
            var k = 0
            while (k < 64) {
              t(ZigZag(k)) = if (prec == 0) u8() else u16()
              require(t(ZigZag(k)) > 0, "[GRAFT] jpeg: zero quantizer")
              k += 1
            }
            qtabs(id) = t
          }
          require(pos == end, "[GRAFT] jpeg: DQT length mismatch")
        case 0xc4 => // DHT: one or more tables (redefinable mid-stream)
          val dhtBody = u16() - 2
          val end = pos + dhtBody
          while (pos < end) {
            val tc = u8()
            val cls = tc >> 4; val id = tc & 0x0f
            require(cls <= 1 && id < 4, "[GRAFT] jpeg: bad DHT header")
            val bits = Array.fill(16)(u8())
            val total = bits.sum
            require(total <= 256, "[GRAFT] jpeg: oversized DHT")
            val vals = Array.fill(total)(u8())
            val t = new JpegHuffTable(bits, vals)
            if (cls == 0) dcTabs(id) = t else acTabs(id) = t
          }
          require(pos == end, "[GRAFT] jpeg: DHT length mismatch")
        case 0xc0 | 0xc1 | 0xc2 => // SOF0 baseline / SOF1 extended
          // sequential (same entropy coding at 8 bits) / SOF2
          // progressive
          require(comps == null, "[GRAFT] jpeg: multiple SOF markers")
          progressive = m == 0xc2
          u16()
          require(u8() == 8, "[GRAFT] jpeg: only 8-bit precision")
          height = u16(); width = u16()
          // the per-axis u16 bound alone admits ~2^32-pixel headers: a
          // 300-byte crafted file would force multi-GB plane
          // allocations (and the size arithmetic would wrap Int) long
          // before any entropy data is validated — cap total pixels
          require(width > 0 && height > 0 &&
            width.toLong * height <= (1L << 26),
            "[GRAFT] jpeg: bad dimensions (max 2^26 pixels)")
          val nc = u8()
          require(nc == 1 || nc == 3,
            s"[GRAFT] jpeg: unsupported component count $nc")
          comps = Array.fill(nc) {
            val id = u8(); val hv = u8(); val tq = u8()
            val h = hv >> 4; val v = hv & 0x0f
            require(h >= 1 && h <= 2 && v >= 1 && v <= 2,
              "[GRAFT] jpeg: sampling factors beyond 2 unsupported")
            (id, h, v, tq)
          }
        case 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb | 0xcd |
            0xce | 0xcf => throw new IllegalArgumentException(
          f"[GRAFT] jpeg: unsupported SOF marker 0xFF$m%02X — baseline " +
            "and progressive Huffman only")
        case 0xdd => // DRI
          require(u16() == 4, "[GRAFT] jpeg: bad DRI length")
          restartInterval = u16()
        case 0xda => // SOS
          require(comps != null, "[GRAFT] jpeg: SOS before SOF")
          allocFrameState()
          u16()
          val ns = u8()
          require(ns >= 1 && ns <= comps.length,
            "[GRAFT] jpeg: bad scan component count")
          val scanComp = new Array[Int](ns)
          val scanDc = new Array[Int](ns)
          val scanAc = new Array[Int](ns)
          var i = 0
          while (i < ns) {
            val cs = u8()
            val j = comps.indexWhere(_._1 == cs)
            require(j >= 0, s"[GRAFT] jpeg: unknown scan component $cs")
            require(!scanComp.take(i).contains(j),
              "[GRAFT] jpeg: duplicate scan component")
            scanComp(i) = j
            val td = u8()
            scanDc(i) = td >> 4; scanAc(i) = td & 0x0f
            i += 1
          }
          val ss = u8(); val se = u8()
          val aa = u8(); val ah = aa >> 4; val al = aa & 0x0f
          if (!progressive) {
            require(ns == comps.length &&
              (0 until ns).forall(i => scanComp(i) == i),
              "[GRAFT] jpeg: baseline scan must cover all components " +
                "in SOF order")
            require(ss == 0 && se == 63 && ah == 0 && al == 0,
              "[GRAFT] jpeg: non-baseline spectral selection")
            pos = decodeBaselineScan(scanDc, scanAc)
          } else {
            require(al <= 13 && (ah == 0 || ah == al + 1),
              "[GRAFT] jpeg: bad successive-approximation parameters")
            if (ss == 0)
              require(se == 0, "[GRAFT] jpeg: progressive DC scan " +
                "must have Se = 0")
            else
              require(ns == 1 && se >= ss && se <= 63,
                "[GRAFT] jpeg: bad progressive AC band")
            pos = decodeProgressiveScan(scanComp, scanDc, scanAc,
              ss, se, ah, al)
          }
          scanSeen = true
        case 0xd9 =>
          require(scanSeen, "[GRAFT] jpeg: EOI before any scan")
          ended = true
        case _ if m >= 0xe0 && m <= 0xef => // APPn
          val skip = u16() - 2
          pos += skip
        case 0xfe => // COM
          val skip = u16() - 2
          pos += skip
        case other => throw new IllegalArgumentException(
          f"[GRAFT] jpeg: unsupported marker 0xFF$other%02X")
      }
    }
    if (progressive) {
      // all scans accumulated: dequantize + IDCT every padded block
      var ci = 0
      while (ci < comps.length) {
        val qt = qtabs(comps(ci)._4)
        require(qt != null, s"[GRAFT] jpeg: missing DQT ${comps(ci)._4}")
        val c = coefs(ci)
        val bw = blocksW(ci)
        val bh = planeH(ci) / 8
        val pw = planeW(ci)
        val d = new Array[Int](64)
        val dcMemo = new IdctDcMemo
        var b = 0
        while (b < bw * bh) {
          var k = 0
          var acAny = false
          d(0) = c(b * 64) * qt(0)
          k = 1
          while (k < 64) {
            val v = c(b * 64 + k) * qt(k)
            d(k) = v
            if (v != 0) acAny = true
            k += 1
          }
          val px = if (acAny) idct(d) else dcMemo(d)
          val ox = (b % bw) * 8
          val oy = (b / bw) * 8
          var yy = 0
          while (yy < 8) {
            System.arraycopy(px, yy * 8, planes(ci),
              (oy + yy) * pw + ox, 8)
            yy += 1
          }
          b += 1
        }
        ci += 1
      }
    }
    if (comps.length == 1) {
      val out = new Array[Byte](width * height)
      val pw = planeW(0)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          out(y * width + x) = planes(0)(y * pw + x).toByte
          x += 1
        }
        y += 1
      }
      Raster(width, height, "GRAY", out)
    } else {
      val out = new Array[Byte](width * height * 3)
      val (_, h0, v0, _) = comps(0)
      val (_, h1, v1, _) = comps(1)
      val (_, h2, v2, _) = comps(2)
      // last-pixel memo (see the encoder's twin): the inverse
      // conversion is a pure function of (yy, cb, cr), so an equal
      // triple reuses the previous pixel's bytes — bit-exact, and
      // flat regions skip the three pinned double chains
      var my = -1; var mcb = -1; var mcr = -1
      var or0: Byte = 0; var og0: Byte = 0; var ob0: Byte = 0
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val yy = planes(0)((y * v0 / vMax) * planeW(0) + x * h0 / hMax)
          val cb = planes(1)((y * v1 / vMax) * planeW(1) + x * h1 / hMax)
          val cr = planes(2)((y * v2 / vMax) * planeW(2) + x * h2 / hMax)
          // scalar helpers, not the tuple form — no per-pixel boxing
          val o = (y * width + x) * 3
          if (yy != my || cb != mcb || cr != mcr) {
            or0 = rgbR(yy, cr).toByte
            og0 = rgbG(yy, cb, cr).toByte
            ob0 = rgbB(yy, cb).toByte
            my = yy; mcb = cb; mcr = cr
          }
          out(o) = or0
          out(o + 1) = og0
          out(o + 2) = ob0
          x += 1
        }
        y += 1
      }
      Raster(width, height, "RGB", out)
    }
  }

  // ---------------------------------------------------------------
  // GIF (87a/89a: LZW, global/local color tables, 4-pass interlace,
  // transparency, multi-frame animation with disposal 0/1/2)
  // ---------------------------------------------------------------

  /** GIF-variant LZW decode: variable code width starting at
    * minCode+1, LSB-first bit packing, clear/EOI codes, dictionary
    * frozen at 4096 until the next clear (the "deferred clear"
    * convention real encoders rely on). Decodes EXACTLY `expected`
    * indices — a stream that runs dry or a code whose expansion
    * crosses the pixel count throws (a wrong pixel count upstream
    * must not silently truncate or spill). */
  private[graft] def lzwDecode(data: Array[Byte], minCode: Int,
      expected: Int): Array[Byte] = {
    require(minCode >= 2 && minCode <= 8,
      s"[GRAFT] gif: bad LZW min code size $minCode")
    require(expected > 0, "[GRAFT] gif: empty LZW target")
    val clear = 1 << minCode
    val eoi = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val stack = new Array[Byte](4097)
    var avail = clear + 2
    var codeSize = minCode + 1
    var oldCode = -1
    var firstByte = 0
    val out = new Array[Byte](expected)
    var outPos = 0
    var acc = 0; var accBits = 0; var pos = 0
    while (outPos < expected) {
      while (accBits < codeSize && pos < data.length) {
        acc |= (data(pos) & 0xff) << accBits
        accBits += 8; pos += 1
      }
      require(accBits >= codeSize, "[GRAFT] gif: LZW stream truncated")
      val code = acc & ((1 << codeSize) - 1)
      acc >>>= codeSize; accBits -= codeSize
      if (code == clear) {
        codeSize = minCode + 1; avail = clear + 2; oldCode = -1
      } else if (code == eoi) {
        // EOI before the raster is full: the outer require catches it
        require(outPos == expected,
          s"[GRAFT] gif: LZW EOI after $outPos of $expected pixels")
      } else {
        require(code < avail || (code == avail && oldCode != -1),
          s"[GRAFT] gif: LZW code $code out of range (avail $avail)")
        var sp = 0
        var cur = code
        if (code == avail) { // the KwKwK case: old string + its first char
          stack(sp) = firstByte.toByte; sp += 1
          cur = oldCode
        }
        while (cur >= clear + 2) {
          stack(sp) = suffix(cur); sp += 1
          cur = prefix(cur)
        }
        require(cur < clear, "[GRAFT] gif: corrupt LZW chain")
        firstByte = cur
        stack(sp) = cur.toByte; sp += 1
        while (sp > 0) {
          sp -= 1
          require(outPos < expected,
            "[GRAFT] gif: LZW output overruns the raster")
          out(outPos) = stack(sp); outPos += 1
        }
        if (oldCode != -1 && avail < 4096) {
          prefix(avail) = oldCode
          suffix(avail) = firstByte.toByte
          avail += 1
          if (avail == (1 << codeSize) && codeSize < 12) codeSize += 1
        }
        oldCode = code
      }
    }
    out
  }

  /** GIF-variant LZW encode, the exact dual of [[lzwDecode]]'s width
    * schedule: the encoder is one emitted code AHEAD of the decoder's
    * dictionary (it adds entry k at emit k, the decoder at read k+1),
    * so it bumps the width when `next` EXCEEDS 1<<width where the
    * decoder bumps at equality — the classic off-by-one that breaks
    * interop when gotten wrong. A full dictionary emits clear and
    * resets (deterministic; real encoders may defer). */
  private[graft] def lzwEncode(indices: Array[Byte], minCode: Int): Array[Byte] = {
    require(minCode >= 2 && minCode <= 8,
      s"[GRAFT] gif: bad LZW min code size $minCode")
    require(indices.nonEmpty, "[GRAFT] gif: nothing to encode")
    val clear = 1 << minCode
    val eoi = clear + 1
    val out = new java.io.ByteArrayOutputStream()
    var acc = 0L; var accBits = 0; var codeSize = minCode + 1
    def emit(code: Int): Unit = {
      acc |= code.toLong << accBits
      accBits += codeSize
      while (accBits >= 8) {
        out.write((acc & 0xff).toInt); acc >>>= 8; accBits -= 8
      }
    }
    val dict = new java.util.HashMap[Integer, Integer](8192)
    var next = clear + 2
    emit(clear)
    var cur = indices(0) & 0xff
    require(cur < clear, s"[GRAFT] gif: index $cur exceeds code space")
    var i = 1
    while (i < indices.length) {
      val k = indices(i) & 0xff
      require(k < clear, s"[GRAFT] gif: index $k exceeds code space")
      val key = Integer.valueOf((cur << 8) | k)
      val hit = dict.get(key)
      if (hit != null) cur = hit.intValue()
      else {
        emit(cur)
        if (next < 4096) {
          dict.put(key, Integer.valueOf(next)); next += 1
          if (next > (1 << codeSize) && codeSize < 12) codeSize += 1
        } else {
          emit(clear)
          dict.clear(); next = clear + 2; codeSize = minCode + 1
        }
        cur = k
      }
      i += 1
    }
    emit(cur)
    emit(eoi)
    if (accBits > 0) out.write((acc & 0xff).toInt)
    out.toByteArray
  }

  /** GIF interlace row schedule (spec appendix E): pass 1 rows
    * 0,8,16…, pass 2 rows 4,12…, pass 3 rows 2,6,10…, pass 4 odd
    * rows. `rowOrder(h)(r)` = the CANVAS row holding the r-th row of
    * the stored (pass-ordered) raster. */
  private def gifRowOrder(h: Int): Array[Int] = {
    val order = new Array[Int](h)
    var r = 0
    var pass = 0
    val starts = Array(0, 4, 2, 1)
    val steps = Array(8, 8, 4, 2)
    while (pass < 4) {
      var y = starts(pass)
      while (y < h) {
        order(r) = y; r += 1; y += steps(pass)
      }
      pass += 1
    }
    order
  }

  /** Pad a 1..256-triple RGB palette to the next power-of-two entry
    * count (GIF color tables are always 2^(k+1) entries) and return
    * (paddedTable, entries, lzwMinCodeSize). */
  private def gifTable(palette: Array[Byte]): (Array[Byte], Int, Int) = {
    require(palette != null && palette.length >= 3 &&
      palette.length <= 768 && palette.length % 3 == 0,
      "[GRAFT] gif: palette must be 1..256 RGB triples")
    val entries = palette.length / 3
    var padded = 2
    while (padded < entries) padded <<= 1
    val table = java.util.Arrays.copyOf(palette, padded * 3)
    val bits = Integer.numberOfTrailingZeros(padded) // 1..8
    (table, entries, math.max(2, bits))
  }

  private def gifU16(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >> 8) & 0xff)
  }

  /** Header + logical screen descriptor + global color table. The
    * dimension fields are 16-BIT: oversized values would truncate
    * mod 65536 through [[gifU16]] into a structurally corrupt file,
    * so reject them here (the JPEG encoders' SOF-field stance). */
  private def gifScreen(out: java.io.ByteArrayOutputStream, width: Int,
      height: Int, table: Array[Byte]): Unit = {
    require(width > 0 && width <= 0xffff && height > 0 && height <= 0xffff,
      s"[GRAFT] gif: dimensions ${width}x$height exceed the 16-bit " +
        "logical-screen fields (max 65535)")
    out.write("GIF89a".getBytes(StandardCharsets.US_ASCII))
    gifU16(out, width); gifU16(out, height)
    val sizeField = Integer.numberOfTrailingZeros(table.length / 3) - 1
    out.write(0x80 | (7 << 4) | sizeField) // GCT present, 8-bit color res
    out.write(0)                           // background color index
    out.write(0)                           // no aspect ratio
    out.write(table, 0, table.length)
  }

  /** One image block: descriptor + LZW data in ≤255-byte sub-blocks.
    * Interlaced frames store rows in pass order — the encoder
    * permutes, the decoder un-permutes, and a resize afterwards
    * pins the row placement end-to-end. */
  private def gifImage(out: java.io.ByteArrayOutputStream,
      indices: Array[Byte], width: Int, height: Int, entries: Int,
      minCode: Int, interlaced: Boolean): Unit = {
    require(width > 0 && width <= 0xffff && height > 0 &&
      height <= 0xffff,
      s"[GRAFT] gif: frame ${width}x$height exceeds the 16-bit " +
        "image-descriptor fields (max 65535)")
    require(indices.length == width * height,
      "[GRAFT] gif: indices must be width*height bytes")
    var i = 0
    while (i < indices.length) {
      require((indices(i) & 0xff) < entries,
        s"[GRAFT] gif: index ${indices(i) & 0xff} out of range " +
          s"(palette has $entries entries)")
      i += 1
    }
    out.write(0x2c)
    gifU16(out, 0); gifU16(out, 0)
    gifU16(out, width); gifU16(out, height)
    out.write(if (interlaced) 0x40 else 0x00) // no LCT
    val stored =
      if (!interlaced) indices
      else {
        val order = gifRowOrder(height)
        val s = new Array[Byte](indices.length)
        var r = 0
        while (r < height) {
          System.arraycopy(indices, order(r) * width, s, r * width, width)
          r += 1
        }
        s
      }
    out.write(minCode)
    val lzw = lzwEncode(stored, minCode)
    var off = 0
    while (off < lzw.length) {
      val n = math.min(255, lzw.length - off)
      out.write(n)
      out.write(lzw, off, n)
      off += n
    }
    out.write(0) // block terminator
  }

  /** Single-frame GIF89a: `indices` are palette indices on a
    * width×height raster, `palette` 1..256 RGB triples (padded to
    * the GIF power-of-two table size). `interlaced` stores rows in
    * the 4-pass order. The output is a bona fide file (desktop
    * viewers and ImageIO open it). */
  def encodeGif(indices: Array[Byte], width: Int, height: Int,
      palette: Array[Byte], interlaced: Boolean = false): Array[Byte] = {
    val (table, entries, minCode) = gifTable(palette)
    val out = new java.io.ByteArrayOutputStream(indices.length / 2 + 64)
    gifScreen(out, width, height, table)
    gifImage(out, indices, width, height, entries, minCode, interlaced)
    out.write(0x3b)
    out.toByteArray
  }

  /** Animated GIF89a: every frame a full-canvas index raster against
    * one global palette, NETSCAPE2.0 infinite loop, per-frame GCE
    * with disposal 1 (do not dispose) and `delayCs` centiseconds. */
  def encodeGifAnimated(frames: Seq[Array[Byte]], width: Int, height: Int,
      palette: Array[Byte], delayCs: Int = 4): Array[Byte] = {
    require(frames.nonEmpty, "[GRAFT] gif: no frames")
    require(delayCs >= 0 && delayCs <= 0xffff, "[GRAFT] gif: bad delay")
    val (table, entries, minCode) = gifTable(palette)
    val out = new java.io.ByteArrayOutputStream()
    gifScreen(out, width, height, table)
    // NETSCAPE2.0 application extension: loop forever
    out.write(0x21); out.write(0xff); out.write(11)
    out.write("NETSCAPE2.0".getBytes(StandardCharsets.US_ASCII))
    out.write(3); out.write(1); gifU16(out, 0); out.write(0)
    frames.foreach { f =>
      out.write(0x21); out.write(0xf9); out.write(4)
      out.write(0x04) // disposal 1 (do not dispose), no transparency
      gifU16(out, delayCs)
      out.write(0)    // transparent index (unused)
      out.write(0)    // terminator
      gifImage(out, f, width, height, entries, minCode, interlaced = false)
    }
    out.write(0x3b)
    out.toByteArray
  }

  /** Decode every frame of a GIF87a/89a into full-canvas RGB rasters
    * — the composited view an animation player shows, which is what
    * frame sampling and near-dup fingerprinting need. Handles
    * global/local color tables, the 4-pass interlace, GCE
    * transparency (transparent pixels leave the canvas unchanged)
    * and disposal 0/1 (keep) and 2 (restore region to the background
    * color); disposal 3 (restore-to-previous) is rejected loudly.
    * The canvas starts at the background-color RGB (white when the
    * background index has no table entry). Structural damage —
    * truncated sub-blocks, out-of-range LZW codes or palette
    * indices, frames exceeding the logical screen — throws.
    *
    * `maxTotalPixels` caps the ANIMATION (frames × canvas pixels):
    * every frame clones the full canvas, so a crafted file with many
    * frames multiplies memory inside a per-partition decode loop.
    * The default 2^26 bounds the decoded output at ~192 MB of RGB —
    * one executor-task-sized worst case for untrusted-crawl
    * ingestion; raise it only for trusted corpora. */
  def decodeGifFrames(bytes: Array[Byte],
      maxTotalPixels: Long = 1L << 26): Seq[Raster] = {
    require(bytes.length >= 13, "[GRAFT] gif: truncated file")
    val sig = new String(bytes, 0, 6, StandardCharsets.US_ASCII)
    require(sig == "GIF87a" || sig == "GIF89a",
      "[GRAFT] gif: missing GIF87a/GIF89a signature")
    var pos = 6
    def u8(): Int = {
      require(pos < bytes.length, "[GRAFT] gif: truncated file")
      val v = bytes(pos) & 0xff; pos += 1; v
    }
    def u16(): Int = { val lo = u8(); lo | (u8() << 8) }
    def colorTable(sizeField: Int): Array[Byte] = {
      val n = (2 << sizeField) * 3
      require(pos + n <= bytes.length, "[GRAFT] gif: color table truncated")
      val t = new Array[Byte](n)
      System.arraycopy(bytes, pos, t, 0, n); pos += n
      t
    }
    val sw = u16(); val sh = u16()
    require(sw > 0 && sh > 0 && sw <= (1 << 20) && sh <= (1 << 20) &&
      sw.toLong * sh <= (1L << 26),
      "[GRAFT] gif: bad logical screen (max 2^26 pixels)")
    val packed = u8()
    val bgIndex = u8()
    u8() // aspect ratio: ignored
    val gct = if ((packed & 0x80) != 0) colorTable(packed & 7) else null
    val canvas = new Array[Byte](sw * sh * 3)
    val (bgR, bgG, bgB) =
      if (gct != null && bgIndex * 3 + 2 < gct.length)
        (gct(bgIndex * 3), gct(bgIndex * 3 + 1), gct(bgIndex * 3 + 2))
      else (255.toByte, 255.toByte, 255.toByte)
    def fillBg(left: Int, top: Int, w: Int, h: Int): Unit = {
      var y = top
      while (y < top + h) {
        var x = left
        while (x < left + w) {
          val o = (y * sw + x) * 3
          canvas(o) = bgR; canvas(o + 1) = bgG; canvas(o + 2) = bgB
          x += 1
        }
        y += 1
      }
    }
    fillBg(0, 0, sw, sh)
    val frames = Seq.newBuilder[Raster]
    var nFrames = 0
    var transparentIdx = -1
    var disposal = 0
    var done = false
    while (!done) {
      u8() match {
        case 0x3b => done = true
        case 0x21 =>
          val label = u8()
          if (label == 0xf9) {
            require(u8() == 4, "[GRAFT] gif: bad GCE block size")
            val p = u8()
            disposal = (p >> 2) & 7
            require(disposal <= 2,
              s"[GRAFT] gif: unsupported disposal method $disposal")
            u16() // delay: ignored
            val t = u8()
            transparentIdx = if ((p & 1) != 0) t else -1
            require(u8() == 0, "[GRAFT] gif: GCE missing terminator")
          } else {
            // comment / application / plain text: skip sub-blocks
            var n = u8()
            while (n != 0) {
              require(pos + n <= bytes.length,
                "[GRAFT] gif: extension data truncated")
              pos += n
              n = u8()
            }
          }
        case 0x2c =>
          val left = u16(); val top = u16()
          val iw = u16(); val ih = u16()
          require(iw > 0 && ih > 0 && left + iw <= sw && top + ih <= sh,
            "[GRAFT] gif: image exceeds the logical screen")
          val ip = u8()
          val interlaced = (ip & 0x40) != 0
          val lct = if ((ip & 0x80) != 0) colorTable(ip & 7) else null
          val table = if (lct != null) lct else gct
          require(table != null, "[GRAFT] gif: image has no color table")
          val entries = table.length / 3
          val minCode = u8()
          val data = new java.io.ByteArrayOutputStream()
          var n = u8()
          while (n != 0) {
            require(pos + n <= bytes.length,
              "[GRAFT] gif: image data truncated")
            data.write(bytes, pos, n); pos += n
            n = u8()
          }
          val indices = lzwDecode(data.toByteArray, minCode, iw * ih)
          val order =
            if (interlaced) gifRowOrder(ih)
            else Array.tabulate(ih)(identity)
          var r = 0
          while (r < ih) {
            val cy = top + order(r)
            var x = 0
            while (x < iw) {
              val idx = indices(r * iw + x) & 0xff
              require(idx < entries,
                s"[GRAFT] gif: pixel index $idx out of range " +
                  s"(table has $entries entries)")
              if (idx != transparentIdx) {
                val o = (cy * sw + left + x) * 3
                canvas(o) = table(3 * idx)
                canvas(o + 1) = table(3 * idx + 1)
                canvas(o + 2) = table(3 * idx + 2)
              }
              x += 1
            }
            r += 1
          }
          nFrames += 1
          require(nFrames.toLong * sw * sh <= maxTotalPixels,
            s"[GRAFT] gif: animation exceeds $maxTotalPixels total " +
              "pixels (frames x canvas)")
          frames += Raster(sw, sh, "RGB", canvas.clone())
          if (disposal == 2) fillBg(left, top, iw, ih)
          // a GCE scopes ONE image (spec 23): reset for the next
          transparentIdx = -1
          disposal = 0
        case other => throw new IllegalArgumentException(
          f"[GRAFT] gif: unknown block introducer 0x$other%02x")
      }
    }
    require(nFrames > 0, "[GRAFT] gif: no image data")
    frames.result()
  }

  /** First (or only) frame of a GIF as a full-canvas RGB raster. */
  def decodeGif(bytes: Array[Byte]): Raster = decodeGifFrames(bytes).head

  // ---------------------------------------------------------------
  // TIFF (baseline 8-bit gray/RGB: II and MM byte orders, IFD walk,
  // multi-strip, compression 1/5/32773 — none, LZW with the
  // early-change width schedule, PackBits — horizontal predictor)
  // ---------------------------------------------------------------

  /** TIFF-variant LZW decode (spec section 13): MSB-first bit
    * packing (the opposite of GIF), 8-bit alphabet with
    * Clear = 256 / EOI = 257, first dynamic entry 258, and the
    * EARLY-CHANGE width schedule — the code width bumps when the
    * next entry to be ADDED is (1<<width)−1, one code earlier than
    * GIF's convention (the classic interop trap between the two
    * formats). Decodes exactly `expected` bytes. */
  private[graft] def tiffLzwDecode(data: Array[Byte],
      expected: Int): Array[Byte] = {
    require(expected >= 0, "[GRAFT] tiff: bad LZW target")
    val Clear = 256; val Eoi = 257
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val stack = new Array[Byte](4097)
    var next = 258; var width = 9
    var old = -1; var firstByte = 0
    val out = new Array[Byte](expected)
    var outPos = 0
    var acc = 0L; var accBits = 0; var pos = 0
    var done = false
    while (!done && outPos < expected) {
      while (accBits < width && pos < data.length) {
        acc = (acc << 8) | (data(pos) & 0xff)
        accBits += 8; pos += 1
      }
      require(accBits >= width, "[GRAFT] tiff: LZW stream truncated")
      val code = ((acc >>> (accBits - width)) & ((1 << width) - 1)).toInt
      accBits -= width
      if (code == Clear) {
        next = 258; width = 9; old = -1
      } else if (code == Eoi) {
        done = true
      } else {
        require(code < next || (code == next && old != -1),
          s"[GRAFT] tiff: LZW code $code out of range (next $next)")
        var sp = 0
        var cur = code
        if (code == next) { // KwKwK
          stack(sp) = firstByte.toByte; sp += 1
          cur = old
        }
        while (cur >= 258) {
          stack(sp) = suffix(cur); sp += 1
          cur = prefix(cur)
        }
        require(cur < 256, "[GRAFT] tiff: corrupt LZW chain")
        firstByte = cur
        stack(sp) = cur.toByte; sp += 1
        while (sp > 0) {
          sp -= 1
          require(outPos < expected,
            "[GRAFT] tiff: LZW output overruns the strip")
          out(outPos) = stack(sp); outPos += 1
        }
        if (old != -1 && next < 4096) {
          prefix(next) = old
          suffix(next) = firstByte.toByte
          next += 1
          // EARLY CHANGE: bump when the NEXT add would be the last
          // code expressible at this width
          if (next == (1 << width) - 1 && width < 12) width += 1
        }
        old = code
      }
    }
    require(outPos == expected,
      s"[GRAFT] tiff: LZW produced $outPos of $expected bytes")
    out
  }

  /** TIFF-variant LZW encode, the exact dual of [[tiffLzwDecode]]:
    * starts with a Clear code and resets the table at 4094 entries
    * (libtiff's margin). The CODE WIDTH is driven by a simulation of
    * the DECODER's counter — the decoder adds one table entry per
    * data code received after the first, and early-changes when its
    * count hits (1<<width)−1; every emitted code must fit the width
    * the decoder will be holding when it reads it, so the encoder
    * replays exactly that bookkeeping after each emit (its own table
    * counter runs one entry ahead and must NOT drive the width). */
  private[graft] def tiffLzwEncode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 16)
    var acc = 0L; var accBits = 0; var width = 9
    var decNext = 258        // the decoder's simulated entry counter
    var firstAfterClear = true
    def emit(code: Int): Unit = {
      acc = (acc << width) | code
      accBits += width
      while (accBits >= 8) {
        out.write(((acc >>> (accBits - 8)) & 0xff).toInt)
        accBits -= 8
      }
    }
    /** Emit a DATA code, then replay the decoder's add+bump. */
    def emitData(code: Int): Unit = {
      emit(code)
      if (!firstAfterClear) {
        decNext += 1
        if (decNext == (1 << width) - 1 && width < 12) width += 1
      }
      firstAfterClear = false
    }
    // child(prefixCode * 4096 + byte) -> code, rebuilt on clear
    var child = new java.util.HashMap[Integer, Integer]()
    var encNext = 258
    emit(256) // leading Clear, per spec
    if (data.nonEmpty) {
      var omega = data(0) & 0xff
      var i = 1
      while (i < data.length) {
        val c = data(i) & 0xff
        val key = Integer.valueOf(omega * 4096 + c)
        val hit = child.get(key)
        if (hit != null) omega = hit.intValue()
        else {
          emitData(omega)
          child.put(key, Integer.valueOf(encNext))
          encNext += 1
          if (encNext == 4094) {
            emit(256) // the decoder resets on receipt: mirror it
            child = new java.util.HashMap[Integer, Integer]()
            encNext = 258; decNext = 258; width = 9
            firstAfterClear = true
          }
          omega = c
        }
        i += 1
      }
      emitData(omega)
    }
    emit(257) // EOI — read at the width the last data code left
    if (accBits > 0) // flush: pad the tail byte with zero bits
      out.write(((acc << (8 - accBits)) & 0xff).toInt)
    out.toByteArray
  }

  /** PackBits (compression 32773) decode to exactly `expected`
    * bytes: n in [0,127] copies n+1 literals, n in [-127,-1] repeats
    * the next byte 1−n times, −128 is a no-op. */
  private[graft] def packBitsDecode(data: Array[Byte],
      expected: Int): Array[Byte] = {
    val out = new Array[Byte](expected)
    var outPos = 0; var pos = 0
    while (outPos < expected) {
      require(pos < data.length, "[GRAFT] tiff: PackBits truncated")
      val n = data(pos); pos += 1
      if (n >= 0) {
        val cnt = n + 1
        require(pos + cnt <= data.length && outPos + cnt <= expected,
          "[GRAFT] tiff: PackBits literal overrun")
        System.arraycopy(data, pos, out, outPos, cnt)
        pos += cnt; outPos += cnt
      } else if (n != -128) {
        val cnt = 1 - n
        require(pos < data.length && outPos + cnt <= expected,
          "[GRAFT] tiff: PackBits run overrun")
        java.util.Arrays.fill(out, outPos, outPos + cnt, data(pos))
        pos += 1; outPos += cnt
      }
    }
    out
  }

  /** PackBits encode: runs of ≥3 repeats become a run packet (a
    * 2-repeat run never beats folding into the neighboring literal —
    * the spec's own recommendation), literals batch up to 128. */
  private[graft] def packBitsEncode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length + 16)
    def runLen(at: Int): Int = {
      var run = 1
      while (at + run < data.length && run < 128 &&
        data(at + run) == data(at)) run += 1
      run
    }
    var i = 0
    while (i < data.length) {
      val run = runLen(i)
      if (run >= 3) {
        out.write(1 - run); out.write(data(i)); i += run
      } else {
        // literal batch: extend past interior sub-3 repeats, stop
        // where a real (≥3) run starts
        var lit = run
        while (i + lit < data.length && lit < 128 &&
          runLen(i + lit) < 3)
          lit += runLen(i + lit) min (128 - lit)
        lit = math.min(lit, 128)
        out.write(lit - 1); out.write(data, i, lit); i += lit
      }
    }
    out.toByteArray
  }

  /** Decode a baseline TIFF: II or MM byte order, first IFD only,
    * 8-bit grayscale (photometric 0 inverted / 1) or RGB
    * (photometric 2), compression 1 (none), 5 (LZW) or 32773
    * (PackBits), horizontal predictor (tag 317 = 2), any strip
    * layout. Planar configuration 2, tiles, palette TIFFs and
    * non-8-bit depths are rejected loudly. */
  def decodeTiff(bytes: Array[Byte]): Raster = {
    require(bytes.length >= 8, "[GRAFT] tiff: truncated file")
    val le = (bytes(0), bytes(1)) match {
      case ('I', 'I') => true
      case ('M', 'M') => false
      case _ => throw new IllegalArgumentException(
        "[GRAFT] tiff: missing II/MM byte-order mark")
    }
    def u16(off: Int): Int = {
      require(off + 2 <= bytes.length, "[GRAFT] tiff: truncated file")
      if (le) (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
      else ((bytes(off) & 0xff) << 8) | (bytes(off + 1) & 0xff)
    }
    def u32(off: Int): Long = {
      require(off + 4 <= bytes.length, "[GRAFT] tiff: truncated file")
      if (le) (u16(off) & 0xffffL) | ((u16(off + 2) & 0xffffL) << 16)
      else ((u16(off) & 0xffffL) << 16) | (u16(off + 2) & 0xffffL)
    }
    require(u16(2) == 42, "[GRAFT] tiff: bad magic (want 42)")
    val ifd = u32(4)
    require(ifd >= 8 && ifd + 2 <= bytes.length,
      "[GRAFT] tiff: IFD offset out of range")
    val nEntries = u16(ifd.toInt)
    // tag -> (type, count, valueOffsetField)
    val entries = scala.collection.mutable.Map[Int, (Int, Long, Int)]()
    var i = 0
    while (i < nEntries) {
      val e = ifd.toInt + 2 + 12 * i
      require(e + 12 <= bytes.length, "[GRAFT] tiff: IFD truncated")
      entries(u16(e)) = (u16(e + 2), u32(e + 4), e + 8)
      i += 1
    }
    def typeSize(t: Int): Int = t match {
      case 1 => 1 // BYTE
      case 3 => 2 // SHORT
      case 4 => 4 // LONG
      case other => throw new IllegalArgumentException(
        s"[GRAFT] tiff: unsupported tag type $other")
    }
    /** All values of a tag as longs (inline when they fit 4 bytes). */
    def values(tag: Int): Option[IndexedSeq[Long]] =
      entries.get(tag).map { case (t, count, vo) =>
        val sz = typeSize(t)
        require(count >= 1 && count <= (1 << 22),
          s"[GRAFT] tiff: absurd count $count for tag $tag")
        val base =
          if (sz * count <= 4) vo.toLong
          else {
            val off = u32(vo)
            require(off + sz * count <= bytes.length,
              s"[GRAFT] tiff: tag $tag values out of range")
            off
          }
        (0L until count).map { j =>
          val o = (base + sz * j).toInt
          t match {
            case 1 => (bytes(o) & 0xff).toLong
            case 3 => u16(o).toLong
            case 4 => u32(o)
          }
        }
      }
    def one(tag: Int, default: => Long): Long =
      values(tag).map(_.head).getOrElse(default)
    def req(tag: Int, what: String): Long =
      values(tag).map(_.head).getOrElse(throw new IllegalArgumentException(
        s"[GRAFT] tiff: missing required tag $what ($tag)"))

    val w = req(256, "ImageWidth")
    val h = req(257, "ImageLength")
    require(w > 0 && h > 0 && w <= (1 << 20) && h <= (1 << 20) &&
      w * h <= (1L << 26), "[GRAFT] tiff: bad dimensions (max 2^26 px)")
    val spp = one(277, 1L).toInt
    val photometric = one(262, 1L).toInt
    val (channels, order) = photometric match {
      case 0 | 1 =>
        require(spp == 1, s"[GRAFT] tiff: gray with $spp samples")
        (1, "GRAY")
      case 2 =>
        require(spp == 3,
          s"[GRAFT] tiff: RGB needs 3 samples/pixel, got $spp")
        (3, "RGB")
      case other => throw new IllegalArgumentException(
        s"[GRAFT] tiff: unsupported photometric $other")
    }
    values(258).foreach(bps => require(bps.forall(_ == 8L),
      s"[GRAFT] tiff: only 8-bit samples supported, got ${bps.mkString(",")}"))
    require(one(284, 1L) == 1L, "[GRAFT] tiff: planar config 2 unsupported")
    val compression = one(259, 1L).toInt
    require(compression == 1 || compression == 5 || compression == 32773,
      s"[GRAFT] tiff: unsupported compression $compression")
    val predictor = one(317, 1L).toInt
    require(predictor == 1 || predictor == 2,
      s"[GRAFT] tiff: unsupported predictor $predictor")
    require(!entries.contains(322),
      "[GRAFT] tiff: tiled layout unsupported (strips only)")
    val offsets = values(273).getOrElse(throw new IllegalArgumentException(
      "[GRAFT] tiff: missing StripOffsets"))
    val counts = values(279).getOrElse(throw new IllegalArgumentException(
      "[GRAFT] tiff: missing StripByteCounts"))
    require(offsets.length == counts.length,
      "[GRAFT] tiff: StripOffsets/StripByteCounts length mismatch")
    val rps = math.min(one(278, h), h)
    require(rps > 0, "[GRAFT] tiff: bad RowsPerStrip")
    val nStrips = ((h + rps - 1) / rps).toInt
    require(offsets.length == nStrips,
      s"[GRAFT] tiff: ${offsets.length} strips, geometry wants $nStrips")
    val rowBytes = (w * channels).toInt
    val pixels = new Array[Byte]((w * h * channels).toInt)
    var strip = 0
    var row = 0
    while (strip < nStrips) {
      val rows = math.min(rps, h - strip * rps).toInt
      val want = rows * rowBytes
      val off = offsets(strip); val cnt = counts(strip)
      require(off >= 0 && cnt >= 0 && off + cnt <= bytes.length,
        s"[GRAFT] tiff: strip $strip out of range")
      val raw = java.util.Arrays.copyOfRange(bytes, off.toInt,
        (off + cnt).toInt)
      val strip8 = compression match {
        case 1 =>
          require(raw.length == want,
            s"[GRAFT] tiff: strip $strip is ${raw.length} bytes, want $want")
          raw
        case 5 => tiffLzwDecode(raw, want)
        case _ => packBitsDecode(raw, want)
      }
      if (predictor == 2) {
        // horizontal differencing: accumulate left-to-right per row,
        // per sample channel
        var r = 0
        while (r < rows) {
          var x = channels
          while (x < rowBytes) {
            strip8(r * rowBytes + x) =
              (strip8(r * rowBytes + x) +
                strip8(r * rowBytes + x - channels)).toByte
            x += 1
          }
          r += 1
        }
      }
      System.arraycopy(strip8, 0, pixels, row * rowBytes, want)
      row += rows
      strip += 1
    }
    if (photometric == 0) { // WhiteIsZero: invert to plain luma
      var j = 0
      while (j < pixels.length) {
        pixels(j) = (255 - (pixels(j) & 0xff)).toByte
        j += 1
      }
    }
    Raster(w.toInt, h.toInt, order, pixels)
  }

  /** Encode a baseline little-endian TIFF: 8-bit grayscale
    * (`channels = 1`, photometric 1) or RGB (`channels = 3`),
    * compression none (1) or PackBits (32773), one strip per
    * `rowsPerStrip` rows. `orientation` != 1 writes tag 274 (SHORT)
    * — TIFF's NATIVE Exif-orientation slot, read back by
    * [[tiffOrientation]]; the stored pixels are then the
    * camera-rotated raster and a viewer/[[orientRgb]] uprights them.
    * The output is a bona fide file — ImageIO and desktop viewers
    * open it. */
  def encodeTiff(pixels: Array[Byte], width: Int, height: Int,
      channels: Int = 3, packBits: Boolean = false,
      rowsPerStrip: Int = 0, orientation: Int = 1): Array[Byte] = {
    require(channels == 1 || channels == 3,
      "[GRAFT] tiff: channels must be 1 or 3")
    require(orientation >= 1 && orientation <= 8,
      "[GRAFT] tiff: orientation must be 1-8")
    require(width > 0 && height > 0 &&
      pixels.length == width.toLong * height * channels,
      "[GRAFT] tiff: pixels must be width*height*channels bytes")
    val rps = if (rowsPerStrip <= 0) height
      else math.min(rowsPerStrip, height)
    val nStrips = (height + rps - 1) / rps
    val rowBytes = width * channels
    val strips = (0 until nStrips).map { s =>
      val rows = math.min(rps, height - s * rps)
      val raw = java.util.Arrays.copyOfRange(pixels,
        s * rps * rowBytes, (s * rps + rows) * rowBytes)
      if (packBits) packBitsEncode(raw) else raw
    }
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def u32(v: Long): Unit = { u16((v & 0xffff).toInt); u16(((v >> 16) & 0xffff).toInt) }
    out.write('I'); out.write('I'); u16(42)
    // layout: header(8) | strips | [bps array] | IFD
    var cursor = 8L
    val stripOffsets = strips.map { s =>
      val o = cursor; cursor += s.length; o
    }
    if (cursor % 2 != 0) cursor += 1 // word-align what follows
    val bpsOffset = cursor
    if (channels == 3) cursor += 6
    val ifdOffset = cursor
    u32(ifdOffset)
    strips.foreach(out.write)
    if ((8L + strips.map(_.length.toLong).sum) % 2 != 0) out.write(0)
    if (channels == 3) { u16(8); u16(8); u16(8) }
    // IFD: tags ascending (9 or 10 — the arrays land right after)
    case class Tag(id: Int, typ: Int, count: Long, value: Long)
    val nTags = if (orientation != 1) 10 else 9
    // strip offsets/counts: inline when a single strip (one LONG fits
    // the 4-byte value field), external arrays after the IFD otherwise
    val needArrays = nStrips > 1
    val arraysOffset = ifdOffset + 2 + 12L * nTags + 4
    val offArr = arraysOffset
    val cntArr = arraysOffset + 4L * nStrips
    val tags = Seq(
      Tag(256, 4, 1, width),
      Tag(257, 4, 1, height),
      Tag(258, 3, channels, if (channels == 1) 8L else bpsOffset),
      Tag(259, 3, 1, if (packBits) 32773L else 1L),
      Tag(262, 3, 1, if (channels == 1) 1L else 2L),
      Tag(273, 4, nStrips,
        if (needArrays) offArr else stripOffsets.head),
      Tag(277, 3, 1, channels),
      Tag(278, 4, 1, rps),
      Tag(279, 4, nStrips,
        if (needArrays) cntArr else strips.head.length)) ++
      (if (orientation != 1) Seq(Tag(274, 3, 1, orientation)) else Nil)
    require(tags.length == nTags, "[GRAFT] tiff: tag count drifted")
    u16(tags.length)
    tags.sortBy(_.id).foreach { t =>
      u16(t.id); u16(t.typ); u32(t.count)
      if (t.typ == 3 && t.count == 1) { u16(t.value.toInt); u16(0) }
      else u32(t.value)
    }
    u32(0) // next IFD
    if (needArrays) {
      stripOffsets.foreach(u32)
      strips.foreach(s => u32(s.length))
    }
    out.toByteArray
  }

  // ---------------------------------------------------------------
  // WebP (RIFF container; VP8L lossless bitstream — canonical prefix
  // codes with the DEFLATE bit convention, LZ77 with the 2-D
  // near-distance map, color cache, and all four transforms:
  // predictor, color, subtract-green, color-indexing incl. pixel
  // bundling). VP8 (lossy) and VP8X (extended) payloads are rejected
  // loudly: lossy VP8 is in principle bit-exact but is a full video
  // intra codec (boolean arithmetic coder, loop filter) — the
  // lossless stream is what the codec-scope stance admits today.
  // No ImageIO referee exists for WebP in a stock JVM, so the spec
  // fixtures pin the bitstream by hand instead (the one codec here
  // without an independent decoder to cross-check against).
  // ---------------------------------------------------------------

  /** LSB-first bit reader over the VP8L payload (the DEFLATE byte
    * convention: bit 0 of byte 0 first). Prefix-code bits are read
    * one at a time MSB-of-code-first via [[bit]]. */
  private final class Vp8lBitReader(bytes: Array[Byte], var pos: Int) {
    private var bitPos = 0
    def bit(): Int = {
      require(pos < bytes.length, "[GRAFT] webp: bitstream truncated")
      val b = (bytes(pos) >> bitPos) & 1
      bitPos += 1
      if (bitPos == 8) { bitPos = 0; pos += 1 }
      b
    }
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v |= bit() << i; i += 1 }
      v
    }
  }

  /** LSB-first bit writer (the encoder's dual; also the spec
    * fixtures' hand-stream builder). `putCode` emits a canonical
    * prefix code MSB-first — the DEFLATE packing. */
  private[graft] final class Vp8lBitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var buf = 0
    private var cnt = 0
    def putBits(v: Int, n: Int): Unit = {
      var i = 0
      while (i < n) {
        buf |= ((v >> i) & 1) << cnt
        cnt += 1
        if (cnt == 8) { out.write(buf); buf = 0; cnt = 0 }
        i += 1
      }
    }
    def putCode(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) { putBits((code >> i) & 1, 1); i -= 1 }
    }
    def toBytes: Array[Byte] = {
      if (cnt > 0) { out.write(buf); buf = 0; cnt = 0 }
      out.toByteArray
    }
  }

  /** Canonical prefix decoder (DEFLATE code assignment: by length
    * ascending, then symbol ascending). `counts(len)` and `syms` in
    * canonical order; a single-symbol code reads ZERO bits (the
    * spec's special case). Codes must otherwise be COMPLETE —
    * an over- or under-subscribed length set throws. */
  private final class Vp8lPrefixCode(lengths: Array[Int]) {
    val nSyms: Int = lengths.count(_ > 0)
    private val MaxLen = 15
    private val counts = new Array[Int](MaxLen + 1)
    lengths.foreach { l =>
      require(l >= 0 && l <= MaxLen, "[GRAFT] webp: bad code length")
      if (l > 0) counts(l) += 1
    }
    private val syms: Array[Int] = {
      val order = Array.ofDim[Int](nSyms)
      var k = 0
      var len = 1
      while (len <= MaxLen) {
        var s = 0
        while (s < lengths.length) {
          if (lengths(s) == len) { order(k) = s; k += 1 }
          s += 1
        }
        len += 1
      }
      order
    }
    val single: Int = if (nSyms == 1) syms(0) else -1
    if (nSyms > 1) {
      var kraft = 0L
      var len = 1
      while (len <= MaxLen) {
        kraft += counts(len).toLong << (MaxLen - len)
        len += 1
      }
      require(kraft == (1L << MaxLen),
        "[GRAFT] webp: prefix code is not complete")
    } else require(nSyms == 1, "[GRAFT] webp: empty prefix code")
    def read(br: Vp8lBitReader): Int = {
      if (single >= 0) return single
      var code = 0
      var first = 0
      var index = 0
      var len = 1
      while (len <= MaxLen) {
        code = (code << 1) | br.bit()
        val c = counts(len)
        if (code - first < c) return syms(index + code - first)
        index += c
        first = (first + c) << 1
        len += 1
      }
      throw new IllegalArgumentException("[GRAFT] webp: invalid prefix code word")
    }
  }

  /** Code-length-code symbol order (spec 5.2.2). */
  private[graft] val Vp8lClOrder: Array[Int] =
    Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  /** The 120-entry near-distance map (spec 5.2.3): (dx, dy)
    * neighbors with dy ∈ [0, 8], dx ∈ [-8, 8] (dy = 0 ⇒ dx > 0),
    * ordered by squared distance, then |dx|, positive dx first —
    * generated from the rule rather than transcribed, so the table
    * cannot carry a typo. */
  private val Vp8lDistMap: Array[(Int, Int)] = {
    val all = for {
      dy <- 0 to 8
      dx <- -8 to 8
      if dy > 0 || dx > 0
    } yield (dx, dy)
    all.sortBy { case (dx, dy) =>
      (dx * dx + dy * dy, math.abs(dx), if (dx < 0) 1 else 0) }
      .take(120).toArray
  }

  private def vp8lReadPrefixCode(alphabet: Int,
      br: Vp8lBitReader): Vp8lPrefixCode = {
    if (br.bit() == 1) { // simple code: 1 or 2 symbols
      val numSyms = br.bit() + 1
      val first8 = br.bit()
      val s0 = br.bits(if (first8 == 1) 8 else 1)
      val lengths = new Array[Int](alphabet)
      require(s0 < alphabet, "[GRAFT] webp: simple-code symbol out of range")
      lengths(s0) = 1
      if (numSyms == 2) {
        val s1 = br.bits(8)
        require(s1 < alphabet && s1 != s0,
          "[GRAFT] webp: bad second simple-code symbol")
        lengths(s1) = 1
      }
      new Vp8lPrefixCode(lengths)
    } else {
      val numCl = 4 + br.bits(4)
      val clLengths = new Array[Int](19)
      var i = 0
      while (i < numCl) { clLengths(Vp8lClOrder(i)) = br.bits(3); i += 1 }
      val clCode = new Vp8lPrefixCode(clLengths)
      var maxSymbol =
        if (br.bit() == 1) {
          val nbits = 2 + 2 * br.bits(3)
          2 + br.bits(nbits)
        } else alphabet
      val lengths = new Array[Int](alphabet)
      var symbol = 0
      var prevLen = 8
      while (symbol < alphabet && maxSymbol > 0) {
        maxSymbol -= 1
        val cl = clCode.read(br)
        if (cl < 16) {
          lengths(symbol) = cl
          symbol += 1
          if (cl != 0) prevLen = cl
        } else {
          val (repeat, value) = cl match {
            case 16 => (3 + br.bits(2), prevLen)
            case 17 => (3 + br.bits(3), 0)
            case _ => (11 + br.bits(7), 0)
          }
          require(symbol + repeat <= alphabet,
            "[GRAFT] webp: code-length repeat overruns the alphabet")
          var r = 0
          while (r < repeat) { lengths(symbol) = value; symbol += 1; r += 1 }
        }
      }
      new Vp8lPrefixCode(lengths)
    }
  }

  /** LZ77 length/distance prefix value (spec 5.2.3). */
  private def vp8lLz77(code: Int, br: Vp8lBitReader): Int =
    if (code < 4) code + 1
    else {
      val extra = (code - 2) >> 1
      val offset = (2 + (code & 1)) << extra
      offset + br.bits(extra) + 1
    }

  /** One entropy-coded ARGB image (spec 5.2.2/5.2.3): color cache,
    * optional meta prefix groups (main image only), the 5-code
    * group(s), literals / backward references / cache hits. */
  private def vp8lDecodeImage(w: Int, h: Int, isMain: Boolean,
      br: Vp8lBitReader): Array[Int] = {
    require(w > 0 && h > 0 && w.toLong * h <= (1L << 26),
      "[GRAFT] webp: bad image dimensions")
    val cacheBits = if (br.bit() == 1) {
      val b = br.bits(4)
      require(b >= 1 && b <= 11, "[GRAFT] webp: cache bits must be 1-11")
      b
    } else 0
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    val cache = if (cacheSize > 0) new Array[Int](cacheSize) else null
    // meta prefix groups (main image only)
    var metaBits = 0
    var metaImg: Array[Int] = null
    var metaW = 0
    var nGroups = 1
    if (isMain && br.bit() == 1) {
      metaBits = 2 + br.bits(3)
      metaW = (w + (1 << metaBits) - 1) >> metaBits
      val metaH = (h + (1 << metaBits) - 1) >> metaBits
      metaImg = vp8lDecodeImage(metaW, metaH, isMain = false, br)
      var mx = 0
      metaImg.foreach { p => val g = (p >> 8) & 0xffff; if (g > mx) mx = g }
      nGroups = mx + 1
    }
    val greenAlphabet = 256 + 24 + cacheSize
    val groups = Array.fill(nGroups) {
      Array(vp8lReadPrefixCode(greenAlphabet, br),
        vp8lReadPrefixCode(256, br),
        vp8lReadPrefixCode(256, br),
        vp8lReadPrefixCode(256, br),
        vp8lReadPrefixCode(40, br))
    }
    val argb = new Array[Int](w * h)
    def insert(p: Int): Unit = if (cache != null)
      cache((0x1e35a7bd * p) >>> (32 - cacheBits)) = p
    var pos = 0
    val n = w * h
    while (pos < n) {
      val g = if (metaImg == null) groups(0)
        else {
          val x = pos % w; val y = pos / w
          val mp = metaImg((y >> metaBits) * metaW + (x >> metaBits))
          val gi = (mp >> 8) & 0xffff
          groups(gi)
        }
      val s = g(0).read(br)
      if (s < 256) {
        val red = g(1).read(br)
        val blue = g(2).read(br)
        val alpha = g(3).read(br)
        val p = (alpha << 24) | (red << 16) | (s << 8) | blue
        argb(pos) = p
        insert(p)
        pos += 1
      } else if (s < 280) {
        val length = vp8lLz77(s - 256, br)
        val distCode = vp8lLz77(g(4).read(br), br)
        val dist =
          if (distCode > 120) distCode - 120
          else {
            val (dx, dy) = Vp8lDistMap(distCode - 1)
            math.max(1, dy * w + dx)
          }
        require(dist <= pos, "[GRAFT] webp: backward reference before start")
        require(pos + length <= n, "[GRAFT] webp: backward reference overruns")
        var i = 0
        while (i < length) {
          val p = argb(pos - dist)
          argb(pos) = p
          insert(p)
          pos += 1
          i += 1
        }
      } else {
        require(cache != null && s - 280 < cacheSize,
          "[GRAFT] webp: cache reference without a color cache")
        val p = cache(s - 280)
        argb(pos) = p
        insert(p)
        pos += 1
      }
    }
    argb
  }

  /** Decode a WebP file: RIFF walk to the VP8L chunk, bitstream
    * header, transforms (read forward, inverted in reverse), the
    * entropy-coded image. Returns an RGBA raster (VP8L is ARGB
    * internally). VP8 / VP8X chunks are rejected loudly. */
  def decodeWebp(bytes: Array[Byte]): Raster = {
    require(bytes.length >= 20 &&
      new String(bytes, 0, 4, StandardCharsets.US_ASCII) == "RIFF" &&
      new String(bytes, 8, 4, StandardCharsets.US_ASCII) == "WEBP",
      "[GRAFT] webp: missing RIFF/WEBP header")
    var off = 12
    var payload: Array[Byte] = null
    while (payload == null && off + 8 <= bytes.length) {
      val tag = new String(bytes, off, 4, StandardCharsets.US_ASCII)
      val size = (bytes(off + 4) & 0xff) | ((bytes(off + 5) & 0xff) << 8) |
        ((bytes(off + 6) & 0xff) << 16) | ((bytes(off + 7) & 0xff) << 24)
      require(size >= 0 && off + 8 + size <= bytes.length,
        "[GRAFT] webp: chunk overruns the file")
      tag match {
        case "VP8L" =>
          payload = java.util.Arrays.copyOfRange(bytes, off + 8,
            off + 8 + size)
        case "VP8 " | "VP8X" => throw new IllegalArgumentException(
          s"[GRAFT] webp: $tag payloads (lossy/extended) are not " +
            "supported — only VP8L lossless")
        case _ => // skip unknown chunks (word-aligned)
      }
      off += 8 + size + (size & 1)
    }
    require(payload != null, "[GRAFT] webp: no VP8L chunk")
    require(payload.length >= 5 && (payload(0) & 0xff) == 0x2f,
      "[GRAFT] webp: bad VP8L signature byte")
    val br = new Vp8lBitReader(payload, 1)
    val w = br.bits(14) + 1
    val h = br.bits(14) + 1
    br.bit() // alpha hint — informational
    require(br.bits(3) == 0, "[GRAFT] webp: unsupported VP8L version")
    // transforms, in read order; each sized at the CURRENT width
    // (color indexing reduces the coded width for everything after)
    var curW = w
    // (type, sizeBits, data, widthBeforeThisTransform)
    val transforms = scala.collection.mutable.ArrayBuffer
      .empty[(Int, Int, Array[Int], Int)]
    var seen = Set.empty[Int]
    while (br.bit() == 1) {
      val t = br.bits(2)
      require(!seen(t), "[GRAFT] webp: duplicate transform")
      seen += t
      t match {
        case 0 | 1 => // predictor / color: per-block sub-image
          val sizeBits = br.bits(3) + 2
          val tw = (curW + (1 << sizeBits) - 1) >> sizeBits
          val th = (h + (1 << sizeBits) - 1) >> sizeBits
          transforms += ((t, sizeBits,
            vp8lDecodeImage(tw, th, isMain = false, br), curW))
        case 2 => // subtract green
          transforms += ((2, 0, null, curW))
        case _ => // color indexing
          val paletteSize = br.bits(8) + 1
          val palette0 = vp8lDecodeImage(paletteSize, 1, isMain = false, br)
          // palette entries are delta-coded per channel
          val palette = new Array[Int](paletteSize)
          var prev = 0
          var i = 0
          while (i < paletteSize) {
            val d = palette0(i)
            val p = (((prev >>> 24) + (d >>> 24)) & 0xff) << 24 |
              ((((prev >> 16) & 0xff) + ((d >> 16) & 0xff)) & 0xff) << 16 |
              ((((prev >> 8) & 0xff) + ((d >> 8) & 0xff)) & 0xff) << 8 |
              (((prev & 0xff) + (d & 0xff)) & 0xff)
            palette(i) = p
            prev = p
            i += 1
          }
          transforms += ((3, paletteSize, palette, curW))
          val ppu = vp8lPixelsPerUnit(paletteSize)
          curW = (curW + ppu - 1) / ppu
      }
    }
    var img = vp8lDecodeImage(curW, h, isMain = true, br)
    // invert in reverse read order
    transforms.reverseIterator.foreach { case (t, aux, data, wBefore) =>
      t match {
        case 0 => img = vp8lInvPredictor(img, curW, h, data, aux)
        case 1 => img = vp8lInvColorTransform(img, curW, h, data, aux)
        case 2 =>
          var i = 0
          while (i < img.length) {
            val p = img(i)
            val gch = (p >> 8) & 0xff
            img(i) = (p & 0xff00ff00.toInt) |
              ((((p >> 16) & 0xff) + gch) & 0xff) << 16 |
              (((p & 0xff) + gch) & 0xff)
            i += 1
          }
        case _ =>
          img = vp8lInvColorIndex(img, curW, h, data, aux, wBefore)
          curW = wBefore
      }
    }
    require(curW == w, "[GRAFT] webp: transform width bookkeeping broke")
    val out = new Array[Byte](w * h * 4)
    var i = 0
    while (i < w * h) {
      val p = img(i)
      out(4 * i) = ((p >> 16) & 0xff).toByte
      out(4 * i + 1) = ((p >> 8) & 0xff).toByte
      out(4 * i + 2) = (p & 0xff).toByte
      out(4 * i + 3) = ((p >>> 24) & 0xff).toByte
      i += 1
    }
    Raster(w, h, "RGBA", out)
  }

  private def vp8lPixelsPerUnit(paletteSize: Int): Int =
    if (paletteSize <= 2) 8 else if (paletteSize <= 4) 4
    else if (paletteSize <= 16) 2 else 1

  /** Inverse color-indexing: green channel carries the (possibly
    * bundled) palette index; out-of-range indices throw. */
  private def vp8lInvColorIndex(img: Array[Int], wB: Int, h: Int,
      palette: Array[Int], paletteSize: Int, w: Int): Array[Int] = {
    val ppu = vp8lPixelsPerUnit(paletteSize)
    val bitsPer = 8 / ppu
    val mask = (1 << bitsPer) - 1
    val out = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val unit = img(y * wB + x / ppu)
        val idx = ((unit >> 8) >> ((x % ppu) * bitsPer)) & mask
        require(idx < paletteSize,
          s"[GRAFT] webp: palette index $idx out of range")
        out(y * w + x) = palette(idx)
        x += 1
      }
      y += 1
    }
    out
  }

  private def vp8lAvg2(a: Int, b: Int): Int =
    ((((a >>> 24) + (b >>> 24)) / 2) << 24) |
      (((((a >> 16) & 0xff) + ((b >> 16) & 0xff)) / 2) << 16) |
      (((((a >> 8) & 0xff) + ((b >> 8) & 0xff)) / 2) << 8) |
      (((a & 0xff) + (b & 0xff)) / 2)

  private def vp8lClamp255(v: Int): Int =
    if (v < 0) 0 else if (v > 255) 255 else v

  /** Inverse predictor transform (spec 5.2.1.1): 14 modes; the
    * residual adds to the prediction per channel mod 256. Edge
    * rules: (0,0) predicts opaque black, the rest of row 0 uses L,
    * column 0 uses T; TR at the right edge reads the linear-memory
    * neighbor (the first pixel of the CURRENT row), per the spec. */
  private def vp8lInvPredictor(img: Array[Int], w: Int, h: Int,
      sub: Array[Int], sizeBits: Int): Array[Int] = {
    val subW = (w + (1 << sizeBits) - 1) >> sizeBits
    val out = img // in place: predictions only read finished pixels
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val pred: Int =
          if (x == 0 && y == 0) 0xff000000
          else if (y == 0) out(y * w + x - 1)
          else if (x == 0) out((y - 1) * w)
          else {
            val mode = (sub((y >> sizeBits) * subW + (x >> sizeBits)) >> 8) & 0xff
            require(mode < 14, s"[GRAFT] webp: bad predictor mode $mode")
            val l = out(y * w + x - 1)
            val t = out((y - 1) * w + x)
            val tl = out((y - 1) * w + x - 1)
            // at x = w-1 this linear index lands on the CURRENT
            // row's first pixel (already decoded) — the spec's
            // linear-memory top-right rule
            val tr = out((y - 1) * w + x + 1)
            mode match {
              case 0 => 0xff000000
              case 1 => l
              case 2 => t
              case 3 => tr
              case 4 => tl
              case 5 => vp8lAvg2(vp8lAvg2(l, tr), t)
              case 6 => vp8lAvg2(l, tl)
              case 7 => vp8lAvg2(l, t)
              case 8 => vp8lAvg2(tl, t)
              case 9 => vp8lAvg2(t, tr)
              case 10 => vp8lAvg2(vp8lAvg2(l, tl), vp8lAvg2(t, tr))
              case 11 => // Select
                val pa = (l >>> 24) + (t >>> 24) - (tl >>> 24)
                val pr = ((l >> 16) & 0xff) + ((t >> 16) & 0xff) - ((tl >> 16) & 0xff)
                val pg = ((l >> 8) & 0xff) + ((t >> 8) & 0xff) - ((tl >> 8) & 0xff)
                val pb = (l & 0xff) + (t & 0xff) - (tl & 0xff)
                val pL = math.abs(pa - (l >>> 24).toInt) +
                  math.abs(pr - ((l >> 16) & 0xff)) +
                  math.abs(pg - ((l >> 8) & 0xff)) +
                  math.abs(pb - (l & 0xff))
                val pT = math.abs(pa - (t >>> 24).toInt) +
                  math.abs(pr - ((t >> 16) & 0xff)) +
                  math.abs(pg - ((t >> 8) & 0xff)) +
                  math.abs(pb - (t & 0xff))
                if (pL < pT) l else t
              case 12 => // ClampAddSubtractFull
                (vp8lClamp255((l >>> 24) + (t >>> 24) - (tl >>> 24)) << 24) |
                  (vp8lClamp255(((l >> 16) & 0xff) + ((t >> 16) & 0xff) - ((tl >> 16) & 0xff)) << 16) |
                  (vp8lClamp255(((l >> 8) & 0xff) + ((t >> 8) & 0xff) - ((tl >> 8) & 0xff)) << 8) |
                  vp8lClamp255((l & 0xff) + (t & 0xff) - (tl & 0xff))
              case _ => // 13: ClampAddSubtractHalf
                val av = vp8lAvg2(l, t)
                def half(a: Int, b: Int): Int = vp8lClamp255(a + (a - b) / 2)
                (half((av >>> 24), (tl >>> 24)) << 24) |
                  (half((av >> 16) & 0xff, (tl >> 16) & 0xff) << 16) |
                  (half((av >> 8) & 0xff, (tl >> 8) & 0xff) << 8) |
                  half(av & 0xff, tl & 0xff)
            }
          }
        val r = out(y * w + x)
        out(y * w + x) =
          ((((r >>> 24) + (pred >>> 24)) & 0xff) << 24) |
            (((((r >> 16) & 0xff) + ((pred >> 16) & 0xff)) & 0xff) << 16) |
            (((((r >> 8) & 0xff) + ((pred >> 8) & 0xff)) & 0xff) << 8) |
            (((r & 0xff) + (pred & 0xff)) & 0xff)
        x += 1
      }
      y += 1
    }
    out
  }

  /** Inverse color transform (spec 5.2.1.2): per-block transform
    * elements ride the sub-image's channels; deltas are products of
    * SIGNED bytes, arithmetic-shifted. */
  private def vp8lInvColorTransform(img: Array[Int], w: Int, h: Int,
      sub: Array[Int], sizeBits: Int): Array[Int] = {
    val subW = (w + (1 << sizeBits) - 1) >> sizeBits
    def delta(t: Int, c: Int): Int = (t.toByte * c.toByte) >> 5
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val cte = sub((y >> sizeBits) * subW + (x >> sizeBits))
        val g2r = cte & 0xff          // blue channel: green_to_red
        val g2b = (cte >> 8) & 0xff   // green channel: green_to_blue
        val r2b = (cte >> 16) & 0xff  // red channel: red_to_blue
        val p = img(y * w + x)
        val green = (p >> 8) & 0xff
        val red = (((p >> 16) & 0xff) + delta(g2r, green)) & 0xff
        val blue0 = ((p & 0xff) + delta(g2b, green)) & 0xff
        val blue = (blue0 + delta(r2b, red)) & 0xff
        img(y * w + x) = (p & 0xff00ff00.toInt) | (red << 16) | blue
        x += 1
      }
      y += 1
    }
    img
  }

  /** Wrap a raw VP8L bitstream (header bits onward, WITHOUT the
    * 0x2f signature byte) into a complete WebP file — shared by the
    * encoder and the spec's hand-built fixture streams. */
  private[graft] def vp8lContainer(stream: Array[Byte]): Array[Byte] = {
    val payload = new Array[Byte](1 + stream.length)
    payload(0) = 0x2f
    System.arraycopy(stream, 0, payload, 1, stream.length)
    val padded = payload.length + (payload.length & 1)
    val out = ByteBuffer.allocate(12 + 8 + padded)
      .order(ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes(StandardCharsets.US_ASCII))
    out.putInt(4 + 8 + padded)
    out.put("WEBP".getBytes(StandardCharsets.US_ASCII))
    out.put("VP8L".getBytes(StandardCharsets.US_ASCII))
    out.putInt(payload.length)
    out.put(payload)
    if (padded != payload.length) out.put(0.toByte)
    out.array()
  }

  /** Encode an RGB raster as a LOSSLESS WebP (VP8L): no transforms,
    * no color cache, literal-only coding with complete fixed 8-bit
    * codes for green/red/blue (each built through the full
    * code-length machinery: a single-symbol code-length code
    * repeating "8" up to max_symbol = 256), a single-symbol alpha
    * code (every pixel opaque — zero bits per pixel) and a
    * single-symbol distance code (never read). A bona fide file any
    * spec-conforming VP8L decoder accepts; dimensions cap at the
    * format's 14-bit fields. */
  def encodeWebpLossless(pixels: Array[Byte], width: Int,
      height: Int): Array[Byte] = {
    require(width > 0 && height > 0 &&
      pixels.length == width.toLong * height * 3,
      "[GRAFT] webp: pixels must be width*height*3 bytes")
    require(width <= 16384 && height <= 16384,
      "[GRAFT] webp: dimensions exceed the 14-bit VP8L fields")
    val bw = new Vp8lBitWriter
    bw.putBits(width - 1, 14)
    bw.putBits(height - 1, 14)
    bw.putBits(0, 1) // no alpha
    bw.putBits(0, 3) // version
    bw.putBits(0, 1) // no transforms
    bw.putBits(0, 1) // no color cache
    bw.putBits(0, 1) // no meta prefix
    // green/red/blue: the fixed 8-bit code via the full form
    def fixed8(): Unit = {
      bw.putBits(0, 1)      // not simple
      bw.putBits(8, 4)      // num_code_lengths = 12 (covers symbol 8)
      var i = 0
      while (i < 12) {      // CL lengths: only symbol 8 (order pos 11)
        bw.putBits(if (Vp8lClOrder(i) == 8) 1 else 0, 3)
        i += 1
      }
      bw.putBits(1, 1)      // use max_symbol
      bw.putBits(3, 3)      // length_nbits = 2 + 2*3 = 8
      bw.putBits(254, 8)    // max_symbol = 2 + 254 = 256
      // the 256 "8" symbols then cost zero bits (single-symbol code)
    }
    def single(sym: Int, is8: Boolean): Unit = {
      bw.putBits(1, 1)                  // simple
      bw.putBits(0, 1)                  // one symbol
      bw.putBits(if (is8) 1 else 0, 1)
      bw.putBits(sym, if (is8) 8 else 1)
    }
    fixed8() // green
    fixed8() // red
    fixed8() // blue
    single(255, is8 = true) // alpha: always 255, zero bits per pixel
    single(0, is8 = false)  // distance: never read
    var i = 0
    while (i < width * height) {
      bw.putCode(pixels(3 * i + 1) & 0xff, 8) // green
      bw.putCode(pixels(3 * i) & 0xff, 8)     // red
      bw.putCode(pixels(3 * i + 2) & 0xff, 8) // blue
      i += 1
    }
    vp8lContainer(bw.toBytes)
  }

  // ---------------------------------------------------------------
  // FLAC (lossless audio: STREAMINFO walk, frame sync + CRC-8/16,
  // constant / verbatim / fixed / LPC subframes, partitioned Rice
  // residuals, stereo decorrelation). FLAC is integer-exact by
  // specification — squarely inside the codec-scope stance that
  // keeps MP3 out — and speech corpora (LibriSpeech et al.) ship it.
  // No stock-JVM referee exists (javax.sound reads WAV/AIFF/AU
  // only), so the spec pins hand-built frames, the WebP stance.
  // ---------------------------------------------------------------

  /** MSB-first bit reader (FLAC packs big-endian). */
  private final class FlacBitReader(bytes: Array[Byte], var pos: Int) {
    private var bitPos = 0
    def bytePos: Int = pos
    def aligned: Boolean = bitPos == 0
    def bit(): Int = {
      require(pos < bytes.length, "[GRAFT] flac: bitstream truncated")
      val b = (bytes(pos) >> (7 - bitPos)) & 1
      bitPos += 1
      if (bitPos == 8) { bitPos = 0; pos += 1 }
      b
    }
    def bits(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def signedBits(n: Int): Long = {
      val v = bits(n)
      if (n > 0 && (v & (1L << (n - 1))) != 0) v - (1L << n) else v
    }
    def unary(): Int = {
      var n = 0
      while (bit() == 0) {
        n += 1
        require(n < (1 << 24), "[GRAFT] flac: runaway unary code")
      }
      n
    }
  }

  /** MSB-first bit writer (the encoder's and the spec fixtures'). */
  private[graft] final class FlacBitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var buf = 0
    private var cnt = 0
    def putBits(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        buf = (buf << 1) | ((v >> i) & 1).toInt
        cnt += 1
        if (cnt == 8) { out.write(buf); buf = 0; cnt = 0 }
        i -= 1
      }
    }
    def putUnary(q: Int): Unit = { var i = 0; while (i < q) { putBits(0, 1); i += 1 }; putBits(1, 1) }
    def alignZero(): Unit = while (cnt != 0) putBits(0, 1)
    def toBytes: Array[Byte] = {
      require(cnt == 0, "[GRAFT] flac: writer not byte-aligned")
      out.toByteArray
    }
  }

  /** CRC-8, poly 0x07, init 0 — the FLAC frame-header checksum. */
  private[graft] def flacCrc8(bytes: Array[Byte], from: Int,
      until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= bytes(i) & 0xff
      var b = 0
      while (b < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff
          else (crc << 1) & 0xff
        b += 1
      }
      i += 1
    }
    crc
  }

  /** CRC-16, poly 0x8005, init 0 — the FLAC frame checksum. */
  private[graft] def flacCrc16(bytes: Array[Byte], from: Int,
      until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (bytes(i) & 0xff) << 8
      var b = 0
      while (b < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff
          else (crc << 1) & 0xffff
        b += 1
      }
      i += 1
    }
    crc
  }

  /** FLAC's extended-UTF-8 frame/sample number coding. */
  private[graft] def flacUtf8Encode(v: Long): Array[Byte] = {
    require(v >= 0, "[GRAFT] flac: negative coded number")
    if (v < 0x80) Array(v.toByte)
    else {
      // an n-byte form carries 5n+1 bits (the 7-byte form: 36)
      var bytesNeeded = 2
      while (bytesNeeded < 7 && v >= (1L << (5 * bytesNeeded + 1)))
        bytesNeeded += 1
      val out = new Array[Byte](bytesNeeded)
      var rest = v
      var i = bytesNeeded - 1
      while (i > 0) {
        out(i) = (0x80 | (rest & 0x3f)).toByte
        rest >>= 6
        i -= 1
      }
      val lead = (0xff << (8 - bytesNeeded)) & 0xff
      out(0) = (lead | rest).toByte
      out
    }
  }

  private def flacUtf8Decode(br: FlacBitReader): Long = {
    val first = br.bits(8).toInt
    if ((first & 0x80) == 0) first.toLong
    else {
      var n = 0
      var mask = 0x40
      while ((first & mask) != 0) { n += 1; mask >>= 1 }
      require(n >= 1 && n <= 6, "[GRAFT] flac: bad coded-number lead byte")
      var v = (first & (mask - 1)).toLong
      var i = 0
      while (i < n) {
        val c = br.bits(8).toInt
        require((c & 0xc0) == 0x80, "[GRAFT] flac: bad coded-number continuation")
        v = (v << 6) | (c & 0x3f)
        i += 1
      }
      v
    }
  }

  private val FlacBlockSizes = Array(-1, 192, 576, 1152, 2304, 4608,
    -6, -7, 256, 512, 1024, 2048, 4096, 8192, 16384, 32768)
  private val FlacSampleSizes = Array(0, 8, 12, -1, 16, 20, 24, 32)

  /** Decode a FLAC stream to PCM (the [[decodeWav]] twin): walks the
    * metadata blocks, then every frame — sync + CRC-8 header, the
    * four subframe types, partitioned Rice residuals, stereo
    * decorrelation, CRC-16 footer. Integer-exact per the spec.
    * Mono/stereo, 8/16/24-bit. */
  def decodeFlac(bytes: Array[Byte]): Pcm = {
    require(bytes.length >= 42 &&
      new String(bytes, 0, 4, StandardCharsets.US_ASCII) == "fLaC",
      "[GRAFT] flac: missing fLaC magic")
    var pos = 4
    var sampleRate = 0
    var channels = 0
    var bps = 0
    var totalSamples = 0L
    var sawStreamInfo = false
    var last = false
    while (!last) {
      require(pos + 4 <= bytes.length, "[GRAFT] flac: metadata truncated")
      val hdr = bytes(pos) & 0xff
      last = (hdr & 0x80) != 0
      val btype = hdr & 0x7f
      val len = ((bytes(pos + 1) & 0xff) << 16) |
        ((bytes(pos + 2) & 0xff) << 8) | (bytes(pos + 3) & 0xff)
      pos += 4
      require(pos + len <= bytes.length, "[GRAFT] flac: metadata overruns")
      if (btype == 0) {
        require(len == 34, "[GRAFT] flac: bad STREAMINFO length")
        val br = new FlacBitReader(bytes, pos)
        br.bits(16); br.bits(16) // min/max block size
        br.bits(24); br.bits(24) // min/max frame size
        sampleRate = br.bits(20).toInt
        channels = br.bits(3).toInt + 1
        bps = br.bits(5).toInt + 1
        totalSamples = br.bits(36)
        sawStreamInfo = true
      }
      pos += len
    }
    require(sawStreamInfo, "[GRAFT] flac: no STREAMINFO block")
    require(sampleRate > 0, "[GRAFT] flac: bad sample rate")
    require(channels >= 1 && channels <= 2,
      s"[GRAFT] flac: $channels channels unsupported (mono/stereo only)")
    require(bps == 8 || bps == 16 || bps == 24,
      s"[GRAFT] flac: $bps bits/sample unsupported")
    // primitive growable buffer — the generic ArrayBuffer[Int] boxed
    // every decoded sample (one java.lang.Integer per sample per
    // channel; the r18 JFR profile of the full-suite bench showed
    // BoxesRunTime.boxToInteger + ArrayBuffer.addOne dominating the
    // decode whenever the JIT had not yet compiled the loop — flac
    // rep CPU 1.4 vs 10-14 s on identical work). Pre-sized from
    // STREAMINFO when present.
    var outBuf = new Array[Int](
      if (totalSamples > 0 && totalSamples * channels < Int.MaxValue / 2)
        (totalSamples * channels).toInt else 4096)
    var outLen = 0
    while (pos < bytes.length) {
      val frameStart = pos
      val br = new FlacBitReader(bytes, pos)
      require(br.bits(14) == 0x3ffe, "[GRAFT] flac: lost frame sync")
      require(br.bit() == 0, "[GRAFT] flac: reserved bit set")
      br.bit() // blocking strategy
      val bsCode = br.bits(4).toInt
      val srCode = br.bits(4).toInt
      val chAsgn = br.bits(4).toInt
      val ssCode = br.bits(3).toInt
      require(br.bit() == 0, "[GRAFT] flac: reserved bit set")
      flacUtf8Decode(br)
      val blockSize = bsCode match {
        case 0 => throw new IllegalArgumentException(
          "[GRAFT] flac: reserved block-size code")
        case 6 => br.bits(8).toInt + 1
        case 7 => br.bits(16).toInt + 1
        case c => FlacBlockSizes(c)
      }
      srCode match {
        case 12 => br.bits(8)
        case 13 | 14 => br.bits(16)
        case 15 => throw new IllegalArgumentException(
          "[GRAFT] flac: invalid sample-rate code")
        case _ => ()
      }
      val frameBps = ssCode match {
        case 0 => bps
        case 3 | 7 => throw new IllegalArgumentException(
          "[GRAFT] flac: reserved sample-size code")
        case c => FlacSampleSizes(c)
      }
      require(br.aligned, "[GRAFT] flac: header must be byte-aligned")
      val crc8At = br.bytePos
      require(flacCrc8(bytes, frameStart, crc8At) == br.bits(8).toInt,
        "[GRAFT] flac: frame header CRC-8 mismatch")
      require(chAsgn <= 10,
        s"[GRAFT] flac: reserved channel assignment $chAsgn")
      val nCh = if (chAsgn <= 7) chAsgn + 1 else 2
      require(nCh == channels, "[GRAFT] flac: channel count drifted")
      val chans = Array.ofDim[Array[Long]](nCh)
      var ch = 0
      while (ch < nCh) {
        val extraBit = chAsgn match {
          case 8 => if (ch == 1) 1 else 0  // left/side
          case 9 => if (ch == 0) 1 else 0  // right/side
          case 10 => if (ch == 1) 1 else 0 // mid/side
          case _ => 0
        }
        chans(ch) = flacSubframe(br, blockSize, frameBps + extraBit)
        ch += 1
      }
      // stereo decorrelation
      chAsgn match {
        case 8 => // left/side: right = left - side
          var i = 0
          while (i < blockSize) {
            chans(1)(i) = chans(0)(i) - chans(1)(i); i += 1
          }
        case 9 => // right/side: left = right + side
          var i = 0
          while (i < blockSize) {
            val right = chans(1)(i)
            chans(1)(i) = right
            chans(0)(i) = right + chans(0)(i)
            i += 1
          }
        case 10 => // mid/side
          var i = 0
          while (i < blockSize) {
            val side = chans(1)(i)
            val mid = (chans(0)(i) << 1) | (side & 1)
            chans(0)(i) = (mid + side) >> 1
            chans(1)(i) = (mid - side) >> 1
            i += 1
          }
        case _ => ()
      }
      // align + frame CRC-16
      val br2 = br
      while (!br2.aligned) require(br2.bit() == 0,
        "[GRAFT] flac: nonzero frame padding")
      val crc16At = br2.bytePos
      require(flacCrc16(bytes, frameStart, crc16At) == br2.bits(16).toInt,
        "[GRAFT] flac: frame CRC-16 mismatch")
      pos = br2.bytePos
      if (outLen + blockSize * nCh > outBuf.length) {
        var ncap = outBuf.length * 2
        while (ncap < outLen + blockSize * nCh) ncap *= 2
        outBuf = java.util.Arrays.copyOf(outBuf, ncap)
      }
      var i = 0
      while (i < blockSize) {
        var c = 0
        while (c < nCh) {
          val v = chans(c)(i)
          require(v >= -(1L << (bps - 1)) && v < (1L << (bps - 1)),
            "[GRAFT] flac: decoded sample out of range")
          outBuf(outLen) = v.toInt
          outLen += 1
          c += 1
        }
        i += 1
      }
    }
    if (totalSamples > 0)
      require(outLen.toLong == totalSamples * channels,
        "[GRAFT] flac: sample count differs from STREAMINFO")
    Pcm(sampleRate, channels, bps,
      if (outLen == outBuf.length) outBuf
      else java.util.Arrays.copyOf(outBuf, outLen))
  }

  /** One subframe: constant / verbatim / fixed(0-4) / LPC. */
  private def flacSubframe(br: FlacBitReader, blockSize: Int,
      bps: Int): Array[Long] = {
    require(br.bit() == 0, "[GRAFT] flac: subframe padding bit set")
    val t = br.bits(6).toInt
    val wasted = if (br.bit() == 1) br.unary() + 1 else 0
    val effBps = bps - wasted
    require(effBps > 0, "[GRAFT] flac: wasted bits exceed sample size")
    val out = new Array[Long](blockSize)
    if (t == 0) { // constant
      val v = br.signedBits(effBps)
      java.util.Arrays.fill(out, v)
    } else if (t == 1) { // verbatim
      var i = 0
      while (i < blockSize) { out(i) = br.signedBits(effBps); i += 1 }
    } else if (t >= 8 && t <= 12) { // fixed, order 0-4
      val order = t - 8
      var i = 0
      while (i < order) { out(i) = br.signedBits(effBps); i += 1 }
      flacResidual(br, blockSize, order, out)
      i = order
      while (i < blockSize) {
        val p = order match {
          case 0 => 0L
          case 1 => out(i - 1)
          case 2 => 2 * out(i - 1) - out(i - 2)
          case 3 => 3 * out(i - 1) - 3 * out(i - 2) + out(i - 3)
          case _ => 4 * out(i - 1) - 6 * out(i - 2) + 4 * out(i - 3) -
            out(i - 4)
        }
        out(i) += p
        i += 1
      }
    } else if (t >= 32) { // LPC, order 1-32
      val order = (t & 0x1f) + 1
      var i = 0
      while (i < order) { out(i) = br.signedBits(effBps); i += 1 }
      val precision = br.bits(4).toInt + 1
      require(precision <= 15, "[GRAFT] flac: invalid LPC precision")
      val shift = br.signedBits(5).toInt
      require(shift >= 0, "[GRAFT] flac: negative LPC shift")
      val coefs = new Array[Long](order)
      i = 0
      while (i < order) { coefs(i) = br.signedBits(precision); i += 1 }
      flacResidual(br, blockSize, order, out)
      i = order
      while (i < blockSize) {
        var acc = 0L
        var j = 0
        while (j < order) { acc += coefs(j) * out(i - 1 - j); j += 1 }
        out(i) += acc >> shift
        i += 1
      }
    } else throw new IllegalArgumentException(
      s"[GRAFT] flac: reserved subframe type $t")
    if (wasted > 0) {
      var i = 0
      while (i < blockSize) { out(i) <<= wasted; i += 1 }
    }
    out
  }

  /** Partitioned Rice residual into out(order until blockSize). */
  private def flacResidual(br: FlacBitReader, blockSize: Int,
      order: Int, out: Array[Long]): Unit = {
    val method = br.bits(2).toInt
    require(method <= 1, "[GRAFT] flac: reserved residual method")
    val paramBits = if (method == 0) 4 else 5
    val escape = (1 << paramBits) - 1
    val pOrder = br.bits(4).toInt
    val nPart = 1 << pOrder
    require((blockSize >> pOrder) > order &&
      (pOrder == 0 || blockSize % nPart == 0),
      "[GRAFT] flac: bad partition order")
    var idx = order
    var part = 0
    while (part < nPart) {
      val count = (blockSize >> pOrder) - (if (part == 0) order else 0)
      val param = br.bits(paramBits).toInt
      if (param == escape) {
        val raw = br.bits(5).toInt
        var i = 0
        while (i < count) { out(idx) = br.signedBits(raw); idx += 1; i += 1 }
      } else {
        var i = 0
        while (i < count) {
          val q = br.unary().toLong
          val v = (q << param) | br.bits(param)
          out(idx) = (v >> 1) ^ -(v & 1) // zigzag
          idx += 1
          i += 1
        }
      }
      part += 1
    }
  }

  /** Encode PCM as FLAC: mono/stereo, 8/16-bit; per-frame the
    * encoder picks CONSTANT when the block is flat, else FIXED
    * order 2 with a single-partition Rice residual (escape-coded
    * when Rice would lose) — a bona fide subset-compliant file with
    * real CRCs any FLAC decoder accepts. */
  def encodeFlac(samples: Array[Int], bitsPerSample: Int = 16,
      sampleRate: Int = 8000, channels: Int = 1,
      blockSize: Int = 4096): Array[Byte] = {
    require(channels == 1, "[GRAFT] flac: encoder is mono (decode is not)")
    require(bitsPerSample == 8 || bitsPerSample == 16,
      "[GRAFT] flac: encoder supports 8/16 bits")
    require(blockSize >= 16 && blockSize <= 65535,
      "[GRAFT] flac: bad block size")
    require(sampleRate > 0 && sampleRate < (1 << 20),
      "[GRAFT] flac: bad sample rate")
    val lim = 1 << (bitsPerSample - 1)
    samples.foreach(s => require(s >= -lim && s < lim,
      "[GRAFT] flac: sample out of range"))
    val out = new java.io.ByteArrayOutputStream()
    out.write("fLaC".getBytes(StandardCharsets.US_ASCII))
    // STREAMINFO (last metadata block)
    val si = new FlacBitWriter
    si.putBits(blockSize, 16); si.putBits(blockSize, 16)
    si.putBits(0, 24); si.putBits(0, 24)
    si.putBits(sampleRate, 20)
    si.putBits(0, 3) // channels - 1
    si.putBits(bitsPerSample - 1, 5)
    si.putBits(samples.length, 36)
    si.putBits(0, 64); si.putBits(0, 64) // md5: unset
    val siBytes = si.toBytes
    out.write(0x80); out.write(0); out.write(0); out.write(siBytes.length)
    out.write(siBytes)
    var frameIdx = 0L
    var off = 0
    // zero samples -> a STREAMINFO-only file with no frames (legal)
    while (off < samples.length) {
      val n = math.min(blockSize, samples.length - off)
      val fw = new FlacBitWriter
      fw.putBits(0x3ffe, 14)
      fw.putBits(0, 1); fw.putBits(0, 1) // reserved, fixed-blocksize
      fw.putBits(7, 4)                   // block size: 16-bit at end
      fw.putBits(0, 4)                   // sample rate: STREAMINFO
      fw.putBits(0, 4)                   // mono
      fw.putBits(if (bitsPerSample == 16) 4 else 1, 3)
      fw.putBits(0, 1)
      flacUtf8Encode(frameIdx).foreach(b => fw.putBits(b & 0xff, 8))
      fw.putBits(n - 1, 16)
      val hdr = fw.toBytes
      val withCrc8 = hdr :+ flacCrc8(hdr, 0, hdr.length).toByte
      val bw = new FlacBitWriter
      withCrc8.foreach(b => bw.putBits(b & 0xff, 8))
      val block = java.util.Arrays.copyOfRange(samples, off, off + n)
      val flat = block.forall(_ == block(0))
      bw.putBits(0, 1)
      if (flat) {
        bw.putBits(0, 6)  // constant
        bw.putBits(0, 1)  // no wasted bits
        bw.putBits(block(0).toLong & ((1L << bitsPerSample) - 1),
          bitsPerSample)
      } else if (n <= 2) {
        bw.putBits(1, 6)  // verbatim
        bw.putBits(0, 1)
        block.foreach(s =>
          bw.putBits(s.toLong & ((1L << bitsPerSample) - 1),
            bitsPerSample))
      } else {
        bw.putBits(10, 6) // fixed, order 2
        bw.putBits(0, 1)
        bw.putBits(block(0).toLong & ((1L << bitsPerSample) - 1),
          bitsPerSample)
        bw.putBits(block(1).toLong & ((1L << bitsPerSample) - 1),
          bitsPerSample)
        val res = new Array[Long](n - 2)
        var i = 2
        while (i < n) {
          res(i - 2) = block(i).toLong - 2 * block(i - 1) + block(i - 2)
          i += 1
        }
        bw.putBits(0, 2)  // 4-bit Rice params
        bw.putBits(0, 4)  // partition order 0
        // Rice parameter from the mean magnitude; escape to raw
        // 17-bit when Rice would blow up (worst-case residual range)
        var mean = 0L
        res.foreach(r => mean += math.abs(r))
        mean /= math.max(1, res.length)
        var p = 0
        while (p < 14 && (1L << p) < mean + 1) p += 1
        val riceBits = res.map { r =>
          val z = (r << 1) ^ (r >> 63)
          (z >>> p) + 1 + p
        }.sum
        if (riceBits > res.length.toLong * 19) {
          bw.putBits(15, 4) // escape
          bw.putBits(18, 5) // raw width: covers 16-bit 2nd differences
          res.foreach(r => bw.putBits(r & ((1L << 18) - 1), 18))
        } else {
          bw.putBits(p, 4)
          res.foreach { r =>
            val z = (r << 1) ^ (r >> 63)
            bw.putUnary((z >>> p).toInt)
            bw.putBits(z & ((1L << p) - 1), p)
          }
        }
      }
      bw.alignZero()
      val body = bw.toBytes
      val crc = flacCrc16(body, 0, body.length)
      out.write(body)
      out.write((crc >> 8) & 0xff); out.write(crc & 0xff)
      frameIdx += 1
      off += n
    }
    out.toByteArray
  }

  // ---------------------------------------------------------------
  // EXIF orientation (JPEG APP1 "Exif" — an embedded TIFF IFD)
  // ---------------------------------------------------------------

  /** EXIF orientation (tag 274) of a JPEG, 1–8; 1 when the file has
    * no APP1/Exif segment or the tag is absent. Walks the JPEG
    * marker stream to APP1, then the embedded TIFF header (its own
    * II/MM byte order) and the 0th IFD — tag-table only, no strips.
    * A PRESENT-but-corrupt Exif block throws rather than silently
    * reading garbage orientation. */
  def jpegOrientation(bytes: Array[Byte]): Int = {
    require(bytes.length >= 2 && (bytes(0) & 0xff) == 0xff &&
      (bytes(1) & 0xff) == 0xd8, "[GRAFT] exif: not a JPEG (no SOI)")
    var pos = 2
    while (pos + 4 <= bytes.length) {
      if ((bytes(pos) & 0xff) != 0xff) return 1 // entropy data reached
      // skip 0xFF fill bytes between markers (decodeJpeg tolerates
      // them — this walk must accept every file the decoder does)
      while (pos + 1 < bytes.length &&
        (bytes(pos + 1) & 0xff) == 0xff) pos += 1
      if (pos + 4 > bytes.length) return 1
      val marker = bytes(pos + 1) & 0xff
      if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7)) {
        pos += 2 // standalone markers
      } else if (marker == 0xd9 || marker == 0xda) {
        return 1 // EOI / start of scan: no APP1 seen
      } else {
        val len = ((bytes(pos + 2) & 0xff) << 8) | (bytes(pos + 3) & 0xff)
        require(len >= 2 && pos + 2 + len <= bytes.length,
          "[GRAFT] exif: truncated JPEG segment")
        if (marker == 0xe1 && len >= 2 + 6 + 8 &&
          bytes(pos + 4) == 'E' && bytes(pos + 5) == 'x' &&
          bytes(pos + 6) == 'i' && bytes(pos + 7) == 'f' &&
          bytes(pos + 8) == 0 && bytes(pos + 9) == 0) {
          return exifOrientation(bytes, pos + 10, pos + 2 + len)
        }
        pos += 2 + len
      }
    }
    1
  }

  /** Orientation (tag 274) of a standalone TIFF file — the tag is
    * native TIFF, no APP1 wrapper involved; 1 when absent. */
  def tiffOrientation(bytes: Array[Byte]): Int =
    exifOrientation(bytes, 0, bytes.length)

  /** Orientation from a TIFF-structured Exif blob in bytes[off,end). */
  private def exifOrientation(bytes: Array[Byte], off: Int,
      end: Int): Int = {
    require(end - off >= 8, "[GRAFT] exif: truncated TIFF header")
    val le = (bytes(off), bytes(off + 1)) match {
      case ('I', 'I') => true
      case ('M', 'M') => false
      case _ => throw new IllegalArgumentException(
        "[GRAFT] exif: bad TIFF byte-order mark")
    }
    def u16(o: Int): Int = {
      require(o + 2 <= end, "[GRAFT] exif: truncated IFD")
      if (le) (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
      else ((bytes(o) & 0xff) << 8) | (bytes(o + 1) & 0xff)
    }
    def u32(o: Int): Long = {
      require(o + 4 <= end, "[GRAFT] exif: truncated IFD")
      if (le) (u16(o) & 0xffffL) | ((u16(o + 2) & 0xffffL) << 16)
      else ((u16(o) & 0xffffL) << 16) | (u16(o + 2) & 0xffffL)
    }
    require(u16(off + 2) == 42, "[GRAFT] exif: bad TIFF magic")
    val rel = u32(off + 4)
    // bound BOTH sides: a huge/garbage offset must throw the loud
    // [GRAFT] error, never wrap negative into a raw AIOOBE
    require(rel >= 8 && rel <= (end - off).toLong - 2,
      s"[GRAFT] exif: IFD offset $rel out of range")
    val ifd = off + rel.toInt
    val n = u16(ifd)
    require(ifd + 2 + 12L * n <= end, "[GRAFT] exif: IFD truncated")
    var i = 0
    while (i < n) {
      val e = ifd + 2 + 12 * i
      if (u16(e) == 274) {
        require(u16(e + 2) == 3, "[GRAFT] exif: orientation not SHORT")
        val v = u16(e + 8) // SHORT inline, left-justified both orders
        require(v >= 1 && v <= 8,
          s"[GRAFT] exif: orientation $v out of range")
        return v
      }
      i += 1
    }
    1
  }

  /** Apply an EXIF orientation (1–8) to an RGB raster, returning the
    * upright image: 1 identity, 2 mirror-H, 3 rotate 180, 4 mirror-V,
    * 5 transpose, 6 rotate 90 CW, 7 transverse, 8 rotate 270 CW.
    * (The tag names the stored→display transform; this applies it.) */
  def orientRgb(pixels: Array[Byte], w: Int, h: Int,
      orientation: Int): Raster = {
    require(orientation >= 1 && orientation <= 8,
      s"[GRAFT] exif: orientation $orientation out of range")
    require(pixels.length == w * h * 3, "[GRAFT] exif: bad raster size")
    if (orientation == 1) return Raster(w, h, "RGB", pixels)
    val swap = orientation >= 5 // transposed family: dims swap
    val ow = if (swap) h else w
    val oh = if (swap) w else h
    // every EXIF transform is affine in (x, y): the destination pixel
    // index is base + x·colStep + y·rowStep — dispatch ONCE, keep the
    // per-pixel loop pure index arithmetic (this runs per pixel per
    // image in the fingerprint kernel)
    val (a1, b1, c1, a2, b2, c2) = orientation match {
      case 2 => (w - 1, -1, 0, 0, 0, 1)      // mirror horizontal
      case 3 => (w - 1, -1, 0, h - 1, 0, -1) // rotate 180
      case 4 => (0, 1, 0, h - 1, 0, -1)      // mirror vertical
      case 5 => (0, 0, 1, 0, 1, 0)           // transpose
      case 6 => (h - 1, 0, -1, 0, 1, 0)      // rotate 90 CW
      case 7 => (h - 1, 0, -1, w - 1, -1, 0) // transverse
      case _ => (0, 0, 1, w - 1, -1, 0)      // 8: rotate 270 CW
    }
    val base = a2 * ow + a1
    val colStep = b2 * ow + b1
    val rowStep = c2 * ow + c1
    val out = new Array[Byte](pixels.length)
    var si = 0
    var y = 0
    while (y < h) {
      var di = base + y * rowStep
      var x = 0
      while (x < w) {
        val d3 = di * 3
        out(d3) = pixels(si)
        out(d3 + 1) = pixels(si + 1)
        out(d3 + 2) = pixels(si + 2)
        si += 3
        di += colStep
        x += 1
      }
      y += 1
    }
    Raster(ow, oh, "RGB", out)
  }

  /** Splice an APP1/Exif orientation segment into an encoded JPEG
    * (right after SOI) — how rotated-capture files present in real
    * crawls; the fixture-side dual of [[jpegOrientation]]. */
  def withJpegOrientation(jpeg: Array[Byte], orientation: Int): Array[Byte] = {
    require(orientation >= 1 && orientation <= 8,
      s"[GRAFT] exif: orientation $orientation out of range")
    require(jpeg.length >= 2 && (jpeg(0) & 0xff) == 0xff &&
      (jpeg(1) & 0xff) == 0xd8, "[GRAFT] exif: not a JPEG (no SOI)")
    val out = new java.io.ByteArrayOutputStream(jpeg.length + 40)
    out.write(jpeg, 0, 2)
    // APP1 len 34: "Exif\0\0"(6) + II TIFF header(8) + count(2)
    // + one 12-byte entry + next-IFD pointer(4), plus the 2 len bytes
    out.write(0xff); out.write(0xe1); out.write(0); out.write(34)
    out.write("Exif".getBytes(StandardCharsets.US_ASCII))
    out.write(0); out.write(0)
    out.write('I'); out.write('I'); out.write(42); out.write(0)
    out.write(8); out.write(0); out.write(0); out.write(0)
    out.write(1); out.write(0)                 // 1 entry
    out.write(274 & 0xff); out.write(274 >> 8) // tag
    out.write(3); out.write(0)                 // SHORT
    out.write(1); out.write(0); out.write(0); out.write(0)
    out.write(orientation); out.write(0); out.write(0); out.write(0)
    out.write(0); out.write(0); out.write(0); out.write(0) // next IFD
    out.write(jpeg, 2, jpeg.length - 2)
    out.toByteArray
  }

  // ---------------------------------------------------------------
  // Raster resize kernels + WAV resample
  // ---------------------------------------------------------------

  /** Nearest-neighbor 3-channel resize: out(x2, y2) samples
    * in((x2·w)/w2, (y2·h)/h2) — integer floor, the box-origin NN
    * grid, exact in 64-bit arithmetic (engine-portable: the DuckDB
    * oracle reproduces resized stats with the same index formula).
    * Channel-order agnostic: per-pixel byte order passes through. */
  def nnResizeRgb(pixels: Array[Byte], w: Int, h: Int,
      w2: Int, h2: Int): Array[Byte] = {
    require(w > 0 && h > 0 && pixels.length == w * h * 3,
      "[GRAFT] resize: pixels must be width*height*3 bytes")
    require(w2 > 0 && h2 > 0 && w2 <= (1 << 20) && h2 <= (1 << 20) &&
      w2.toLong * h2 * 3 <= Int.MaxValue,
      "[GRAFT] resize: bad target dimensions")
    val out = new Array[Byte](w2 * h2 * 3)
    var y2 = 0
    while (y2 < h2) {
      val sy = (y2.toLong * h / h2).toInt
      var x2 = 0
      while (x2 < w2) {
        val sx = (x2.toLong * w / w2).toInt
        val src = (sy * w + sx) * 3
        val dst = (y2 * w2 + x2) * 3
        out(dst) = pixels(src)
        out(dst + 1) = pixels(src + 1)
        out(dst + 2) = pixels(src + 2)
        x2 += 1
      }
      y2 += 1
    }
    out
  }

  /** Bilinear 3-channel resize with half-pixel centers
    * (align_corners = false — the OpenCV/PIL convention): source
    * position (dst + 0.5)·scale − 0.5, clamped to the image, the four
    * neighbors blended by the fractional offsets, Math.round to a
    * byte. Deterministic: IEEE double arithmetic in a fixed order. */
  def bilinearResizeRgb(pixels: Array[Byte], w: Int, h: Int,
      w2: Int, h2: Int): Array[Byte] = {
    require(w > 0 && h > 0 && pixels.length == w * h * 3,
      "[GRAFT] resize: pixels must be width*height*3 bytes")
    require(w2 > 0 && h2 > 0 && w2 <= (1 << 20) && h2 <= (1 << 20) &&
      w2.toLong * h2 * 3 <= Int.MaxValue,
      "[GRAFT] resize: bad target dimensions")
    val out = new Array[Byte](w2 * h2 * 3)
    val sxScale = w.toDouble / w2
    val syScale = h.toDouble / h2
    var y2 = 0
    while (y2 < h2) {
      val fy = math.max(0.0, math.min(h - 1.0, (y2 + 0.5) * syScale - 0.5))
      val y0 = fy.toInt
      val y1 = math.min(h - 1, y0 + 1)
      val wy = fy - y0
      var x2 = 0
      while (x2 < w2) {
        val fx = math.max(0.0, math.min(w - 1.0, (x2 + 0.5) * sxScale - 0.5))
        val x0 = fx.toInt
        val x1 = math.min(w - 1, x0 + 1)
        val wx = fx - x0
        var c = 0
        while (c < 3) {
          val p00 = pixels((y0 * w + x0) * 3 + c) & 0xff
          val p01 = pixels((y0 * w + x1) * 3 + c) & 0xff
          val p10 = pixels((y1 * w + x0) * 3 + c) & 0xff
          val p11 = pixels((y1 * w + x1) * 3 + c) & 0xff
          val top = p00 * (1.0 - wx) + p01 * wx
          val bot = p10 * (1.0 - wx) + p11 * wx
          val v = Math.round(top * (1.0 - wy) + bot * wy).toInt
          out((y2 * w2 + x2) * 3 + c) = math.max(0, math.min(255, v)).toByte
          c += 1
        }
        x2 += 1
      }
      y2 += 1
    }
    out
  }

  /** Sample-rate conversion for 8-bit mono PCM WAV: nearest-sample
    * pick — output length round(n·newRate/rate) (≥ 1 when n > 0),
    * out[j] = in[(j·n)/newN] (integer floor) — re-encoded at
    * `newRate`. The audio analog of [[nnResizeRgb]]; a windowed-sinc
    * kernel would slot behind the same signature. */
  def resampleWav(bytes: Array[Byte], newRate: Int): Array[Byte] = {
    require(newRate > 0 && newRate <= 1000000,
      "[GRAFT] wav-resample: bad target rate")
    val pcm = decodeWav(bytes)
    require(pcm.bitsPerSample == 8 && pcm.channels == 1,
      "[GRAFT] wav-resample: only 8-bit mono input supported")
    val n = pcm.samples.length
    if (n == 0) return encodeWav(Array.emptyByteArray, newRate)
    val newN = math.max(1L,
      Math.round(n.toDouble * newRate / pcm.sampleRate)).toInt
    val out = new Array[Byte](newN)
    var j = 0
    while (j < newN) {
      out(j) = pcm.samples((j.toLong * n / newN).toInt).toByte
      j += 1
    }
    encodeWav(out, newRate)
  }
}
