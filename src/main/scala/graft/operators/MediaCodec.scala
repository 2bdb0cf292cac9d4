package graft.operators

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** Pure-JVM encoders/decoders for three real container formats —
  * WAV (RIFF PCM), BMP (BITMAPINFOHEADER, 24-bpp) and PPM (P6) — so
  * the multimodal decode path parses genuine headers, chunk layouts,
  * channel orders and row strides instead of a stand-in byte fold.
  * These cover the in-sandbox-verifiable end of the codec spectrum;
  * compressed formats (JPEG/MP3/H.264) slot in behind the same
  * [[Multimodal.decodeStats]] dispatch.
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
    * / truecolor / truecolor+alpha, non-interlaced), and that the
    * inflated stream is exactly (1 + width·bpp)·height bytes. Multiple
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
          require(width > 0 && height > 0 && width <= (1 << 20) &&
            height <= (1 << 20), "[GRAFT] png: bad dimensions")
          val depth = h.get(); val ct = h.get()
          require(depth == 8 && (ct == 0 || ct == 2 || ct == 3 || ct == 6),
            s"[GRAFT] png: only 8-bit grayscale/truecolor/paletted/" +
              s"RGBA supported, got depth=$depth colorType=$ct")
          colorType = ct
          require(h.get() == 0, "[GRAFT] png: bad compression method")
          require(h.get() == 0, "[GRAFT] png: bad filter method")
          require(h.get() == 0,
            "[GRAFT] png: interlaced images unsupported")
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
    val bpp = pngBpp(colorType)
    val stride = width * bpp
    val rawLen = (stride + 1) * height
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
    // un-filter: predictors read RECONSTRUCTED neighbors, mod 256
    val out = new Array[Byte](stride * height)
    var r = 0
    while (r < height) {
      val ft = raw(r * (stride + 1)) & 0xff
      require(ft <= 4, s"[GRAFT] png: unknown filter type $ft")
      var x = 0
      while (x < stride) {
        val f = raw(r * (stride + 1) + 1 + x) & 0xff
        val left = if (x >= bpp) out(r * stride + x - bpp) & 0xff else 0
        val up = if (r > 0) out((r - 1) * stride + x) & 0xff else 0
        val ul = if (r > 0 && x >= bpp)
          out((r - 1) * stride + x - bpp) & 0xff else 0
        val v = ft match {
          case 0 => f
          case 1 => f + left
          case 2 => f + up
          case 3 => f + ((left + up) / 2)
          case _ => f + paeth(left, up, ul)
        }
        out(r * stride + x) = v.toByte
        x += 1
      }
      r += 1
    }
    // paletted: expand indices through PLTE at decode — downstream
    // kernels see plain RGB, exactly like truecolor
    if (colorType == 3) {
      require(plte != null, "[GRAFT] png: paletted image missing PLTE")
      val n = plte.length / 3
      val rgb = new Array[Byte](out.length * 3)
      var i = 0
      while (i < out.length) {
        val idx = out(i) & 0xff
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
    Raster(width, height, order, out)
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
