package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One multimodal asset: an opaque binary payload + typed metadata.
  * Image/audio/video are all carried this way (SURVEY north-star:
  * multimodal columns for training-data pipelines). */
case class MediaRecord(doc_id: Long, media: Array[Byte], format: String,
    n_bytes: Long)

/** Decoded/derived features for one asset. */
case class MediaFeatures(doc_id: Long, format: String, n_bytes: Long,
    feature: Array[Float])

/** One sampled video frame with REAL per-channel statistics from the
  * decoded frame raster (PPM stores RGB, so r/g/b are stored-order
  * channel means in milli). */
case class FrameStats(doc_id: Long, frame_idx: Long, width: Int,
    height: Int, r_milli: Long, g_milli: Long, b_milli: Long)

/** Decoded per-channel statistics for one asset. For audio, `width`
  * and `height` are 0, `n_samples` counts PCM samples and c0/c1/c2
  * are mean/peak/trough in milli (sample ∈ [0,255] → [0,1000]). For
  * rasters, `n_samples` counts pixels and c0/c1/c2 are the R/G/B
  * channel means in milli — channel order NORMALIZED from the
  * format's stored order (BMP stores BGR). */
case class MediaStats(doc_id: Long, format: String, width: Int,
    height: Int, n_samples: Long, c0_milli: Long, c1_milli: Long,
    c2_milli: Long)

/** Multimodal-column plumbing AND a real decode path: binary media
  * columns with typed metadata, a mapPartitions batch kernel, and
  * genuine pure-JVM container parsing via [[MediaCodec]] (WAV RIFF
  * chunk walk, BMP header/stride/BGR/bottom-up, PPM P6 with comment
  * handling, PNG zlib+filters, JPEG — sequential DCT, Huffman, YCbCr
  * 4:4:4/4:2:0, baseline AND progressive decode: the format real
  * web-image corpora are overwhelmingly made of). [[decodeStats]] features are computed
  * from the DECODED samples, and the DuckDB oracle reproduces them
  * from the payload byte arithmetic — so the decode is verified
  * end-to-end, not stubbed.
  *
  * LOSSY audio/video (MP3/H.264) decode is out of scope BY
  * DESIGN, permanently: those specs define the bitstream but not the
  * decoder's arithmetic (conformant float filterbanks disagree in
  * the low bits), so their output can't be oracle-pinned the way
  * every kernel here is. LOSSLESS compressed audio is in: FLAC is
  * integer-exact by specification ([[MediaCodec.decodeFlac]]) and
  * rides the same PCM dispatch as WAV, so speech corpora
  * (LibriSpeech et al.) feed the audio family directly. The contract
  * for lossy corpora is decode-to-PCM/PPM-frames upstream
  * (ffmpeg-class tooling) and feed the deterministic WAV/FLAC /
  * concatenated-P6 paths — which is also the shape a 100 TB pipeline
  * wants, since transcode is a separate embarrassingly-parallel
  * stage. */
object Multimodal {

  /** Raster formats with a registered [[MediaCodec]] parser, in one
    * dispatch — every decode site (stats, features, fingerprint,
    * resize) shares it so a new codec lights up the whole image
    * family at once. */
  private[operators] def decodeRaster(format: String,
      bytes: Array[Byte]): MediaCodec.Raster = format match {
    case "image/bmp" => MediaCodec.decodeBmp(bytes)
    case "image/ppm" => MediaCodec.decodePpm(bytes)
    case "image/png" => MediaCodec.decodePng(bytes)
    case "image/jpeg" => MediaCodec.decodeJpeg(bytes)
    case "image/gif" => MediaCodec.decodeGif(bytes)
    case "image/tiff" => MediaCodec.decodeTiff(bytes)
    case "image/webp" => MediaCodec.decodeWebp(bytes)
    case other => throw new IllegalArgumentException(
      s"[GRAFT] no raster decoder registered for format $other")
  }

  private[operators] val RasterFormats: Set[String] =
    Set("image/bmp", "image/ppm", "image/png", "image/jpeg", "image/gif",
      "image/tiff", "image/webp")

  /** PCM formats with a registered decoder — the audio-family twin
    * of [[RasterFormats]]/[[decodeRaster]]: every audio site (stats,
    * features, energy windows, fingerprint) shares this dispatch, so
    * a new audio codec lights up the whole family at once. Returns
    * the PCM and its CENTER: WAV 8-bit is UNSIGNED around 128; FLAC
    * (all depths) and WAV 16-bit are signed around 0. */
  private[operators] def decodePcmCentered(format: String,
      bytes: Array[Byte]): (MediaCodec.Pcm, Int) = format match {
    case "audio/wav" =>
      val p = MediaCodec.decodeWav(bytes)
      (p, if (p.bitsPerSample == 8) 128 else 0)
    case "audio/flac" => (MediaCodec.decodeFlac(bytes), 0)
    case other => throw new IllegalArgumentException(
      s"[GRAFT] no PCM decoder registered for format $other")
  }

  private[operators] val PcmFormats: Set[String] =
    Set("audio/wav", "audio/flac")

  /** Route an UNLABELED binary column into the media family: sniff
    * each blob's format from its magic bytes
    * ([[graft.functions.MediaSniff]] — the `vfs_media_format`
    * expression, codegen'd) and emit [[MediaRecord]] rows every
    * downstream operator accepts. `onUnknown = "drop"` silently
    * filters unrecognized blobs (the web-crawl stance: most bytes are
    * not media); `"fail"` raises on the first unknown (the curated-
    * ingest stance). One projection + one filter — no shuffle. */
  def withSniffedFormat(df: DataFrame, idCol: String = "doc_id",
      binCol: String = "media",
      onUnknown: String = "drop"): Dataset[MediaRecord] = {
    require(onUnknown == "drop" || onUnknown == "fail",
      s"[GRAFT] withSniffedFormat: onUnknown must be drop|fail, " +
        s"got $onUnknown")
    val spark = df.sparkSession
    import spark.implicits._
    val sniffed = df.select(col(idCol).cast("long").as("doc_id"),
      col(binCol).as("media"),
      graft.functions.vfs_media_format(col(binCol)).as("format"),
      length(col(binCol)).cast("long").as("n_bytes"))
    val routed = if (onUnknown == "drop")
      sniffed.filter(col("format").isNotNull)
    else
      sniffed.withColumn("format",
        coalesce(col("format"), raise_error(concat(
          lit("[GRAFT] withSniffedFormat: unrecognized media for id "),
          col("doc_id").cast("string")))))
    routed.as[MediaRecord]
  }

  /** Build a media table from the documents table: the text payload is
    * UTF-8-encoded as the stand-in binary blob. Every synthesizer
    * [[WorkCols.spread]]s its docs input first: the decode/encode
    * kernels downstream are compute-bound per-partition passes, and a
    * few-file corpus read would otherwise pin them to as few cores
    * (no-op on real many-file corpora — the standing kernel
    * convention). */
  def mediaFromDocs(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    WorkCols.spread(docs)
      .select(col(idCol).cast("long").as("doc_id"),
      encode(col(textCol), "UTF-8").as("media"),
      lit("text/plain").as("format"),
      octet_length(encode(col(textCol), "UTF-8")).cast("long").as("n_bytes"))

  /** Byte-stripe profile for formats WITHOUT a registered parser — a
    * model-free content feature (per-stripe byte mass), not a decode.
    * Formats [[MediaCodec]] understands go through [[decodeStats]]
    * instead. Integer accumulation + ONE final double division keeps
    * the profile bit-reproducible by any engine (a float += loop
    * would depend on f32 rounding at every step). */
  private[operators] def byteStripeProfile(bytes: Array[Byte], dim: Int): Array[Float] = {
    val sums = new Array[Long](dim)
    var i = 0
    while (i < bytes.length) {
      sums(i % dim) += (bytes(i) & 0xff)
      i += 1
    }
    val n = math.max(1, bytes.length / dim)
    sums.map(s => (s / (255.0 * n)).toFloat)
  }

  /** Wrap each document's UTF-8 payload in a REAL media container —
    * round-robin WAV (8-bit mono PCM), BMP (24-bpp, width 4) and PPM
    * (P6) by doc_id % 3 — producing decodable binary media columns
    * without external assets. Raster payloads are truncated to whole
    * 4-pixel rows (12 bytes) and zero-padded up to one row minimum;
    * audio keeps every byte as one sample. The container bytes are
    * bona fide files (a desktop viewer opens them); container sizes
    * and decoded features are therefore header-exact and the DuckDB
    * oracle pins both. */
  def synthesizeMedia(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    WorkCols.spread(docs)
      .select(col(idCol).cast("long").as("doc_id"),
        encode(col(textCol), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          def rasterPayload: Array[Byte] = {
            val m = math.max(12, payload.length - payload.length % 12)
            java.util.Arrays.copyOf(payload, m)
          }
          val (bytes, fmt) = (id % 3) match {
            case 0 => (MediaCodec.encodeWav(payload), "audio/wav")
            case 1 =>
              val p = rasterPayload
              (MediaCodec.encodeBmp(p, 4, p.length / 12), "image/bmp")
            case _ =>
              val p = rasterPayload
              (MediaCodec.encodePpm(p, 4, p.length / 12), "image/ppm")
          }
          MediaRecord(id, bytes, fmt, bytes.length.toLong)
        }
      }
  }

  /** Wrap EVERY document's UTF-8 payload in a real PNG container —
    * the COMPRESSED-raster twin of [[synthesizeMedia]]'s PPM branch
    * (same 4-pixel-wide RGB raster shape, truncated to whole rows and
    * zero-padded up to one row minimum). The encoder cycles all five
    * PNG scanline filters and deflates a genuine zlib stream, so
    * decoding must invert real filters + Inflater to recover the
    * payload — and the DuckDB oracle pins the decoded channel stats
    * from payload arithmetic, proving the round trip end-to-end. */
  def synthesizePng(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): Dataset[MediaRecord] =
    synthRgb(docs, textCol, idCol, capBytes = Int.MaxValue,
      format = "image/png",
      enc = (p, w, h) => MediaCodec.encodePng(p, w, h))

  /** The ONE truecolor-synthesizer body the PNG and TIFF twins
    * share — the "4-wide RGB, 12 bytes/row, whole rows, one-row
    * minimum" geometry contract their shared oracle derivation
    * depends on lives here, once. */
  private def synthRgb(docs: DataFrame, textCol: String,
      idCol: String, capBytes: Int, format: String,
      enc: (Array[Byte], Int, Int) => Array[Byte]): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    WorkCols.spread(docs)
      .select(col(idCol).cast("long").as("doc_id"),
        encode(col(textCol), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          val m = math.min(
            math.max(12, payload.length - payload.length % 12), capBytes)
          val p = java.util.Arrays.copyOf(payload, m)
          val bytes = enc(p, 4, p.length / 12)
          MediaRecord(id, bytes, format, bytes.length.toLong)
        }
      }
  }

  /** TIFF twin of [[synthesizePng]]: the payload bytes become a
    * 4-wide RGB raster (12 bytes/row, whole rows, one-row minimum,
    * capped at 2^20 rows — [[MediaCodec.decodeTiff]]'s own dimension
    * guard; the oracle truncates identically) in a real little-endian
    * baseline TIFF. With `packBits = true` the strips are
    * PackBits-compressed AND split at 2 rows per strip, so the row
    * only hash-matches if the IFD walk, the multi-strip geometry,
    * and the run-length codec all round-trip byte-exactly. */
  def synthesizeTiff(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id",
      packBits: Boolean = false): Dataset[MediaRecord] =
    synthRgb(docs, textCol, idCol, capBytes = 12 * (1 << 20),
      format = "image/tiff",
      enc = (p, w, h) => MediaCodec.encodeTiff(p, w, h, channels = 3,
        packBits = packBits, rowsPerStrip = if (packBits) 2 else 0))

  /** WebP (VP8L lossless) twin of [[synthesizePng]]: the same 4-wide
    * RGB geometry in a real RIFF + VP8L container — decoding walks
    * the chunk layout, the LSB-first bitstream, the code-length
    * machinery, and the canonical prefix codes. Capped at the
    * format's 14-bit dimension fields (16384 rows; the oracle
    * mirrors the cap). */
  def synthesizeWebp(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): Dataset[MediaRecord] =
    synthRgb(docs, textCol, idCol, capBytes = 12 * 16384,
      format = "image/webp",
      enc = (p, w, h) => MediaCodec.encodeWebpLossless(p, w, h))

  /** FLAC twin of [[synthesizeMedia]]'s WAV branch: every payload
    * byte becomes one 16-bit sample with VALUE 0..255 (so the stats
    * oracle shares the WAV byte arithmetic), framed at a small block
    * size so multi-frame files are routine — per block the encoder
    * picks constant / verbatim / fixed-order-2 + Rice, exercising
    * the subframe family at corpus scale. */
  def synthesizeFlac(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id",
      blockSize: Int = 256): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    WorkCols.spread(docs)
      .select(col(idCol).cast("long").as("doc_id"),
        encode(col(textCol), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          val samples = payload.map(b => b & 0xff)
          val bytes = MediaCodec.encodeFlac(samples,
            bitsPerSample = 16, blockSize = blockSize)
          MediaRecord(id, bytes, "audio/flac", bytes.length.toLong)
        }
      }
  }

  /** Camera-rotated twin of [[synthesizeTiff]] for EXIF-orientation
    * testing: each doc's UPRIGHT 4-wide raster is transformed by the
    * INVERSE of its per-doc orientation k = (doc_id % 8) + 1, and the
    * TIFF carries tag 274 = k — so an exif-aware reader that uprights
    * the stored pixels recovers exactly the [[synthesizeTiff]] image
    * (and an exif-blind one does not, for k ∉ {1, 2}: 2 flips
    * horizontally, which a width-4 constant-geometry dHash may or may
    * not distinguish, but 5–8 swap the axes outright). Orientations
    * 6 and 8 (rotate 90/270) are mutual inverses; the other six are
    * self-inverse. */
  def synthesizeTiffRotated(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    WorkCols.spread(docs)
      .select(col(idCol).cast("long").as("doc_id"),
        encode(col(textCol), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          val m = math.min(
            math.max(12, payload.length - payload.length % 12),
            12 * (1 << 20))
          val p = java.util.Arrays.copyOf(payload, m)
          val k = (id % 8).toInt + 1
          val inv = k match { case 6 => 8; case 8 => 6; case o => o }
          val stored = MediaCodec.orientRgb(p, 4, p.length / 12, inv)
          val bytes = MediaCodec.encodeTiff(stored.pixels, stored.width,
            stored.height, channels = 3, orientation = k)
          MediaRecord(id, bytes, "image/tiff", bytes.length.toLong)
        }
      }
  }

  /** 8-bit GRAYSCALE (color type 0) twin of [[synthesizePng]]: the
    * payload is one luma byte per pixel on a 4-wide raster (4 bytes
    * per row), truncated to whole rows and zero-padded up to one row
    * minimum. Decoding replicates luma into R=G=B via
    * [[MediaCodec.toRgb]], so the oracle pins all three channel means
    * to the same payload mean. */
  def synthesizePngGray(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    WorkCols.spread(docs)
      .select(col(idCol).cast("long").as("doc_id"),
        encode(col(textCol), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          val m = math.max(4, payload.length - payload.length % 4)
          val p = java.util.Arrays.copyOf(payload, m)
          val bytes = MediaCodec.encodePngGray(p, 4, p.length / 4)
          MediaRecord(id, bytes, "image/png", bytes.length.toLong)
        }
      }
  }

  /** 8-bit RGBA (color type 6) twin of [[synthesizePng]]: the
    * payload is R,G,B,A bytes per pixel on a 4-wide raster (16 bytes
    * per row), truncated to whole rows and zero-padded up to one row
    * minimum. The payload's every 4th byte BECOMES the alpha lane, so
    * decode stats only match the oracle if [[MediaCodec.toRgb]]'s
    * integer alpha-composite over white is reproduced exactly. */
  def synthesizePngRgba(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    WorkCols.spread(docs)
      .select(col(idCol).cast("long").as("doc_id"),
        encode(col(textCol), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          val m = math.max(16, payload.length - payload.length % 16)
          val p = java.util.Arrays.copyOf(payload, m)
          val bytes = MediaCodec.encodePngRgba(p, 4, p.length / 16)
          MediaRecord(id, bytes, "image/png", bytes.length.toLong)
        }
      }
  }

  /** PALETTED (color type 3) twin of [[synthesizePng]]: the payload
    * bytes become palette INDICES on a 4-wide raster (4 bytes/row,
    * truncated to whole rows, zero-padded to one row minimum) against
    * a deterministic 256-entry palette — entry i is
    * ((i·7) mod 256, (i·13) mod 256, (i·29) mod 256) — so the oracle
    * can recompute the decoded RGB channel means from the raw bytes
    * with pure modular arithmetic. Round-trip proves the PLTE chunk,
    * the 1-byte-per-pixel filter stride, and the index→RGB expansion
    * are all exact. */
  def synthesizePngPaletted(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): Dataset[MediaRecord] =
    synthPaletted(docs, textCol, idCol, capBytes = Int.MaxValue,
      format = "image/png",
      enc = (p, w, h) => MediaCodec.encodePngPaletted(p, w, h,
        SynthPalette))

  /** The ONE paletted-synthesizer body the PNG and GIF twins share —
    * the "4-wide, whole rows, one-row minimum" geometry contract the
    * shared oracle derivation depends on lives here, once. */
  private def synthPaletted(docs: DataFrame, textCol: String,
      idCol: String, capBytes: Int, format: String,
      enc: (Array[Byte], Int, Int) => Array[Byte]): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    WorkCols.spread(docs)
      .select(col(idCol).cast("long").as("doc_id"),
        encode(col(textCol), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          val m = math.min(
            math.max(4, payload.length - payload.length % 4), capBytes)
          val p = java.util.Arrays.copyOf(payload, m)
          val bytes = enc(p, 4, p.length / 4)
          MediaRecord(id, bytes, format, bytes.length.toLong)
        }
      }
  }

  /** The deterministic 256-entry palette shared by the paletted PNG
    * and GIF synthesizers — entry i is ((i·7) mod 256, (i·13) mod
    * 256, (i·29) mod 256), so an oracle recomputes decoded RGB from
    * raw index bytes with pure modular arithmetic. */
  private[operators] val SynthPalette: Array[Byte] =
    Array.tabulate(768) { j =>
      val i = j / 3
      (j % 3 match {
        case 0 => i * 7 % 256
        case 1 => i * 13 % 256
        case _ => i * 29 % 256
      }).toByte
    }

  /** GIF twin of [[synthesizePngPaletted]]: the payload bytes become
    * palette indices on a 4-wide GIF89a raster (4 bytes/row, truncated
    * to whole rows, zero-padded to one row minimum, capped at 65535
    * rows — the format's 16-bit height field; the oracle truncates
    * identically) against [[SynthPalette]] — SAME geometry and palette
    * formula, so the two formats share one oracle derivation.
    * `interlaced = true` stores rows in the 4-pass order (means are
    * row-order-invariant, so the de-interlace inversion is pinned by
    * exact-pixel specs, not the stats oracle). Round-trip proves the
    * logical-screen header, the global color table, LZW, and the
    * index→RGB expansion are exact. */
  def synthesizeGif(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id",
      interlaced: Boolean = false): Dataset[MediaRecord] =
    synthPaletted(docs, textCol, idCol, capBytes = 4 * 0xffff,
      format = "image/gif",
      enc = (p, w, h) => MediaCodec.encodeGif(p, w, h, SynthPalette,
        interlaced))

  /** Animated-GIF twin of [[synthesizeVideo]]: the payload zero-padded
    * to whole 4×`frameRows` index frames (≥ 1 frame), each frame a
    * full-canvas image against [[SynthPalette]], disposal 1 (keep).
    * Because every frame covers the whole canvas with no transparency,
    * the composited frame k a player (and [[MediaCodec.decodeGifFrames]])
    * shows is exactly frame k's palette-mapped pixels — so the frames
    * oracle reads each frame's channel means straight off the payload
    * slice with the palette's modular arithmetic. */
  def synthesizeGifAnimated(docs: DataFrame, frameRows: Int = 2,
      textCol: String = "text",
      idCol: String = "doc_id"): Dataset[MediaRecord] = {
    require(frameRows > 0 && frameRows <= 0xffff,
      "[GRAFT] gif: frameRows must fit the 16-bit height field (1..65535)")
    val frameBytes = 4 * frameRows
    val spark = docs.sparkSession
    import spark.implicits._
    WorkCols.spread(docs)
      .select(col(idCol).cast("long").as("doc_id"),
        encode(col(textCol), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          val nFrames = math.max(1L,
            (payload.length.toLong + frameBytes - 1) / frameBytes).toInt
          val p = java.util.Arrays.copyOf(payload, nFrames * frameBytes)
          val frames = Seq.tabulate(nFrames) { f =>
            java.util.Arrays.copyOfRange(p, f * frameBytes,
              (f + 1) * frameBytes)
          }
          val bytes = MediaCodec.encodeGifAnimated(frames, 4, frameRows,
            SynthPalette)
          MediaRecord(id, bytes, "video/gif", bytes.length.toLong)
        }
      }
  }

  /** Wrap each document in a REAL baseline JPEG — grayscale, one
    * CONSTANT 8×8 block per payload byte (width 8, height 8·len,
    * min one block, capped at 8191 blocks so the height fits the
    * format's 16-bit SOF field) at flat quantizer 8. Constant blocks make the
    * lossy codec EXACT here (DC = 8·(c−128) quantizes losslessly at
    * q = 8; every AC is 0), so the decoded pixels equal the payload
    * bytes and the DuckDB oracle pins the channel stats from payload
    * arithmetic — Huffman coding, the marker walk, DC prediction and
    * the IDCT must all round-trip byte-exactly for the row to
    * hash-match. */
  def synthesizeJpeg(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    WorkCols.spread(docs)
      .select(col(idCol).cast("long").as("doc_id"),
        encode(col(textCol), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          // cap at 8191 blocks: height 8·m must fit the format's
          // 16-bit SOF field (the oracle truncates identically)
          val m = math.min(math.max(1, payload.length), 8191)
          val luma = new Array[Byte](64 * m)
          var i = 0
          while (i < m) {
            val c = if (i < payload.length) payload(i) else 0: Byte
            java.util.Arrays.fill(luma, 64 * i, 64 * (i + 1), c)
            i += 1
          }
          val bytes = MediaCodec.encodeJpegGray(luma, 8, 8 * m)
          MediaRecord(id, bytes, "image/jpeg", bytes.length.toLong)
        }
      }
  }

  /** COLOR (4:4:4) twin of [[synthesizeJpeg]]: every 3 payload bytes
    * become one constant-(r,g,b) 8×8 block (width 8, height
    * 8·(len div 3), min one block, zero-padded, capped at 8191
    * blocks — the 16-bit SOF field). Constant blocks keep
    * the DCT exact, but color rides the JFIF RGB→YCbCr→RGB integer
    * chain, so the decoded channels equal
    * [[MediaCodec.yccToRgb]]([[MediaCodec.rgbToYcc]](r,g,b)) — the
    * oracle reproduces exactly that pinned floor(x+0.5) double chain
    * per 3-byte group. */
  def synthesizeJpegColor(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): Dataset[MediaRecord] =
    synthesizeJpegRgb(docs, textCol, idCol, subsample = false)

  /** 4:2:0 twin of [[synthesizeJpegColor]]: every 3 payload bytes
    * become one constant-(r,g,b) 16×16 MACROBLOCK (4 luma blocks +
    * one 2×2-box-averaged chroma block each — averaging a constant is
    * exact, so subsampling and replication upsampling round-trip
    * exactly). Width 16, height 16·(len div 3), min one macroblock,
    * capped at 4095 macroblocks — the 16-bit SOF field. */
  def synthesizeJpeg420(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): Dataset[MediaRecord] =
    synthesizeJpegRgb(docs, textCol, idCol, subsample = true)

  private def synthesizeJpegRgb(docs: DataFrame, textCol: String,
      idCol: String, subsample: Boolean): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val side = if (subsample) 16 else 8
    WorkCols.spread(docs)
      .select(col(idCol).cast("long").as("doc_id"),
        encode(col(textCol), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          val m3 = math.max(3, payload.length - payload.length % 3)
          // cap blocks: height side·nb must fit the 16-bit SOF field
          // (8191 at side 8, 4095 at side 16; oracle mirrors)
          val nb = math.min(m3 / 3, 65535 / side)
          val p = java.util.Arrays.copyOf(payload, 3 * nb)
          val px = new Array[Byte](side * side * 3 * nb)
          var i = 0
          while (i < nb) {
            val base = side * side * 3 * i
            var j = 0
            while (j < side * side) {
              px(base + 3 * j) = p(3 * i)
              px(base + 3 * j + 1) = p(3 * i + 1)
              px(base + 3 * j + 2) = p(3 * i + 2)
              j += 1
            }
            i += 1
          }
          val bytes = MediaCodec.encodeJpeg(px, side, side * nb,
            subsample = subsample)
          MediaRecord(id, bytes, "image/jpeg", bytes.length.toLong)
        }
      }
  }

  private def meanMilli(sum: Long, cnt: Long): Long =
    if (cnt == 0) 0L else math.round(sum * 1000.0 / (255.0 * cnt))

  /** REAL batch decode: dispatch on format, parse the container with
    * [[MediaCodec]], and compute per-channel statistics from the
    * decoded samples. One JVM-side loop per partition (the Scala
    * analog of a mapInPandas batch kernel) — constant memory, no
    * per-row closure dispatch. */
  def decodeStats(spark: SparkSession, media: Dataset[MediaRecord]): Dataset[MediaStats] = {
    import spark.implicits._
    media.mapPartitions(it => it.map(decodeStatsOne))
  }

  /** The per-record [[decodeStats]] body — shared by the strict path
    * and [[decodeStatsQuarantined]] so the two can never drift. */
  private def decodeStatsOne(r: MediaRecord): MediaStats =
    r.format match {
      case f if PcmFormats(f) =>
        val pcm = decodePcmCentered(f, r.media)._1
        var sum = 0L; var mx = Long.MinValue; var mn = Long.MaxValue
        pcm.samples.foreach { s =>
          sum += s; if (s > mx) mx = s; if (s < mn) mn = s
        }
        val n = pcm.samples.length.toLong
        MediaStats(r.doc_id, r.format, 0, 0, n,
          meanMilli(sum, n),
          if (n == 0) 0L else meanMilli(mx * n, n),
          if (n == 0) 0L else meanMilli(mn * n, n))
      case f if RasterFormats(f) =>
        val ras = decodeRaster(f, r.media)
        // normalize to RGB first: swaps BGR, replicates GRAY,
        // alpha-composites RGBA over white (stats are then
        // alpha-aware — transparent pixels read as background)
        val rgb = MediaCodec.toRgb(ras)
        val sums = new Array[Long](3)
        var i = 0
        while (i < rgb.pixels.length) {
          sums(i % 3) += (rgb.pixels(i) & 0xff)
          i += 1
        }
        val px = (ras.width.toLong * ras.height)
        MediaStats(r.doc_id, r.format, ras.width, ras.height, px,
          meanMilli(sums(0), px), meanMilli(sums(1), px),
          meanMilli(sums(2), px))
      case other => throw new IllegalArgumentException(
        s"[GRAFT] no decoder registered for format $other")
    }

  /** [[decodeStats]] with per-asset DECODE QUARANTINE — the
    * untrusted-crawl stance: at web scale a sniff-valid,
    * body-corrupt asset is routine, and the strict kernel's
    * loud-error discipline (right for fixtures) would fail the whole
    * stage on ONE truncated file. Each record decodes under its own
    * Try; a failure emits (doc_id, format, nulls…, err) instead of
    * killing the task, so a 100 TB decode job ships its survivors
    * and a greppable quarantine list in one pass. `err` is null for
    * clean rows — split with `filter(col("err").isNull)`. The
    * per-record body is [[decodeStats]]'s own, so clean-row output
    * is bit-identical to the strict kernel's. */
  def decodeStatsQuarantined(spark: SparkSession,
      media: Dataset[MediaRecord]): DataFrame = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        try {
          val s = decodeStatsOne(r)
          (r.doc_id, r.format, Some(s.width), Some(s.height),
            Some(s.n_samples), Some(s.c0_milli), Some(s.c1_milli),
            Some(s.c2_milli), Option.empty[String])
        } catch { case scala.util.control.NonFatal(e) =>
          (r.doc_id, r.format, Option.empty[Int], Option.empty[Int],
            Option.empty[Long], Option.empty[Long], Option.empty[Long],
            Option.empty[Long], Some(graft.Verify.errHead(e)))
        }
      }
    }.toDF("doc_id", "format", "width", "height", "n_samples",
      "c0_milli", "c1_milli", "c2_milli", "err")
  }

  /** Fixed-dim feature vector per asset — real-decode formats get a
    * [[lerpResample]]d profile of their DECODED sample stream
    * (normalized to [0,1]); unregistered formats fall back to the
    * [[byteStripeProfile]] content feature. Batch kernel shape: one
    * JVM-side loop per partition, no per-row closure dispatch,
    * constant memory. */
  def extractFeatures(spark: SparkSession, media: DataFrame,
      dim: Int = 8): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("doc_id"), col("media"), col("format"), col("n_bytes"))
      .as[MediaRecord]
      .mapPartitions { it =>
        it.map { r =>
          val feature = r.format match {
            case f if PcmFormats(f) =>
              val pcm = decodePcmCentered(f, r.media)._1
              val denom = if (pcm.bitsPerSample == 8) 255.0f else 32767.0f
              lerpResample(pcm.samples.map(_ / denom), dim)
            case f if RasterFormats(f) =>
              val ras = decodeRaster(f, r.media)
              lerpResample(ras.pixels.map(b => (b & 0xff) / 255.0f), dim)
            case _ => byteStripeProfile(r.media, dim)
          }
          MediaFeatures(r.doc_id, r.format, r.n_bytes, feature)
        }
      }
  }

  /** Wrap each document's UTF-8 payload in a REAL multi-frame video
    * container: a concatenated-P6 PPM stream (the `ffmpeg -f
    * image2pipe` ppm video format — whole P6 files laid back to
    * back). Each frame is a 4-wide RGB raster of `frameRows` rows
    * (12·frameRows payload bytes); the payload is zero-padded up to
    * whole frames, minimum one frame. Every frame carries its own
    * ASCII header, so frame extraction requires genuine sequential
    * container parsing, not fixed-stride slicing. */
  def synthesizeVideo(docs: DataFrame, frameRows: Int = 2,
      textCol: String = "text", idCol: String = "doc_id"): Dataset[MediaRecord] = {
    require(frameRows > 0 && frameRows <= (1 << 20),
      "[GRAFT] video: bad frameRows")
    val frameBytes = 12 * frameRows
    val spark = docs.sparkSession
    import spark.implicits._
    WorkCols.spread(docs)
      .select(col(idCol).cast("long").as("doc_id"),
        encode(col(textCol), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          val nFrames = math.max(1L,
            (payload.length.toLong + frameBytes - 1) / frameBytes).toInt
          val p = java.util.Arrays.copyOf(payload, nFrames * frameBytes)
          val out = new java.io.ByteArrayOutputStream()
          var f = 0
          while (f < nFrames) {
            out.write(MediaCodec.encodePpm(
              java.util.Arrays.copyOfRange(p, f * frameBytes,
                (f + 1) * frameBytes), 4, frameRows))
            f += 1
          }
          val bytes = out.toByteArray
          MediaRecord(id, bytes, "video/ppm-stream", bytes.length.toLong)
        }
      }
  }

  /** REAL frame sampling: walk the container frame by frame —
    * concatenated-P6 streams via [[MediaCodec.decodePpmAt]] (each
    * frame's own header is parsed, a truncated or corrupt stream
    * throws) and animated GIF via [[MediaCodec.decodeGifFrames]]
    * (LZW + compositing, each frame a full-canvas raster) — keep
    * every `everyN`-th frame, and emit its decoded per-channel
    * means. The 1→N batch kernel shape: one JVM loop per partition,
    * output rows ∝ frames kept. */
  def sampleFrames(spark: SparkSession, media: Dataset[MediaRecord],
      everyN: Int = 4,
      maxGifPixels: Long = 1L << 26): Dataset[FrameStats] = {
    require(everyN > 0, "[GRAFT] sampleFrames: everyN must be positive")
    import spark.implicits._
    media.mapPartitions { it =>
      it.flatMap { r =>
        val decoded = r.format match {
          case "video/ppm-stream" => MediaCodec.decodePpmStream(r.media)
          // "image/gif" too: the sniffer labels EVERY GIF image/gif
          // (magic bytes can't see frame count), so sniffed crawl
          // data must reach frame sampling without relabeling — a
          // single-frame GIF just yields one frame here.
          // `maxGifPixels` passes the animation memory cap through
          // (default = the untrusted-crawl bound; raise for trusted
          // corpora with large canvases)
          case "video/gif" | "image/gif" =>
            MediaCodec.decodeGifFrames(r.media, maxGifPixels)
          case other => throw new IllegalArgumentException(
            s"[GRAFT] sampleFrames: no frame decoder for format $other")
        }
        decoded.zipWithIndex.collect {
          case (ras, f) if f % everyN == 0 =>
            val sums = new Array[Long](3)
            var i = 0
            while (i < ras.pixels.length) {
              sums(i % 3) += (ras.pixels(i) & 0xff)
              i += 1
            }
            val px = ras.width.toLong * ras.height
            FrameStats(r.doc_id, f.toLong, ras.width, ras.height,
              meanMilli(sums(0), px), meanMilli(sums(1), px),
              meanMilli(sums(2), px))
        }
      }
    }
  }

  /** Windowed audio ENERGY/PEAK extraction — the DSP-lite feature
    * pass of an audio-curation pipeline (silence trimming, clipping
    * detection, loudness bucketing all key off it): decode the WAV
    * container, center the PCM samples (8-bit unsigned centers at
    * 128; 16-bit is already signed), and fold each window of
    * `window` samples to `energy` = Σ centered² and `peak` =
    * max |centered| — EXACT integer arithmetic, so the DuckDB oracle
    * reproduces every value from payload bytes. The trailing partial
    * window is emitted with its true `n_samples` (callers decide
    * whether to keep it). Per-partition kernel over the asset bytes —
    * zero shuffle, the [[sampleFrames]] 100 TB shape. Non-WAV assets
    * fail loudly (same stance as [[sampleFrames]]). */
  def audioEnergyWindows(spark: SparkSession, media: Dataset[MediaRecord],
      window: Int = 64): DataFrame = {
    require(window > 0, "[GRAFT] audioEnergyWindows: window must be positive")
    import spark.implicits._
    media.mapPartitions { it =>
      it.flatMap { r =>
        require(PcmFormats(r.format),
          s"[GRAFT] audioEnergyWindows: not a PCM asset: ${r.format}")
        val (pcm, center) = decodePcmCentered(r.format, r.media)
        pcm.samples.grouped(window).zipWithIndex.map { case (w, i) =>
          var e = 0L
          var p = 0L
          var j = 0
          while (j < w.length) {
            val c = (w(j) - center).toLong
            e += c * c
            if (math.abs(c) > p) p = math.abs(c)
            j += 1
          }
          (r.doc_id, i.toLong, w.length.toLong, e, p)
        }
      }
    }.toDF("doc_id", "win", "n_samples", "energy", "peak")
  }

  /** Per-asset 64-bit audio fingerprint from the energy-delta SIGNS
    * of the [[audioEnergyWindows]] sequence — the audio twin of
    * [[Dedup.simHash64]]'s text signature (cf. Haitsma & Kalker's
    * sign-of-difference audio fingerprints, re-derived over window
    * energy instead of per-band spectral energy): bit j (0 ≤ j < 63)
    * is set iff energy(window j+1) > energy(window j), windows of
    * `window` samples each. The signature covers the first 64
    * windows (63 deltas — bit 63 stays clear, keeping the LONG
    * non-negative and the DuckDB oracle's `<<` fold overflow-free);
    * a longer `window` widens the fingerprinted prefix. EXACT
    * integer arithmetic end-to-end (decode → center → Σc² → compare)
    * so the oracle reproduces every bit from payload bytes. Assets
    * with zero samples are omitted (no windows → no fingerprint).
    * Per-partition kernel, zero shuffle. Output: (doc_id, sig,
    * n_windows). */
  def audioFingerprint(spark: SparkSession, media: Dataset[MediaRecord],
      window: Int = 64): DataFrame = {
    require(window > 0, "[GRAFT] audioFingerprint: window must be positive")
    import spark.implicits._
    media.mapPartitions { it =>
      it.flatMap { r =>
        audioFingerprintOne(r, window).map { case (sig, nw) =>
          (r.doc_id, sig, nw)
        }
      }
    }.toDF("doc_id", "sig", "n_windows")
  }

  /** The per-record audio-fingerprint body [[audioFingerprint]] and
    * its quarantined twin share — clean output stays bit-identical
    * between the two. None = a zero-sample asset (no print row, the
    * omit-zero-sample stance). */
  private def audioFingerprintOne(r: MediaRecord,
      window: Int): Option[(Long, Long)] = {
    require(PcmFormats(r.format),
      s"[GRAFT] audioFingerprint: not a PCM asset: ${r.format}")
    val (pcm, center) = decodePcmCentered(r.format, r.media)
    val energies = pcm.samples.grouped(window).map { w =>
      var e = 0L
      var j = 0
      while (j < w.length) {
        val c = (w(j) - center).toLong
        e += c * c
        j += 1
      }
      e
    }.toArray
    if (energies.isEmpty) None
    else Some((deltaSignSig(energies), energies.length.toLong))
  }

  /** [[audioFingerprint]] with per-asset decode QUARANTINE — the
    * [[decodeStatsQuarantined]] stance for the audio print path: a
    * body-corrupt asset (truncated FLAC, damaged RIFF) emits
    * (doc_id, nulls…, err) instead of failing the stage. Clean rows
    * are bit-identical to the strict kernel's (shared per-record
    * body); zero-sample clean assets still emit NO row, matching the
    * strict path. Split with `filter(col("err").isNull)`. */
  def audioFingerprintQuarantined(spark: SparkSession,
      media: Dataset[MediaRecord], window: Int = 64): DataFrame = {
    require(window > 0, "[GRAFT] audioFingerprint: window must be positive")
    import spark.implicits._
    media.mapPartitions { it =>
      it.flatMap { r =>
        try audioFingerprintOne(r, window).map { case (sig, nw) =>
          (r.doc_id, Some(sig), Some(nw), Option.empty[String])
        }
        catch { case scala.util.control.NonFatal(e) =>
          Some((r.doc_id, Option.empty[Long], Option.empty[Long],
            Some(graft.Verify.errHead(e))))
        }
      }
    }.toDF("doc_id", "sig", "n_windows", "err")
  }

  /** Sign-of-delta 63-bit signature over a value sequence — the ONE
    * fold both media fingerprints share ([[audioFingerprint]] over
    * window energies, [[videoFingerprint]] over frame intensities),
    * so the two oracles reproduce the same bit semantics by
    * construction: bit j (0 ≤ j < 63) set iff v(j+1) > v(j)
    * (strict), bit 63 always clear (LONG non-negative). */
  private def deltaSignSig(vs: Array[Long]): Long = {
    var sig = 0L
    val nBits = math.min(vs.length - 1, 63)
    var j = 0
    while (j < nBits) {
      if (vs(j + 1) > vs(j)) sig |= (1L << j)
      j += 1
    }
    sig
  }

  /** Audio near-dup pairs with fingerprint hamming ≤ `maxHamming` —
    * [[Dedup.simHashPairs]]' audio twin, and the same 100 TB shape:
    * the per-partition [[audioFingerprint]] kernel collapses each
    * asset to 8 bytes BEFORE anything shuffles, then the shared
    * 4×16-bit band fold ([[Dedup.sigBandFoldPairs]]: one pinned slim
    * shuffle + streaming O(maxBucket) bucket fold) emits candidate
    * pairs with the hamming computed inline. No false negatives for
    * maxHamming ≤ 3 (pigeonhole), no false positives (inline
    * filter), subject to the documented `maxBucket` drop on
    * pathological corpora (identical silence/boilerplate audio —
    * surfaced by exact dedup instead). Output: (a, b, hamming). */
  def audioNearDupPairs(spark: SparkSession, media: Dataset[MediaRecord],
      maxHamming: Int = 3, window: Int = 64,
      maxBucket: Int = 1000): DataFrame =
    Dedup.sigBandFoldPairs(
      audioFingerprint(spark, media, window)
        .select(col("doc_id").as("id"), col("sig")),
      maxHamming, maxBucket)

  /** Per-asset 64-bit VIDEO fingerprint from the frame-intensity
    * delta SIGNS of the PPM-stream frame sequence — the TEMPORAL
    * twin of [[audioFingerprint]] (the same sign-of-difference idea
    * over per-frame total intensity instead of per-window energy —
    * the ordinal-measure family of temporal video fingerprints):
    * each frame is parsed by the real container walk
    * ([[MediaCodec.decodePpmStream]] — per-frame headers, a corrupt
    * stream throws) and folds to Σ of its pixel bytes; bit j
    * (0 ≤ j < 63) is set iff intensity(frame j+1) > intensity(frame
    * j). Bit 63 stays clear (LONG non-negative, the
    * [[audioFingerprint]] oracle-portability stance) and the print
    * covers the first 64 frames. EXACT integer arithmetic
    * end-to-end, so the DuckDB oracle reproduces every bit from
    * payload bytes. A valid stream always has ≥ 1 frame (a 1-frame
    * asset prints sig 0 with n_frames 1). Per-partition kernel, zero
    * shuffle. Output: (doc_id, sig, n_frames). */
  def videoFingerprint(spark: SparkSession,
      media: Dataset[MediaRecord],
      maxGifPixels: Long = 1L << 26): DataFrame = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val (sig, n) = videoFingerprintOne(r, maxGifPixels)
        (r.doc_id, sig, n)
      }
    }.toDF("doc_id", "sig", "n_frames")
  }

  /** The per-record video-fingerprint body [[videoFingerprint]] and
    * its quarantined twin share — clean output stays bit-identical
    * between the two. */
  private def videoFingerprintOne(r: MediaRecord,
      maxGifPixels: Long): (Long, Long) = {
    val decoded = r.format match {
      case "video/ppm-stream" => MediaCodec.decodePpmStream(r.media)
      // sniffed GIFs carry "image/gif" (see sampleFrames) — a
      // 1-frame GIF prints sig 0 with n_frames 1, same as a
      // 1-frame ppm-stream; maxGifPixels passes the animation
      // memory cap through
      case "video/gif" | "image/gif" =>
        MediaCodec.decodeGifFrames(r.media, maxGifPixels)
      case other => throw new IllegalArgumentException(
        s"[GRAFT] videoFingerprint: no frame decoder for " +
          s"format $other")
    }
    val sums = decoded.map { ras =>
      var s = 0L
      var i = 0
      while (i < ras.pixels.length) {
        s += (ras.pixels(i) & 0xff)
        i += 1
      }
      s
    }.toArray
    (deltaSignSig(sums), sums.length.toLong)
  }

  /** [[videoFingerprint]] with per-asset decode QUARANTINE — the
    * [[decodeStatsQuarantined]] stance for the video print path: a
    * container-corrupt stream (truncated frame, damaged header)
    * emits (doc_id, nulls…, err) instead of failing the stage; clean
    * rows are bit-identical to the strict kernel's. */
  def videoFingerprintQuarantined(spark: SparkSession,
      media: Dataset[MediaRecord],
      maxGifPixels: Long = 1L << 26): DataFrame = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        try {
          val (sig, n) = videoFingerprintOne(r, maxGifPixels)
          (r.doc_id, Some(sig), Some(n), Option.empty[String])
        } catch { case scala.util.control.NonFatal(e) =>
          (r.doc_id, Option.empty[Long], Option.empty[Long],
            Some(graft.Verify.errHead(e)))
        }
      }
    }.toDF("doc_id", "sig", "n_frames", "err")
  }

  /** Per-asset 64-bit IMAGE perceptual fingerprint — dHash (the
    * difference-hash of the perceptual-hash family: gradient
    * direction survives re-encode/resize/brightness shifts), closing
    * the one modality without a near-dup fingerprint (text simhash /
    * embedding LSH / audio energy-delta / video frame-intensity):
    * decode the real container ([[MediaCodec.decodeBmp]]/Ppm/Png
    * dispatch), normalize stored channel order to RGB
    * ([[MediaCodec.toRgb]] — BGR swap, GRAY replicate, RGBA composite
    * over white), downsample with the REAL resize kernel
    * ([[MediaCodec.nnResizeRgb]] to 9×8 — NN commutes with the
    * per-pixel luma, so resize-then-gray is exact), take integer
    * BT.601 luma per cell (gray = (299·r + 587·g + 114·b) div 1000),
    * and set bit j (0 ≤ j < 63, j = y·8 + x) iff
    * gray(y, x+1) > gray(y, x) — each row's 9 cells yield 8
    * horizontal deltas. The 64th delta (row 7, delta 7) is dropped to
    * keep bit 63 clear ([[audioFingerprint]]'s LONG-non-negative
    * oracle-portability stance). EXACT integer arithmetic end-to-end
    * (decode → RGB → NN index → luma → compare), so the DuckDB oracle
    * reproduces every bit from payload bytes. Per-partition kernel,
    * zero shuffle; media bytes collapse to 8 bytes before anything
    * shuffles. Output: (doc_id, sig, width, height).
    *
    * `exifAware = true` additionally reads the orientation tag — a
    * JPEG's APP1/Exif ([[MediaCodec.jpegOrientation]]) or a TIFF's
    * native tag 274 ([[MediaCodec.tiffOrientation]]) — and uprights
    * the raster ([[MediaCodec.orientRgb]]) BEFORE hashing: a
    * rotated-capture duplicate (same pixels, orientation tag 6)
    * otherwise evades dHash entirely. Formats without an orientation
    * tag pass through; the reported width/height are
    * post-uprighting. */
  def imageFingerprint(spark: SparkSession,
      media: Dataset[MediaRecord],
      exifAware: Boolean = false): DataFrame = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val (sig, w, h) = imageFingerprintOne(r, exifAware)
        (r.doc_id, sig, w, h)
      }
    }.toDF("doc_id", "sig", "width", "height")
  }

  /** Decode + RGB-normalize + (optionally) EXIF-upright — the shared
    * prelude of every image fingerprint kernel. */
  private def decodeOrientedRgb(r: MediaRecord,
      exifAware: Boolean): MediaCodec.Raster = {
    val ras0 = decodeRaster(r.format, r.media)
    val rgb0 = MediaCodec.toRgb(ras0)
    val orientation =
      if (!exifAware) 1
      else r.format match {
        case "image/jpeg" => MediaCodec.jpegOrientation(r.media)
        case "image/tiff" => MediaCodec.tiffOrientation(r.media)
        case _ => 1
      }
    MediaCodec.orientRgb(rgb0.pixels, rgb0.width, rgb0.height,
      orientation)
  }

  /** The per-record dHash body — shared by the strict path and
    * [[imageFingerprintQuarantined]] so the two can never drift.
    * Returns (sig, orientedWidth, orientedHeight). */
  private def imageFingerprintOne(r: MediaRecord,
      exifAware: Boolean): (Long, Int, Int) = {
    val rgb = decodeOrientedRgb(r, exifAware)
    val small = MediaCodec.nnResizeRgb(rgb.pixels, rgb.width,
      rgb.height, 9, 8)
    val gray = new Array[Int](72)
    var i = 0
    while (i < 72) {
      gray(i) = (299 * (small(3 * i) & 0xff) +
        587 * (small(3 * i + 1) & 0xff) +
        114 * (small(3 * i + 2) & 0xff)) / 1000
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 63) {
      val y = j / 8
      val x = j % 8
      if (gray(y * 9 + x + 1) > gray(y * 9 + x)) sig |= (1L << j)
      j += 1
    }
    (sig, rgb.width, rgb.height)
  }

  /** Fixed-point cosine table for the pHash DCT:
    * C(u, x) = round(cos((2x+1)·u·π/64) · 2^14), u ∈ 0..7 over 32
    * sample positions. ONE Scala constant is the source of truth —
    * the DuckDB oracle's literal table is GENERATED from it
    * (the LangIdSeedCorpus pattern), so the two sides cannot drift
    * and the whole transform is exact 64-bit integer arithmetic
    * (|F| ≤ 32²·255·2^28 < 2^63 — no overflow, no float sums). */
  private[graft] val PhashCos: Array[Int] = Array.tabulate(8 * 32) { i =>
    val u = i / 32; val x = i % 32
    math.round(math.cos((2 * x + 1) * u * math.Pi / 64) * 16384.0).toInt
  }

  /** The per-record pHash body: 32×32 NN resize (commutes with the
    * per-pixel luma, the dHash stance) → BT.601 integer luma → 2-D
    * fixed-point DCT ([[PhashCos]]) → the low-frequency 8×8 band in
    * row-major order minus DC (63 coefficients) → threshold at the
    * band's MEDIAN (sorted index 31 — exact integer compare): bit
    * j−1 set iff F(j) > median. Bit 63 stays clear (the sig-family
    * LONG-non-negative convention) and at most 31 bits are ever set.
    * Perceptual rationale: dHash reads 8-cell-scale gradient SIGNS,
    * which recompression noise flips wherever neighbors nearly tie;
    * the DCT low band integrates each basis over all 1024 pixels, so
    * block-level noise cancels and survives re-encode/rescale. */
  private[graft] def pHash64FromRgb(pixels: Array[Byte], w: Int,
      h: Int): Long = {
    val small = MediaCodec.nnResizeRgb(pixels, w, h, 32, 32)
    val g = new Array[Long](1024)
    var i = 0
    while (i < 1024) {
      g(i) = (299 * (small(3 * i) & 0xff) +
        587 * (small(3 * i + 1) & 0xff) +
        114 * (small(3 * i + 2) & 0xff)) / 1000
      i += 1
    }
    // tmp(u, y) = Σ_x g(y, x)·C(u, x) — exact integer sums
    val tmp = new Array[Long](8 * 32)
    var u = 0
    while (u < 8) {
      var y = 0
      while (y < 32) {
        var s = 0L
        var x = 0
        while (x < 32) { s += g(y * 32 + x) * PhashCos(u * 32 + x); x += 1 }
        tmp(u * 32 + y) = s
        y += 1
      }
      u += 1
    }
    // F(v·8 + u) = Σ_y tmp(u, y)·C(v, y)
    val f = new Array[Long](64)
    var v = 0
    while (v < 8) {
      u = 0
      while (u < 8) {
        var s = 0L
        var y = 0
        while (y < 32) { s += tmp(u * 32 + y) * PhashCos(v * 32 + y); y += 1 }
        f(v * 8 + u) = s
        u += 1
      }
      v += 1
    }
    val sorted = java.util.Arrays.copyOfRange(f, 1, 64)
    java.util.Arrays.sort(sorted)
    val med = sorted(31)
    var sig = 0L
    var j = 1
    while (j < 64) {
      if (f(j) > med) sig |= 1L << (j - 1)
      j += 1
    }
    sig
  }

  /** Per-asset 64-bit DCT PERCEPTUAL fingerprint (pHash) — the
    * low-frequency twin of [[imageFingerprint]]'s dHash: where dHash
    * keys on local gradient signs (fast, but recompression noise
    * flips near-tie cells), pHash thresholds the 32×32 DCT's
    * low-frequency band against its own median, so a JPEG-recompress
    * or rescale of the same picture lands within a small hamming
    * radius. Exact integer arithmetic end-to-end ([[pHash64FromRgb]])
    * — the DuckDB oracle reproduces every bit from payload bytes.
    * Output: (doc_id, sig, width, height), drop-in compatible with
    * [[Dedup.sigBandFoldPairs]] and [[SigIndex]]. */
  def imagePHash(spark: SparkSession, media: Dataset[MediaRecord],
      exifAware: Boolean = false): DataFrame = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val rgb = decodeOrientedRgb(r, exifAware)
        (r.doc_id, pHash64FromRgb(rgb.pixels, rgb.width, rgb.height),
          rgb.width, rgb.height)
      }
    }.toDF("doc_id", "sig", "width", "height")
  }

  /** [[imageFingerprint]] with per-asset DECODE QUARANTINE (the
    * [[decodeStatsQuarantined]] stance): one truncated container or
    * garbage Exif block among a crawl batch routes to an
    * (doc_id, err) row instead of failing the stage. Clean rows are
    * bit-identical to the strict kernel's (shared per-record body);
    * quarantined rows carry null sig/width/height and the failure
    * head in `err`. Split with `filter(col("err").isNull)`; feed the
    * clean half to [[Dedup.sigBandFoldPairs]] exactly like the
    * strict path. */
  def imageFingerprintQuarantined(spark: SparkSession,
      media: Dataset[MediaRecord],
      exifAware: Boolean = false): DataFrame = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        try {
          val (sig, w, h) = imageFingerprintOne(r, exifAware)
          (r.doc_id, Some(sig), Some(w), Some(h), Option.empty[String])
        } catch { case scala.util.control.NonFatal(e) =>
          (r.doc_id, Option.empty[Long], Option.empty[Int],
            Option.empty[Int], Some(graft.Verify.errHead(e)))
        }
      }
    }.toDF("doc_id", "sig", "width", "height", "err")
  }

  /** Image near-dup pairs with fingerprint hamming ≤ `maxHamming` —
    * [[audioNearDupPairs]]' image twin, completing the per-modality
    * dedup family: the per-partition [[imageFingerprint]] kernel
    * collapses each asset to 8 bytes BEFORE anything shuffles, then
    * the shared 4×16-bit band fold ([[Dedup.sigBandFoldPairs]]: one
    * pinned slim shuffle + streaming O(maxBucket) bucket fold) emits
    * candidate pairs with the hamming computed inline. No false
    * negatives for maxHamming ≤ 3 (pigeonhole), no false positives
    * (inline filter), subject to the documented `maxBucket` drop on
    * pathological corpora (solid-color/boilerplate images — surfaced
    * by exact dedup instead). Output: (a, b, hamming). */
  def imageNearDupPairs(spark: SparkSession, media: Dataset[MediaRecord],
      maxHamming: Int = 3, maxBucket: Int = 1000,
      exifAware: Boolean = false, method: String = "dhash"): DataFrame = {
    val prints = method match {
      case "dhash" => imageFingerprint(spark, media, exifAware)
      case "phash" => imagePHash(spark, media, exifAware)
      case other => throw new IllegalArgumentException(
        s"[GRAFT] imageNearDupPairs: method must be dhash|phash, " +
          s"got $other")
    }
    Dedup.sigBandFoldPairs(
      prints.select(col("doc_id").as("id"), col("sig")),
      maxHamming, maxBucket)
  }

  /** Video near-dup pairs with fingerprint hamming ≤ `maxHamming` —
    * [[audioNearDupPairs]]' video twin, completing the per-modality
    * dedup family (text simhash / embedding LSH / audio energy /
    * video intensity all feed the SAME banded bucket fold): the
    * per-partition [[videoFingerprint]] kernel collapses each asset
    * to 8 bytes BEFORE anything shuffles, then
    * [[Dedup.sigBandFoldPairs]] (one pinned slim shuffle + streaming
    * O(maxBucket) bucket fold) emits candidate pairs with the
    * hamming computed inline. No false negatives for maxHamming ≤ 3
    * (pigeonhole over the 4×16 bands), no false positives (inline
    * filter), subject to the documented `maxBucket` drop on
    * pathological corpora (e.g. static/black-frame boilerplate —
    * surfaced by exact dedup instead). Output: (a, b, hamming). */
  def videoNearDupPairs(spark: SparkSession, media: Dataset[MediaRecord],
      maxHamming: Int = 3, maxBucket: Int = 1000): DataFrame =
    Dedup.sigBandFoldPairs(
      videoFingerprint(spark, media)
        .select(col("doc_id").as("id"), col("sig")),
      maxHamming, maxBucket)

  /** REAL 2-D image resize: decode the container (BMP/PPM/PNG),
    * normalize stored channel order to RGB, resize with a genuine
    * interpolation kernel ([[MediaCodec.nnResizeRgb]] by default,
    * [[MediaCodec.bilinearResizeRgb]] opt-in — the ML-pipeline
    * "normalize every image to W×H" shape), and re-encode as PNG.
    * Composing with [[decodeStats]] therefore exercises decode →
    * resize → encode → decode end-to-end; the DuckDB oracle pins the
    * resized stats from payload arithmetic with the same NN index
    * formula. */
  def resizeMedia(spark: SparkSession, media: Dataset[MediaRecord],
      newWidth: Int, newHeight: Int,
      bilinear: Boolean = false): Dataset[MediaRecord] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val ras = decodeRaster(r.format, r.media)
        // BGR swap / GRAY replicate / RGBA composite over white —
        // the resize kernels are 3-channel, so alpha is resolved
        // here (alpha-aware resize = composite, then interpolate)
        val rgb = MediaCodec.toRgb(ras).pixels
        val resized =
          if (bilinear) MediaCodec.bilinearResizeRgb(rgb, ras.width,
            ras.height, newWidth, newHeight)
          else MediaCodec.nnResizeRgb(rgb, ras.width, ras.height,
            newWidth, newHeight)
        val bytes = MediaCodec.encodePng(resized, newWidth, newHeight)
        MediaRecord(r.doc_id, bytes, "image/png", bytes.length.toLong)
      }
    }
  }

  /** Frame sampling over formats WITHOUT a registered container
    * parser — the "frame" is a fixed-size byte window and its feature
    * a [[byteStripeProfile]] content profile (NOT a decode; real
    * video goes through [[sampleFrames]]). Output one row per sampled
    * window with its index. */
  def sampleByteFrames(spark: SparkSession, media: DataFrame,
      frameBytes: Int = 64, everyN: Int = 4): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("media"), col("format"), col("n_bytes"))
      .as[MediaRecord]
      .flatMap { r =>
        val nFrames = math.max(1, r.media.length / frameBytes)
        (0 until nFrames by everyN).map { f =>
          val start = f * frameBytes
          val frame = r.media.slice(start,
            math.min(start + frameBytes, r.media.length))
          (r.doc_id, f.toLong, frame.length.toLong,
            byteStripeProfile(frame, 4))
        }
      }
      .toDF("doc_id", "frame_idx", "frame_bytes", "frame_feature")
  }

  /** Deterministic LINEAR-INTERPOLATION resample of a feature vector to
    * `newDim` lanes — the 1-D analog of an image resize kernel, so the
    * resize stub is algorithmically real even without codecs. Each
    * output lane j samples position j·(d−1)/(newDim−1) of the input and
    * lerps its two neighbors. Properties (PipelineSpec): identity at
    * the same dim, exact on linear ramps at any dim, output bounded by
    * the input's [min, max], endpoints preserved. */
  private[graft] def lerpResample(v: Array[Float], newDim: Int): Array[Float] = {
    require(newDim > 0, "newDim must be positive")
    if (v.isEmpty) new Array[Float](newDim)
    else if (v.length == 1 || newDim == 1) Array.fill(newDim)(v(0))
    else {
      val out = new Array[Float](newDim)
      val scale = (v.length - 1).toDouble / (newDim - 1)
      var j = 0
      while (j < newDim) {
        val x = j * scale
        val lo = math.min(v.length - 2, x.toInt)
        val frac = x - lo
        out(j) = (v(lo) * (1.0 - frac) + v(lo + 1) * frac).toFloat
        j += 1
      }
      out
    }
  }

  /** "Resize"/re-sample with a real interpolation kernel (see
    * [[lerpResample]]); swap the kernel for a codec-backed resize and
    * the plumbing is unchanged. */
  def resampleFeatures(spark: SparkSession, feats: Dataset[MediaFeatures],
      newDim: Int): Dataset[MediaFeatures] = {
    import spark.implicits._
    feats.map { f =>
      MediaFeatures(f.doc_id, f.format, f.n_bytes,
        lerpResample(f.feature, newDim))
    }
  }
}
