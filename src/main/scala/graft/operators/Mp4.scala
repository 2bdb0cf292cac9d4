package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One parsed MP4 track: identity, media handler, sample-entry
  * codec fourcc, duration (track timescale normalized to ms), the
  * sample count, and the sync-sample (keyframe) table resolved to
  * BYTE RANGES via stsc/stco/stsz.
  *
  * `allSync` marks a track with NO stss box — per ISO 14496-12
  * every sample is then a sync sample (audio tracks routinely ship
  * millions). For those the per-sample enumeration is deliberately
  * NOT materialized (`keyframeSamples`/`keyframeRanges` stay empty —
  * a 3-minute AAC track would otherwise allocate hundreds of MB of
  * boxed tuples per record); the aggregate fields carry the summary
  * (`nKeyframes` = nSamples, `kfBytes` = all sample bytes,
  * first/last offsets), and there is no selective fetch plan — a
  * consumer reads the whole track. */
final case class Mp4Track(trackId: Long, handler: String,
    codec: String, durationMs: Long, nSamples: Long,
    allSync: Boolean,
    keyframeSamples: Vector[Long],
    keyframeRanges: Vector[(Long, Long)],
    nKeyframes: Long, kfBytes: Long,
    firstKfOffset: Long, lastKfOffset: Long)

/** Parsed movie-level metadata: mvhd duration (ms) + the tracks. */
final case class Mp4Meta(durationMs: Long, timescale: Long,
    tracks: Vector[Mp4Track])

/** ISO-BMFF (MP4) container walking — the box-level parse a crawl
  * pipeline needs BEFORE any codec work: movie duration, per-track
  * handler/codec identity, and the keyframe byte ranges that tell a
  * frame sampler which byte spans to fetch. Integer-exact container
  * parsing in the WARC/RIFF precedent: size+fourcc box framing
  * (64-bit largesize and size-0 run-to-end included), version 0 AND
  * 1 mvhd/tkhd/mdhd, and the stbl sample tables (stsd codec fourcc,
  * stts counts, stss sync samples, stsz sizes, stsc sample→chunk
  * runs, stco/co64 chunk offsets) resolved into per-keyframe
  * (offset, size) spans.
  *
  * H.264/H.265 PAYLOAD decode stays OUT of scope per the
  * [[MediaCodec]] codec stance (the bitstreams specify the decoder's
  * arithmetic only up to conformance, so their output is not
  * oracle-pinnable); the box walk is the deterministic part, and its
  * output is exactly the fetch plan an ffmpeg-class decode stage
  * consumes. Malformed containers fail loudly with [GRAFT] errors
  * (crawl infrastructure produces MP4s; framing damage means
  * truncation, not routine dirt). */
object Mp4 {

  // ---------------------------------------------------------------
  // byte-level helpers (big-endian, bounds-checked)
  // ---------------------------------------------------------------
  private def u32(b: Array[Byte], at: Int): Long = {
    require(at >= 0 && at + 4 <= b.length,
      "[GRAFT] mp4: u32 read past end of box")
    ((b(at) & 0xffL) << 24) | ((b(at + 1) & 0xffL) << 16) |
      ((b(at + 2) & 0xffL) << 8) | (b(at + 3) & 0xffL)
  }
  private def u64(b: Array[Byte], at: Int): Long = {
    require(at >= 0 && at + 8 <= b.length,
      "[GRAFT] mp4: u64 read past end of box")
    (u32(b, at) << 32) | u32(b, at + 4)
  }
  private def fourcc(b: Array[Byte], at: Int): String = {
    require(at >= 0 && at + 4 <= b.length,
      "[GRAFT] mp4: fourcc read past end of box")
    new String(b, at, 4, StandardCharsets.US_ASCII)
  }

  /** Walk the boxes of `bytes[from, until)`, calling `f(type,
    * payloadStart, payloadEnd)` per box. Handles 32-bit sizes,
    * size==1 largesize, and size==0 run-to-end. */
  private def walkBoxes(bytes: Array[Byte], from: Int, until: Int)(
      f: (String, Int, Int) => Unit): Unit = {
    var pos = from
    while (pos < until) {
      require(pos + 8 <= until, "[GRAFT] mp4: truncated box header")
      val size32 = u32(bytes, pos)
      val typ = fourcc(bytes, pos + 4)
      val (payloadAt, end) =
        if (size32 == 1L) {
          val large = u64(bytes, pos + 8)
          require(large >= 16 && pos + large <= until,
            s"[GRAFT] mp4: box '$typ' largesize overruns the container")
          (pos + 16, pos + large.toInt)
        } else if (size32 == 0L) (pos + 8, until)
        else {
          require(size32 >= 8 && pos + size32 <= until,
            s"[GRAFT] mp4: box '$typ' size overruns the container")
          (pos + 8, pos + size32.toInt)
        }
      f(typ, payloadAt, end)
      pos = end
    }
  }

  // ---------------------------------------------------------------
  // parse
  // ---------------------------------------------------------------

  /** Mutable per-track accumulation while walking one trak box. */
  private final class TrackState {
    var trackId: Long = -1
    var handler: String = ""
    var codec: String = ""
    var mediaTimescale: Long = 0
    var mediaDuration: Long = 0
    var nSamplesStts: Long = 0
    var sizes: Array[Long] = Array.emptyLongArray
    var uniformSize: Long = 0
    var nSamplesStsz: Long = 0
    var chunkOffsets: Array[Long] = Array.emptyLongArray
    var stscRuns: Array[(Long, Long)] = Array.empty // (firstChunk, samplesPerChunk)
    var syncSamples: Array[Long] = Array.empty // 1-based; empty = all sync
    var sawStss = false
  }

  /** Parse one MP4 container. The sample-table cross-checks are
    * loud: stts and stsz must agree on the sample count, and every
    * sample must land inside a declared chunk. */
  private[graft] def parse(bytes: Array[Byte]): Mp4Meta = {
    require(bytes.length >= 16, "[GRAFT] mp4: container too short")
    // the first box must identify the file (ftyp, or styp for
    // segments) — random bytes must not parse as an empty movie
    val firstType = fourcc(bytes, 4)
    require(firstType == "ftyp" || firstType == "styp",
      s"[GRAFT] mp4: first box is '$firstType', expected ftyp")
    var movieTimescale = 0L
    var movieDuration = 0L
    val tracks = scala.collection.mutable.ArrayBuffer.empty[Mp4Track]

    def parseStbl(t: TrackState, from: Int, until: Int): Unit =
      walkBoxes(bytes, from, until) { (typ, at, end) =>
        typ match {
          case "stsd" =>
            val n = u32(bytes, at + 4)
            if (n > 0) t.codec = fourcc(bytes, at + 12) // first entry's fourcc
          case "stts" =>
            val n = u32(bytes, at + 4).toInt
            require(at + 8 + 8L * n <= end,
              "[GRAFT] mp4: stts table overruns its box")
            var i = 0
            var total = 0L
            while (i < n) {
              total += u32(bytes, at + 8 + i * 8)
              i += 1
            }
            t.nSamplesStts = total
          case "stsz" =>
            t.uniformSize = u32(bytes, at + 4)
            t.nSamplesStsz = u32(bytes, at + 8)
            if (t.uniformSize == 0L) {
              val n = t.nSamplesStsz.toInt
              require(at + 12 + 4L * n <= end,
                "[GRAFT] mp4: stsz table overruns its box")
              t.sizes = Array.tabulate(n)(i => u32(bytes, at + 12 + i * 4))
            }
          case "stsc" =>
            val n = u32(bytes, at + 4).toInt
            require(at + 8 + 12L * n <= end,
              "[GRAFT] mp4: stsc table overruns its box")
            t.stscRuns = Array.tabulate(n)(i =>
              (u32(bytes, at + 8 + i * 12), u32(bytes, at + 12 + i * 12)))
          case "stco" =>
            val n = u32(bytes, at + 4).toInt
            require(at + 8 + 4L * n <= end,
              "[GRAFT] mp4: stco table overruns its box")
            t.chunkOffsets = Array.tabulate(n)(i => u32(bytes, at + 8 + i * 4))
          case "co64" =>
            val n = u32(bytes, at + 4).toInt
            require(at + 8 + 8L * n <= end,
              "[GRAFT] mp4: co64 table overruns its box")
            t.chunkOffsets = Array.tabulate(n)(i => u64(bytes, at + 8 + i * 8))
          case "stss" =>
            t.sawStss = true
            val n = u32(bytes, at + 4).toInt
            require(at + 8 + 4L * n <= end,
              "[GRAFT] mp4: stss table overruns its box")
            t.syncSamples = Array.tabulate(n)(i => u32(bytes, at + 8 + i * 4))
          case _ => ()
        }
      }

    def parseTrak(from: Int, until: Int): Unit = {
      val t = new TrackState
      walkBoxes(bytes, from, until) { (typ, at, end) =>
        typ match {
          case "tkhd" =>
            val version = bytes(at) & 0xff
            // v0: 4 (ver/flags) + 4 + 4 created/modified, id at +12;
            // v1: 8 + 8, id at +20
            t.trackId = if (version == 1) u32(bytes, at + 20)
              else u32(bytes, at + 12)
          case "mdia" =>
            walkBoxes(bytes, at, end) { (mt, mAt, mEnd) =>
              mt match {
                case "mdhd" =>
                  val version = bytes(mAt) & 0xff
                  if (version == 1) {
                    t.mediaTimescale = u32(bytes, mAt + 20)
                    t.mediaDuration = u64(bytes, mAt + 24)
                  } else {
                    t.mediaTimescale = u32(bytes, mAt + 12)
                    t.mediaDuration = u32(bytes, mAt + 16)
                  }
                case "hdlr" =>
                  t.handler = fourcc(bytes, mAt + 8)
                case "minf" =>
                  walkBoxes(bytes, mAt, mEnd) { (nt, nAt, nEnd) =>
                    if (nt == "stbl") parseStbl(t, nAt, nEnd)
                  }
                case _ => ()
              }
            }
          case _ => ()
        }
      }
      require(t.nSamplesStts == t.nSamplesStsz,
        s"[GRAFT] mp4: stts/stsz sample counts disagree " +
          s"(${t.nSamplesStts} vs ${t.nSamplesStsz})")
      val n = t.nSamplesStsz.toInt
      def sizeOf(i: Int): Long =
        if (t.uniformSize != 0L) t.uniformSize else t.sizes(i)
      // resolve sample -> byte offset through the stsc chunk runs:
      // run r covers chunks [firstChunk_r, firstChunk_{r+1});
      // samples lay out contiguously inside each chunk
      val offsets = new Array[Long](n)
      if (n > 0) {
        require(t.chunkOffsets.nonEmpty && t.stscRuns.nonEmpty,
          "[GRAFT] mp4: sample table without stsc/stco chunks")
        var sample = 0
        var run = 0
        var chunk = t.stscRuns(0)._1.toInt // 1-based
        while (sample < n) {
          require(chunk <= t.chunkOffsets.length,
            "[GRAFT] mp4: samples overrun the declared chunks")
          while (run + 1 < t.stscRuns.length &&
            chunk >= t.stscRuns(run + 1)._1) run += 1
          val perChunk = t.stscRuns(run)._2.toInt
          require(perChunk > 0, "[GRAFT] mp4: stsc run with zero samples")
          var inChunk = 0
          var off = t.chunkOffsets(chunk - 1)
          while (inChunk < perChunk && sample < n) {
            offsets(sample) = off
            off += sizeOf(sample)
            sample += 1
            inChunk += 1
          }
          chunk += 1
        }
      }
      val durMs =
        if (t.mediaTimescale > 0)
          t.mediaDuration * 1000L / t.mediaTimescale
        else 0L
      if (t.sawStss) {
        val sync = t.syncSamples.toVector
        sync.foreach(s => require(s >= 1 && s <= n,
          s"[GRAFT] mp4: stss names sample $s of $n"))
        val ranges = sync.map { s =>
          val i = (s - 1).toInt
          (offsets(i), sizeOf(i))
        }
        tracks += Mp4Track(t.trackId, t.handler, t.codec, durMs,
          t.nSamplesStsz, allSync = false, sync, ranges,
          nKeyframes = sync.length.toLong,
          kfBytes = ranges.iterator.map(_._2).sum,
          firstKfOffset = if (ranges.isEmpty) -1L else ranges.head._1,
          lastKfOffset = if (ranges.isEmpty) -1L else ranges.last._1)
      } else {
        // no stss: every sample is sync — summarize, never enumerate
        var total = 0L
        var i = 0
        while (i < n) { total += sizeOf(i); i += 1 }
        tracks += Mp4Track(t.trackId, t.handler, t.codec, durMs,
          t.nSamplesStsz, allSync = true, Vector.empty, Vector.empty,
          nKeyframes = n.toLong, kfBytes = total,
          firstKfOffset = if (n > 0) offsets(0) else -1L,
          lastKfOffset = if (n > 0) offsets(n - 1) else -1L)
      }
    }

    walkBoxes(bytes, 0, bytes.length) { (typ, at, end) =>
      if (typ == "moov") walkBoxes(bytes, at, end) { (mt, mAt, mEnd) =>
        mt match {
          case "mvhd" =>
            val version = bytes(mAt) & 0xff
            if (version == 1) {
              movieTimescale = u32(bytes, mAt + 20)
              movieDuration = u64(bytes, mAt + 24)
            } else {
              movieTimescale = u32(bytes, mAt + 12)
              movieDuration = u32(bytes, mAt + 16)
            }
          case "trak" => parseTrak(mAt, mEnd)
          case _ => ()
        }
      }
    }
    require(movieTimescale > 0, "[GRAFT] mp4: no mvhd (not a movie)")
    Mp4Meta(movieDuration * 1000L / movieTimescale, movieTimescale,
      tracks.toVector)
  }

  // ---------------------------------------------------------------
  // Spark surface
  // ---------------------------------------------------------------

  /** One row per track: the container-level identity + keyframe
    * aggregate a curation pass filters on. Per-partition parse
    * kernel, zero shuffle — the 100 TB shape by construction. */
  def trackMeta(spark: SparkSession, media: DataFrame,
      idCol: String = "doc_id", binCol: String = "mp4"): DataFrame = {
    import spark.implicits._
    media.select(col(idCol).cast("long").as("doc_id"),
        col(binCol).as("mp4"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val meta = parse(bytes)
          meta.tracks.map { t =>
            (id, meta.durationMs, meta.tracks.length.toLong, t.trackId,
              t.handler, t.codec, t.durationMs, t.nSamples, t.allSync,
              t.nKeyframes, t.kfBytes, t.firstKfOffset, t.lastKfOffset)
          }
        }
      }.toDF("doc_id", "movie_duration_ms", "n_tracks", "track_id",
        "handler", "codec", "track_duration_ms", "n_samples",
        "all_sync", "n_keyframes", "kf_bytes", "first_kf_offset",
        "last_kf_offset")
  }

  /** One row per EXPLICIT keyframe (stss-declared): (doc_id,
    * track_id, sample_no, offset, size) — the byte-range fetch plan
    * a frame-sampling decode stage consumes. Tracks WITHOUT an stss
    * box emit no rows here by contract: every sample is sync, there
    * is no selective plan, and enumerating an 8M-sample audio track
    * would be a rows-explosion, not a plan (consumers check
    * [[trackMeta]]'s `all_sync` column and read the whole track).
    * Rows ∝ declared keyframes; zero shuffle. */

  def keyframeRanges(spark: SparkSession, media: DataFrame,
      idCol: String = "doc_id", binCol: String = "mp4"): DataFrame = {
    import spark.implicits._
    media.select(col(idCol).cast("long").as("doc_id"),
        col(binCol).as("mp4"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          parse(bytes).tracks.flatMap { t =>
            t.keyframeSamples.zip(t.keyframeRanges).map {
              case (s, (off, size)) => (id, t.trackId, s, off, size)
            }
          }
        }
      }.toDF("doc_id", "track_id", "sample_no", "offset", "size")
  }

  // ---------------------------------------------------------------
  // encoder twin (fixtures + synthesizer — every graft codec ships
  // its encoder side)
  // ---------------------------------------------------------------

  private def box(typ: String, payload: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](8 + payload.length)
    val size = out.length
    out(0) = (size >>> 24).toByte; out(1) = (size >>> 16).toByte
    out(2) = (size >>> 8).toByte; out(3) = size.toByte
    val t = typ.getBytes(StandardCharsets.US_ASCII)
    System.arraycopy(t, 0, out, 4, 4)
    System.arraycopy(payload, 0, out, 8, payload.length)
    out
  }
  private def be32(v: Long): Array[Byte] = Array(
    (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
  private def concatAll(parts: Array[Byte]*): Array[Byte] = {
    val out = new Array[Byte](parts.map(_.length).sum)
    var at = 0
    parts.foreach { p =>
      System.arraycopy(p, 0, out, at, p.length); at += p.length
    }
    out
  }

  /** The fixed prefix every encoded fixture shares: a 24-byte ftyp
    * (isom, [isom, mp42]) + the 8-byte mdat header — sample data
    * starts at byte 32, which the oracle arithmetic relies on. */
  private[graft] val SampleDataStart = 32L

  /** Build a real single-video-track MP4: ftyp + mdat (sample bytes)
    * + moov(mvhd, trak(tkhd, mdia(mdhd, hdlr, minf/stbl))). Samples
    * lay out in chunks of 2 (exercising multi-run stsc); keyframes
    * are every `kfEvery`-th sample starting at 1. `sampleDeltaMs`
    * is the per-sample duration at timescale 1000. */
  private[graft] def encodeMp4(sampleSizes: Seq[Int], kfEvery: Int,
      sampleDeltaMs: Int, fill: Int => Byte,
      codec: String = "gft1"): Array[Byte] = {
    require(sampleSizes.nonEmpty && sampleSizes.forall(_ > 0),
      "[GRAFT] mp4 encode: need positive sample sizes")
    require(kfEvery > 0 && sampleDeltaMs > 0 && codec.length == 4,
      "[GRAFT] mp4 encode: bad parameters")
    val n = sampleSizes.length
    val totalBytes = sampleSizes.map(_.toLong).sum
    require(totalBytes <= (1 << 26),
      "[GRAFT] mp4 encode: fixture payload cap exceeded")
    val ftyp = box("ftyp", concatAll(
      "isom".getBytes(StandardCharsets.US_ASCII), be32(0),
      "isom".getBytes(StandardCharsets.US_ASCII),
      "mp42".getBytes(StandardCharsets.US_ASCII)))
    require(ftyp.length == 24, "[GRAFT] mp4 encode: ftyp drifted")
    val data = new Array[Byte](totalBytes.toInt)
    var i = 0
    while (i < data.length) { data(i) = fill(i); i += 1 }
    val mdat = box("mdat", data)
    val duration = n.toLong * sampleDeltaMs
    val mvhd = box("mvhd", concatAll(
      be32(0), // version 0 + flags
      be32(0), be32(0), // creation, modification
      be32(1000), be32(duration), // timescale, duration
      be32(0x00010000L), // rate 1.0
      Array[Byte](0x01, 0x00), // volume 1.0
      new Array[Byte](10), // reserved
      matrixIdentity,
      new Array[Byte](24), // pre_defined
      be32(2))) // next track id
    val tkhd = box("tkhd", concatAll(
      be32(7), // version 0, flags enabled|in-movie|in-preview
      be32(0), be32(0),
      be32(1), // track id
      be32(0), // reserved
      be32(duration),
      new Array[Byte](8), // reserved
      new Array[Byte](2), new Array[Byte](2), // layer, alt group
      new Array[Byte](2), new Array[Byte](2), // volume, reserved
      matrixIdentity,
      be32(0), be32(0))) // width, height (fixed point)
    val mdhd = box("mdhd", concatAll(
      be32(0), be32(0), be32(0),
      be32(1000), be32(duration),
      Array[Byte](0x55, ((0xc4 & 0xff)).toByte), // language 'und'
      new Array[Byte](2)))
    val hdlr = box("hdlr", concatAll(
      be32(0), be32(0),
      "vide".getBytes(StandardCharsets.US_ASCII),
      new Array[Byte](12),
      Array[Byte](0))) // empty NUL name
    val sampleEntry = box(codec, concatAll(
      new Array[Byte](6), Array[Byte](0, 1))) // reserved + data_ref_idx
    val stsd = box("stsd", concatAll(be32(0), be32(1), sampleEntry))
    val stts = box("stts", concatAll(be32(0), be32(1),
      be32(n), be32(sampleDeltaMs)))
    // chunks of 2 samples (last may hold 1): stsc runs + stco offsets
    val nChunks = (n + 1) / 2
    val stscRuns =
      if (n % 2 == 0 || nChunks == 1) Seq((1L, n.toLong min 2L))
      else Seq((1L, 2L), (nChunks.toLong, 1L))
    val stsc = box("stsc", concatAll(
      (Seq(be32(0), be32(stscRuns.length)) ++
        stscRuns.flatMap { case (fc, spc) =>
          Seq(be32(fc), be32(spc), be32(1)) }): _*))
    val stsz = box("stsz", concatAll(
      (Seq(be32(0), be32(0), be32(n)) ++
        sampleSizes.map(s => be32(s))): _*))
    val chunkOffsets = {
      var off = SampleDataStart
      (0 until nChunks).map { c =>
        val o = off
        val inChunk = if (c == nChunks - 1 && n % 2 == 1) 1 else 2
        (0 until inChunk).foreach(j => off += sampleSizes(c * 2 + j))
        o
      }
    }
    val stco = box("stco", concatAll(
      (Seq(be32(0), be32(nChunks)) ++ chunkOffsets.map(be32)): _*))
    val kfs = (1 to n).filter(s => (s - 1) % kfEvery == 0)
    val stss = box("stss", concatAll(
      (Seq(be32(0), be32(kfs.length)) ++ kfs.map(s => be32(s))): _*))
    val stbl = box("stbl", concatAll(stsd, stts, stsc, stsz, stco, stss))
    val minf = box("minf", stbl)
    val mdia = box("mdia", concatAll(mdhd, hdlr, minf))
    val trak = box("trak", concatAll(tkhd, mdia))
    val moov = box("moov", concatAll(mvhd, trak))
    concatAll(ftyp, mdat, moov)
  }

  private val matrixIdentity: Array[Byte] = concatAll(
    be32(0x00010000L), be32(0), be32(0),
    be32(0), be32(0x00010000L), be32(0),
    be32(0), be32(0), be32(0x40000000L))

  /** Wrap every document in a deterministic single-track MP4:
    * n_samples = 1 + doc_id % 7, sample i's size = 8 + (doc_id + i)
    * % 5, keyframes every 3rd sample, 40 ms per sample — all
    * recomputable from doc_id alone, which is what the oracle does. */
  def synthesizeMp4(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    WorkCols.spread(docs)
      .select(col(idCol).cast("long").as("doc_id"))
      .as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val n = (1 + id % 7).toInt
          val sizes = (0 until n).map(i => (8 + (id + i) % 5).toInt)
          (id, encodeMp4(sizes, kfEvery = 3, sampleDeltaMs = 40,
            fill = j => ((id + 7 * j) % 251).toByte))
        }
      }.toDF("doc_id", "mp4")
  }
}
