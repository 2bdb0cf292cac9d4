package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Mp4

/** ISO-BMFF container walking: box framing (32-bit, largesize,
  * run-to-end), version 0/1 header boxes, the stbl sample tables
  * resolved to keyframe byte ranges, loud failures on framing
  * damage, and the Spark surface. */
class Mp4Spec extends AnyFunSuite {

  private def fixture(n: Int, id: Long = 3L): Array[Byte] =
    Mp4.encodeMp4((0 until n).map(i => (8 + (id + i) % 5).toInt),
      kfEvery = 3, sampleDeltaMs = 40,
      fill = j => ((id + 7 * j) % 251).toByte)

  test("encode/parse duals: duration, handler, codec, sample count, and keyframe byte ranges recompute from the construction") {
    val id = 3L
    val n = 7
    val sizes = (0 until n).map(i => (8 + (id + i) % 5).toInt)
    val meta = Mp4.parse(fixture(n, id))
    assert(meta.durationMs === n * 40L)
    assert(meta.timescale === 1000L)
    assert(meta.tracks.length === 1)
    val t = meta.tracks.head
    assert(t.trackId === 1L)
    assert(t.handler === "vide")
    assert(t.codec === "gft1")
    assert(t.durationMs === n * 40L)
    assert(t.nSamples === n.toLong)
    assert(t.keyframeSamples === Vector(1L, 4L, 7L))
    // offsets: sample data starts at 32, samples contiguous across
    // the 2-sample chunks (stco + in-chunk prefix sums line up)
    val prefix = sizes.scanLeft(0)(_ + _)
    assert(t.keyframeRanges === Vector(
      (32L, sizes(0).toLong),
      (32L + prefix(3), sizes(3).toLong),
      (32L + prefix(6), sizes(6).toLong)))
  }

  test("single-sample movie: one chunk, one keyframe at byte 32") {
    val meta = Mp4.parse(fixture(1))
    val t = meta.tracks.head
    assert(t.nSamples === 1L)
    assert(t.keyframeRanges === Vector((32L, 11L))) // 8 + (3+0)%5
  }

  test("version-1 mvhd/mdhd and co64 parse; a movie without stss treats every sample as sync") {
    // hand-build: ftyp + moov(mvhd v1, trak(tkhd v1, mdia(mdhd v1,
    // hdlr 'soun', minf(stbl(stsd 'gfa1', stts 2 samples, stsc one
    // run, stsz uniform 6, co64 one chunk @ 40, NO stss))))
    def be32(v: Long) = Array((v >>> 24).toByte, (v >>> 16).toByte,
      (v >>> 8).toByte, v.toByte)
    def be64(v: Long) = be32(v >>> 32) ++ be32(v & 0xffffffffL)
    def box(t: String, p: Array[Byte]) =
      be32(p.length + 8L) ++ t.getBytes("US-ASCII") ++ p
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++ be32(0))
    val mvhd = box("mvhd", Array[Byte](1, 0, 0, 0) ++
      be64(0) ++ be64(0) ++ be32(90000) ++ be64(180000) ++
      new Array[Byte](80))
    val tkhd = box("tkhd", Array[Byte](1, 0, 0, 7) ++
      be64(0) ++ be64(0) ++ be32(9) ++ new Array[Byte](4) ++
      be64(180000) ++ new Array[Byte](52))
    val mdhd = box("mdhd", Array[Byte](1, 0, 0, 0) ++
      be64(0) ++ be64(0) ++ be32(8000) ++ be64(4000) ++
      new Array[Byte](4))
    val hdlr = box("hdlr", be32(0) ++ be32(0) ++
      "soun".getBytes("US-ASCII") ++ new Array[Byte](13))
    val entry = box("gfa1", new Array[Byte](8))
    val stsd = box("stsd", be32(0) ++ be32(1) ++ entry)
    val stts = box("stts", be32(0) ++ be32(1) ++ be32(2) ++ be32(2000))
    val stsc = box("stsc", be32(0) ++ be32(1) ++
      be32(1) ++ be32(2) ++ be32(1))
    val stsz = box("stsz", be32(0) ++ be32(6) ++ be32(2))
    val co64 = box("co64", be32(0) ++ be32(1) ++ be64(40))
    val stbl = box("stbl", stsd ++ stts ++ stsc ++ stsz ++ co64)
    val minf = box("minf", stbl)
    val mdia = box("mdia", mdhd ++ hdlr ++ minf)
    val trak = box("trak", tkhd ++ mdia)
    val moov = box("moov", mvhd ++ trak)
    val meta = Mp4.parse(ftyp ++ moov)
    assert(meta.durationMs === 2000L) // 180000 / 90000 * 1000
    val t = meta.tracks.head
    assert(t.trackId === 9L)
    assert(t.handler === "soun")
    assert(t.codec === "gfa1")
    assert(t.durationMs === 500L) // 4000 / 8000 * 1000
    assert(t.nSamples === 2L)
    // no stss = every sample is sync, SUMMARIZED (never enumerated —
    // an 8M-sample audio track would allocate hundreds of MB of
    // boxed tuples per record if the vectors materialized)
    assert(t.allSync)
    assert(t.keyframeSamples.isEmpty && t.keyframeRanges.isEmpty)
    assert(t.nKeyframes === 2L)
    assert(t.kfBytes === 12L)
    assert(t.firstKfOffset === 40L)
    assert(t.lastKfOffset === 46L) // 40 + uniform size 6
  }

  test("malformed containers fail loudly: wrong first box, truncated header, box overrun, stts/stsz disagreement, stss out of range") {
    def loud(bytes: Array[Byte]): Unit = {
      val e = intercept[Exception](Mp4.parse(bytes))
      assert(e.getMessage != null && e.getMessage.contains("[GRAFT]"))
    }
    loud("1234notamovie----".getBytes("US-ASCII"))
    loud(fixture(3).take(20)) // truncated mid-box
    val overrun = fixture(3)
    // inflate the ftyp size so it overruns the container
    overrun(0) = 0x7f.toByte
    loud(overrun)
    // corrupt the stts count (byte search for the box, bump a count)
    val good = fixture(4)
    val sttsAt = {
      var i = 0
      while (!(good(i + 4) == 's' && good(i + 5) == 't' &&
        good(i + 6) == 't' && good(i + 7) == 's')) i += 1
      i
    }
    val bad = good.clone()
    bad(sttsAt + 19) = (bad(sttsAt + 19) + 1).toByte // sample count +1
    loud(bad)
  }

  test("Spark surface: trackMeta and keyframeRanges are per-partition kernels with doc_id-derivable output") {
    val spark = GraftTest.spark
    import spark.implicits._
    val docs = Seq(0L, 3L, 6L, 13L).toDF("doc_id")
    val media = Mp4.synthesizeMp4(docs)
    val meta = Mp4.trackMeta(spark, media)
      .orderBy($"doc_id").collect()
    assert(meta.length === 4)
    meta.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val n = 1 + id % 7
      assert(r.getAs[Long]("n_samples") === n)
      assert(r.getAs[Long]("movie_duration_ms") === n * 40)
      assert(r.getAs[String]("handler") === "vide")
      assert(r.getAs[Long]("n_keyframes") === (n + 2) / 3)
      assert(r.getAs[Long]("first_kf_offset") === 32L)
    }
    val kf = Mp4.keyframeRanges(spark, media)
      .filter($"doc_id" === 6L).orderBy($"sample_no").collect()
    // id 6: n = 7 samples, keyframes 1/4/7; sizes 8+(6+i)%5
    val sizes = (0 until 7).map(i => 8L + (6 + i) % 5)
    val prefix = sizes.scanLeft(0L)(_ + _)
    assert(kf.map(r => (r.getAs[Long]("sample_no"),
      r.getAs[Long]("offset"), r.getAs[Long]("size"))).toSeq ===
      Seq((1L, 32L, sizes(0)), (4L, 32L + prefix(3), sizes(3)),
        (7L, 32L + prefix(6), sizes(6))))
    // the plan is a pure scan + kernel: no shuffle exchange
    val plan = Mp4.trackMeta(spark, media)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      "trackMeta must stay a zero-shuffle per-partition kernel")
  }
}
