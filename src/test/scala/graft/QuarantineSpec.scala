package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{MediaCodec, MediaRecord, Multimodal}

/** Per-asset decode quarantine: one corrupt container among a crawl
  * batch routes to an (doc_id, err) row instead of failing the
  * stage, clean rows stay bit-identical to the strict kernels, and
  * the streaming front door lands both halves batch-addressed. */
class QuarantineSpec extends AnyFunSuite {

  private def media(rows: (Long, Array[Byte], String)*) = {
    val spark = GraftTest.spark
    import spark.implicits._
    rows.toSeq.map { case (id, bytes, fmt) =>
      MediaRecord(id, bytes, fmt, bytes.length.toLong) }.toDS()
  }

  private def ppm(id: Long): Array[Byte] =
    MediaCodec.encodePpm(Array.tabulate(24)(i => ((id * 7 + i) % 251).toByte), 4, 2)

  test("decodeStatsQuarantined: clean rows equal the strict kernel bit-for-bit; a truncated container quarantines with a [GRAFT] err while strict throws") {
    val spark = GraftTest.spark
    val good = media((1L, ppm(1), "image/ppm"), (2L, ppm(2), "image/ppm"),
      (3L, MediaCodec.encodeWav(Array.tabulate(16)(_.toByte)), "audio/wav"))
    val strict = Multimodal.decodeStats(spark, good).collect()
      .map(s => (s.doc_id, s.width, s.height, s.n_samples,
        s.c0_milli, s.c1_milli, s.c2_milli)).toSet
    val viaQ = Multimodal.decodeStatsQuarantined(spark, good)
    assert(viaQ.filter(col("err").isNotNull).count() === 0L)
    val qRows = viaQ.collect().map(r => (r.getAs[Long]("doc_id"),
      r.getAs[Int]("width"), r.getAs[Int]("height"),
      r.getAs[Long]("n_samples"), r.getAs[Long]("c0_milli"),
      r.getAs[Long]("c1_milli"), r.getAs[Long]("c2_milli"))).toSet
    assert(qRows === strict)
    // inject one truncated asset: strict fails the whole stage,
    // quarantined ships the survivors + the greppable failure
    val mixed = media((1L, ppm(1), "image/ppm"),
      (2L, ppm(2).take(20), "image/ppm"))
    assertThrows[org.apache.spark.SparkException](
      Multimodal.decodeStats(spark, mixed).collect())
    val out = Multimodal.decodeStatsQuarantined(spark, mixed).collect()
      .map(r => r.getAs[Long]("doc_id") -> Option(r.getAs[String]("err")))
      .toMap
    assert(out(1L).isEmpty)
    assert(out(2L).exists(_.contains("[GRAFT]")))
  }

  test("audioFingerprintQuarantined: a truncated FLAC quarantines while strict throws; clean prints are bit-identical; zero-sample assets emit no row on either path") {
    val spark = GraftTest.spark
    val pcm = Array.tabulate(32)(i => (i * 13 + 5) % 251)
    val flac = MediaCodec.encodeFlac(pcm)
    val wav = MediaCodec.encodeWav(Array.tabulate(24)(_.toByte))
    val good = media((1L, flac, "audio/flac"), (2L, wav, "audio/wav"))
    val strict = Multimodal.audioFingerprint(spark, good, window = 4)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("sig"), r.getAs[Long]("n_windows"))).toSet
    val viaQ = Multimodal
      .audioFingerprintQuarantined(spark, good, window = 4)
    assert(viaQ.filter(col("err").isNotNull).count() === 0L)
    assert(viaQ.collect().map(r => (r.getAs[Long]("doc_id"),
      r.getAs[Long]("sig"), r.getAs[Long]("n_windows"))).toSet === strict)
    // truncated FLAC (magic survives, STREAMINFO cut): strict fails
    // the stage, quarantined routes it aside
    val mixed = media((1L, flac, "audio/flac"),
      (2L, flac.take(20), "audio/flac"))
    assertThrows[org.apache.spark.SparkException](
      Multimodal.audioFingerprint(spark, mixed, window = 4).collect())
    val out = Multimodal
      .audioFingerprintQuarantined(spark, mixed, window = 4).collect()
      .map(r => r.getAs[Long]("doc_id") -> Option(r.getAs[String]("err")))
      .toMap
    assert(out(1L).isEmpty)
    assert(out(2L).exists(_.contains("[GRAFT]")))
    // a zero-sample clean asset: NO row on either path (omit stance)
    val empty = media((9L, MediaCodec.encodeWav(Array.emptyByteArray),
      "audio/wav"))
    assert(Multimodal.audioFingerprint(spark, empty, 4).count() === 0L)
    assert(Multimodal.audioFingerprintQuarantined(spark, empty, 4)
      .count() === 0L)
  }

  test("videoFingerprintQuarantined: a truncated PPM stream quarantines while strict throws; clean prints are bit-identical") {
    val spark = GraftTest.spark
    def stream(id: Long): Array[Byte] =
      ppm(id) ++ ppm(id + 1) ++ ppm(id + 2)
    val good = media((1L, stream(1), "video/ppm-stream"),
      (2L, stream(5), "video/ppm-stream"))
    val strict = Multimodal.videoFingerprint(spark, good).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("sig"),
        r.getAs[Long]("n_frames"))).toSet
    val viaQ = Multimodal.videoFingerprintQuarantined(spark, good)
    assert(viaQ.filter(col("err").isNotNull).count() === 0L)
    assert(viaQ.collect().map(r => (r.getAs[Long]("doc_id"),
      r.getAs[Long]("sig"), r.getAs[Long]("n_frames"))).toSet === strict)
    val mixed = media((1L, stream(1), "video/ppm-stream"),
      (2L, stream(5).take(5), "video/ppm-stream"))
    assertThrows[org.apache.spark.SparkException](
      Multimodal.videoFingerprint(spark, mixed).collect())
    val out = Multimodal.videoFingerprintQuarantined(spark, mixed)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> Option(r.getAs[String]("err")))
      .toMap
    assert(out(1L).isEmpty)
    assert(out(2L).exists(_.contains("[GRAFT]")))
  }

  test("imageFingerprintQuarantined: a present-but-corrupt Exif block quarantines only on the exif-aware path (the blind path skips APP1)") {
    val spark = GraftTest.spark
    val px = Array.tabulate(32 * 32 * 3)(i => (((i / 3) * 7) % 200 + 20).toByte)
    val plain = MediaCodec.encodeJpeg(px, 32, 32)
    val bad = MediaCodec.withJpegOrientation(plain, 6).clone()
    bad(12) = 'X' // wreck the TIFF header inside APP1
    val ds = media((1L, plain, "image/jpeg"), (2L, bad, "image/jpeg"))
    val aware = Multimodal.imageFingerprintQuarantined(spark, ds,
        exifAware = true).collect()
      .map(r => r.getAs[Long]("doc_id") -> Option(r.getAs[String]("err")))
      .toMap
    assert(aware(1L).isEmpty)
    assert(aware(2L).exists(_.contains("[GRAFT]")))
    // exif-blind: the marker walk skips APP1, both decode clean and
    // the doc-1 row matches the strict kernel
    val blind = Multimodal.imageFingerprintQuarantined(spark, ds)
    assert(blind.filter(col("err").isNotNull).count() === 0L)
    val strictSig = Multimodal.imageFingerprint(spark, ds)
      .filter(col("doc_id") === 1L).head().getAs[Long]("sig")
    assert(blind.filter(col("doc_id") === 1L).head()
      .getAs[Long]("sig") === strictSig)
  }

  test("mediaQuarantineBatch: batch-addressed dual sinks, quarantine dir written even when clean, replay idempotent, empty batch writes nothing") {
    val spark = GraftTest.spark
    val out = java.nio.file.Files
      .createTempDirectory("quarantine-batch").toString
    val mixed = media((1L, ppm(1), "image/ppm"),
      (2L, ppm(2).take(20), "image/ppm"), (3L, ppm(3), "image/ppm"))
    graft.streaming.Ingest.mediaQuarantineBatch(mixed.toDF(), 5L, out)
    val ok1 = spark.read.parquet(s"$out/ok/batch=5")
      .orderBy(col("doc_id")).collect().map(_.toSeq).toSeq
    assert(ok1.map(_.head) === Seq(1L, 3L))
    val bad1 = spark.read.parquet(s"$out/quarantine/batch=5").collect()
    assert(bad1.map(_.getAs[Long]("doc_id")).toSeq === Seq(2L))
    assert(bad1.head.getAs[String]("err").contains("[GRAFT]"))
    // replay overwrites with identical rows
    graft.streaming.Ingest.mediaQuarantineBatch(mixed.toDF(), 5L, out)
    assert(spark.read.parquet(s"$out/ok/batch=5")
      .orderBy(col("doc_id")).collect().map(_.toSeq).toSeq === ok1)
    // a clean batch still writes its (empty) quarantine dir: missing
    // dir must mean "never ran", not "was clean"
    val clean = media((7L, ppm(7), "image/ppm"))
    graft.streaming.Ingest.mediaQuarantineBatch(clean.toDF(), 6L, out)
    assert(spark.read.parquet(s"$out/quarantine/batch=6").count() === 0L)
    // an empty batch writes nothing
    graft.streaming.Ingest.mediaQuarantineBatch(
      mixed.limit(0).toDF(), 9L, out)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$out/ok/batch=9")))
  }

  test("mediaQuarantineIngestStream: two micro-batches through the real stream, corrupt assets land in quarantine per batch") {
    val spark = GraftTest.spark
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val out = java.nio.file.Files
      .createTempDirectory("quarantine-stream").toString
    val ck = java.nio.file.Files
      .createTempDirectory("quarantine-stream-ck").toString
    val stream = MemoryStream[(Long, Array[Byte], String, Long)]
    val q = graft.streaming.Ingest.mediaQuarantineIngestStream(
      stream.toDF().toDF("doc_id", "media", "format", "n_bytes"),
      out, ck,
      trigger = org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("50 milliseconds"))
    try {
      stream.addData((1L, ppm(1), "image/ppm", 0L),
        (2L, ppm(2).take(20), "image/ppm", 0L))
      q.processAllAvailable()
      assert(spark.read.parquet(s"$out/ok/batch=0")
        .select(col("doc_id")).as[Long].collect().toSeq === Seq(1L))
      assert(spark.read.parquet(s"$out/quarantine/batch=0")
        .select(col("doc_id")).as[Long].collect().toSeq === Seq(2L))
      stream.addData((3L, ppm(3), "image/ppm", 0L))
      q.processAllAvailable()
      assert(spark.read.parquet(s"$out/ok/batch=1")
        .select(col("doc_id")).as[Long].collect().toSeq === Seq(3L))
      assert(spark.read.parquet(s"$out/quarantine/batch=1").count() === 0L)
    } finally q.stop()
  }
}
