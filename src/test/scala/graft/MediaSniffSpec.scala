package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.MediaSniff
import graft.operators.MediaCodec

/** vfs_media_format: the magic-byte rule chain, real containers from
  * every codec, short-blob fall-through, the SQL surface, and the
  * codegen path. */
class MediaSniffSpec extends AnyFunSuite {

  test("every real container the codecs emit sniffs to its format; unknowns and short blobs are NULL") {
    val px = Array.tabulate(24)(i => (i * 7 % 256).toByte)
    val pal = Array.tabulate(768)(j => (j % 256).toByte)
    val cases = Seq(
      MediaCodec.encodePng(px, 4, 2) -> "image/png",
      MediaCodec.encodeJpeg(px, 4, 2) -> "image/jpeg",
      MediaCodec.encodeGif(px.take(8), 4, 2, pal) -> "image/gif",
      MediaCodec.encodeTiff(px, 4, 2) -> "image/tiff",
      MediaCodec.encodeTiff(px, 4, 2, packBits = true) -> "image/tiff",
      MediaCodec.encodeWav(px, 8000) -> "audio/wav",
      MediaCodec.encodePpm(px, 4, 2) -> "image/ppm",
      MediaCodec.encodeBmp(px, 4, 2) -> "image/bmp")
    for ((bytes, want) <- cases)
      assert(Option(MediaSniff.sniff(bytes)).map(_.toString)
        === Some(want), want)
    // big-endian TIFF sniffs too
    assert(MediaSniff.sniff(
      Array[Byte]('M', 'M', 0, 42, 0, 0, 0, 8)).toString === "image/tiff")
    // unknown content and every magic truncated below its rule length
    assert(MediaSniff.sniff("hello world".getBytes("UTF-8")) == null)
    assert(MediaSniff.sniff(Array.empty[Byte]) == null)
    assert(MediaSniff.sniff(Array[Byte]('P', '6')) == null) // needs ws
    assert(MediaSniff.sniff("GIF87".getBytes("US-ASCII")) == null)
    assert(MediaSniff.sniff("RIFFxxxxWAV".getBytes("US-ASCII")) == null)
    assert(MediaSniff.sniff(Array[Byte]('I', 'I', 42)) == null)
    // loose rules DO fire on text that carries the magic — by design,
    // and the oracle mirrors it
    assert(MediaSniff.sniff("BMW review".getBytes("UTF-8"))
      .toString === "image/bmp")
    assert(MediaSniff.sniff("P6 engines".getBytes("UTF-8"))
      .toString === "image/ppm")
  }

  test("withSniffedFormat routes an unlabeled mixed frame identically to the declared-format run; unknown stances hold") {
    val spark = GraftTest.spark
    import spark.implicits._
    import graft.operators.Multimodal
    val docs = Seq((1L, "sniff routing one"), (2L, "and two"),
      (3L, "and a third document")).toDF("doc_id", "text")
    // a mixed frame: png, gif, tiff (+ one unknown raw blob)
    val labeled = Multimodal.synthesizePng(docs.filter($"doc_id" === 1))
      .union(Multimodal.synthesizeGif(docs.filter($"doc_id" === 2)))
      .union(Multimodal.synthesizeTiff(docs.filter($"doc_id" === 3)))
    val unlabeled = labeled.toDF().select($"doc_id", $"media")
      .unionByName(Seq((9L, "not media".getBytes("UTF-8")))
        .toDF("doc_id", "media"))
    val routed = Multimodal.withSniffedFormat(unlabeled)
    // formats recovered purely from bytes; the unknown blob dropped
    assert(routed.select($"doc_id", $"format").as[(Long, String)]
      .collect().toMap ===
      Map(1L -> "image/png", 2L -> "image/gif", 3L -> "image/tiff"))
    // downstream stats identical to the declared-format run
    val viaSniff = Multimodal.decodeStats(spark, routed)
      .collect().map(s => s.doc_id -> s.c0_milli).toMap
    val declared = Multimodal.decodeStats(spark, labeled)
      .collect().map(s => s.doc_id -> s.c0_milli).toMap
    assert(viaSniff === declared)
    // fail stance raises on the unknown blob
    val e = intercept[Exception] {
      Multimodal.withSniffedFormat(unlabeled, onUnknown = "fail")
        .collect()
    }
    assert(Iterator.iterate[Throwable](e)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .mkString.contains("unrecognized media for id 9"))
    assert(intercept[IllegalArgumentException](
      Multimodal.withSniffedFormat(unlabeled, onUnknown = "maybe"))
      .getMessage.contains("[GRAFT]"))
  }

  test("SQL surface and codegen: vfs_media_format runs inside WholeStageCodegen and returns NULL for unknowns") {
    val spark = GraftTest.spark
    import spark.implicits._
    graft.functions.registerAll(spark)
    val px = Array.tabulate(24)(i => (i * 3 % 256).toByte)
    val dir = java.nio.file.Files
      .createTempDirectory("sniff-sql").toString
    Seq(
      (1L, MediaCodec.encodePng(px, 4, 2)),
      (2L, "plain text".getBytes("UTF-8"))).toDF("id", "media")
      .write.mode("overwrite").parquet(dir)
    // parquet-backed (a local Seq collapses to LocalTableScan with
    // the expression constant-folded — no codegen span to assert)
    spark.read.parquet(dir).createOrReplaceTempView("sniff_in")
    val got = spark.sql(
      "SELECT id, vfs_media_format(media) AS fmt FROM sniff_in")
    val rows = got.collect().map(r => r.getLong(0) ->
      Option(r.getString(1))).toMap
    assert(rows === Map(1L -> Some("image/png"), 2L -> None))
    // the expression stays inside whole-stage codegen: the Project
    // carrying it wears the `*(n)` codegen marker
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("vfs_media_format") && l.trim.startsWith("*(")),
      plan.take(400))
  }
}
