package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{MediaCodec, MediaRecord, Multimodal}

/** DCT perceptual hash (pHash): sig-family invariants, the
  * recompression case dHash misses, near-dup wiring, and EXIF
  * awareness. The bit-exact arithmetic itself is oracle-pinned
  * (multimodal_phash / multimodal_phash_neardup). */
class PhashSpec extends AnyFunSuite {

  private def media(rows: (Long, Array[Byte], String)*) = {
    val spark = GraftTest.spark
    import spark.implicits._
    rows.toSeq.map { case (id, bytes, fmt) =>
      MediaRecord(id, bytes, fmt, bytes.length.toLong) }.toDS()
  }

  private def sigs(ds: org.apache.spark.sql.Dataset[MediaRecord],
      phash: Boolean): Map[Long, Long] = {
    val spark = GraftTest.spark
    val df = if (phash) Multimodal.imagePHash(spark, ds)
      else Multimodal.imageFingerprint(spark, ds)
    df.collect().map(r => r.getAs[Long]("doc_id") ->
      r.getAs[Long]("sig")).toMap
  }

  /** The "photo" fixture: coarse 2-D steps (non-degenerate low-band
    * DCT energy both axes) overlaid with a ±1 horizontal dither.
    * Adjacent dHash cells inside one coarse step are NEAR TIES whose
    * gradient signs any recompression noise flips; the pHash 32×32
    * NN grid samples only even x, so the dither never reaches the
    * DCT and the low band barely moves. */
  private def photo(w: Int, h: Int): Array[Byte] = {
    val px = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = 60 + (y / 8) * 12 + (x / 16) * 9 + (x % 2)
        val o = (y * w + x) * 3
        px(o) = v.toByte; px(o + 1) = v.toByte; px(o + 2) = v.toByte
        x += 1
      }
      y += 1
    }
    px
  }

  test("sig-family invariants: identical assets hash to hamming 0, at most 31 bits set, bit 63 clear") {
    val px = photo(64, 64)
    val png = MediaCodec.encodePng(px, 64, 64)
    val m = media((1L, png, "image/png"), (2L, png.clone(), "image/png"))
    val s = sigs(m, phash = true)
    assert(s(1L) === s(2L))
    assert(s(1L) >= 0L, "bit 63 must stay clear")
    assert(java.lang.Long.bitCount(s(1L)) <= 31,
      "median threshold sets at most 31 of 63 bits")
    assert(java.lang.Long.bitCount(s(1L)) > 0, "non-degenerate fixture")
  }

  test("recompression: a lossy JPEG re-encode of the same picture is caught by pHash (hamming <= 3) and missed by dHash (hamming > 3)") {
    val w = 64; val h = 64
    val px = photo(w, h)
    val original = MediaCodec.encodePng(px, w, h)
    // real recompression: through the repo's own lossy JPEG codec at
    // a coarse quantizer, then back to PNG (the crawl-variant shape:
    // same picture, different encoder history)
    val recompressed = {
      val ras = MediaCodec.decodeJpeg(MediaCodec.encodeJpeg(px, w, h, q = 16))
      MediaCodec.encodePng(MediaCodec.toRgb(ras).pixels, w, h)
    }
    val m = media((1L, original, "image/png"),
      (2L, recompressed, "image/png"))
    val d = sigs(m, phash = false)
    val p = sigs(m, phash = true)
    val dHam = java.lang.Long.bitCount(d(1L) ^ d(2L))
    val pHam = java.lang.Long.bitCount(p(1L) ^ p(2L))
    assert(dHam > 3,
      s"fixture must break dHash (near-tie gradient signs): got $dHam")
    assert(pHam <= 3, s"pHash must survive recompression: got $pHam")
  }

  test("imageNearDupPairs method=phash finds the recompressed pair the dhash method misses; unknown method fails loudly") {
    val spark = GraftTest.spark
    val w = 64; val h = 64
    val px = photo(w, h)
    val original = MediaCodec.encodePng(px, w, h)
    val recompressed = {
      val ras = MediaCodec.decodeJpeg(MediaCodec.encodeJpeg(px, w, h, q = 16))
      MediaCodec.encodePng(MediaCodec.toRgb(ras).pixels, w, h)
    }
    val m = media((1L, original, "image/png"),
      (2L, recompressed, "image/png"))
    def pairs(method: String) =
      Multimodal.imageNearDupPairs(spark, m, maxHamming = 3,
          method = method)
        .collect().map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"))).toSet
    assert(pairs("phash") === Set((1L, 2L)))
    assert(pairs("dhash") === Set.empty)
    assert(intercept[IllegalArgumentException](
      Multimodal.imageNearDupPairs(spark, m, method = "ahash"))
      .getMessage.contains("[GRAFT]"))
  }

  test("exifAware pHash: a camera-rotated TIFF twin hashes identically to its upright original") {
    val spark = GraftTest.spark
    import spark.implicits._
    val docs = (0L to 7L).map(i =>
      (i, s"phash orientation fixture $i with sufficient payload"))
      .toDF("doc_id", "text")
    val up = Multimodal.imagePHash(spark,
        Multimodal.synthesizeTiff(docs), exifAware = true)
      .select($"doc_id", $"sig").as[(Long, Long)].collect().toMap
    val rot = Multimodal.imagePHash(spark,
        Multimodal.synthesizeTiffRotated(docs), exifAware = true)
      .select($"doc_id", $"sig").as[(Long, Long)].collect().toMap
    assert(rot === up)
  }
}
