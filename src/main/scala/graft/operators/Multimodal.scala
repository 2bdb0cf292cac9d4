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

/** Multimodal-column plumbing: schema, partition-friendly batch decode,
  * and feature extraction. The *decode kernel itself is a stub* — the
  * real image/audio codecs are not available in this environment — but
  * everything Spark-side (binary columns, typed Datasets, mapPartitions
  * batch shape, deterministic output) is real and tested. Swap
  * [[decodeStub]] for a JNI/codec call and nothing else changes.
  */
object Multimodal {

  /** Build a media table from the documents table: the text payload is
    * UTF-8-encoded as the stand-in binary blob. */
  def mediaFromDocs(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol).cast("long").as("doc_id"),
      encode(col(textCol), "UTF-8").as("media"),
      lit("text/plain").as("format"),
      octet_length(encode(col(textCol), "UTF-8")).cast("long").as("n_bytes"))

  /** STUB decode: a real implementation would decode image/audio bytes
    * here (e.g. via a codec library) and emit pixel/sample buffers.
    * This deterministic stand-in derives an 8-dim feature from byte
    * content so the full pipeline (schema, batching, downstream joins,
    * similarity search over features) is exercised end-to-end. */
  private[operators] def decodeStub(bytes: Array[Byte], dim: Int): Array[Float] = {
    // ??? <- real codec goes here; deterministic fake below.
    // Integer accumulation + ONE final double division keeps the fake
    // bit-reproducible by any engine (a float += loop would make the
    // result depend on f32 rounding at every step).
    val sums = new Array[Long](dim)
    var i = 0
    while (i < bytes.length) {
      sums(i % dim) += (bytes(i) & 0xff)
      i += 1
    }
    val n = math.max(1, bytes.length / dim)
    sums.map(s => (s / (255.0 * n)).toFloat)
  }

  /** Batch feature extraction over partitions — the Scala analog of a
    * pandas-UDF/mapInPandas batch kernel: one JVM-side loop per
    * partition, no per-row closure dispatch, constant memory. */
  def extractFeatures(spark: SparkSession, media: DataFrame,
      dim: Int = 8): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("doc_id"), col("media"), col("format"), col("n_bytes"))
      .as[MediaRecord]
      .mapPartitions { it =>
        it.map { r =>
          MediaFeatures(r.doc_id, r.format, r.n_bytes,
            decodeStub(r.media, dim))
        }
      }
  }

  /** Frame sampling stub — the 1→N batch shape (video → every-Nth
    * frame). The "frame" here is a fixed-size byte window; a real
    * implementation would emit decoded frames. Output one row per
    * sampled frame with its index. */
  def sampleFrames(spark: SparkSession, media: DataFrame,
      frameBytes: Int = 64, everyN: Int = 4): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("media"), col("format"), col("n_bytes"))
      .as[MediaRecord]
      .flatMap { r =>
        // ??? <- real frame decode goes here; windowed bytes below
        val nFrames = math.max(1, r.media.length / frameBytes)
        (0 until nFrames by everyN).map { f =>
          val start = f * frameBytes
          val frame = r.media.slice(start,
            math.min(start + frameBytes, r.media.length))
          (r.doc_id, f.toLong, frame.length.toLong,
            decodeStub(frame, 4))
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
