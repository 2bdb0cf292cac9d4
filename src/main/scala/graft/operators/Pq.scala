package graft.operators

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Product-quantization index — the COMPRESSED scale path for vector
  * search (cf. Jégou et al., "Product Quantization for Nearest
  * Neighbor Search", TPAMI 2011; the same design as faiss PQ/IVFPQ).
  * At 100 TB, storing raw float vectors costs dim × 4 bytes/row and
  * every search reads all of it; PQ stores `m` one-byte codes per
  * vector (a 32× compression at dim=64, m=8) and scores with table
  * lookups instead of float dot products:
  *
  *   - TRAIN (driver-local, bounded sample — same shape as
  *     [[IvfIndex.build]]): split each vector into `m` subvectors of
  *     dim/m lanes; run Lloyd per subspace for `ks` centroids. The
  *     codebook is m × ks × (dim/m) floats — kilobytes.
  *   - ENCODE (one broadcast pass): each subvector → id of its nearest
  *     subspace centroid → `m` bytes per vector, stored as a slim
  *     (id, code BINARY) parquet table.
  *   - SEARCH (asymmetric distance, ADC): per query build an m × ks
  *     lookup table of exact subspace distances ||q_j − c_{j,k}||²,
  *     broadcast it, and scan codes summing m lookups per row — no
  *     float math per row, no decompression. A bounded per-partition
  *     top-k heap shuffles k rows per partition, then the driver-side
  *     final k. Optional exact REFINE re-ranks the top candidates
  *     against the raw vectors (the standard two-stage PQ pipeline).
  *
  * For cosine, vectors are L2-normalized at train/encode/query time
  * (ADC euclidean on the unit sphere orders like cosine); reported
  * `adist` is the squared euclidean ADC approximation in that space.
  * Deterministic given the corpus partition layout (hash-priority
  * sample + seeded k-means++ init, the U2 determinism stance).
  *
  * Composability: partition the code table by an [[IvfIndex]] cluster
  * id to get IVF-PQ (prune clusters, then ADC-scan only the probed
  * partitions); the two artifacts are deliberately independent files.
  */
object PqIndex {
  case class Meta(m: Int, ks: Int, dim: Int, metric: String, seed: Long)

  private def metaJson(meta: Meta): String =
    s"""{"m":${meta.m},"ks":${meta.ks},"dim":${meta.dim},"metric":"${meta.metric}","seed":${meta.seed}}"""
  private def parseMeta(s: String): Meta = {
    def num(k: String) = ("\"" + k + "\":(-?\\d+)").r
      .findFirstMatchIn(s).get.group(1).toLong
    val metric = "\"metric\":\"(\\w+)\"".r.findFirstMatchIn(s).get.group(1)
    Meta(num("m").toInt, num("ks").toInt, num("dim").toInt, metric,
      num("seed"))
  }
  private def readMeta(path: String): Meta = parseMeta(new String(
    Files.readAllBytes(Paths.get(path, "pq.json")), StandardCharsets.UTF_8))

  /** codebooks(j)(k) = centroid k of subspace j (dim/m floats). */
  private def loadCodebooks(spark: SparkSession, path: String,
      meta: Meta): Array[Array[Array[Float]]] = {
    val rows = spark.read.parquet(s"$path/codebooks")
      .select(col("subspace"), col("centroid_id"), col("centroid"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Float](2).toArray))
    val books = Array.ofDim[Array[Float]](meta.m, meta.ks)
    rows.foreach { case (j, k, c) => books(j)(k) = c }
    books
  }

  /** Train the per-subspace codebooks and encode the corpus at `path`:
    * `codebooks/` (subspace, centroid_id, centroid), `codes/` (id,
    * code BINARY), `pq.json`. `dim` must be divisible by `m`; `ks` ≤
    * 256 (one byte per code). */
  def build(base: DataFrame, path: String, m: Int = 8, ks: Int = 256,
      metric: Metric = Metric.Cosine, seed: Long = 42L,
      vecCol: String = "values", idCol: String = "id",
      trainCap: Long = 100000L, maxIter: Int = 10): Unit = {
    require(m > 0 && ks > 1 && ks <= 256,
      "[GRAFT] PQ needs 0 < m and 1 < ks <= 256 (one byte per code)")
    val spark = base.sparkSession
    import spark.implicits._
    val spherical = metric == Metric.Cosine
    val prepared = base.select(col(idCol).as("id"),
      col(vecCol).cast("array<float>").as("values"))
    val parts = math.max(1, prepared.rdd.getNumPartitions)
    val train = IvfIndex.sampleVectors(prepared, trainCap, seed,
      minPerPart = ks, normalize = spherical)
    val dim = train.head.length
    require(dim % m == 0,
      s"[GRAFT] dim $dim not divisible by m=$m subspaces")
    val dsub = dim / m
    // per-subspace Lloyd on the shared sample (subspace j gets its own
    // seed so codebooks are independent draws)
    val books: Array[Array[Array[Float]]] = Array.tabulate(m) { j =>
      val sub = train.map(v => java.util.Arrays.copyOfRange(v, j * dsub,
        (j + 1) * dsub))
      IvfIndex.lloyd(sub, ks, maxIter, seed + j)
        .map(_.map(_.toFloat))
    }
    val bookRows = for (j <- 0 until m; k <- 0 until ks)
      yield (j, k, books(j)(k))
    spark.createDataFrame(bookRows).toDF("subspace", "centroid_id", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/codebooks")
    // ---- encode pass: broadcast codebooks, argmin per subspace.
    // Compute-bound (|rows|·ks·dim muladds) — spread like IvfIndex's
    // assignment pass when the scan has too few partitions.
    val encodeInput =
      if (parts < spark.sparkContext.defaultParallelism)
        prepared.repartition(spark.sparkContext.defaultParallelism)
      else prepared
    val bc = spark.sparkContext.broadcast(books)
    encodeInput.as[(Long, Array[Float])]
      .mapPartitions { it =>
        val bks = bc.value
        it.map { case (id, v0) =>
          val v = if (spherical) IvfIndex.l2normalize(v0) else v0
          (id, encodeOne(v, bks, dsub))
        }
      }
      .toDF("id", "code")
      .write.mode("overwrite").parquet(s"$path/codes")
    Files.write(Paths.get(path, "pq.json"),
      metaJson(Meta(m, ks, dim, metric match {
        case Metric.Cosine => "cosine"
        case Metric.Euclidean => "euclidean"
      }, seed)).getBytes(StandardCharsets.UTF_8))
  }

  /** One vector → m bytes (argmin per subspace; `best == -1 ||` guards
    * all-NaN subvectors, which land deterministically in centroid 0 —
    * same stance as [[IvfIndex.assignRows]]). */
  private def encodeOne(v: Array[Float], books: Array[Array[Array[Float]]],
      dsub: Int): Array[Byte] = {
    val m = books.length
    val code = new Array[Byte](m)
    var j = 0
    while (j < m) {
      val cents = books(j)
      val off = j * dsub
      var best = -1; var bestD = Double.MaxValue
      var k = 0
      while (k < cents.length) {
        val c = cents(k)
        var d = 0.0; var i = 0
        while (i < dsub) {
          val diff = v(off + i).toDouble - c(i); d += diff * diff; i += 1
        }
        if (best == -1 || d < bestD) { bestD = d; best = k }
        k += 1
      }
      code(j) = best.toByte
      j += 1
    }
    code
  }

  /** Decode a code back to its reconstruction (centroid concatenation)
    * — for error measurement and tooling. */
  private[graft] def decodeOne(code: Array[Byte],
      books: Array[Array[Array[Float]]], dsub: Int): Array[Float] = {
    val out = new Array[Float](books.length * dsub)
    var j = 0
    while (j < books.length) {
      System.arraycopy(books(j)(code(j) & 0xff), 0, out, j * dsub, dsub)
      j += 1
    }
    out
  }

  /** ADC top-k over the encoded corpus: (id, adist) ascending. `adist`
    * is the table-lookup approximation of the (unit-sphere, for
    * cosine) squared euclidean distance. */
  def search(spark: SparkSession, path: String, query: Array[Float],
      k: Int): DataFrame = {
    import spark.implicits._
    val meta = readMeta(path)
    if (query.length != meta.dim)
      throw new graft.store.InvalidVectorException(
        s"[GRAFT] vector dimension mismatch: expected ${meta.dim}, got ${query.length}")
    val dsub = meta.dim / meta.m
    val q = if (meta.metric == "cosine") IvfIndex.l2normalize(query)
      else query
    val books = loadCodebooks(spark, path, meta)
    // the ADC lookup table: exact subspace distances query↔centroid
    val table: Array[Array[Double]] = Array.tabulate(meta.m) { j =>
      val off = j * dsub
      books(j).map { c =>
        var d = 0.0; var i = 0
        while (i < dsub) {
          val diff = q(off + i).toDouble - c(i); d += diff * diff; i += 1
        }
        d
      }
    }
    val bt = spark.sparkContext.broadcast(table)
    spark.read.parquet(s"$path/codes")
      .select(col("id"), col("code"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val t = bt.value
        it.map { case (id, code) =>
          var d = 0.0; var j = 0
          while (j < t.length) { d += t(j)(code(j) & 0xff); j += 1 }
          (id, d)
        }
      }
      .toDF("id", "adist")
      .orderBy(col("adist").asc, col("id").asc)
      .limit(k)
  }

  /** Two-stage PQ search: ADC top-(k·`overfetch`) candidates, then
    * exact re-rank against the raw vectors of `base` — the standard
    * refine step that recovers exact-ordering quality at a fraction of
    * the scan cost (only k·overfetch raw vectors are read, via a
    * semi-join the optimizer can push down). Output: (id, distance)
    * in the requested metric, ascending, k rows. */
  def searchRefined(spark: SparkSession, path: String, base: DataFrame,
      query: Array[Float], k: Int, overfetch: Int = 4,
      vecCol: String = "values", idCol: String = "id"): DataFrame = {
    val meta = readMeta(path)
    val metric = Metric.parse(meta.metric)
    val candidates = search(spark, path, query, k * overfetch)
      .select(col("id"))
    val pruned = base.select(col(idCol).as("id"),
        col(vecCol).cast("array<float>").as("values"))
      .join(candidates.hint("broadcast"), Seq("id"), "left_semi")
    Knn.exact(pruned, query, k, metric).select(col("id"), col("distance"))
  }
}
