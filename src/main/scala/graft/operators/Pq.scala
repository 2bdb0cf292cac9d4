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
  private[operators] def loadCodebooks(spark: SparkSession, path: String,
      m: Int, ks: Int): Array[Array[Array[Float]]] = {
    val rows = spark.read.parquet(s"$path/codebooks")
      .select(col("subspace"), col("centroid_id"), col("centroid"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Float](2).toArray))
    val books = Array.ofDim[Array[Float]](m, ks)
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
          // ragged rows that escaped the bounded sample must fail
          // loudly here, not crash the argmin or truncate silently
          if (v0.length != dim)
            throw new graft.store.InvalidVectorException(
              s"[GRAFT] vector dimension mismatch at id=$id:" +
                s" expected $dim, got ${v0.length}")
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
  private[operators] def encodeOne(v: Array[Float],
      books: Array[Array[Array[Float]]], dsub: Int): Array[Byte] = {
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

  /** The ADC lookup table: exact subspace distances query↔centroid —
    * table(j)(k) = ||q_j − c_{j,k}||². m × ks doubles, kilobytes. */
  private[operators] def adcTable(q: Array[Float],
      books: Array[Array[Array[Float]]], dsub: Int): Array[Array[Double]] =
    Array.tabulate(books.length) { j =>
      val off = j * dsub
      books(j).map { c =>
        var d = 0.0; var i = 0
        while (i < dsub) {
          val diff = q(off + i).toDouble - c(i); d += diff * diff; i += 1
        }
        d
      }
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
    val books = loadCodebooks(spark, path, meta.m, meta.ks)
    val table = adcTable(q, books, dsub)
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

/** IVF-PQ — the composed 100 TB vector-search layout (faiss IVFPQ;
  * Jégou et al. 2011 §IV): PQ codes partitioned by the clusters of an
  * existing [[IvfIndex]], with RESIDUAL encoding (code `v − centroid`,
  * not `v`: residuals concentrate near 0, so the same codebook budget
  * spends its resolution where the data is — the standard accuracy
  * win over flat PQ).
  *
  * Why the composition matters at scale: flat PQ still ADC-scans
  * EVERY code at query time (cheap per row, but 100 TB of corpus is
  * ~3 TB of codes at 32×); IVF-PQ prunes to nProbe cluster partitions
  * first — `.explain` shows the same `cluster=` file-level pruning as
  * [[IvfIndex.search]] — then ADC-scans only those. Search cost is
  * O(corpus × nProbe / nCentroids) table lookups, and the refine
  * stage reads k·overfetch raw vectors from the probed partitions of
  * the SAME ivf assignments (no second copy of the corpus).
  *
  * Build reads the ivf index's own cluster-partitioned assignments —
  * vectors arrive pre-normalized (cosine indexes store unit vectors)
  * and pre-clustered, so training and encoding are two narrow passes
  * with a broadcast centroid map and no extra shuffle; codes are
  * written `partitionBy(cluster)` mirroring the parent layout.
  * Deterministic given the parent index (hash-priority sample +
  * seeded Lloyd per subspace, the U2 determinism stance). */
object IvfPq {
  private def centroidMap(spark: SparkSession,
      ivfPath: String): Map[Int, Array[Float]] =
    spark.read.parquet(s"$ivfPath/centroids")
      .select(col("cluster"), col("centroid"))
      .collect()
      .map(r => r.getInt(0) -> r.getSeq[Float](1).toArray).toMap

  private def sub(v: Array[Float], c: Array[Float]): Array[Float] = {
    val out = new Array[Float](v.length)
    var i = 0
    while (i < v.length) { out(i) = v(i) - c(i); i += 1 }
    out
  }

  /** nProbe nearest clusters to q, ties to the lowest cluster id. */
  private def probeClusters(cents: Map[Int, Array[Float]],
      q: Array[Float], nProbe: Int): Seq[Int] =
    cents.toSeq
      .map { case (c, cent) =>
        var d = 0.0; var i = 0
        while (i < q.length) {
          val diff = q(i).toDouble - cent(i); d += diff * diff; i += 1
        }
        (d, c)
      }
      .sorted.take(nProbe).map(_._2)

  /** Train residual codebooks over `ivfPath`'s assignments and encode
    * every indexed vector at `path`: `codebooks/`, `codes/cluster=<c>/`
    * (id, code BINARY), `ivfpq.json`. The parent index is read-only
    * input; rebuild the codes after heavy [[IvfIndex.append]] traffic
    * (same operating practice as centroid-drift rebuilds). */
  def build(spark: SparkSession, ivfPath: String, path: String,
      m: Int = 8, ks: Int = 256, seed: Long = 42L,
      trainCap: Long = 100000L, maxIter: Int = 10): Unit = {
    require(m > 0 && ks > 1 && ks <= 256,
      "[GRAFT] PQ needs 0 < m and 1 < ks <= 256 (one byte per code)")
    import spark.implicits._
    val cents = centroidMap(spark, ivfPath)
    val bcCents = spark.sparkContext.broadcast(cents)
    val assign = spark.read.parquet(s"$ivfPath/assignments")
      .select(col("id"), col("values"), col("cluster"))
    // compute-bound passes (ks·dim muladds per row): spread a
    // few-partition layout across the cores first, same stance as
    // [[IvfIndex.build]]'s assignment pass
    val parts = math.max(1, assign.rdd.getNumPartitions)
    val spreadAssign =
      if (parts < spark.sparkContext.defaultParallelism)
        assign.repartition(spark.sparkContext.defaultParallelism)
      else assign
    // residual stream (id, v − centroid): the training distribution
    val residuals = spreadAssign.as[(Long, Array[Float], Int)]
      .mapPartitions { it =>
        val cm = bcCents.value
        it.map { case (id, v, c) => (id, sub(v, cm(c))) }
      }.toDF("id", "values")
    val train = IvfIndex.sampleVectors(residuals, trainCap, seed,
      minPerPart = ks, normalize = false)
    val dim = train.head.length
    require(dim % m == 0,
      s"[GRAFT] dim $dim not divisible by m=$m subspaces")
    val dsub = dim / m
    val books: Array[Array[Array[Float]]] = Array.tabulate(m) { j =>
      val subTrain = train.map(v => java.util.Arrays.copyOfRange(v,
        j * dsub, (j + 1) * dsub))
      IvfIndex.lloyd(subTrain, ks, maxIter, seed + j).map(_.map(_.toFloat))
    }
    val bookRows = for (j <- 0 until m; k <- 0 until ks)
      yield (j, k, books(j)(k))
    spark.createDataFrame(bookRows).toDF("subspace", "centroid_id", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/codebooks")
    val bcBooks = spark.sparkContext.broadcast(books)
    spreadAssign.as[(Long, Array[Float], Int)]
      .mapPartitions { it =>
        val cm = bcCents.value; val bks = bcBooks.value
        it.map { case (id, v, c) =>
          (id, PqIndex.encodeOne(sub(v, cm(c)), bks, dsub), c)
        }
      }
      .toDF("id", "code", "cluster")
      .repartition(col("cluster"))
      .write.mode("overwrite").partitionBy("cluster")
      .parquet(s"$path/codes")
    // record the parent's nAssign: a single-assignment parent can
    // never produce duplicate ids across probed partitions, so search
    // skips the dedup shuffle entirely (same distinction
    // [[IvfIndex.searchHydrated]] makes)
    val nAssign = IvfIndex.readMeta(ivfPath).nAssign
    Files.write(Paths.get(path, "ivfpq.json"),
      s"""{"m":$m,"ks":$ks,"dim":$dim,"seed":$seed,"nAssign":$nAssign}"""
        .getBytes(StandardCharsets.UTF_8))
  }

  /** Incremental maintenance after [[IvfIndex.append]] traffic: encode
    * every indexed vector that does NOT yet have a code, with the
    * EXISTING codebooks, and append the new codes to the cluster
    * partitions. One anti-join of the parent's assignments against the
    * code table's ids (the code side is scanned id-only), then the
    * same broadcast encode kernel as [[build]]. Codebook drift from
    * heavy appends is the documented
    * trade (same stance as the parent's centroid drift): refresh keeps
    * the index LIVE, rebuild restores codebook quality. Returns the
    * number of newly encoded rows. */
  def refresh(spark: SparkSession, ivfPath: String,
      path: String): Long = {
    import spark.implicits._
    val (m, ks, dim, _) = readMeta(path)
    val dsub = dim / m
    val cents = centroidMap(spark, ivfPath)
    val bcCents = spark.sparkContext.broadcast(cents)
    val assign = spark.read.parquet(s"$ivfPath/assignments")
      .select(col("id"), col("values"), col("cluster"))
    val coded = spark.read.parquet(s"$path/codes").select(col("id"))
    val missing = assign.join(coded, Seq("id"), "left_anti")
    val books = PqIndex.loadCodebooks(spark, path, m, ks)
    val bcBooks = spark.sparkContext.broadcast(books)
    val newCodes = missing.as[(Long, Array[Float], Int)]
      .mapPartitions { it =>
        val cm = bcCents.value; val bks = bcBooks.value
        it.map { case (id, v, c) =>
          if (v.length != dim)
            throw new graft.store.InvalidVectorException(
              s"[GRAFT] vector dimension mismatch at id=$id:" +
                s" expected $dim, got ${v.length}")
          (id, PqIndex.encodeOne(sub(v, cm(c)), bks, dsub), c)
        }
      }
      .toDF("id", "code", "cluster")
      .persist()
    val n = newCodes.count()
    if (n > 0)
      newCodes.repartition(col("cluster"))
        .write.mode("append").partitionBy("cluster")
        .parquet(s"$path/codes")
    newCodes.unpersist()
    n
  }

  private def readMeta(path: String): (Int, Int, Int, Int) = {
    val s = new String(Files.readAllBytes(Paths.get(path, "ivfpq.json")),
      StandardCharsets.UTF_8)
    def num(k: String) = ("\"" + k + "\":(-?\\d+)").r
      .findFirstMatchIn(s).get.group(1).toInt
    def opt(k: String, default: Int) = ("\"" + k + "\":(-?\\d+)").r
      .findFirstMatchIn(s).map(_.group(1).toInt).getOrElse(default)
    (num("m"), num("ks"), num("dim"), opt("nAssign", 1))
  }

  /** Everything both search stages need, computed ONCE per query:
    * normalized query, parent centroids, probed cluster ids. */
  private case class Probe(m: Int, ks: Int, dim: Int, nAssign: Int,
      metric: Metric, q: Array[Float], cents: Map[Int, Array[Float]],
      probed: Seq[Int])

  private def probe(spark: SparkSession, ivfPath: String, path: String,
      query: Array[Float], nProbe: Int): Probe = {
    val (m, ks, dim, nAssign) = readMeta(path)
    if (query.length != dim)
      throw new graft.store.InvalidVectorException(
        s"[GRAFT] vector dimension mismatch: expected $dim, got ${query.length}")
    val metric = Metric.parse(IvfIndex.metricOf(ivfPath))
    val q = if (metric == Metric.Cosine) IvfIndex.l2normalize(query)
      else query
    val cents = centroidMap(spark, ivfPath)
    Probe(m, ks, dim, nAssign, metric, q, cents,
      probeClusters(cents, q, nProbe))
  }

  /** ADC top-k over the nProbe nearest clusters only: (id, adist)
    * ascending. Per probed cluster the lookup table is built from the
    * RESIDUAL query `q − centroid_c` (asymmetric distance in residual
    * space — exact for the query side, quantized for the data side).
    * Reads only existing `codes/cluster=<c>/` directories (empty
    * k-means clusters have none), O(nProbe) paths listed. A vector
    * stored in several clusters by a multiprobe parent index scores
    * once per shared probed cluster; the min wins before top-k. */
  def search(spark: SparkSession, ivfPath: String, path: String,
      query: Array[Float], k: Int, nProbe: Int = 4): DataFrame =
    adcTopK(spark, path, probe(spark, ivfPath, path, query, nProbe), k)

  private def adcTopK(spark: SparkSession, path: String, p: Probe,
      k: Int): DataFrame = {
    import spark.implicits._
    val dsub = p.dim / p.m
    val books = PqIndex.loadCodebooks(spark, path, p.m, p.ks)
    // per-probed-cluster ADC tables in residual space — nProbe × m ×
    // ks doubles, broadcast as one map
    val tables: Map[Int, Array[Array[Double]]] = p.probed.map { c =>
      c -> PqIndex.adcTable(sub(p.q, p.cents(c)), books, dsub)
    }.toMap
    val existing = IvfIndex.existingClusterDirs(spark, s"$path/codes",
      p.probed)
    if (existing.isEmpty)
      return spark.range(0).select(col("id"), lit(0.0).as("adist"))
    val bt = spark.sparkContext.broadcast(tables)
    val scored = spark.read.option("basePath", s"$path/codes")
      .parquet(existing: _*)
      .select(col("id"), col("code"), col("cluster"))
      .as[(Long, Array[Byte], Int)]
      .mapPartitions { it =>
        val ts = bt.value
        it.map { case (id, code, c) =>
          val t = ts(c)
          var d = 0.0; var j = 0
          while (j < t.length) { d += t(j)(code(j) & 0xff); j += 1 }
          (id, d)
        }
      }
      .toDF("id", "adist")
    // single-assignment parent ⇒ ids are unique across partitions:
    // plain orderBy+limit compiles to TakeOrderedAndProject (k rows
    // per partition shuffled); only a multiprobe parent needs the
    // min-per-id combine first
    val deduped = if (p.nAssign > 1)
      scored.groupBy(col("id")).agg(min(col("adist")).as("adist"))
    else scored
    deduped.orderBy(col("adist").asc, col("id").asc).limit(k)
  }

  /** Two-stage IVF-PQ search: ADC top-(k·overfetch) within the probed
    * clusters, then exact re-rank reading raw vectors ONLY for those
    * candidates — the candidate ids (k·overfetch, driver-safe by
    * construction) become a pushed-down `id IN (…)` parquet filter
    * over the probed partitions of the parent index, so the refine
    * stage touches row groups containing candidates instead of
    * rescanning the probe set's floats. Output: (id, distance) in the
    * parent index's metric, ascending, k rows. */
  def searchRefined(spark: SparkSession, ivfPath: String, path: String,
      query: Array[Float], k: Int, nProbe: Int = 4,
      overfetch: Int = 4): DataFrame = {
    import spark.implicits._
    // probe state (centroid read + top-k + dir listing) is computed
    // once and shared by both stages
    val p = probe(spark, ivfPath, path, query, nProbe)
    val candIds = adcTopK(spark, path, p, k * overfetch)
      .select(col("id")).as[Long].collect()
    val existing = IvfIndex.existingClusterDirs(spark,
      s"$ivfPath/assignments", p.probed)
    if (existing.isEmpty || candIds.isEmpty)
      return spark.range(0).select(col("id"), lit(0.0).as("distance"))
    val pruned = spark.read
      .option("basePath", s"$ivfPath/assignments")
      .parquet(existing: _*)
      .filter(col("id").isin(candIds.toIndexedSeq: _*))
      // a multiprobe parent stores a vector once per assigned cluster;
      // identical copies, so the id-dedup is deterministic
      .dropDuplicates("id")
      .select(col("id"), col("values"))
    Knn.exact(pruned, p.q, k, p.metric).select(col("id"), col("distance"))
  }
}
