package graft.operators

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.FloatType

/** Approximate k-NN as a *persisted, reusable* index artifact — the
  * deliberate replacement for the reference's per-query HNSW rebuild
  * (vfs/src/vfs/rank.rs:204-239 rebuilds the whole graph on every
  * search, which is why its approximate path scales worse than exact —
  * SURVEY §6 crossover). Design:
  *
  *   - build: k-means centroids (MLlib, fixed seed ⇒ deterministic like
  *     the reference's seeded SmallRng, ann.rs:257); every vector is
  *     assigned to its nearest centroid and the table is written
  *     partitioned by `cluster` — at 100 TB each cluster is a prunable
  *     parquet partition.
  *   - probe: score the query against the (tiny, driver-side) centroid
  *     table, pick `nProbe` clusters, and run exact k-NN over just
  *     those partitions — the cluster filter prunes at the file level.
  *
  * For cosine, vectors are L2-normalized before clustering (spherical
  * k-means): euclidean NN on the unit sphere = cosine NN.
  */
object IvfIndex {
  case class Meta(nCentroids: Int, metric: String, dim: Int, seed: Long)

  private def metaJson(m: Meta): String =
    s"""{"nCentroids":${m.nCentroids},"metric":"${m.metric}","dim":${m.dim},"seed":${m.seed}}"""
  private def parseMeta(s: String): Meta = {
    def num(k: String) = ("\"" + k + "\":(-?\\d+)").r.findFirstMatchIn(s).get.group(1).toLong
    val metric = "\"metric\":\"(\\w+)\"".r.findFirstMatchIn(s).get.group(1)
    Meta(num("nCentroids").toInt, metric, num("dim").toInt, num("seed"))
  }

  /** Build the index from (idCol, vecCol) rows and persist at `path`:
    * `centroids/` (cluster INT, centroid ARRAY<FLOAT>),
    * `assignments/cluster=<c>/` (id, values), `ivf.json`.
    *
    * Scale design: k-means trains on a bounded SAMPLE (`trainCap` rows
    * — centroid quality converges long before that), then every row is
    * assigned in one broadcast-centroid pass. Training cost is O(cap),
    * independent of corpus size; assignment is a single map over the
    * data. */
  def build(base: DataFrame, path: String, nCentroids: Int,
      metric: Metric = Metric.Cosine, seed: Long = 42L,
      vecCol: String = "values", idCol: String = "id",
      trainCap: Long = 100000L, maxIter: Int = 10): Unit = {
    val spark = base.sparkSession
    val prepared = metric match {
      case Metric.Cosine =>
        // spherical k-means: normalize, cluster on the unit sphere
        base.select(col(idCol).as("id"),
          normalized(col(vecCol)).as("values"))
      case Metric.Euclidean =>
        base.select(col(idCol).as("id"),
          col(vecCol).cast("array<float>").as("values"))
    }
    val n = prepared.count()
    val trainSet =
      if (n <= trainCap) prepared
      else prepared.sample(withReplacement = false,
        math.min(1.0, trainCap.toDouble / n * 1.05), seed)
    // cache the featurized training set: k-means is iterative and would
    // otherwise recompute scan+normalize+vectorize every iteration.
    // Size the partition count to the TRAINING SET (≤ trainCap), not the
    // cluster default: k-means|| init + every Lloyd iteration is a
    // full-pass job, and at small n the per-task overhead of 32
    // near-empty partitions dominates build time (measured 6.2s for
    // 2000 rows). ~3k rows per task: small corpora still coalesce to
    // one task, while a full 100k training sample uses every core —
    // dividing by 25k left Lloyd on 4 of 32 threads at the cap
    // (measured 96s for the 500k probe; ~40s at full parallelism).
    val trainN = math.min(n, trainCap)
    val trainParts = math.max(1, math.min(32, (trainN / 3125L).toInt))
    val featurized = trainSet
      .withColumn("features", array_to_vector(col("values")))
      .coalesce(trainParts).cache()
    val model = try {
      // random init, not k-means||: the parallel init costs extra full
      // passes over the training set, and IVF routing quality (recall
      // at fixed nProbe) converges to the same place under Lloyd
      // iterations — the standard IVF trade (cf. faiss random init).
      new KMeans().setK(nCentroids).setSeed(seed)
        .setMaxIter(maxIter).setInitMode("random")
        .setFeaturesCol("features").setPredictionCol("cluster")
        .fit(featurized)
    } finally featurized.unpersist(blocking = false)
    val assigned = model.transform(
        prepared.withColumn("features", array_to_vector(col("values"))))
      .select(col("id"), col("values"), col("cluster"))
    // repartition by cluster BEFORE partitionBy: otherwise every shuffle
    // partition writes a sliver into every cluster directory
    // (partitions × clusters small files — 22k files at 500k rows)
    assigned.repartition(col("cluster"))
      .write.mode("overwrite").partitionBy("cluster")
      .parquet(s"$path/assignments")
    val centroids = model.clusterCenters.zipWithIndex.map { case (c, i) =>
      (i, c.toArray.map(_.toFloat))
    }
    spark.createDataFrame(centroids.toSeq).toDF("cluster", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    val dim = centroids.head._2.length
    Files.write(Paths.get(path, "ivf.json"),
      metaJson(Meta(nCentroids, metric match {
        case Metric.Cosine => "cosine"
        case Metric.Euclidean => "euclidean"
      }, dim, seed)).getBytes(StandardCharsets.UTF_8))
  }

  /** Probe: exact top-k within the nProbe nearest clusters. Returns
    * (id, distance) — distances in the *original* metric space.
    * `.explain` shows PartitionFilters pruning the unprobed clusters. */
  def search(spark: SparkSession, path: String, query: Array[Float],
      k: Int, nProbe: Int = 4): DataFrame =
    searchHydrated(spark, path, query, k, nProbe)
      .select(col("id"), col("distance"))

  /** [[search]] keeping the stored vector alongside — the shape the
    * [[graft.plans.RouteKnnToIvf]] optimizer rewrite needs, since a
    * routed KnnSearch node must keep producing its child's columns. */
  def searchHydrated(spark: SparkSession, path: String,
      query: Array[Float], k: Int, nProbe: Int = 4): DataFrame = {
    val meta = parseMeta(new String(
      Files.readAllBytes(Paths.get(path, "ivf.json")), StandardCharsets.UTF_8))
    val metric = Metric.parse(meta.metric)
    if (query.length != meta.dim)
      throw new graft.store.InvalidVectorException(
        s"[GRAFT] vector dimension mismatch: expected ${meta.dim}, got ${query.length}")
    val q = metric match {
      case Metric.Cosine =>
        val n = math.sqrt(query.map(x => x.toDouble * x).sum)
        if (n == 0.0) query else query.map(x => (x / n).toFloat)
      case Metric.Euclidean => query
    }
    // centroid table is tiny: pick probe clusters driver-side
    val cents = spark.read.parquet(s"$path/centroids")
      .select(col("cluster"),
        Metric.Euclidean.dist(col("centroid"), typedLit(q)).as("d"))
      .orderBy(col("d").asc, col("cluster").asc)
      .limit(nProbe)
      .collect().map(_.getInt(0))
    // read ONLY the probed cluster directories — skips the full
    // partition-discovery listing (O(nProbe) paths instead of
    // O(nCentroids) at probe time). Empty k-means clusters have no
    // directory at all; reading them would fail with PATH_NOT_FOUND.
    val hadoopConf = spark.sessionState.newHadoopConf()
    val existing = cents.map(c => s"$path/assignments/cluster=$c")
      .filter { p =>
        val hp = new org.apache.hadoop.fs.Path(p)
        hp.getFileSystem(hadoopConf).exists(hp)
      }
    if (existing.isEmpty)
      return spark.emptyDataFrame
        .select(lit(0L).as("id"),
          typedLit(Array.empty[Float]).as("values"),
          lit(0.0).as("distance")).limit(0)
    val pruned = spark.read.parquet(existing.toIndexedSeq: _*)
    // on normalized vectors euclidean order == cosine order; report the
    // requested metric's distance values
    Knn.exact(pruned, q, k, metric)
  }

  /** Metric string of a persisted index (for routing guards). */
  def metricOf(path: String): String =
    parseMeta(new String(Files.readAllBytes(Paths.get(path, "ivf.json")),
      StandardCharsets.UTF_8)).metric

  /** Incremental index maintenance: assign NEW vectors to the nearest
    * EXISTING centroid and append them to the cluster partitions — no
    * re-clustering, no rewrite of existing data. This is how an IVF
    * index absorbs streaming/batch ingest at 100 TB: one broadcast of
    * the (tiny) centroid table, a map-side argmin per row, one
    * partitioned append. Centroid drift from skewed appends is the
    * documented trade — rebuild when recall degrades (the standard IVF
    * operating practice).
    *
    * Caller contract (same as [[build]]): `idCol` is unique within the
    * batch AND against ids already indexed. Duplicate ids within a
    * batch collapse to one row (the lexicographically smallest vector,
    * deterministically); re-appending an existing id is NOT detected
    * and yields two index entries — route ingest through
    * [[graft.store.VfsStore]] (which owns id uniqueness) or dedupe
    * upstream.
    *
    * Works as a `foreachBatch` body for Structured Streaming ingest. */
  def append(newRows: DataFrame, path: String,
      vecCol: String = "values", idCol: String = "id"): Unit = {
    val spark = newRows.sparkSession
    val meta = parseMeta(new String(
      Files.readAllBytes(Paths.get(path, "ivf.json")), StandardCharsets.UTF_8))
    val metric = Metric.parse(meta.metric)
    val raw = metric match {
      case Metric.Cosine => newRows.select(col(idCol).as("id"),
        normalized(col(vecCol)).as("values"))
      case Metric.Euclidean => newRows.select(col(idCol).as("id"),
        col(vecCol).cast("array<float>").as("values"))
    }
    // collapse duplicate ids within the batch DETERMINISTICALLY (the
    // lexicographically smallest vector wins) — the documented caller
    // contract; without this each duplicate would write an index entry
    // and shrink effective k at probe time
    val prepared = raw.groupBy(col("id"))
      .agg(min(col("values")).as("values"))
    // centroid table is tiny (nCentroids × dim floats) — broadcast the
    // raw arrays and argmin per row in one tight partition loop, the
    // same shape MLlib's own transform uses. A relational phrasing
    // (cross join with the centroid table + min aggregate) materializes
    // |batch| × nCentroids joined rows first — measured 18-27s for a
    // 10k-row append vs ~1s here. Ties break to the lowest cluster id
    // (strict < scan in ascending order), deterministically.
    val centArr = spark.read.parquet(s"$path/centroids")
      .select(col("cluster"), col("centroid"))
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)
    val bc = spark.sparkContext.broadcast(centArr)
    import spark.implicits._
    val assigned = prepared.as[(Long, Array[Float])]
      .mapPartitions { it =>
        val cs = bc.value
        it.map { case (id, v) =>
          var best = -1; var bestD = Double.MaxValue
          var c = 0
          while (c < cs.length) {
            val cent = cs(c)._2
            var d = 0.0; var i = 0
            while (i < v.length) {
              val diff = v(i).toDouble - cent(i); d += diff * diff; i += 1
            }
            if (d < bestD) { bestD = d; best = cs(c)._1 }
            c += 1
          }
          (id, v, best)
        }
      }
      .toDF("id", "values", "cluster")
    assigned.repartition(col("cluster"))
      .write.mode("append").partitionBy("cluster")
      .parquet(s"$path/assignments")
  }

  /** Compact the assignments layout after a run of [[append]]s: each
    * append adds one file per touched cluster directory, and at
    * nCentroids in the hundreds that is the classic small-files
    * problem — probe latency grows with files listed, not bytes read.
    * Rewrites every cluster partition into one file per shuffle
    * partition, staged in a sibling directory and swapped in with two
    * renames.
    *
    * SINGLE-WRITER maintenance op (the same stance as the reference's
    * global write mutex): appends racing a compact can land between
    * the stage read and the swap and be deleted with the old layout —
    * stop streaming ingest for the swap window. Crash recovery: a
    * crash between the two renames leaves `assignments_old` complete
    * and `assignments` absent; rename `assignments_old` back to
    * recover (the stage directory is overwritten by the next run). */
  def compactAssignments(spark: SparkSession, path: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val live = new org.apache.hadoop.fs.Path(s"$path/assignments")
    val stage = new org.apache.hadoop.fs.Path(s"$path/assignments_stage")
    val old = new org.apache.hadoop.fs.Path(s"$path/assignments_old")
    spark.read.parquet(live.toString)
      .repartition(col("cluster"))
      .write.mode("overwrite").partitionBy("cluster")
      .parquet(stage.toString)
    if (fs.exists(old)) fs.delete(old, true)
    if (!fs.rename(live, old))
      throw new java.io.IOException(s"[GRAFT] compact: cannot move $live")
    if (!fs.rename(stage, live)) {
      fs.rename(old, live) // roll back
      throw new java.io.IOException(s"[GRAFT] compact: cannot move $stage")
    }
    fs.delete(old, true)
  }

  /** Approximate all-pairs similarity JOIN over a built index: vectors
    * sharing an IVF cluster are candidate pairs; exact distance
    * verifies < tau. The cluster partitioning bounds the self-join to
    * within-cluster blocks (the embedding analog of LSH banding);
    * recall follows cluster quality — pairs straddling a centroid
    * boundary need the complementary [[Dedup.embeddingNearDupLsh]]
    * route or a multiprobe assignment. Output: (a, b, dist_milli). */
  def similarityJoin(spark: SparkSession, path: String,
      tau: Double): DataFrame = {
    val meta = parseMeta(new String(
      Files.readAllBytes(Paths.get(path, "ivf.json")), StandardCharsets.UTF_8))
    val metric = Metric.parse(meta.metric)
    val t = spark.read.parquet(s"$path/assignments")
    val a = t.as("a")
    val b = t.as("b")
    a.join(b, col("a.cluster") === col("b.cluster") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("a"), col("b.id").as("b"),
        round(metric.dist(col("a.values"), col("b.values")) * 1000)
          .cast("long").as("dist_milli"))
      .filter(col("dist_milli") < math.round(tau * 1000))
  }

  private def normalized(v: org.apache.spark.sql.Column) = {
    val norm = sqrt(aggregate(transform(v,
      x => x.cast("double") * x.cast("double")), lit(0.0), (a, x) => a + x))
    transform(v, x => (x.cast("double") / norm).cast(FloatType))
  }
}
