package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** SemDeDup-style semantic dedup (Dedup.semanticDedup): cluster-scoped
  * near-identical pruning with deterministic seed centroids. */
class SemDeDupSpec extends AnyFunSuite {
  lazy val spark = GraftTest.spark
  import spark.implicits._

  private def mkEmb(rows: Seq[(Long, Seq[Float])]) =
    rows.toDF("vec_id", "embedding")

  test("drops exact/near duplicates within a cluster, keeps lowest id") {
    // seed centroids = ids 1 (cluster A) and 2 (cluster B), orthogonal;
    // ids 3,4 duplicate id 1; id 12 duplicates id 2; id 20 is a
    // B-cluster singleton
    val e = mkEmb(Seq(
      1L  -> Seq(1f, 0f, 0f, 0f),
      2L  -> Seq(0f, 0f, 1f, 0f),
      3L  -> Seq(1f, 0f, 0f, 0f),
      4L  -> Seq(0.999f, 0.001f, 0f, 0f),
      12L -> Seq(0f, 0f, 1f, 0f),
      20L -> Seq(0f, 0f, 0.7f, 0.7f)))
    val dropped = Dedup.semanticDedup(e, Dedup.seedCentroids(e, 2),
        tauMilli = 100L)
      .orderBy($"vec_id").collect()
    assert(dropped.map(_.getLong(0)).toSeq == Seq(3L, 4L, 12L))
    // canonical is the lowest-id near-dup neighbor
    assert(dropped.map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(3L -> 1L, 4L -> 1L, 12L -> 2L))
    // survivors = anti-join on the dropped set
    val survivors = e.join(
        Dedup.semanticDedup(e, Dedup.seedCentroids(e, 2), 100L),
        Seq("vec_id"), "left_anti")
      .select($"vec_id").as[Long].collect().sorted
    assert(survivors.toSeq == Seq(1L, 2L, 20L))
  }

  test("comparisons never cross clusters: a near-dup pair straddling the " +
      "cluster boundary is not compared (the method's documented trade)") {
    // seed centroids = ids 1,2 (orthogonal); 3 and 4 are near-identical
    // to EACH OTHER (dist < 1 milli) but each lands in a different
    // cluster, and neither is within tau of anything in its own cluster
    val e = mkEmb(Seq(
      1L -> Seq(1f, 0f),
      2L -> Seq(0f, 1f),
      3L -> Seq(0.72f, 0.69f),
      4L -> Seq(0.69f, 0.72f)))
    val dropped = Dedup.semanticDedup(e, Dedup.seedCentroids(e, 2), 50L)
    assert(dropped.count() == 0L)
    // SOAR-style double assignment (nAssign=2) closes the blind spot:
    // 3 and 4 now share both clusters, the pair is compared, 4 drops
    val multi = Dedup.semanticDedup(e, Dedup.seedCentroids(e, 2), 50L,
      nAssign = 2).collect()
    assert(multi.map(r => r.getLong(0) -> r.getLong(1)).toSeq ==
      Seq(4L -> 3L))
  }

  test("maxCluster cap bounds a collapsed-embedding corpus") {
    // pathological: 500 identical vectors -> one cluster, O(n^2) pairs
    // uncapped; the cap drops the oversized cluster entirely (bounded
    // cost, documented completeness trade)
    val e = mkEmb((1L to 500L).map(i => i -> Seq(1f, 0f, 0f, 0f)))
    val capped = Dedup.semanticDedup(e, Dedup.seedCentroids(e, 2), 100L,
      maxCluster = 50)
    assert(capped.count() == 0L)
    val uncapped = Dedup.semanticDedup(e, Dedup.seedCentroids(e, 2), 100L)
    assert(uncapped.count() == 499L) // all but id 1 dropped
  }

  test("semanticDedup composes with IVF-trained centroids (production " +
      "path) and multi-assignment only widens the dropped set") {
    val emb = spark.read.parquet(s"${GraftTest.sf0001}/embeddings.parquet")
    val dir = java.nio.file.Files
      .createTempDirectory("semdedup_ivf").toString
    graft.operators.IvfIndex.build(
      emb.select($"vec_id".as("id"), $"embedding".as("values")),
      dir, nCentroids = 8, graft.operators.Metric.Cosine)
    val cents = spark.read.parquet(s"$dir/centroids")
      .select($"cluster".cast("long").as("cid"), $"centroid".as("cv"))
    val d1 = Dedup.semanticDedup(emb, cents, tauMilli = 600L).collect()
    // invariants: canonical is a lower id, distance under tau
    assert(d1.forall(r => r.getLong(1) < r.getLong(0)))
    assert(d1.forall(r => r.getLong(3) < 600L))
    // every drop is a TRUE near-dup per the exact all-pairs check
    val truePairs = Dedup.embeddingPairsWithin(
        emb.withColumn("g", lit(1)), "g", 0.6)
      .select($"a", $"b").as[(Long, Long)].collect().toSet
    assert(d1.forall(r => truePairs.contains((r.getLong(1), r.getLong(0)))))
    // double assignment can only ADD boundary pairs, never lose drops
    val ids1 = d1.map(_.getLong(0)).toSet
    val ids2 = Dedup.semanticDedup(emb, cents, 600L, nAssign = 2)
      .collect().map(_.getLong(0)).toSet
    assert(ids1.subsetOf(ids2))
  }

  test("kernel assignment route (big centroid sets) agrees with the " +
      "literal oracle route — including for NON-UNIT centroids") {
    val emb = spark.read.parquet(s"${GraftTest.sf0001}/embeddings.parquet")
    val cents = Dedup.seedCentroids(emb, 8)
    def drops(c: org.apache.spark.sql.DataFrame, kt: Int) =
      Dedup.semanticDedup(emb, c, 600L, kernelThreshold = kt)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(drops(cents, 0) == drops(cents, 64)) // kernel vs literal
    // IVF Lloyd centroids are never unit-norm: scale each seed
    // centroid by a different factor — cosine assignment is
    // direction-only, so BOTH routes must be invariant and agree
    val scaled = cents.withColumn("cv",
      transform($"cv", x => x * (pmod($"cid", lit(3)) + 1).cast("float")))
    assert(drops(scaled, 0) == drops(cents, 0))
    assert(drops(scaled, 64) == drops(cents, 64))
  }

  test("centroid collect is byte-gated: a centroid table past the " +
      "driver budget fails LOUDLY naming two-level clustering, " +
      "before any driver allocation") {
    val e = mkEmb(Seq(
      1L -> Seq(1f, 0f, 0f, 0f),
      2L -> Seq(0f, 0f, 1f, 0f),
      3L -> Seq(1f, 0f, 0f, 0f)))
    val key = "graft.collect.budget.bytes"
    val old = sys.props.get(key)
    // even 2 centroids at dim 4 estimate past a 64-byte budget — the
    // k ≈ √N SemDeDup regime in miniature (the ESTIMATE must trip:
    // no collect happens first)
    sys.props(key) = "64"
    try {
      val err = intercept[IllegalArgumentException] {
        Dedup.semanticDedup(e, Dedup.seedCentroids(e, 2), 100L)
      }
      assert(err.getMessage.contains("two-level clustering"),
        err.getMessage)
      assert(err.getMessage.contains("centroid table"), err.getMessage)
    } finally old match {
      case Some(v) => sys.props(key) = v
      case None => sys.props.remove(key)
    }
    // with the budget restored the same call serves
    assert(Dedup.semanticDedup(e, Dedup.seedCentroids(e, 2), 100L)
      .collect().map(_.getLong(0)).toSeq === Seq(3L))
  }

  test("probe-vs-corpus embedding near-dup join: finds cross-corpus dups, " +
      "cost scoped to the probe batch") {
    val corpus = mkEmb(Seq(
      1L -> Seq(1f, 0f, 0f, 0f),
      2L -> Seq(0f, 1f, 0f, 0f),
      3L -> Seq(0f, 0f, 1f, 0f)))
    val probe = mkEmb(Seq(
      101L -> Seq(1f, 0f, 0f, 0f),      // dup of corpus 1
      102L -> Seq(0f, 0.001f, 0f, 1f))) // near-orthogonal to everything
    val hits = Dedup.embeddingNearDupJoin(probe, corpus, tau = 0.1,
        bands = 2, bitsPerBand = 4)
      .select($"probe_id", $"corpus_id").as[(Long, Long)].collect().toSet
    assert(hits == Set((101L, 1L)))
    // corpus-side bucket cap bounds a boilerplate corpus: every corpus
    // vector identical -> one bucket of size 3 > cap 2 -> no candidates
    val boiler = mkEmb((1L to 3L).map(_ -> Seq(1f, 0f, 0f, 0f)))
    assert(Dedup.embeddingNearDupJoin(probe, boiler, 0.1,
      bands = 2, bitsPerBand = 4, maxBucket = 2).count() == 0L)
    // pre-banded corpus path gives identical results
    val preBanded = Dedup.bandCorpus(corpus, bands = 2, bitsPerBand = 4)
    val viaBanded = Dedup.embeddingNearDupJoin(probe, corpus, 0.1,
        bands = 2, bitsPerBand = 4, bandedCorpus = Some(preBanded))
      .select($"probe_id", $"corpus_id").as[(Long, Long)].collect().toSet
    assert(viaBanded == hits)
    // an EMPTY probe micro-batch returns empty instead of crashing
    assert(Dedup.embeddingNearDupJoin(probe.limit(0), corpus, 0.1,
      bands = 2, bitsPerBand = 4).count() == 0L)
    // probe/corpus dimension mismatch throws up front — per-side plane
    // derivation would otherwise band with unrelated families and
    // silently report "no dups"
    val probe8 = mkEmb(Seq(201L -> Seq(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)))
    val e = intercept[Exception] {
      Dedup.embeddingNearDupJoin(probe8, corpus, 0.1,
        bands = 2, bitsPerBand = 4)
    }
    assert(e.getMessage.contains("dimension mismatch"))
  }

  test("matryoshka staged rerank: prefix-scored candidates recover the " +
      "exact full-dimension top-10") {
    val emb = spark.read.parquet(s"${GraftTest.sf0001}/embeddings.parquet")
    val q = emb.filter($"vec_id" === 1L).head().getSeq[Float](1).toArray
    import graft.functions.vfs_cosine
    val exact = emb.select($"vec_id",
        vfs_cosine($"embedding", typedLit(q)).as("d"))
      .orderBy($"d".asc, $"vec_id".asc).limit(10)
      .select($"vec_id").as[Long].collect().toSet
    def staged(candidates: Int): Set[Long] =
      emb.select($"vec_id", $"embedding",
          vfs_cosine(slice($"embedding", 1, 16), typedLit(q.take(16)))
            .as("pd"))
        .orderBy($"pd".asc, $"vec_id".asc).limit(candidates)
        .select($"vec_id", vfs_cosine($"embedding", typedLit(q)).as("d"))
        .orderBy($"d".asc, $"vec_id".asc).limit(10)
        .select($"vec_id").as[Long].collect().toSet
    def recall(s: Set[Long]) = (exact intersect s).size.toDouble / exact.size
    // degenerate equality: candidate pool = whole corpus -> exact top-10
    assert(staged(500) == exact)
    // recall is monotone in the candidate budget, and a 10% budget
    // already recovers a usable fraction on weakly-aligned prefixes
    val r50 = recall(staged(50))
    assert(recall(staged(200)) >= r50)
    assert(r50 >= 0.3, s"staged recall@50=$r50")
  }
}
