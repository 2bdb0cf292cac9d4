package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators._

/** Recall curves for every index type — the operating-point table the
  * acceptance oracles (`ann_ivf_topk` / `ann_pq_recall` /
  * `ann_ivfpq_recall`, each gating recall ≥ 0.9 at ONE point) do not
  * show. Emitted as markdown rows for BENCHREPORT.md so index-quality
  * regressions are visible round-over-round, not just pass/fail.
  * Run: `sbt "runMain graft.tools.RecallProbe [sfDir] [nQueries]"`. */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nq = args.lift(1).map(_.toInt).getOrElse(20)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select($"vec_id".as("id"), $"embedding".as("values"))
    val all = emb.as[(Long, Array[Float])].collect()
    val queries = all.take(nq).map(_._2)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      a.indices.foreach { i =>
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i)
      }
      1.0 - dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def brute(q: Array[Float], k: Int): Set[Long] =
      all.map { case (id, v) => (cos(v, q), id) }.sorted.take(k)
        .map(_._2).toSet
    val exact = queries.map(q => q -> brute(q, 10)).toMap
    def recallOf(got: Array[Float] => Set[Long]): Double = {
      val rs = queries.map(q => (got(q) & exact(q)).size / 10.0)
      rs.sum / rs.length
    }

    val k = 10
    println(s"[recall-probe] corpus=${all.length} dim=${all.head._2.length} " +
      s"queries=$nq k=$k (recall@10, cosine)")

    // ---- IVF: recall vs nProbe, single vs multiprobe storage ----
    for (nAssign <- Seq(1, 2)) {
      val idx = java.nio.file.Files
        .createTempDirectory(s"recall-ivf$nAssign").toString
      IvfIndex.build(emb, idx, nCentroids = 45, Metric.Cosine,
        nAssign = nAssign)
      val cells = Seq(1, 2, 4, 8, 16, 32, 45).map { np =>
        val r = recallOf(q => IvfIndex.search(spark, idx, q, k,
          nProbe = np).select("id").as[Long].collect().toSet)
        f"$r%.3f"
      }
      println(s"| IVF nCentroids=45 nAssign=$nAssign | " +
        cells.mkString(" | ") + " |")
    }

    // ---- PQ (flat ADC + exact refine): recall vs m and overfetch ----
    for ((m, of) <- Seq((8, 4), (8, 16), (16, 4), (16, 16), (32, 4))) {
      val p = java.nio.file.Files.createTempDirectory("recall-pq").toString
      PqIndex.build(emb, p, m = m, ks = 64, Metric.Cosine)
      val r = recallOf(q => PqIndex.searchRefined(spark, p, emb, q, k,
        overfetch = of).select("id").as[Long].collect().toSet)
      println(f"| PQ m=$m ks=64 overfetch=$of | $r%.3f |")
    }

    // ---- IVF-PQ (probe + ADC + refine): recall vs m at nProbe=8 ----
    val ivfBase = java.nio.file.Files
      .createTempDirectory("recall-ivfbase").toString
    IvfIndex.build(emb, ivfBase, nCentroids = 45, Metric.Cosine)
    for (m <- Seq(8, 16, 32)) {
      val p = java.nio.file.Files.createTempDirectory("recall-ivfpq").toString
      IvfPq.build(spark, ivfBase, p, m = m, ks = 64)
      val r = recallOf(q => IvfPq.searchRefined(spark, ivfBase, p, q, k,
        nProbe = 8, overfetch = 4).select("id").as[Long].collect().toSet)
      println(f"| IVF-PQ m=$m ks=64 nProbe=8 overfetch=4 | $r%.3f |")
    }

    // ---- IVF-PQ at the DOCUMENTED defaults (multiprobe parent,
    // nProbe=16, overfetch=8) — the operating point the
    // `ann_ivfpq_pruned` acceptance row gates at >= 0.8 ----
    val ivfMp = java.nio.file.Files
      .createTempDirectory("recall-ivfmp").toString
    IvfIndex.build(emb, ivfMp, nCentroids = 45, Metric.Cosine,
      nAssign = 2)
    val pqMp = java.nio.file.Files
      .createTempDirectory("recall-ivfpqmp").toString
    IvfPq.build(spark, ivfMp, pqMp, m = 32, ks = 64)
    for ((np, of) <- Seq((8, 8), (16, 8), (16, 16))) {
      val r = recallOf(q => IvfPq.searchRefined(spark, ivfMp, pqMp, q, k,
        nProbe = np, overfetch = of).select("id").as[Long].collect().toSet)
      println(f"| IVF-PQ m=32 ks=64 nAssign=2 nProbe=$np overfetch=$of | $r%.3f |")
    }
    spark.stop()
  }
}
