package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{IvfIndex, IvfPq, Knn, Metric}

/** One-off probe: where does the pruned-probe recall loss come from,
  * and what does closure assignment buy? At the ann_ivfpq_pruned
  * operating point (45 centroids, nProbe=16, m=32, overfetch=8),
  * measures parent-IVF exact recall, IVF-PQ refined recall, and the
  * assignment replication factor across (nAssign, assignEps). */
object PrunedRecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("values"))
    val nBase = e.count()
    val queries = e.orderBy(col("id").asc).limit(20)
      .select(col("id").as("qid"), col("values").as("qvalues"))
    val exact = Knn.exactBatch(e, queries, 10, Metric.Cosine)
      .select(col("qid"), col("id")).cache()
    exact.count()
    for ((nAssign, eps) <- Seq((2, -1.0), (3, -1.0), (3, 0.1), (3, 0.2),
        (3, 0.3), (3, 0.5), (4, 0.3), (4, 0.5))) {
      val ivf = java.nio.file.Files.createTempDirectory(s"prp-i").toString
      val pq = java.nio.file.Files.createTempDirectory(s"prp-p").toString
      IvfIndex.build(e, ivf, nCentroids = 45, Metric.Cosine,
        nAssign = nAssign, assignEps = eps)
      IvfPq.build(spark, ivf, pq, m = 32, ks = 64)
      val stored = spark.read.parquet(s"$ivf/assignments").count()
      val repl = stored.toDouble / nBase
      val ivfHits = IvfIndex.searchBatch(spark, ivf, queries, 10, nProbe = 16)
        .select(col("qid"), col("id")).intersect(exact).count()
      val pqHits = IvfPq.searchBatch(spark, ivf, pq, queries, 10,
        nProbe = 16, overfetch = 8)
        .select(col("qid"), col("id")).intersect(exact).count()
      println(f"[probe] nAssign=$nAssign eps=$eps%.1f repl=$repl%.2fx " +
        f"ivf=$ivfHits/200 pq=$pqHits/200")
    }
    spark.stop()
  }
}
