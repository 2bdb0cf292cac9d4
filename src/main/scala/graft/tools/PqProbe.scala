package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators._

object PqProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select($"vec_id".as("id"), $"embedding".as("values"))
    val all = emb.as[(Long, Array[Float])].collect()
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      a.indices.foreach { i =>
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i) }
      1.0 - dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def brute(q: Array[Float], k: Int) =
      all.map { case (id, v) => (cos(v, q), id) }.sorted.take(k).map(_._2).toSet
    for ((m, ks, of) <- Seq((8, 64, 16), (16, 64, 8), (16, 64, 16), (16, 128, 8), (32, 64, 8))) {
      val p = java.nio.file.Files.createTempDirectory(s"pqp").toString
      PqIndex.build(emb, p, m = m, ks = ks, Metric.Cosine)
      val rs = all.take(10).map { case (_, q) =>
        val got = PqIndex.searchRefined(spark, p, emb, q, 10, overfetch = of)
          .select("id").as[Long].collect().toSet
        (got & brute(q, 10)).size / 10.0
      }
      println(f"[pq-probe] m=$m ks=$ks of=$of recall=${rs.sum / rs.length}%.3f min=${rs.min}%.2f")
    }
    spark.stop()
  }
}
