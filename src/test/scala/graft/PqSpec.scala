package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators._

class PqSpec extends AnyFunSuite {
  lazy val spark = GraftTest.spark
  import spark.implicits._

  private lazy val emb = spark.read
    .parquet(s"${GraftTest.sf0001}/embeddings.parquet")
    .select($"vec_id".as("id"), $"embedding".as("values"))

  private lazy val all: Array[(Long, Array[Float])] =
    emb.as[(Long, Array[Float])].collect()

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    a.indices.foreach { i =>
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
      nb += b(i).toDouble * b(i)
    }
    1.0 - dot / (math.sqrt(na) * math.sqrt(nb))
  }

  private def bruteTopK(q: Array[Float], k: Int): Seq[Long] =
    all.map { case (id, v) => (cos(v, q), id) }.sorted.take(k).map(_._2).toSeq

  test("PQ codes: 32x compression, deterministic, bounded reconstruction") {
    val dir = Files.createTempDirectory("pq").toString
    PqIndex.build(emb, dir, m = 8, ks = 32, Metric.Cosine)
    val codes = spark.read.parquet(s"$dir/codes")
      .as[(Long, Array[Byte])].collect().toMap
    assert(codes.size === all.length)
    assert(codes.values.forall(_.length === 8)) // 8 bytes vs 256 raw
    // deterministic: a second build produces byte-identical codes
    val dir2 = Files.createTempDirectory("pq2").toString
    PqIndex.build(emb, dir2, m = 8, ks = 32, Metric.Cosine)
    val codes2 = spark.read.parquet(s"$dir2/codes")
      .as[(Long, Array[Byte])].collect().toMap
    assert(codes.view.mapValues(_.toSeq).toMap ===
      codes2.view.mapValues(_.toSeq).toMap)
    // parameter guards
    intercept[IllegalArgumentException] {
      PqIndex.build(emb, dir2, m = 7, ks = 32) // 64 % 7 != 0
    }
    intercept[graft.store.InvalidVectorException] {
      PqIndex.search(spark, dir, Array(1f, 2f), 5)
    }
  }

  test("PQ ADC + exact refine: recall@10 >= 0.9 vs brute force") {
    val dir = Files.createTempDirectory("pq_recall").toString
    PqIndex.build(emb, dir, m = 8, ks = 32, Metric.Cosine)
    // plain ADC is lossy on uniform data — it only needs to KEEP the
    // true neighbors inside the overfetch window; refine restores order
    val queries = all.take(15)
    val refined = queries.map { case (_, q) =>
      val got = PqIndex.searchRefined(spark, dir, emb, q, 10,
        overfetch = 8).select("id").as[Long].collect().toSet
      (got & bruteTopK(q, 10).toSet).size / 10.0
    }
    val recall = refined.sum / refined.length
    assert(recall >= 0.9, s"refined recall@10 = $recall")
    // the refine output is ordered by the requested metric's exact
    // distance and carries it
    val one = PqIndex.searchRefined(spark, dir, emb, queries.head._2, 5,
      overfetch = 8).as[(Long, Double)].collect()
    assert(one.map(_._2).toSeq === one.map(_._2).sorted.toSeq)
  }
}
