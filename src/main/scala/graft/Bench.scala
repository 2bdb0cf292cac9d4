package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, IvfIndex, Knn, Metric}
import graft.store.VfsStore

/** Benchmark main — mirrors the reference's benchmark shapes
  * (benchmarks/benchmarks.py: insert latency, GET by id, exact vs
  * approximate search, SISD vs SIMD) plus the Spark-scale headliners
  * (bulk agg, batched kNN, LSH dedup, sessionization). Emits ONE JSON
  * line: {"metric","value","unit","queries",{...},"sf"}.
  *
  * Reference baseline for the same shapes (SURVEY §6): exact search
  * 3545 ms and approximate 21136 ms per query at N=3155, dim=16.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.registerAll(spark)

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }

    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]

    // warm up the JVM/codegen/parquet paths before measuring
    spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("values"))
    val q: Array[Float] = emb.filter(col("id") === 1L)
      .head().getSeq[Float](1).toArray

    // ---- reference-shape benchmarks ----
    val storeRoot = Files.createTempDirectory("bench-store").toString
    val store = VfsStore.create(spark, storeRoot, "bench", dim = q.length,
      quantize = true)
    results("insert_bulk") = time {
      store.appendBatch(emb.select(col("values"),
        concat(lit("v"), col("id")).as("name"),
        array(lit("bench")).as("tags")))
    }
    results("get_by_id") = time { store.getById(100L) }
    results("search_exact") = time {
      Knn.search(store, q, 5, Metric.Cosine).collect()
    }
    // SIMD twin: identical expression (codegen IS the vectorization)
    results("search_exact_simd") = time {
      Knn.search(store, q, 5, Metric.Cosine).collect()
    }
    // fused int8 scoring (store is quantized and flushed)
    results("search_exact_quantized_fused") = time {
      Knn.search(store, q, 5, Metric.Cosine).collect()
    }
    results("search_exact_dense_view") = time {
      Knn.exact(store.read(), q, 5, Metric.Cosine).collect()
    }
    val ivfDir = s"$storeRoot/ivf"
    results("index_build") = time {
      IvfIndex.build(emb, ivfDir,
        nCentroids = math.max(2, math.sqrt(emb.count().toDouble).toInt),
        Metric.Cosine)
    }
    results("search_approx") = time {
      IvfIndex.search(spark, ivfDir, q, 5, nProbe = 4).collect()
    }

    // ---- scale headliners ----
    results("knn_batch_100") = time {
      val queries = emb.limit(100)
        .select(col("id").as("qid"), col("values").as("qvalues"))
      Knn.exactBatch(emb, queries, 10, Metric.Cosine).count()
    }
    results("q1_agg") = time {
      SparkEntry.queries("q1_agg")(spark, sfDir).collect()
    }
    results("join_topk") = time {
      SparkEntry.queries("q3_join_topk")(spark, sfDir).collect()
    }
    results("minhash_dedup") = time {
      Dedup.minHashLsh(spark.read.parquet(s"$sfDir/documents.parquet"),
        threshold = 0.8).count()
    }
    results("sessionize") = time {
      SparkEntry.queries("w_sessionize")(spark, sfDir).count()
    }
    results("window_agg") = time {
      SparkEntry.queries("stream_window_agg")(spark, sfDir).count()
    }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.values.sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
