package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-level timing of IvfIndex.build against the bench corpus —
  * isolates sample / train / assign+write / centroid-write cost so
  * build optimization targets the real bottleneck instead of guesses.
  * Run: sbt "runMain graft.tools.BuildProbe [sfDir]". */
object BuildProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[buildprobe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("values"))
    emb.count() // warm
    val root = java.nio.file.Files.createTempDirectory("buildprobe").toString
    var n = 0L
    time("count") { n = emb.count() }
    val k = math.max(2, math.sqrt(n.toDouble).toInt)
    // full build twice: cold then warm (codegen/committer warm-up)
    time("build cold")(graft.operators.IvfIndex.build(emb, s"$root/i1", k))
    time("build warm")(graft.operators.IvfIndex.build(emb, s"$root/i2", k))
    // phase isolation (mirrors build's internal passes)
    import spark.implicits._
    val prepared = emb.select(col("id"),
      transform(col("values"), x => x.cast("float")).as("values"))
    time("sample pass (collect)") {
      prepared.as[(Long, Array[Float])].mapPartitions(it => it.take(5000))
        .collect()
    }
    time("plain write unpartitioned") {
      prepared.write.mode("overwrite").parquet(s"$root/plain")
    }
    time("repartition+partitionBy") {
      prepared.withColumn("cluster", pmod(col("id"), lit(k)).cast("int"))
        .repartition(col("cluster"))
        .write.mode("overwrite").partitionBy("cluster")
        .parquet(s"$root/parts")
    }
    time("centroid coalesce(1) write") {
      spark.createDataFrame((0 until k).map(i => (i, Array.fill(64)(0.1f))))
        .toDF("cluster", "centroid")
        .coalesce(1).write.mode("overwrite").parquet(s"$root/cents")
    }
    spark.stop()
  }
}
