package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Dev-only profiling probe for the minhash-LSH dedup pipeline stage
  * timings (not part of the engine surface). */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    println(s"[probe] docs=${docs.count()}")

    val sigs = docs.select(col("doc_id").as("id"),
      Dedup.minHashSignature(col("text"), 64).as("sig"))
    val banded = sigs
      .select(col("id"), col("sig"), explode(sequence(lit(0), lit(15))).as("band"))
      .select(col("id"), col("band"),
        hash(slice(col("sig"), col("band") * 4 + 1, lit(4))).as("bsig"))
    time("banded (new shape)")(banded.count())

    val bucketW = Window.partitionBy(col("band"), col("bsig"))
    val capped = banded
      .withColumn("bucket_n", count(lit(1)).over(bucketW))
      .filter(col("bucket_n") <= 1000)
      .drop("bucket_n")
    val a = capped.as("a")
    val b = capped.as("b")
    val rawCand = a.join(b,
        col("a.band") === col("b.band") && col("a.bsig") === col("b.bsig") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("a"), col("b.id").as("b"))
    time("raw candidates")(rawCand.count())
    val cand = rawCand.dropDuplicates("a", "b")
    time("deduped candidates")(cand.count())

    // verify stage in isolation
    def wordSetCol(c: org.apache.spark.sql.Column) =
      array_distinct(split(trim(lower(c)), "\\s+"))
    val words = docs.select(col("doc_id").as("id"),
      wordSetCol(col("text")).as("words"))
    val verified = cand
      .join(words.select(col("id").as("a"), col("words").as("wa")), Seq("a"))
      .join(words.select(col("id").as("b"), col("words").as("wb")), Seq("b"))
      .filter(size(col("wa")).cast("double") >= size(col("wb")) * 0.8 &&
        size(col("wb")).cast("double") >= size(col("wa")) * 0.8)
      .withColumn("jaccard_milli", Dedup.jaccardMilli(col("wa"), col("wb")))
      .filter(col("jaccard_milli") >= 800)
    time("verify stage")(verified.count())

    val full = time("full minHashLsh")(
      Dedup.minHashLsh(docs, threshold = 0.8).count())
    println(s"[probe] out pairs=$full")
    spark.stop()
  }
}
