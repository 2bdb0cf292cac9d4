package graft.tools

/** Dev tool: stage-split timing of the MinHash-LSH dedup pipeline
  * (signatures -> banding -> bucket join -> dedup -> exact verify),
  * built from the SAME Dedup building blocks as production so the
  * stage numbers decompose the real pipeline (a drifted copy here once
  * measured a murmur-bucketed shape the code no longer runs).
  * Run: `sbt "runMain graft.tools.LshProbe [sfDir]"`. */
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object LshProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(
      args.headOption.getOrElse("/root/testdata/sf0.1") + "/documents.parquet")
    def time[T](n: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[lsh-probe] $n: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val banded = graft.operators.Dedup
      .bandedRelation(docs, "id", "text", "doc_id", 16, 4)
    time("signatures+banding only")(banded.count())
    val capped = graft.operators.Dedup.capBuckets(banded, 1000)
    val a = capped.as("a"); val b = capped.as("b")
    val cand = a.join(b, col("a.band") === col("b.band") &&
        col("a.bsig") === col("b.bsig") && col("a.id") < col("b.id"))
      .select(col("a.id").as("a"), col("b.id").as("b"))
    val preDedup = time("bucket self-join (pre-dedup)")(cand.count())
    val cd = time("dropDuplicates")(cand.dropDuplicates("a", "b").count())
    println(s"[lsh-probe] pairs pre-dedup=$preDedup deduped=$cd")
    val v = time("full minHashLsh")(
      graft.operators.Dedup.minHashLsh(docs, 0.8).count())
    println(s"[lsh-probe] verified pairs = $v")
  }
}
