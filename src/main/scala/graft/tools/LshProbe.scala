package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev tool: stage-split timing of the MinHash-LSH dedup pipeline
  * (signatures -> banding -> bucket join -> dedup -> exact verify).
  * Run: `sbt "runMain graft.tools.LshProbe [sfDir]"`. */
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.shims
object LshProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(args.headOption.getOrElse("/root/testdata/sf0.1") + "/documents.parquet")
    def time[T](n: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[lsh-probe] $n: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val bands = 16; val rpb = 4
    val banded = docs.select(col("doc_id").as("id"),
        shims.column(graft.functions.MinHashSig(
          shims.expression(col("text")), bands * rpb)).as("sig"))
      .select(col("id"), col("sig"),
        explode(sequence(lit(0), lit(bands - 1))).as("band"))
      .select(col("id"), col("band"),
        hash(slice(col("sig"), col("band") * rpb + 1, lit(rpb))).as("bsig"))
    time("signatures+banding only")(banded.count())
    val w = Window.partitionBy(col("band"), col("bsig"))
    val capped = banded.withColumn("n", count(lit(1)).over(w))
      .filter(col("n") <= 1000).drop("n")
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
