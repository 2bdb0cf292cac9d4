package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off phase timing for the minhash_dedup bench entry — which of
  * signature / banding / bucket-cap / self-join / verify dominates at
  * sf0.1. Not part of the published surface. */
object MinhashProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .appName("graft-minhash-probe").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.coalescePartitions.enabled",
        sys.env.getOrElse("PROBE_COALESCE", "true"))
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Dedup

    for (k <- Seq("spark.sql.adaptive.enabled",
        "spark.sql.adaptive.coalescePartitions.enabled",
        "spark.sql.adaptive.coalescePartitions.parallelismFirst",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize"))
      println(s"[probe] $k = " +
        spark.conf.getOption(k).getOrElse("unset"))
    println(s"[probe] defaultParallelism = " +
      spark.sparkContext.defaultParallelism)

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    println(s"[probe] docs: ${docs.count()}")
    if (sys.env.contains("PROBE_PLAN")) {
      val p = Dedup.minHashLsh(docs, 0.8)
      p.count()
      java.nio.file.Files.write(
        java.nio.file.Paths.get("/tmp/minhash_plan.txt"),
        p.queryExecution.executedPlan.toString
          .getBytes("UTF-8"))
      spark.stop(); return
    }

    def time(name: String)(f: => Long): Unit = {
      // median of 3
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val med = ts.map(_._1).sorted.apply(1)
      println(f"[probe] $name%-28s ${med}%.3f s  (n=${ts.head._2})")
    }

    val banded = Dedup.bandedRelation(docs, "id", "text", "doc_id", 16, 4)
    time("banded (sig+explode)") { banded.count() }
    val capped = Dedup.capBuckets(banded, 1000)
    time("capped (window)") { capped.count() }
    val a = capped.as("a"); val b = capped.as("b")
    val cand = a.join(b,
        col("a.band") === col("b.band") && col("a.bsig") === col("b.bsig") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("a"), col("b.id").as("b"))
    time("candidates (self-join)") { cand.count() }
    val dd = cand.dropDuplicates("a", "b")
    time("candidates dedup") { dd.count() }
    time("full minHashLsh") { Dedup.minHashLsh(docs, 0.8).count() }

    // ---- bucket-fold experiment: groupBy+collect_list pair gen ----
    val buckets = banded.groupBy(col("band"), col("bsig"))
      .agg(sort_array(collect_list(col("id"))).as("ids"))
      .filter(size(col("ids")) <= 1000 && size(col("ids")) >= 2)
    val foldPairs = buckets
      .select(posexplode(col("ids")).as(Seq("i", "a")), col("ids"))
      .select(col("a"),
        explode(expr("slice(ids, i + 2, size(ids))")).as("b"))
    time("fold candidates") { foldPairs.count() }
    val foldDd = foldPairs.dropDuplicates("a", "b")
    time("fold candidates dedup") { foldDd.count() }
    foldPairs.cache().count()
    time("dedup alone (cached in)") { foldPairs.dropDuplicates("a", "b").count() }
    time("packed dedup (cached in)") {
      foldPairs.select((col("a") * 4294967296L + col("b")).as("p"))
        .dropDuplicates("p").count()
    }
    time("agg count (cached in)") {
      foldPairs.groupBy("a", "b").count().count()
    }
    foldPairs.unpersist()

    // ---- collapse experiment: LSH over identical-wordset reps ----
    val ws = docs.select(col("doc_id"), col("text"),
      array_sort(array_distinct(split(trim(lower(col("text"))), "\\s+")))
        .as("ws"))
    val reps = ws.groupBy(col("ws"))
      .agg(min(struct(col("doc_id"), col("text"))).as("rt"),
        count(lit(1)).as("gsize"))
      .select(col("rt.doc_id").as("doc_id"), col("rt.text").as("text"),
        col("gsize"))
    println(s"[probe] reps: ${reps.count()}")
    time("reps groupBy(ws)") { reps.count() }
    val rBanded = Dedup.bandedRelation(reps, "id", "text", "doc_id", 16, 4)
    val rCapped = Dedup.capBuckets(rBanded, 1000)
    val ra = rCapped.as("a"); val rb = rCapped.as("b")
    val rCand = ra.join(rb,
        col("a.band") === col("b.band") && col("a.bsig") === col("b.bsig") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("a"), col("b.id").as("b"))
      .dropDuplicates("a", "b")
    time("rep candidates dedup") { rCand.count() }
    time("rep minHashLsh") { Dedup.minHashLsh(reps, 0.8).count() }
    spark.stop()
  }
}
