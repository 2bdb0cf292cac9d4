package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{CacheScope, Dedup, Packing, TextAnalysis, WorkCols}

/** One-JVM interleaved A/B for the curate pipeline's survivor-set
  * persist question (r18): variant A persists the anti-join output
  * before langid+packing (the pre-r18 shape), variant B feeds the
  * anti-join straight into the langid fold kernel. Same session, same
  * fixtures, alternating reps — the only honest comparison on a host
  * whose lap-to-lap spread exceeds the effect size. */
object AbCurateProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
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
    val osBean = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    import spark.implicits._

    val model = TextAnalysis.trainLangId(
      TextAnalysis.LangIdSeedCorpus.toDF("lang", "text")).cache()
    model.count()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def pipeline(persistSurv: Boolean): DataFrame = {
      val q = WorkCols.spread(docs).filter(
        TextAnalysis.qualityMilli(col("text")) >= 650L &&
        TextAnalysis.tokenCount(col("text")).between(20L, 90L)).persist()
      val drops = Dedup.simHashPairsPortable(q, maxHamming = 3)
        .select(col("b").as("doc_id")).distinct()
      val surv0 = q.join(drops, Seq("doc_id"), "left_anti")
      val surv = if (persistSurv) surv0.persist() else surv0
      val scored = TextAnalysis.scoreLangId(surv, model,
        carry = Seq("__nt" -> TextAnalysis.tokenCount(col("text"))))
      val code = graft.operators.Curation.SeedLangCodes.foldLeft(lit(4L)) {
        case (acc, (lang, c)) =>
          when(col("lang_pred") === lang, c).otherwise(acc)
      }
      val coded = scored.select(col("doc_id"), code.as("lang_code"),
        col("__nt"))
      val out = Packing.packBinsNextFit(coded, col("lang_code"),
        col("doc_id"), col("__nt"), 256, "doc_id")
      if (persistSurv) CacheScope.releaseWith(
        CacheScope.releaseWith(out, q), surv)
      else CacheScope.releaseWith(out, q)
    }

    def run(persistSurv: Boolean): (Double, Double) = {
      val c0 = osBean.getProcessCpuTime
      val t0 = System.nanoTime()
      val r = pipeline(persistSurv)
      r.agg(sum(col("bin_id"))).collect()
      CacheScope.releaseNow(r)
      ((System.nanoTime() - t0) / 1e9,
        (osBean.getProcessCpuTime - c0) / 1e9)
    }

    run(true); run(false) // warmup both
    val a = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
    val b = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
    (1 to reps).foreach { i =>
      a += run(true)
      b += run(false)
      println(f"[ab] rep $i  persist: wall=${a.last._1}%6.3f cpu=${a.last._2}%7.3f | no-persist: wall=${b.last._1}%6.3f cpu=${b.last._2}%7.3f")
    }
    def stats(xs: Seq[Double]) =
      f"min=${xs.min}%6.3f med=${xs.sorted.apply(xs.size / 2)}%6.3f"
    println(s"[ab] persist    wall ${stats(a.map(_._1).toSeq)}  cpu ${stats(a.map(_._2).toSeq)}")
    println(s"[ab] no-persist wall ${stats(b.map(_._1).toSeq)}  cpu ${stats(b.map(_._2).toSeq)}")
    spark.stop()
  }
}
