package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Reproducer for the intermittent 16x-CPU reps seen in the full
  * bench (minhash_dedup rep CPU 18 vs 290 s on identical work, GC
  * exonerated by gc_times): runs one entry many times in one JVM and
  * prints wall, process-CPU, GC and JIT-compilation deltas per rep. */
object FilteredKnnProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(10)
    val which = args.lift(2).getOrElse("minhash")
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
    val compBean = java.lang.management.ManagementFactory
      .getCompilationMXBean
    import scala.jdk.CollectionConverters._
    def gcMs: Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala
      .map(b => math.max(0L, b.getCollectionTime)).sum
    import graft.operators._

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("values"))

    lazy val fkp: () => Long = {
      val q = emb.limit(1).collect()(0).getSeq[Float](1).toArray
      val tmp = java.nio.file.Files.createTempDirectory("fkp").toString
      val ivfDir = s"$tmp/ivf"
      val nCent = math.max(2, math.sqrt(emb.count().toDouble).toInt)
      IvfIndex.build(emb, ivfDir, nCent, Metric.Cosine)
      val ivfpqDir = s"$tmp/ivfpq"
      IvfPq.build(spark, ivfDir, ivfpqDir, m = 32, ks = 64)
      () => {
        val allowed = emb.filter(col("id") % 3 === 0).select(col("id"))
        IvfPq.searchRefined(spark, ivfDir, ivfpqDir, q,
          10, nProbe = 16, overfetch = 8, allowed = Some(allowed)).count()
      }
    }
    val body: () => Long = which match {
      case "minhash" => () => Dedup.minHashLsh(docs, threshold = 0.8).count()
      case "fkp" => fkp
      case "lm" => () =>
        graft.SparkEntry.queries("text_lm_score")(spark, sfDir).count()
      case "shstats" => () => {
        // duplicate-emission factor of the simhash band fold: how many
        // (band-collision, hamming<=3) pair rows reach the dedup
        // exchange vs how many distinct pairs leave it
        val q = docs.filter(
          TextAnalysis.qualityMilli(col("text")) >= 650L &&
          TextAnalysis.tokenCount(col("text")).between(20L, 90L))
        val sigs = q.select(col("doc_id").as("id"),
          graft.functions.vfs_simhash(col("text"), 60, portable = true)
            .as("sig"))
        val banded = sigs
          .select(col("id"), col("sig"),
            explode(sequence(lit(0), lit(3))).as("band"))
          .select(col("id"), col("sig"), col("band"),
            call_function("shiftright", col("sig"), col("band") * 16)
              .bitwiseAND(0xffffL).as("bval"))
        val bstats = banded.groupBy(col("band"), col("bval"))
          .agg(count(lit(1)).as("n"))
          .agg(sum(col("n")).as("rows"),
            sum(col("n") * (col("n") - 1) / 2).as("cand_pairs"),
            max(col("n")).as("max_bucket")).collect()(0)
        println(s"[shstats] banded_rows=${bstats.getLong(0)} " +
          s"cand_pairs=${bstats.getLong(1)} max_bucket=${bstats.getLong(2)}")
        val a = banded.as("a"); val b = banded.as("b")
        val emitted = a.join(b,
            col("a.band") === col("b.band") && col("a.bval") === col("b.bval")
              && col("a.id") < col("b.id"))
          .filter(call_function("bit_count",
            col("a.sig").bitwiseXOR(col("b.sig"))) <= 3)
        val pre = emitted.count()
        val post = emitted.select(col("a.id"), col("b.id")).distinct().count()
        println(s"[shstats] emitted_pairs=$pre distinct_pairs=$post " +
          f"dup_factor=${pre.toDouble / math.max(1, post)}%.2f")
        post
      }
      case other => sys.error(s"unknown probe $other")
    }

    (1 to reps).foreach { i =>
      val g0 = gcMs; val j0 = compBean.getTotalCompilationTime
      val c0 = osBean.getProcessCpuTime
      val t0 = System.nanoTime()
      val n = body()
      val w = (System.nanoTime() - t0) / 1e9
      val c = (osBean.getProcessCpuTime - c0) / 1e9
      val g = (gcMs - g0) / 1e3
      val j = (compBean.getTotalCompilationTime - j0) / 1e3
      println(f"[rep] $i%2d wall=$w%7.3f cpu=$c%8.3f gc=$g%6.3f jit=$j%7.3f rows=$n")
    }
    spark.stop()
  }
}
