package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-19 JIT-storm instrumentation (guide §1: measure first).
  *
  * The r18 driver run showed 13 queries 2-9x slower at 32 cores than
  * at 8 on the same binary — the C2 compile-queue pathology. This
  * probe reps selected bench entries and prints, per rep:
  *   - wall / process-CPU deltas (the interpreted-window cost),
  *   - JIT compilation-time delta (CompilationMXBean),
  *   - Janino compilation COUNT and generated-bytecode deltas from
  *     Spark's CodegenMetrics (a rep that re-Janino-compiles missed
  *     the codegen class cache → the JVM sees a brand-new class and
  *     starts interpreting from zero; a rep with zero fresh classes
  *     but a jit spike was a DEOPT/recompile of an existing one),
  *   - loaded-class count delta (ClassLoadingMXBean).
  *
  * Usage: sbt "runMain graft.tools.JitProbe [sfDir] [entry...]"
  * Env: GRAFT_JIT_REPS (default 6).
  */
object JitProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val which = args.drop(1).toSet
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
    val compBean = java.lang.management.ManagementFactory.getCompilationMXBean
    val clBean = java.lang.management.ManagementFactory.getClassLoadingMXBean
    val cg = org.apache.spark.metrics.source.CodegenMetrics
    def janinoCount: Long = cg.METRIC_SOURCE_CODE_SIZE.getCount
    def janinoMs: Long = {
      // METRIC_COMPILATION_TIME is a histogram of per-unit millis; the
      // running total lives in CodeGenerator._compileTime (driver side)
      org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
        .compileTime
    }

    import scala.jdk.CollectionConverters._
    def gcSec: Double = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala
      .map(b => math.max(0L, b.getCollectionTime)).sum / 1e3
    val codePools = java.lang.management.ManagementFactory
      .getMemoryPoolMXBeans.asScala.filter(_.getName.startsWith("CodeHeap"))
    def codeMb: String = codePools
      .map(p => f"${p.getName.replaceAll("CodeHeap '|'", "").take(8)}=${p.getUsage.getUsed / 1e6}%.0f")
      .mkString(",")

    // per-rep spill/GC attribution: a rep whose CPU doubles with flat
    // jit and a spill delta was a memory-pressure lottery loss (32
    // concurrent tasks share one execution-memory pool), not JIT
    val spillMem = new java.util.concurrent.atomic.AtomicLong
    val spillDisk = new java.util.concurrent.atomic.AtomicLong
    val shufWrite = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = te.taskMetrics
          if (m != null) {
            spillMem.addAndGet(m.memoryBytesSpilled)
            spillDisk.addAndGet(m.diskBytesSpilled)
            shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          }
        }
      })

    val reps = sys.env.get("GRAFT_JIT_REPS").map(_.toInt).getOrElse(6)
    def probe(name: String)(f: => Unit): Unit = {
      if (which.nonEmpty && !which.exists(name.startsWith)) return
      println(s"[jit] === $name ===")
      (0 until reps).foreach { i =>
        val c0 = osBean.getProcessCpuTime
        val j0 = compBean.getTotalCompilationTime
        val g0 = janinoCount
        val gc0 = gcSec
        val l0 = clBean.getTotalLoadedClassCount
        val sm0 = spillMem.get; val sd0 = spillDisk.get; val sw0 = shufWrite.get
        val t0 = System.nanoTime()
        f
        val w = (System.nanoTime() - t0) / 1e9
        val c = (osBean.getProcessCpuTime - c0) / 1e9
        val j = (compBean.getTotalCompilationTime - j0) / 1e3
        println(f"[jit] $name%-22s rep=$i wall=$w%7.3f cpu=$c%8.3f " +
          f"jit=$j%6.3f gc=${gcSec - gc0}%6.3f janino=${janinoCount - g0}%3d " +
          f"classes=${clBean.getTotalLoadedClassCount - l0}%5d " +
          f"spillMem=${(spillMem.get - sm0) / 1e6}%.0fMB spillDisk=${(spillDisk.get - sd0) / 1e6}%.0fMB " +
          f"shufW=${(shufWrite.get - sw0) / 1e6}%.0fMB code[$codeMb]MB")
      }
    }

    lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("values"))

    probe("jpeg_decode") {
      graft.SparkEntry.queries("multimodal_jpeg_color")(spark, sfDir).count()
    }
    probe("minhash_dedup") {
      graft.operators.Dedup.minHashLsh(docs, threshold = 0.8).count()
    }
    probe("gram_index_probe") {
      // standing index built once (lazy) like the bench fixture
      graft.operators.GramIndex.probeSpans(spark, gramIdxDir,
          docs.filter(col("doc_id") < 500))
        .agg(sum(col("span_tokens"))).collect()
    }
    probe("bm25_score") {
      graft.SparkEntry.queries("text_bm25")(spark, sfDir).count()
    }
    probe("snapshot_diff") {
      graft.SparkEntry.queries("src_snapshot_diff")(spark, sfDir).count()
    }
    probe("webp_decode") {
      graft.SparkEntry.queries("multimodal_webp")(spark, sfDir).count()
    }
    probe("margin_mining") {
      graft.operators.Mining.marginPairs(spark,
        emb.filter(col("id") % 2 === 0),
        emb.filter(col("id") % 2 === 1), k = 4).count()
    }
    probe("exactbatch_persist") {
      val queries = emb.limit(100)
        .select(col("id").as("qid"), col("values").as("qvalues"))
      graft.operators.Knn.exactBatch(emb, queries, 10,
        graft.operators.Metric.Cosine).count()
    }
    probe("exactbatch_nopersist") {
      val queries = emb.limit(100)
        .select(col("id").as("qid"), col("values").as("qvalues"))
      graft.operators.Knn.exactBatch(emb, queries, 10,
        graft.operators.Metric.Cosine, persistQueries = false).count()
    }

    // codegen-diff mode: build the exactBatch frame twice (fresh
    // DataFrames, identical logical query), hash every generated
    // unit's source, and print which units' text CHANGES between
    // builds — those are the per-rep Janino recompiles
    if (which.contains("codegen_diff")) {
      import org.apache.spark.sql.execution.debug._
      def unitHashes(tag: String): Map[String, String] = {
        val queries = emb.limit(100)
          .select(col("id").as("qid"), col("values").as("qvalues"))
        val df = graft.operators.Knn.exactBatch(emb, queries, 10,
          graft.operators.Metric.Cosine, persistQueries = false)
        df.count()
        val s = df.queryExecution.debug.codegenToSeq()
        s.zipWithIndex.map { case ((sub, code, _), i) =>
          val md = java.security.MessageDigest.getInstance("MD5")
            .digest(code.getBytes("UTF-8")).map("%02x".format(_)).mkString
          (s"$tag-unit$i", md + "  " + sub.linesIterator.next().take(90))
        }.toMap
      }
      val a = unitHashes("a")
      val b = unitHashes("b")
      val am = a.map { case (k, v) => (k.drop(2), v) }
      val bm = b.map { case (k, v) => (k.drop(2), v) }
      (am.keySet ++ bm.keySet).toSeq.sorted.foreach { k =>
        val ha = am.getOrElse(k, "-")
        val hb = bm.getOrElse(k, "-")
        val mark = if (ha.take(32) == hb.take(32)) "same" else "DIFF"
        println(s"[codegen-diff] $k $mark\n  a: $ha\n  b: $hb")
      }
    }

    lazy val gramIdxDir = {
      val d = java.nio.file.Files.createTempDirectory("jitprobe").toString
      graft.operators.GramIndex.build(
        docs.filter(col("doc_id") >= 500), d, k = 4)
      d
    }

    spark.stop()
  }
}
