package graft.tools

import java.io.{File, FileOutputStream, PrintStream}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-19 top-up for [[PlanDumpR18]]: dumps only the shapes this
  * round's operator changes touched (passageDedup's survivor
  * selection, the containment verify kernel) so before/after plan
  * evidence exists without re-running the full dumper in the
  * before-worktree.
  *
  * Usage: sbt "runMain graft.tools.PlanDumpExtraR19 [sfDir] [suffix] [outDir]"
  */
object PlanDumpExtraR19 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val suffix = if (args.length > 1) args(1) else "after"
    val outDirName = if (args.length > 2) args(2) else "plans/r19"
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

    val outDir = new File(outDirName)
    outDir.mkdirs()
    def dump(name: String)(df: => DataFrame): Unit = {
      val f = new File(outDir, s"${name}_$suffix.txt")
      val ps = new PrintStream(new FileOutputStream(f), true, "UTF-8")
      try {
        Console.withOut(ps) {
          try df.explain("formatted")
          catch { case e: Throwable =>
            println(s"EXPLAIN FAILED: ${graft.Verify.errHead(e)}")
          }
        }
      } finally ps.close()
      System.err.println(s"[plandump-extra] wrote ${f.getPath}")
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    dump("passage_dedup") {
      graft.operators.Dedup.passageDedup(docs, windowWords = 50)
    }
    dump("containment_pairs") {
      graft.operators.Dedup.containmentPairs(docs, threshold = 0.9)
    }
    spark.stop()
  }
}
