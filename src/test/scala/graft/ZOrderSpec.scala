package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ZOrderMath
import graft.store.ZOrderLayout

class ZOrderSpec extends AnyFunSuite {
  lazy val spark = GraftTest.spark
  import spark.implicits._

  test("morton interleave matches the bit-by-bit reference") {
    def reference(x: Long, y: Long): Long = {
      var z = 0L
      (0 until 32).foreach { i =>
        z |= ((x >> i) & 1L) << (2 * i)
        z |= ((y >> i) & 1L) << (2 * i + 1)
      }
      z
    }
    val rnd = new scala.util.Random(3)
    (0 until 2000).foreach { _ =>
      val x = rnd.nextLong() & 0xFFFFFFFFL
      val y = rnd.nextLong() & 0xFFFFFFFFL
      assert(ZOrderMath.interleave(x, y) === reference(x, y), s"($x,$y)")
    }
    assert(ZOrderMath.interleave(0, 0) === 0L)
    assert(ZOrderMath.interleave(1, 0) === 1L)
    assert(ZOrderMath.interleave(0, 1) === 2L)
    assert(ZOrderMath.interleave(0xFFFFFFFFL, 0xFFFFFFFFL) === -1L)
  }

  test("z-order layout prunes a 2-d box scan vs a linear sort") {
    // 200k points on a 1000x1000 grid; query a 50x50 box (0.25% of the
    // domain). With row-group stats, the z-ordered layout should read
    // far fewer rows than the same data sorted by x alone (whose row
    // groups span all of y).
    val n = 200000
    val df = spark.range(n).select(
      (pmod(hash($"id"), lit(1000))).cast("long").as("x"),
      (pmod(hash($"id", lit(1)), lit(1000))).cast("long").as("y"),
      $"id".as("payload"))
    // small parquet row groups: pruning granularity is the ROW GROUP,
    // and with default 128MB blocks each file here is a single group —
    // both layouts would degenerate to file-level skipping
    val base = java.nio.file.Files.createTempDirectory("zorder").toString
    val smallGroups = Map(
      "parquet.block.size" -> (16 * 1024).toString,
      "parquet.page.size" -> (8 * 1024).toString)
    ZOrderLayout.writeZOrdered(df, s"$base/z", "x", "y", nFiles = 16,
      options = smallGroups)
    // total sort key (payload breaks x-ties): without it, tie order —
    // and so each row group's incidental y-stats — depends on shuffle
    // fetch order, and the measured ratio wobbles run to run
    df.repartitionByRange(16, $"x")
      .sortWithinPartitions($"x", $"payload")
      .write.mode("overwrite").options(smallGroups)
      .parquet(s"$base/linear")

    def scannedRows(path: String): (Long, Long) = {
      val q = spark.read.parquet(path)
        .filter($"x" >= 100 && $"x" < 150 && $"y" >= 700 && $"y" < 750)
      // collect() (not count()) so the metrics belong to THIS plan —
      // count() builds and executes a separate aggregated plan
      val res = q.collect().length.toLong
      val scan = q.queryExecution.executedPlan.collectLeaves().head
      (scan.metrics("numOutputRows").value, res)
    }
    val (zScanned, zHits) = scannedRows(s"$base/z")
    val (lScanned, lHits) = scannedRows(s"$base/linear")
    assert(zHits === lHits, "both layouts must return identical results")
    // measured: z ~5.4k vs linear ~10.4k (1.9x) with deterministic
    // layouts — assert a 1.5x floor, not the knife-edge 2x
    assert(zScanned * 3 < lScanned * 2,
      s"z-order scanned $zScanned rows vs linear $lScanned — expected >1.5x pruning")
    assert(zScanned * 10 < n,
      s"z-order scanned $zScanned of $n rows — box scan must prune >90%")
  }
}
