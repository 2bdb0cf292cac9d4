package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TimeSeries

class TimeSeriesSpec extends AnyFunSuite {
  lazy val spark = GraftTest.spark
  import spark.implicits._

  test("resampleLocf: dense buckets, zero-filled counts, LOCF values, " +
      "per-key spans") {
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)
    val ev = Seq(
      ("a", ts(0), 1.0), ("a", ts(30), 2.0), // bucket 0: n=2, vc=300
      ("a", ts(610), 4.0),                   // bucket 600; 300 is a GAP
      ("b", ts(900), 7.5))                   // b spans a single bucket
      .toDF("k0", "ts0", "v0")
    val out = TimeSeries.resampleLocf(ev, $"k0", $"ts0", $"v0",
        stepSec = 300L)
      .orderBy($"k", $"bucket")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      ("a", 0L, 2L, 300L),
      ("a", 300L, 0L, 300L), // gap: zero observations, value carried
      ("a", 600L, 1L, 400L),
      ("b", 900L, 1L, 750L))) // b's span does not bleed into a's
  }
}
