package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AsOfJoin

class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = GraftTest.spark
  import spark.implicits._

  test("backward as-of join picks latest right row <= left ts, per key") {
    val left = Seq(
      (1L, 100L, 10L), (2L, 100L, 25L), (3L, 100L, 5L),
      (4L, 200L, 50L)
    ).toDF("lid", "user", "lts")
    val right = Seq(
      (100L, 10L, 1.0), (100L, 20L, 2.0), // user 100
      (200L, 50L, 9.0)
    ).toDF("user", "rts", "pval")
    val out = AsOfJoin.backward(left, right, "user", "lts", "rts",
        Seq("pval"))
      .select($"lid", $"pval").as[(Long, Option[Double])]
      .collect().toMap
    assert(out(1L) === Some(1.0))  // ts=10: simultaneous right row counts
    assert(out(2L) === Some(2.0))  // ts=25: latest is 20 -> 2.0
    assert(out(3L) === None)       // ts=5: nothing at or before
    assert(out(4L) === Some(9.0))  // other key
  }

  test("a matching right row with NULL payload beats an older non-null row") {
    val left = Seq((1L, 100L, 90L)).toDF("lid", "user", "lts")
    val right = Seq((100L, 10L, Some(5.0)), (100L, 50L, None))
      .toDF("user", "rts", "pval")
    val out = AsOfJoin.backward(left, right, "user", "lts", "rts",
        Seq("pval"))
      .select($"lid", $"pval").as[(Long, Option[Double])].collect().toMap
    // latest right row at ts=50 has NULL payload — that row (not the
    // older 5.0) is the as-of match
    assert(out(1L) === None)
  }

  test("nearest as-of join picks the closer side; ties and one-sided " +
      "matches resolve backward/available; numeric ts supported") {
    val left = Seq(
      (1L, 100L, 12L),  // bwd 10 (gap 2) vs fwd 20 (gap 8) -> bwd 1.0
      (2L, 100L, 19L),  // bwd 10 (gap 9) vs fwd 20 (gap 1) -> fwd 2.0
      (3L, 100L, 15L),  // equidistant (5 both) -> BACKWARD 1.0
      (4L, 100L, 5L),   // nothing before -> fwd 1.0
      (5L, 100L, 99L),  // nothing after -> bwd 2.0
      (6L, 300L, 50L)   // key with no right rows at all -> null
    ).toDF("lid", "user", "lts")
    val right = Seq(
      (100L, 10L, 1.0), (100L, 20L, 2.0)
    ).toDF("user", "rts", "pval")
    val out = AsOfJoin.nearest(left, right, "user", "lts", "rts",
        Seq("pval"), matchedTsAs = Some("mts"))
      .select($"lid", $"pval", $"mts")
      .as[(Long, Option[Double], Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) === ((Some(1.0), Some(10L))))
    assert(out(2L) === ((Some(2.0), Some(20L))))
    assert(out(3L) === ((Some(1.0), Some(10L)))) // tie -> backward
    assert(out(4L) === ((Some(1.0), Some(10L))))
    assert(out(5L) === ((Some(2.0), Some(20L))))
    assert(out(6L) === ((None, None)))
  }

  test("nearest as-of join over timestamp columns (incl. NTZ)") {
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)
    val left = Seq((1L, 7L, ts(100)), (2L, 7L, ts(260)))
      .toDF("lid", "user", "lts")
    val right = Seq((7L, ts(90), 1.0), (7L, ts(300), 2.0))
      .toDF("user", "rts", "pval")
    val out = AsOfJoin.nearest(left, right, "user", "lts", "rts",
        Seq("pval"))
      .select($"lid", $"pval").as[(Long, Option[Double])].collect().toMap
    assert(out(1L) === Some(1.0)) // gap 10 back vs 200 fwd
    assert(out(2L) === Some(2.0)) // gap 170 back vs 40 fwd
    // NTZ flavor: same instants, cast to TIMESTAMP_NTZ on both sides
    import org.apache.spark.sql.types.TimestampNTZType
    val leftN = left.withColumn("lts", $"lts".cast(TimestampNTZType))
    val rightN = right.withColumn("rts", $"rts".cast(TimestampNTZType))
    val outN = AsOfJoin.nearest(leftN, rightN, "user", "lts", "rts",
        Seq("pval"))
      .select($"lid", $"pval").as[(Long, Option[Double])].collect().toMap
    assert(outN === out)
  }

  test("nearest as-of with tolerance: out-of-bound sides fall back to " +
      "the in-bound side; neither in bound -> null; edge is inclusive") {
    val left = Seq(
      (1L, 100L, 12L),  // bwd gap 2 in-tol, fwd gap 8 in-tol -> bwd 1.0
      (2L, 100L, 14L),  // bwd gap 4 in-tol; fwd gap 6 OUT (tol 5) -> bwd
      (3L, 100L, 17L),  // bwd gap 7 OUT; fwd gap 3 in-tol -> fwd 2.0
      (4L, 100L, 40L),  // bwd gap 20 OUT, no fwd -> null
      (5L, 100L, 15L),  // both gaps exactly 5 = tol (inclusive) -> bwd
      (6L, 200L, 25L)   // only a fwd match, gap exactly 5 = tol -> fwd
    ).toDF("lid", "user", "lts")
    val right = Seq(
      (100L, 10L, 1.0), (100L, 20L, 2.0), (200L, 30L, 2.0)
    ).toDF("user", "rts", "pval")
    val out = AsOfJoin.nearest(left, right, "user", "lts", "rts",
        Seq("pval"), matchedTsAs = Some("mts"), toleranceUs = Some(5L))
      .select($"lid", $"pval", $"mts")
      .as[(Long, Option[Double], Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) === ((Some(1.0), Some(10L))))
    assert(out(2L) === ((Some(1.0), Some(10L))))
    assert(out(3L) === ((Some(2.0), Some(20L))))
    assert(out(4L) === ((None, None))) // matched ts nulled too
    assert(out(5L) === ((Some(1.0), Some(10L)))) // tie at the edge -> bwd
    assert(out(6L) === ((Some(2.0), Some(30L)))) // fwd inclusive edge
  }

  test("nearest with a tolerance wider than every gap equals the " +
      "untolerated nearest (tolerance only ever removes matches)") {
    val left = Seq(
      (1L, 100L, 12L), (2L, 100L, 19L), (3L, 100L, 15L),
      (4L, 100L, 5L), (5L, 100L, 99L), (6L, 300L, 50L)
    ).toDF("lid", "user", "lts")
    val right = Seq(
      (100L, 10L, 1.0), (100L, 20L, 2.0)
    ).toDF("user", "rts", "pval")
    def run(tol: Option[Long]) =
      AsOfJoin.nearest(left, right, "user", "lts", "rts", Seq("pval"),
          matchedTsAs = Some("mts"), toleranceUs = tol)
        .select($"lid", $"pval", $"mts")
        .as[(Long, Option[Double], Option[Long])].collect().sortBy(_._1)
        .toSeq
    assert(run(Some(Long.MaxValue / 4)) === run(None))
  }

  test("nearest rejects a mixed time-flavor pair (timestamp left, " +
      "numeric right) instead of silently mis-converting") {
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)
    val left = Seq((1L, 7L, ts(100))).toDF("lid", "user", "lts")
    val right = Seq((7L, 90L, 1.0)).toDF("user", "rts", "pval")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.nearest(left, right, "user", "lts", "rts", Seq("pval"))
    }
    assert(e.getMessage.contains("both be timestamps or both numeric"))
  }

  test("forward as-of join picks earliest right row >= left ts, per key") {
    val left = Seq(
      (1L, 100L, 10L), (2L, 100L, 25L), (3L, 100L, 21L),
      (4L, 200L, 60L)
    ).toDF("lid", "user", "lts")
    val right = Seq(
      (100L, 10L, 1.0), (100L, 20L, 2.0),
      (200L, 50L, 9.0)
    ).toDF("user", "rts", "pval")
    val out = AsOfJoin.forward(left, right, "user", "lts", "rts",
        Seq("pval"))
      .select($"lid", $"pval").as[(Long, Option[Double])]
      .collect().toMap
    assert(out(1L) === Some(1.0))  // ts=10: simultaneous right row counts
    assert(out(2L) === None)       // ts=25: nothing at or after
    assert(out(3L) === None)       // ts=21: 20 is before, not after
    assert(out(4L) === None)       // ts=60 > 50
  }

  test("matchedTsAs surfaces the matched right ts for tolerance filters") {
    val left = Seq((1L, 100L, 95L), (2L, 100L, 35L))
      .toDF("lid", "user", "lts")
    val right = Seq((100L, 20L, 2.0), (100L, 90L, 7.0))
      .toDF("user", "rts", "pval")
    val j = AsOfJoin.backward(left, right, "user", "lts", "rts",
      Seq("pval"), matchedTsAs = Some("mts"))
    val within10 = j.withColumn("pval",
        when(col("lts") - col("mts") <= 10, col("pval")))
      .select($"lid", $"pval").as[(Long, Option[Double])].collect().toMap
    assert(within10(1L) === Some(7.0)) // gap 5 <= 10
    assert(within10(2L) === None)      // gap 15 > 10 -> nulled out
  }

  test("plan: one shuffle by key + window, no broadcast of either side") {
    val left = Seq((1L, 100L, 10L)).toDF("lid", "user", "lts")
    val right = Seq((100L, 5L, 1.0)).toDF("user", "rts", "pval")
    val plan = AsOfJoin.backward(left, right, "user", "lts", "rts",
      Seq("pval")).queryExecution.executedPlan.toString
    assert(plan.contains("Window"), plan)
    assert(!plan.contains("BroadcastExchange"), plan)
  }
}
