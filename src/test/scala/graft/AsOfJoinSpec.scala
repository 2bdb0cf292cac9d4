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
