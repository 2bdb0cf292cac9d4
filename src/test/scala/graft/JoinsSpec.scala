package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{RangeJoin, SkewJoin}
import graft.store.BucketedLayout

class JoinsSpec extends AnyFunSuite {
  lazy val spark = GraftTest.spark
  import spark.implicits._

  test("range join equals brute-force theta join, incl. multi-bin spans") {
    val points = Seq((1L, 0.0), (2L, 4.9), (3L, 5.0), (4L, 17.3),
      (5L, 25.0), (6L, 99.9)).toDF("pid", "p")
    // overlapping intervals, spans much wider than the bin width
    val ivs = Seq((10L, 0.0, 5.0), (11L, 3.0, 30.0), (12L, 5.0, 6.0),
      (13L, 0.0, 100.0), (14L, 40.0, 41.0)).toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, ivs, "p", "lo", "hi",
        binWidth = 7.0)
      .select($"pid", $"iid").as[(Long, Long)].collect().sorted.toSeq
    val want = points.as("l").join(ivs.as("r"),
        $"p" >= $"lo" && $"p" < $"hi")
      .select($"pid", $"iid").as[(Long, Long)].collect().sorted.toSeq
    assert(got === want)
    assert(want.contains((2L, 10L)) && !want.exists(_ == ((3L, 10L))),
      "half-open boundary: 4.9 in [0,5), 5.0 not")
    // an INVERTED interval (hi < lo) contains no point under
    // half-open semantics and must be dropped up front — a negative
    // span would slip past the bins-per-row cap and make sequence()
    // DESCEND through ~|span| bins (the silent blowup the guard
    // exists to stop)
    val inverted = Seq((20L, 1.0e9, 0.0)).toDF("iid", "lo", "hi")
    assert(RangeJoin.pointInInterval(points, inverted, "p", "lo", "hi",
      binWidth = 1.0).count() === 0L)
  }

  test("interval overlap join equals brute-force theta join; pairs " +
      "sharing many bins emitted once; touching endpoints excluded") {
    val l = Seq((1L, 0.0, 50.0),   // spans many bins, overlaps most
      (2L, 4.0, 5.0), (3L, 10.0, 11.0), (4L, 90.0, 91.0))
      .toDF("lid", "lo1", "hi1")
    val r = Seq((10L, 3.0, 40.0),  // also multi-bin
      (11L, 5.0, 6.0),             // touches l2 at 5.0 — NOT overlap
      (12L, 10.5, 10.7),           // nested inside l3
      (13L, 200.0, 201.0),
      (14L, 7.0, 7.0))             // degenerate: never matches
      .toDF("rid", "lo2", "hi2")
    val got = RangeJoin.intervalOverlap(l, r, "lo1", "hi1", "lo2",
        "hi2", binWidth = 7.0)
      .select($"lid", $"rid").as[(Long, Long)].collect().sorted.toSeq
    // brute force mirrors the operator's semantics: an EMPTY interval
    // overlaps nothing, even though the bare predicate would admit it
    val want = l.as("a").join(r.as("b"),
        $"lo1" < $"hi2" && $"lo2" < $"hi1" &&
          $"hi1" > $"lo1" && $"hi2" > $"lo2")
      .select($"lid", $"rid").as[(Long, Long)].collect().sorted.toSeq
    assert(got === want)
    // (1, 10) share bins 0..5 — exactly one output row proves the
    // first-shared-bin dedup
    assert(got.count(_ == ((1L, 10L))) === 1)
    assert(!got.contains((2L, 11L)), "touching endpoints must not join")
  }

  test("interval overlap join plans as an equi-join on the bin") {
    val l = Seq((1L, 0.0, 5.0)).toDF("lid", "lo1", "hi1")
    val r = Seq((10L, 3.0, 4.0)).toDF("rid", "lo2", "hi2")
    val plan = RangeJoin.intervalOverlap(l, r, "lo1", "hi1", "lo2",
        "hi2", 5.0).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("range join plans as an equi-join on the bin, not a nested loop") {
    val points = Seq((1L, 1.0)).toDF("pid", "p")
    val ivs = Seq((10L, 0.0, 5.0)).toDF("iid", "lo", "hi")
    val plan = RangeJoin.pointInInterval(points, ivs, "p", "lo", "hi", 5.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("operators reject inputs that carry reserved __ working columns") {
    // a silent overwrite would both corrupt the bin/salt computation and
    // drop the user's column from the output — must fail loudly
    val points = Seq((1L, 1.0, 9L)).toDF("pid", "p", "__bin")
    val ivs = Seq((10L, 0.0, 5.0)).toDF("iid", "lo", "hi")
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(points, ivs, "p", "lo", "hi", 5.0)
    }
    val withSalt = Seq((1L, 2L)).toDF("k", "__salt")
    intercept[IllegalArgumentException] {
      SkewJoin.salted(withSalt, Seq(1L).toDF("k"), "k", "k", 4)
    }
    intercept[IllegalArgumentException] {
      graft.operators.Sampling.stratifiedTopN(
        Seq((1L, "a", 7L)).toDF("id", "g", "__rn"), col("g"), col("id"),
        col("id"), 2)
    }
    intercept[IllegalArgumentException] {
      graft.operators.AsOfJoin.backward(
        Seq((1L, 1L, 0)).toDF("k", "ts", "__side"),
        Seq((1L, 1L, 1.0)).toDF("k", "ts", "v"), "k", "ts", "ts", Seq("v"))
    }
  }

  test("salted join result equals the plain equi-join") {
    val li = spark.read.parquet(s"${GraftTest.sf001}/lineitem.parquet")
      .select($"l_orderkey", $"l_extendedprice")
    val o = spark.read.parquet(s"${GraftTest.sf001}/orders.parquet")
      .select($"o_orderkey", $"o_orderpriority")
    val salted = SkewJoin.salted(li, o, "l_orderkey", "o_orderkey", 8)
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n"), round(sum($"l_extendedprice")).cast("long"))
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    val plain = li.join(o, $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n"), round(sum($"l_extendedprice")).cast("long"))
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(salted === plain)
  }

  test("salted join works when both keys share a name; dups still spread") {
    val facts = Seq.fill(100)((42L, 1.0)).toDF("user_id", "m") // identical rows
    val dims = Seq((42L, "hot"), (7L, "cold")).toDF("user_id", "tag")
      .select($"user_id".as("uid"), $"tag")
      .withColumnRenamed("uid", "user_id")
    val out = SkewJoin.salted(facts, dims, "user_id", "user_id", 4)
    assert(out.count() === 100)
    // identical duplicate rows of the hot key must not all share a salt
    val salts = facts.withColumn("__salt",
        pmod(xxhash64($"user_id", monotonically_increasing_id()), lit(4)))
      .select($"__salt").distinct().count()
    assert(salts > 1, "identical hot-key rows collapsed to one salt")
  }

  test("co-bucketed join works when both keys share a name") {
    BucketedLayout.writeBucketed(
      Seq((1L, "a"), (2L, "b")).toDF("k", "v"), "graft_test_bl_same_l",
      "k", 4)
    BucketedLayout.writeBucketed(
      Seq((1L, 10.0), (3L, 30.0)).toDF("k", "w"), "graft_test_bl_same_r",
      "k", 4)
    val joined = BucketedLayout.coLocatedJoin(spark,
      "graft_test_bl_same_l", "graft_test_bl_same_r", "k", "k")
    assert(joined.count() === 1)
  }

  test("runtime bloom filter prunes the probe side of a selective join") {
    // the AQE-era runtime row-filter: a selective dimension filter
    // plants a bloom filter on the fact side's scan, pruning shuffle
    // input before the join — the 100 TB "semi-join pushdown" Spark
    // does automatically when the thresholds say it pays off
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = spark.read.parquet(s"${GraftTest.sf001}/lineitem.parquet")
        .select($"l_orderkey", $"l_extendedprice")
      val o = spark.read.parquet(s"${GraftTest.sf001}/orders.parquet")
        .filter($"o_orderpriority" === "1-URGENT")
        .select($"o_orderkey")
      val joined = li.join(o, $"l_orderkey" === $"o_orderkey")
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain") &&
        plan.contains("bloom_filter_agg"), plan)
      assert(joined.count() > 0)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("co-bucketed join runs with no shuffle on either side") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      BucketedLayout.writeBucketed(
        Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"),
        "graft_test_bl_left", "k", 4)
      BucketedLayout.writeBucketed(
        Seq((1L, 10.0), (2L, 20.0), (9L, 90.0)).toDF("j", "w"),
        "graft_test_bl_right", "j", 4)
      val joined = BucketedLayout.coLocatedJoin(spark,
        "graft_test_bl_left", "graft_test_bl_right", "k", "j")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan)
      assert(joined.count() === 2)
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
