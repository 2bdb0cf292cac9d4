package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sketches

class SketchesSpec extends AnyFunSuite {
  lazy val spark = GraftTest.spark
  import spark.implicits._

  private lazy val docs = spark.read
    .parquet(s"${GraftTest.sf001}/documents.parquet")
  private lazy val lineitem = spark.read
    .parquet(s"${GraftTest.sf001}/lineitem.parquet")

  test("one-pass profile: per-column rows/nulls/distinct/min-max, " +
      "approx mode within HLL error") {
    import graft.operators.Profile
    val df = Seq[(java.lang.Long, String)](
      (1L, "a"), (2L, "b"), (2L, null), (null, "a"), (3L, "c"))
      .toDF("k", "s")
    val got = Profile.profile(df, Seq("k", "s")).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got("k").getLong(1) === 5L) // n_rows
    assert(got("k").getLong(2) === 1L) // one null key
    assert(got("k").getLong(3) === 3L) // 1,2,3
    assert(got("k").getString(4) === "1" && got("k").getString(5) === "3")
    assert(got("s").getLong(2) === 1L)
    assert(got("s").getLong(3) === 3L) // a,b,c
    assert(got("s").getString(4) === "a" && got("s").getString(5) === "c")
    // approx mode: HLL++ within its documented ~2-5% envelope on the
    // real corpus (and exact on tiny cardinalities)
    val approxTiny = Profile.profile(df, Seq("k"), exact = false)
      .collect().head
    assert(approxTiny.getLong(3) === 3L)
    val exactDocs = Profile.profile(docs, Seq("text")).collect().head
    val approxDocs = Profile.profile(docs, Seq("text"), exact = false)
      .collect().head
    val (e, a) = (exactDocs.getLong(3).toDouble, approxDocs.getLong(3))
    assert(math.abs(a - e) / e < 0.1, s"approx $a vs exact $e")
    // unknown column fails fast
    val err = intercept[IllegalArgumentException](
      Profile.profile(df, Seq("nope")))
    assert(err.getMessage.contains("[GRAFT]"))
  }

  test("HLL distinct estimate is within the configured error bound") {
    val exact = lineitem.select($"l_partkey").distinct().count()
    val est = Sketches.approxDistinct(lineitem, col("l_partkey"), 0.02)
      .head().getLong(0)
    val err = math.abs(est - exact).toDouble / exact
    assert(err < 0.06, s"exact=$exact est=$est err=$err") // 3x rsd margin
  }

  test("approx quantiles bracket the exact percentiles") {
    val qs = Sketches.approxQuantiles(lineitem, col("l_extendedprice"),
      Seq(0.1, 0.5, 0.9)).head().getSeq[Double](0)
    val sorted = lineitem.select($"l_extendedprice").as[Double]
      .collect().sorted
    def exactAt(p: Double) = sorted(((sorted.length - 1) * p).toInt)
    Seq(0.1, 0.5, 0.9).zip(qs).foreach { case (p, got) =>
      val exact = exactAt(p)
      assert(math.abs(got - exact) / exact < 0.05,
        s"p=$p exact=$exact approx=$got")
    }
  }

  test("portable HLL registers: estimate within bound, merge = per-bucket max") {
    val exact = lineitem.select($"l_partkey").distinct().count()
    val key = col("l_partkey").cast("string")
    val regs = Sketches.hllRegisters(lineitem, key, p = 8)
    val est = Sketches.hllEstimate(regs, 8)
    // p=8 -> rse ~ 1.04/sqrt(256) = 6.5%; 3x margin
    assert(math.abs(est - exact) / exact < 0.2, s"exact=$exact est=$est")
    // the HLL merge: registers(A ∪ B) == per-bucket max of the halves
    val ra = Sketches.hllRegisters(lineitem.filter($"l_orderkey" % 2 === 0), key, 8)
    val rb = Sketches.hllRegisters(lineitem.filter($"l_orderkey" % 2 =!= 0), key, 8)
    val merged = ra.unionByName(rb).groupBy($"bucket")
      .agg(max($"max_rho").as("max_rho"))
      .orderBy($"bucket").collect().toSeq
    assert(merged == regs.orderBy($"bucket").collect().toSeq)
  }

  test("KMV estimate is deterministic and within ~2/sqrt(k) of exact") {
    val exact = docs.select($"text").distinct().count()
    val k = 64
    val est = Sketches.kmvDistinct(docs, col("text"), k).head().getLong(0)
    val bound = 2.0 / math.sqrt(k.toDouble) // ~2 std errors
    assert(math.abs(est - exact).toDouble / exact < bound,
      s"exact=$exact est=$est")
    // determinism: invariant under repartitioning (no RNG, portable hash)
    val again = Sketches.kmvDistinct(docs.repartition(7), col("text"), k)
      .head().getLong(0)
    assert(again === est)
  }

  test("KMV is exact below k distinct values") {
    val small = Seq("a", "b", "c", "b", "a").toDF("t")
    assert(Sketches.kmvDistinct(small, col("t"), 64)
      .head().getLong(0) === 3L)
  }

  test("count-min: est >= true always, exact absent collisions, mergeable") {
    val ev = spark.read.parquet(s"${GraftTest.sf001}/events.parquet")
      .select($"event_type", $"event_id")
    val sketch = Sketches.countMinSketch(ev, col("event_type"), 4, 64)
    val truth = ev.groupBy($"event_type").count()
      .as[(String, Long)].collect().toMap
    val est = Sketches.countMinEstimate(sketch,
        ev.select($"event_type").distinct(), col("event_type"), 4, 64)
      .as[(String, Long)].collect().toMap
    val n = ev.count()
    truth.foreach { case (k, t) =>
      assert(est(k) >= t, s"$k: est ${est(k)} < true $t")
      assert(est(k) <= t + 2L * n / 64, s"$k grossly over")
    }
    // estimate for a never-seen key is 0
    val unseen = Sketches.countMinEstimate(sketch,
        Seq("no_such_type").toDF("event_type"), col("event_type"), 4, 64)
      .as[(String, Long)].collect().head._2
    assert(unseen === 0L)
    // mergeability: sketches of two halves sum to the full sketch
    val h1 = Sketches.countMinSketch(ev.filter($"event_id" % 2 === 0),
      col("event_type"), 4, 64)
    val h2 = Sketches.countMinSketch(ev.filter($"event_id" % 2 === 1),
      col("event_type"), 4, 64)
    val mergedMap = h1.union(h2).groupBy($"r", $"c")
      .agg(sum($"cnt").as("cnt"))
      .collect().map(x => (x.getInt(0), x.getInt(1)) -> x.getLong(2)).toMap
    val fullMap = sketch.collect()
      .map(x => (x.getInt(0), x.getInt(1)) -> x.getLong(2)).toMap
    assert(mergedMap === fullMap)
    // estimating against mismatched build dimensions fails loudly
    // (silently it would underestimate -> est 0 for present keys)
    intercept[IllegalArgumentException] {
      Sketches.countMinEstimate(sketch,
        ev.select($"event_type").distinct(), col("event_type"), 4, 128)
    }
    // NULL keys are ignored on both build and probe (KMV convention)
    val withNull = Seq(Some("a"), None, Some("a")).toDF("k")
    val skN = Sketches.countMinSketch(withNull, col("k"), 4, 64)
    assert(skN.agg(sum($"cnt")).head().getLong(0) === 8L) // 2 rows x 4
    // an EMPTY sketch (built from all-null input) estimates 0 for every
    // probe key instead of throwing on the missing dims row
    val skEmpty = Sketches.countMinSketch(
      Seq(Option.empty[String]).toDF("k"), col("k"), 4, 64)
    val zeroEsts = Sketches.countMinEstimate(skEmpty,
        Seq("a", "b").toDF("k"), col("k"), 4, 64)
      .as[(String, Long)].collect().toMap
    assert(zeroEsts === Map("a" -> 0L, "b" -> 0L))
  }

  test("heavy hitters: exact when distinct fits, bounded when it doesn't") {
    import graft.operators.HeavyHitters
    // skewed stream: item "hot_i" appears (20-i)*50 times, tail of
    // 500 singletons
    val rows = ((0 until 20).flatMap(i =>
      Seq.fill((20 - i) * 50)(s"hot_$i")) ++
      (0 until 500).map(i => s"tail_$i"))
    val df = rows.toDF("item").repartition(13)
    val n = rows.length.toLong
    val exact = rows.groupBy(identity).map { case (k, v) =>
      k -> v.length.toLong }
    // capacity >= distinct -> exact counts, deterministic top-k
    val big = HeavyHitters.topK(df, $"item", 5, capacity = 4096)
      .as[(String, Long)].collect()
    assert(big.toSeq === (0 until 5).map(i =>
      s"hot_$i" -> (20 - i) * 50L))
    // small capacity: every estimate is a lower bound within
    // n/(capacity+1), and items above that frequency are present
    val cap = 32
    val small = HeavyHitters.topK(df, $"item", 20, capacity = cap)
      .as[(String, Long)].collect().toMap
    val slack = n / (cap + 1)
    small.foreach { case (k, est) =>
      val truth = exact(k)
      assert(est <= truth && est >= truth - slack,
        s"$k: est=$est truth=$truth slack=$slack")
    }
    (0 until 20).filter(i => (20 - i) * 50L > slack).foreach { i =>
      assert(small.contains(s"hot_$i"), s"guaranteed hitter hot_$i missing")
    }
    // SQL-registered aggregate reaches the same summary
    graft.functions.registerAll(spark)
    df.createOrReplaceTempView("hh_in")
    val viaSql = spark.sql(
      "SELECT vfs_heavy_hitters(item, 4096) AS s FROM hh_in")
      .selectExpr("inline(s)")
      .orderBy($"cnt".desc, $"item".asc).limit(5)
      .as[(String, Long)].collect()
    assert(viaSql.toSeq === big.toSeq)
  }

  test("bloom: no false negatives, bounded false positives, dim guard") {
    val ref = (0 until 200).map(i => s"ref_$i").toDF("key")
    val bloom = Sketches.bloomBuild(ref, col("key"), nBits = 4096, k = 3)
    // every inserted key must hit
    val refHits = Sketches.bloomMightContain(bloom, ref, col("key"), 4096, 3)
      .as[(String, Long)].collect()
    assert(refHits.length === 200 && refHits.forall(_._2 === 1L))
    // unseen keys: mostly misses, false-positive rate well under 50%
    val other = (0 until 500).map(i => s"other_$i").toDF("key")
    val fp = Sketches.bloomMightContain(bloom, other, col("key"), 4096, 3)
      .as[(String, Long)].collect().count(_._2 === 1L)
    assert(fp < 100, s"false-positive count $fp out of 500 is implausible")
    // the filter is genuinely sparse words, not a degenerate all-ones
    val setBits = bloom.select(sum(expr("bit_count(bits)"))).head().getLong(0)
    assert(setBits > 0 && setBits <= 600)
    // mismatched probe dims fail loudly
    intercept[IllegalArgumentException] {
      Sketches.bloomMightContain(bloom, other, col("key"), 2048, 3)
    }
    // empty build input: all probes are clean misses
    val empty = Sketches.bloomBuild(ref.filter(lit(false)), col("key"))
    val misses = Sketches.bloomMightContain(empty, other, col("key"))
      .as[(String, Long)].collect()
    assert(misses.length === 500 && misses.forall(_._2 === 0L))
  }

  test("KMV ignores NULL keys (no slot consumed, no estimate bias)") {
    val withNulls = Seq(Some("a"), None, Some("b"), None, Some("c"))
      .toDF("t")
    assert(Sketches.kmvDistinct(withNulls, col("t"), 64)
      .head().getLong(0) === 3L)
  }
}
