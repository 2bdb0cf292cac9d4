package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sampling

class SamplingSpec extends AnyFunSuite {
  lazy val spark = GraftTest.spark
  import spark.implicits._

  private lazy val docs = spark.read
    .parquet(s"${GraftTest.sf001}/documents.parquet")

  test("hash sample is invariant under repartitioning (no RNG)") {
    val a = Sampling.hashSample(docs, col("text"), 10)
      .select($"doc_id").as[Long].collect().toSet
    val b = Sampling.hashSample(docs.repartition(7, $"lang"), col("text"), 10)
      .select($"doc_id").as[Long].collect().toSet
    assert(a === b)
    val n = docs.count()
    assert(a.size > n / 20 && a.size < n / 5,
      s"~10% expected, got ${a.size} of $n")
  }

  test("split assignment is a disjoint total cover and append-stable") {
    val s = Sampling.splitAssign(docs, col("text"),
      Seq(("train", 80), ("val", 90), ("test", 100)))
    val byId = s.select($"doc_id", $"split").as[(Long, String)]
      .collect().toMap
    assert(byId.size === docs.count(), "every row labeled exactly once")
    // append-stability: labels computed on a subset agree with the full run
    val subset = Sampling.splitAssign(
        docs.filter($"doc_id" % 3 === 0), col("text"),
        Seq(("train", 80), ("val", 90), ("test", 100)))
      .select($"doc_id", $"split").as[(Long, String)].collect()
    subset.foreach { case (id, sp) => assert(byId(id) === sp) }
    val frac = byId.values.count(_ == "train").toDouble / byId.size
    assert(frac > 0.7 && frac < 0.9, s"train fraction $frac")
  }

  test("weighted sample keeps rows proportionally to weight, reproducibly") {
    import org.apache.spark.sql.functions.lit
    // weight 1.0 keeps everything; weight 0.0 keeps nothing
    assert(Sampling.weightedHashSample(docs, col("text"), lit(1.0))
      .count() === docs.count())
    assert(Sampling.weightedHashSample(docs, col("text"), lit(0.0))
      .count() === 0L)
    // constant weight w keeps ~w of rows; repartition-invariant
    val w03 = Sampling.weightedHashSample(docs, col("text"), lit(0.3))
      .select($"doc_id").as[Long].collect().toSet
    val frac = w03.size.toDouble / docs.count()
    assert(frac > 0.2 && frac < 0.4, s"~30% expected, got $frac")
    val again = Sampling.weightedHashSample(
        docs.repartition(9), col("text"), lit(0.3))
      .select($"doc_id").as[Long].collect().toSet
    assert(again === w03)
    // monotone: a higher weight keeps a superset of a lower weight
    val w06 = Sampling.weightedHashSample(docs, col("text"), lit(0.6))
      .select($"doc_id").as[Long].collect().toSet
    assert(w03.subsetOf(w06))
  }

  test("mixture sample hits target proportions, binding source intact") {
    // 40/20/10 rows of a/b/c with target 0.25/0.25/0.5 → c binds:
    // N* = min(160, 80, 20) = 20, quotas 5/5/10
    val rows = ((0 until 40).map(i => (i.toLong, "a")) ++
      (100 until 120).map(i => (i.toLong, "b")) ++
      (200 until 210).map(i => (i.toLong, "c")))
      .toDF("id", "src")
    val got = Sampling.mixtureSample(rows, col("src"),
        col("id").cast("string"), col("id"),
        Map("a" -> 0.25, "b" -> 0.25, "c" -> 0.5))
      .groupBy($"src").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(got === Map("a" -> 5L, "b" -> 5L, "c" -> 10L))
    // a source missing from the weights is dropped entirely
    val withX = rows.union(Seq((900L, "x")).toDF("id", "src"))
    val gotX = Sampling.mixtureSample(withX, col("src"),
        col("id").cast("string"), col("id"),
        Map("a" -> 0.25, "b" -> 0.25, "c" -> 0.5))
      .filter($"src" === "x").count()
    assert(gotX === 0L)
    // deterministic under repartitioning
    val a = Sampling.mixtureSample(rows.repartition(7), col("src"),
        col("id").cast("string"), col("id"),
        Map("a" -> 0.5, "b" -> 0.5))
      .select($"id").as[Long].collect().toSet
    val b = Sampling.mixtureSample(rows, col("src"),
        col("id").cast("string"), col("id"),
        Map("a" -> 0.5, "b" -> 0.5))
      .select($"id").as[Long].collect().toSet
    assert(a === b)
  }

  test("stratified top-n picks exactly n per stratum, deterministically") {
    val got = Sampling.stratifiedTopN(docs, col("lang"), col("text"),
        col("doc_id"), 3)
      .groupBy($"lang").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val strata = docs.select($"lang").distinct().as[String].collect()
    assert(got.keySet === strata.toSet)
    got.values.foreach(n => assert(n <= 3))
    val again = Sampling.stratifiedTopN(docs.repartition(5), col("lang"),
        col("text"), col("doc_id"), 3)
      .select($"lang", $"doc_id").as[(String, Long)].collect().toSet
    val first = Sampling.stratifiedTopN(docs, col("lang"), col("text"),
        col("doc_id"), 3)
      .select($"lang", $"doc_id").as[(String, Long)].collect().toSet
    assert(again === first)
  }

  test("temperature sampling: balanced mix is a fixpoint; a skewed " +
      "source is trimmed toward the others' shares") {
    // the test corpus is perfectly balanced -> alpha-smoothing keeps all
    assert(Sampling.temperatureSample(docs, col("source"), col("text"),
      col("doc_id")).count() === docs.count())
    // induce skew: src0 keeps 25 rows, every other source drops to ~16
    val skewed = docs.filter($"source" === "src0" ||
      pmod($"doc_id", lit(3)) =!= 0)
    val kept = Sampling.temperatureSample(skewed, col("source"),
        col("text"), col("doc_id"))
      .groupBy($"source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val input = skewed.groupBy($"source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // oversized source is trimmed by MORE than the floor jitter
    assert(kept("src0") < input("src0") - 1)
    // small sources bind: each keeps all its rows up to the standard
    // double-floor loss (N* and the quota each floor once -> ≤ 1 row)
    assert(input.filter(_._1 != "src0").forall { case (s, n) =>
      kept(s) >= n - 1
    })
  }

  test("hash-threshold selection matches the window formulation " +
      "bit-for-bit under forced multi-pass refinement") {
    // 6,000 rows / 3 skewed sources; bandCap 8 forces several radix
    // refinement passes, bandCap 10^9 degenerates to the single
    // window — both must pick the IDENTICAL row set
    val rows = ((0 until 3000).map(i => (i.toLong, "a")) ++
      (10000 until 12000).map(i => (i.toLong, "b")) ++
      (20000 until 21000).map(i => (i.toLong, "c")))
      .toDF("id", "src").repartition(13)
    val weights = Map("a" -> 0.5, "b" -> 0.3, "c" -> 0.2)
    val viaThreshold = Sampling.mixtureSample(rows, col("src"),
        col("id").cast("string"), col("id"), weights, bandCap = 8L)
      .select($"id").as[Long].collect().toSet
    val viaWindow = Sampling.mixtureSample(rows, col("src"),
        col("id").cast("string"), col("id"), weights,
        bandCap = 1000000000L)
      .select($"id").as[Long].collect().toSet
    assert(viaThreshold === viaWindow)
    assert(viaThreshold.nonEmpty)
    // stratifiedTopN: same equivalence, quota larger than bandCap
    val thr = Sampling.stratifiedTopN(rows, col("src"),
        col("id").cast("string"), col("id"), 500, bandCap = 4L)
      .select($"id").as[Long].collect().toSet
    val win = Sampling.stratifiedTopN(rows, col("src"),
        col("id").cast("string"), col("id"), 500,
        bandCap = 1000000000L)
      .select($"id").as[Long].collect().toSet
    assert(thr === win && thr.size === 1500)
  }

  test("negative pairs: deterministic, no self-pairs, partners in the " +
      "id domain") {
    val out = Sampling.negativePairs(docs, k = 3, n = 500).collect()
    assert(out.length > 1400 && out.length <= 1500) // 500x3 minus self-hits
    assert(out.forall(r => r.getLong(2) != r.getLong(0)))
    assert(out.forall(r => r.getLong(2) >= 0 && r.getLong(2) < 500))
    val again = Sampling.negativePairs(docs, k = 3, n = 500).collect()
    assert(out.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("curriculum interleave: best-first within source, sources " +
      "alternate, prefix is balanced") {
    val df = Seq(
      (1L, "a", 900L), (2L, "a", 800L), (5L, "a", 100L),
      (4L, "b", 950L), (3L, "b", 700L))
      .toDF("id", "src", "score")
    val out = Sampling.curriculumInterleave(df, $"src", $"score", $"id")
      .select($"id", $"src", $"rank").collect()
    // rank 1: a's best (id 1) then b's best (id 4); rank 2: ids 2, 3;
    // rank 3: a's leftover
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 4L, 2L, 3L, 5L))
    assert(out.map(_.getLong(2)).toSeq == Seq(1L, 1L, 2L, 2L, 3L))
    // any even prefix holds an equal share of each source
    val prefix = out.take(4).map(_.getString(1))
    assert(prefix.count(_ == "a") == 2 && prefix.count(_ == "b") == 2)
  }

  test("curriculum interleave: reliable mode matches localCheckpoint mode; loud without a checkpoint dir") {
    val df = Seq(
      (1L, "a", 900L), (2L, "a", 800L), (5L, "a", 100L),
      (4L, "b", 950L), (3L, "b", 700L))
      .toDF("id", "src", "score")
    // no checkpoint dir set -> the reliable flag must fail UP FRONT,
    // not after the sort
    val sc = spark.sparkContext
    if (sc.getCheckpointDir.isEmpty) {
      intercept[IllegalArgumentException] {
        Sampling.curriculumInterleave(df, $"src", $"score", $"id",
          reliable = true)
      }
    }
    val ckDir = java.nio.file.Files
      .createTempDirectory("curriculum_ck").toString
    sc.setCheckpointDir(ckDir)
    try {
      val a = Sampling.curriculumInterleave(df, $"src", $"score", $"id")
        .select($"id", $"rank").as[(Long, Long)].collect().toSeq
      val b = Sampling.curriculumInterleave(df, $"src", $"score", $"id",
          reliable = true)
        .select($"id", $"rank").as[(Long, Long)].collect().toSeq
      assert(a === b)
      assert(a.map(_._1) === Seq(1L, 4L, 2L, 3L, 5L))
      // the reliable run actually wrote checkpoint data to the dir
      val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(ckDir))
        .filter(p => java.nio.file.Files.isRegularFile(p)).count()
      assert(wrote > 0L, "reliable mode must write to the checkpoint dir")
    } finally {
      // tests share the session: later suites must not inherit a
      // checkpoint dir they didn't set
      sc.setCheckpointDir(null)
    }
  }

  test("rankedTopNMaterialized matches rankedTopN on both selection paths") {
    val base = docs.select($"doc_id", $"source", $"n_chars")
    def direct(bandCap: Long) = Sampling.rankedTopN(base, $"source",
        -$"n_chars", $"doc_id", n = 5, bandCap = bandCap)
      .select($"doc_id").as[Long].collect().toSet
    def mat2(bandCap: Long) = Sampling.rankedTopNMaterialized(base,
        $"source", -$"n_chars", $"doc_id", "doc_id",
        n = 5, bandCap = bandCap)
      .select($"doc_id").as[Long].collect().toSet
    // plain window path (big bandCap) and the threshold path (tiny)
    assert(mat2(100000L) === direct(100000L))
    assert(mat2(2L) === direct(2L))
    assert(direct(2L) === direct(100000L) && direct(2L).nonEmpty)
    // the materialized form returns the INPUT's columns (semi join)
    val cols = Sampling.rankedTopNMaterialized(base, $"source",
      -$"n_chars", $"doc_id", "doc_id", n = 2).columns.toSeq
    assert(cols === base.columns.toSeq)
  }

  test("rankedTopNMaterialized: reliable mode matches localCheckpoint " +
      "mode, loud without a checkpoint dir; checkIds rejects duplicate " +
      "and null ids") {
    val base = docs.select($"doc_id", $"source", $"n_chars")
    def pick(reliable: Boolean) = Sampling.rankedTopNMaterialized(base,
        $"source", -$"n_chars", $"doc_id", "doc_id", n = 5,
        bandCap = 2L, reliable = reliable, checkIds = true)
      .select($"doc_id").as[Long].collect().toSet
    val sc = spark.sparkContext
    // no checkpoint dir -> reliable fails UP FRONT, before any scan
    if (sc.getCheckpointDir.isEmpty) {
      intercept[IllegalArgumentException] { pick(reliable = true) }
    }
    val ckDir = java.nio.file.Files
      .createTempDirectory("rankedtopn_ck").toString
    sc.setCheckpointDir(ckDir)
    try {
      val local = pick(reliable = false)
      val rel = pick(reliable = true)
      assert(rel === local && rel.nonEmpty)
      // the reliable run actually wrote checkpoint data to the dir
      val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(ckDir))
        .filter(p => java.nio.file.Files.isRegularFile(p)).count()
      assert(wrote > 0L, "reliable mode must write to the checkpoint dir")
    } finally sc.setCheckpointDir(null)
    // checkIds: a duplicated id fails loudly instead of silently
    // widening the semi join...
    val dup = base.unionByName(base.limit(1))
    val eDup = intercept[IllegalArgumentException] {
      Sampling.rankedTopNMaterialized(dup, $"source", -$"n_chars",
        $"doc_id", "doc_id", n = 5, checkIds = true).collect()
    }
    assert(eDup.getMessage.contains("not unique"))
    // ...and so does a NULL id (count_distinct ignores nulls)
    val withNull = base.unionByName(
      base.limit(1).withColumn("doc_id", lit(null).cast("long")))
    val eNull = intercept[IllegalArgumentException] {
      Sampling.rankedTopNMaterialized(withNull, $"source", -$"n_chars",
        $"doc_id", "doc_id", n = 5, checkIds = true).collect()
    }
    assert(eNull.getMessage.contains("not unique"))
    // default (checkIds = false) keeps the documented non-enforcing
    // behavior: the duplicate id row widens, no throw
    Sampling.rankedTopNMaterialized(dup, $"source", -$"n_chars",
      $"doc_id", "doc_id", n = 5).collect()
  }

  /** The budgetSample contract replayed row-by-row: per stratum, in
    * (fingerprint, tiebreak) order, keep while the running weight
    * BEFORE the row is under the budget. */
  private def budgetExpected(rows: Seq[(Long, String, Long, Long)],
      budgets: Map[String, Long]): Set[Long] =
    rows.groupBy(_._2).flatMap { case (s, rs) =>
      val b = budgets.getOrElse(s, 0L)
      if (b <= 0L) Nil
      else {
        var cum = 0L
        rs.sortBy(r => (r._4, r._1)).flatMap { r =>
          val keep = cum < b
          cum += r._3
          if (keep) Some(r._1) else None
        }
      }
    }.toSet

  test("budgetSample fills per-source weight budgets deterministically, both paths agree") {
    val base = docs.select($"doc_id", $"source", $"n_chars",
      graft.functions.vfs_fingerprint($"text").as("fp"))
      .as[(Long, String, Long, Long)].collect().toSeq
    val budgets = Map("src0" -> 3000L, "src1" -> 1500L, "src2" -> 1L)
    val expect = budgetExpected(base, budgets)
    assert(expect.nonEmpty && expect.size < base.size)
    def got(bandCap: Long) = Sampling.budgetSample(docs, $"source",
        $"n_chars", $"text", $"doc_id", budgets, bandCap)
      .select($"doc_id").as[Long].collect().toSet
    // plain path (strata under bandCap) and forced-refinement path
    // (bandCap=1: the radix ladder narrows to the crossing hash) must
    // both reproduce the row-by-row replay — incl. src2's budget of 1
    // keeping exactly the first hash-ordered doc and sources absent
    // from the map contributing nothing
    assert(got(100000L) === expect)
    assert(got(1L) === expect)
  }

  test("budgetSample: exact-equality stratum drops trailing zero-weight rows; contract violations are loud") {
    // craft: total weight == budget, with a zero-weight row placed
    // LAST in hash order — before == budget there, so it must drop
    val d0 = Seq((1L, "s", 10L), (2L, "s", 20L), (3L, "s", 0L),
      (4L, "s", 30L)).toDF("id", "src", "w")
    val fp = d0.select($"id",
        graft.functions.vfs_fingerprint($"id".cast("string")).as("f"))
      .as[(Long, Long)].collect().toMap
    val order = Seq(1L, 2L, 3L, 4L).sortBy(i => (fp(i), i))
    val weights = Map(1L -> 10L, 2L -> 20L, 3L -> 0L, 4L -> 30L)
    // budget = total: every row before the last non-zero row keeps
    val total = 60L
    val expect = {
      var cum = 0L
      order.flatMap { i =>
        val keep = cum < total
        cum += weights(i); if (keep) Some(i) else None
      }.toSet
    }
    val out = Sampling.budgetSample(d0, $"src", $"w",
        $"id".cast("string"), $"id", Map("s" -> total))
      .select($"id").as[Long].collect().toSet
    assert(out === expect)
    // a zero-weight row positioned AFTER the full budget is consumed
    // must be out — pin that the crafted order actually tests it when
    // the zero row is not first
    if (order.last == 3L) assert(!out.contains(3L))
    // negative weight -> loud, naming the stratum
    val neg = Seq((1L, "s", -5L)).toDF("id", "src", "w")
    val e = intercept[IllegalArgumentException] {
      Sampling.budgetSample(neg, $"src", $"w", $"id".cast("string"),
        $"id", Map("s" -> 10L))
    }
    assert(e.getMessage.contains("negative"))
  }

  test("budgetSample: NULL-key rows are never selected and never consume budget, on both regimes") {
    // 3 keyed rows of weight 10 + a null-key row of weight 1000; with
    // the null weight EXCLUDED the total (30) fits budget 40 -> all
    // keyed rows pass, null row out. Counting the null weight would
    // flip the stratum into the banded regime.
    val d = Seq((1L, "s", 10L, Some("a")), (2L, "s", 10L, Some("b")),
      (3L, "s", 10L, Some("c")), (4L, "s", 1000L, None))
      .toDF("id", "src", "w", "k")
    def run(budget: Long) = Sampling.budgetSample(d, $"src", $"w",
        $"k", $"id", Map("s" -> budget))
      .select($"id").as[Long].collect().toSet
    assert(run(40L) === Set(1L, 2L, 3L))
    // banded regime (budget 15 < 30): crossing cut applies to keyed
    // rows only; null-key row still out
    val banded = run(15L)
    // cum-before: 0, 10, 20 -> exactly two keyed rows clear 15
    assert(!banded.contains(4L) && banded.size === 2)
  }
}
