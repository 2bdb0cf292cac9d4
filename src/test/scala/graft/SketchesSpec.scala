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

  test("KMV ignores NULL keys (no slot consumed, no estimate bias)") {
    val withNulls = Seq(Some("a"), None, Some("b"), None, Some("c"))
      .toDF("t")
    assert(Sketches.kmvDistinct(withNulls, col("t"), 64)
      .head().getLong(0) === 3L)
  }
}
