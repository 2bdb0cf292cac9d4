package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Contamination

class ContaminationSpec extends AnyFunSuite {
  lazy val spark = GraftTest.spark
  import spark.implicits._

  test("finds planted overlap, ignores disjoint and sub-threshold docs") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "completely different words entirely unrelated content here"),
      (3L, "the quick brown fox sat still")
    ).toDF("doc_id", "text")
    // probe 10 copies corpus 1's opening (8 shared trigrams), probe 11
    // shares only 2 trigrams with corpus 3, probe 12 nothing
    val probe = Seq(
      (10L, "the quick brown fox jumps over the lazy dog sometimes"),
      (11L, "yes the quick brown fox was here"),
      (12L, "nothing in common at all with anything")
    ).toDF("doc_id", "text")
    val got = Contamination.ngramOverlap(corpus, probe,
        "doc_id", "text", n = 3, minShared = 5)
      .as[(Long, Long, Long)].collect().toSet
    assert(got.map(t => (t._1, t._2)) === Set((10L, 1L)))
    assert(got.head._3 >= 7)
  }

  test("maxDf cap drops grams that occur in too many corpus docs") {
    // "a b c" appears in every corpus doc -> df cap 2 removes it
    val corpus = Seq(
      (1L, "a b c x1 y1"), (2L, "a b c x2 y2"), (3L, "a b c x3 y3")
    ).toDF("doc_id", "text")
    val probe = Seq((10L, "a b c z z z")).toDF("doc_id", "text")
    val uncapped = Contamination.ngramOverlap(corpus, probe,
      "doc_id", "text", n = 3, minShared = 1, maxDf = 0L).count()
    val capped = Contamination.ngramOverlap(corpus, probe,
      "doc_id", "text", n = 3, minShared = 1, maxDf = 2L).count()
    assert(uncapped === 3L)
    assert(capped === 0L)
  }

  test("plan: inverted-index equi-join, no cartesian/nested-loop") {
    val corpus = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val probe = Seq((10L, "a b c e")).toDF("doc_id", "text")
    val plan = Contamination.ngramOverlap(corpus, probe,
        "doc_id", "text", 3, 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
