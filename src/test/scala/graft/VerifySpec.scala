package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Harness guard: a query that throws inside Verify must leave a
  * recorded error artifact (`_errors.json`), never a silent omission —
  * round 6's three red queries read as green-by-omission because
  * failures only went to stderr. */
class VerifySpec extends AnyFunSuite {
  private val spark = GraftTest.spark
  import spark.implicits._

  test("the driver's flagship entry() smoke contract returns rows") {
    // the ONE driver call no other spec or Verify run exercises —
    // if entry() breaks, the driver's smoke check fails the round
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("a throwing query is recorded in _errors.json, green ones dump parquet") {
    val out = Files.createTempDirectory("verify-spec").toString
    val errors = Verify.runAll(spark, GraftTest.sf0001, out, Map(
      "ok_query" -> ((s, _) => Seq(1L, 2L).toDF("id")),
      "boom_query" -> ((_, _) =>
        throw new IllegalStateException("deliberate failure\nsecond line"))
    ))
    assert(errors.keySet == Set("boom_query"))
    assert(Files.exists(Paths.get(out, "ok_query")))
    assert(!Files.exists(Paths.get(out, "boom_query")))
    val json = Files.readString(Paths.get(out, "_errors.json"))
    assert(json.contains("boom_query"))
    assert(json.contains("IllegalStateException"))
    assert(json.contains("deliberate failure"))
    // newline in the message must be escaped, not raw (driver json.load)
    assert(!json.exists(_ == '\n'))
  }

  test("all-green run writes an empty _errors.json (driver-distinguishable)") {
    val out = Files.createTempDirectory("verify-spec-green").toString
    val errors = Verify.runAll(spark, GraftTest.sf0001, out, Map(
      "ok_query" -> ((s, _) => Seq(1L).toDF("id"))))
    assert(errors.isEmpty)
    assert(Files.readString(Paths.get(out, "_errors.json")) == "{}")
  }

  test("every declared query has an oracle, and the docs' declared-" +
      "query counts DERIVE from SparkEntry.queries.size (no drift)") {
    val n = SparkEntry.queries.size
    // the driver records a weaker rows-only check for oracle-less
    // queries; this repo's contract is stronger — every declared query
    // is oracle-gated, and a dangling oracle would silently never run
    assert(SparkEntry.oracleSql.keySet == SparkEntry.queries.keySet,
      "queries and oracleSql must declare the same keys; diff: " +
        (SparkEntry.oracleSql.keySet diff SparkEntry.queries.keySet) +
        " / " + (SparkEntry.queries.keySet diff SparkEntry.oracleSql.keySet))
    // round 7's verdict found a hand-maintained "132/132" against 131
    // real keys — pin every doc statement of the count to the source
    // of truth (docs state it as "<n> declared queries")
    val stmt = raw"(\d+) declared queries".r
    for (doc <- Seq("COVERAGE.md", "TESTRUN.md", "README.md")) {
      val p = Paths.get(doc)
      if (Files.exists(p)) {
        val txt = Files.readString(p)
        stmt.findAllMatchIn(txt).foreach(m =>
          assert(m.group(1).toInt == n,
            s"$doc states '${m.matched}' but SparkEntry declares $n"))
      }
    }
  }

  test("an ANALYSIS-time failure (lazy plan) is still caught and recorded") {
    val out = Files.createTempDirectory("verify-spec-lazy").toString
    val errors = Verify.runAll(spark, GraftTest.sf0001, out, Map(
      // unresolved column: throws at analysis inside the write action,
      // the same failure mode as round 6's NTZ DATATYPE_MISMATCH
      "bad_col" -> ((s, dir) =>
        s.read.parquet(s"$dir/events.parquet").select(col("no_such_col")))
    ))
    assert(errors.contains("bad_col"))
  }
}
