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
