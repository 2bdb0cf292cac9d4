package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TimeNorm

/** Regression guard for the harness's shifting events.parquet time
  * type: round ≤5 shipped TIMESTAMP(NANOS) (read as LONG under
  * nanosAsLong), round 6 shipped TIMESTAMP(MICROS, isAdjustedToUTC=
  * false) (read as TIMESTAMP_NTZ) — which broke w_sessionize /
  * q_time_resample / asof_join_tolerance and crashed the bench main.
  * Every operator taking a time column must tolerate LONG-nanos, NTZ,
  * and LTZ; these specs run the three affected queries end-to-end over
  * parquet fixtures of each flavor and require identical results. */
class TimeNormSpec extends AnyFunSuite {
  private val spark = GraftTest.spark
  import spark.implicits._

  // small events-shaped table: 2 users, clicks and purchases spread
  // over ~3 hours so sessionize splits (gap > 30 min), resample has
  // gaps to LOCF-fill, and the 1h as-of tolerance both passes and fails
  private def baseMicros: Seq[(Long, Long, String, Double, Long)] = {
    val t0 = 1700000000000000L // 2023-11-14T22:13:20Z, epoch micros
    Seq(
      (1L, 10L, "click",    1.0, t0),
      (2L, 10L, "purchase", 5.0, t0 + 600L * 1000000),        // +10 min
      (3L, 10L, "click",    2.0, t0 + 1200L * 1000000),       // +20 min
      (4L, 10L, "click",    3.0, t0 + 7200L * 1000000),       // +2 h (new session; >1h after purchase)
      (5L, 20L, "purchase", 7.0, t0 + 300L * 1000000),
      (6L, 20L, "click",    4.0, t0 + 1500L * 1000000),       // +25 min (within 1h of purchase)
      (7L, 20L, "click",    6.0, t0 + 10800L * 1000000)       // +3 h
    )
  }

  /** Write the fixture with `ts` in the given flavor; returns the dir. */
  private def writeFixture(flavor: String): String = {
    val dir = Files.createTempDirectory(s"tsnorm-$flavor").toString
    val df = baseMicros
      .toDF("event_id", "user_id", "event_type", "value", "us")
    val withTs = flavor match {
      case "long_nanos" => df.withColumn("ts", col("us") * 1000L)
      case "ntz" => df.withColumn("ts",
        timestamp_micros(col("us")).cast(TimestampNTZType))
      case "ltz" => df.withColumn("ts", timestamp_micros(col("us")))
    }
    withTs.drop("us").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private lazy val dirs =
    Seq("long_nanos", "ntz", "ltz").map(f => f -> writeFixture(f)).toMap

  test("fixtures round-trip with the intended physical types") {
    val ntz = spark.read.parquet(s"${dirs("ntz")}/events.parquet")
    assert(ntz.schema("ts").dataType == TimestampNTZType,
      "NTZ fixture must read back as TIMESTAMP_NTZ to reproduce the harness data")
    val ltz = spark.read.parquet(s"${dirs("ltz")}/events.parquet")
    assert(ltz.schema("ts").dataType == TimestampType)
  }

  test("normalize: all three flavors land on identical TIMESTAMP instants") {
    val got = dirs.view.mapValues { d =>
      val n = TimeNorm.normalize(
        spark.read.parquet(s"$d/events.parquet"), "ts")
      assert(n.schema("ts").dataType == TimestampType)
      n.select(col("event_id"), unix_micros(col("ts")).as("us"))
        .orderBy(col("event_id")).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    }.toMap
    assert(got("ntz") == got("ltz"))
    assert(got("long_nanos") == got("ltz"))
    assert(got("ltz").map(_._2) == baseMicros.map(_._5))
  }

  test("normalize rejects non-time columns loudly") {
    val df = Seq((1L, "x")).toDF("id", "ts")
    val e = intercept[IllegalArgumentException] {
      TimeNorm.normalize(df, "ts")
    }
    assert(e.getMessage.contains("unsupported time column type"))
  }

  test("normalize accepts DATE as that day's UTC midnight") {
    val df = Seq(1L).toDF("id").select(col("id"),
      to_date(lit("2024-03-05")).as("ts"))
    val n = TimeNorm.normalize(df, "ts")
    assert(n.schema("ts").dataType == TimestampType)
    assert(n.select(unix_micros(col("ts"))).head().getLong(0) ==
      java.time.Instant.parse("2024-03-05T00:00:00Z").toEpochMilli * 1000)
  }

  test("epochMicros accepts both timestamp flavors") {
    val df = Seq(1700000000000000L).toDF("us").select(
      timestamp_micros(col("us")).as("ltz"),
      timestamp_micros(col("us")).cast(TimestampNTZType).as("ntz"))
    val r = df.select(TimeNorm.epochMicros(col("ltz")),
      TimeNorm.epochMicros(col("ntz"))).head()
    assert(r.getLong(0) == 1700000000000000L)
    assert(r.getLong(1) == 1700000000000000L)
  }

  private def run(q: String, dir: String): Seq[String] =
    SparkEntry.queries(q)(spark, dir).collect()
      .map(_.toSeq.mkString("|")).toSeq

  for (q <- Seq("w_sessionize", "q_time_resample", "asof_join_tolerance")) {
    test(s"$q runs identically over LONG-nanos, NTZ, and LTZ events") {
      val byFlavor = dirs.view.mapValues(run(q, _)).toMap
      assert(byFlavor("ltz").nonEmpty, s"$q returned no rows on the fixture")
      assert(byFlavor("ntz") == byFlavor("ltz"),
        s"$q diverges on TIMESTAMP_NTZ input")
      assert(byFlavor("long_nanos") == byFlavor("ltz"),
        s"$q diverges on LONG-nanos input")
    }
  }

  test("sessionize splits sessions as expected on the NTZ fixture") {
    val rows = SparkEntry.queries("w_sessionize")(spark, dirs("ntz"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // user 10: events at +0/+10/+20 min then +2h → sessions of 3 and 1
    // user 20: +5/+25 min then +3h → sessions of 2 and 1
    assert(rows.toSeq == Seq((10L, 1L, 3L), (10L, 2L, 1L),
      (20L, 1L, 2L), (20L, 2L, 1L)))
  }

  test("as-of tolerance nulls matches beyond 1h on the NTZ fixture") {
    val rows = SparkEntry.queries("asof_join_tolerance")(spark, dirs("ntz"))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    // clicks 1 (before any purchase) and 4/7 (>1h after) → -1;
    // clicks 3 and 6 match their user's purchase within the hour
    assert(rows == Map(1L -> -1L, 3L -> 500L, 4L -> -1L,
      6L -> 700L, 7L -> -1L))
  }
}
