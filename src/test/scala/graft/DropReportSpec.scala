package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** The no-silent-caps rule for the LSH bucket caps: the pair
  * emitters drop over-cap buckets at runtime (documented), and the
  * drop-report companions make that visible — same banding, same
  * threshold, so report and drop can never disagree. */
class DropReportSpec extends AnyFunSuite {

  test("minHashDroppedBuckets: an all-identical corpus over the cap reports every band bucket; under the cap the report is empty and pairs flow") {
    val spark = GraftTest.spark
    import spark.implicits._
    val n = 7
    val docs = (1L to n.toLong)
      .map(i => (i, "the very same boilerplate text body"))
      .toDF("doc_id", "text")
    // over the cap: the pair run yields NOTHING (documented drop) —
    // and the report says exactly why: all 16 band buckets at size n
    assert(Dedup.minHashLsh(docs, maxBucket = 5).count() === 0L)
    val dropped = Dedup.minHashDroppedBuckets(docs, maxBucket = 5)
      .collect()
    assert(dropped.length === 16)
    assert(dropped.forall(_.getAs[Long]("bucket_n") === n.toLong))
    // under the cap: report empty, pairs present — the two surfaces
    // flip together because they share banding and threshold
    assert(Dedup.minHashDroppedBuckets(docs, maxBucket = 10).count() === 0L)
    assert(Dedup.minHashLsh(docs, maxBucket = 10).count() ===
      (n * (n - 1) / 2).toLong)
  }

  test("sigDroppedBuckets: identical prints over the cap report all 4 band buckets with the fold's null exclusion") {
    val spark = GraftTest.spark
    import spark.implicits._
    val sigs = ((1L to 6L).map(i => (Some(i), Some(0x0123456789abL))) :+
        ((Option.empty[Long], Some(0x0123456789abL))))
      .toDF("id", "sig")
    // cap 5 < 6 identical prints: all four 16-bit band buckets drop;
    // the null id is excluded from the count exactly as the fold
    // excludes it from pairing
    val dropped = Dedup.sigDroppedBuckets(sigs, maxBucket = 5).collect()
    assert(dropped.length === 4)
    assert(dropped.forall(_.getAs[Long]("bucket_n") === 6L))
    assert(Dedup.sigDroppedBuckets(sigs, maxBucket = 6).count() === 0L)
  }
}
