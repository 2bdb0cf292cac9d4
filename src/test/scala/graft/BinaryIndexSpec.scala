package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{vfs_binary_quantize, vfs_hamming, BinaryQuantMath}
import graft.operators.BinaryIndex

class BinaryIndexSpec extends AnyFunSuite {
  lazy val spark = GraftTest.spark
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("binidx").toString

  test("persisted sidecar: candidates match the scan-form prefilter " +
      "bit-for-bit; search re-ranks exactly; coarse scan never touches " +
      "the float column") {
    val emb = spark.read.parquet(s"${GraftTest.sf0001}/embeddings.parquet")
    val dir = tmp()
    BinaryIndex.build(emb, dir)
    // metadata rides INSIDE the packed dir (swap-atomic with the data)
    assert(new java.io.File(s"$dir/packed/_binary.json").exists())
    val q = emb.filter($"vec_id" === 1L).select($"embedding")
      .head().getSeq[Float](0).toArray
    val qp = BinaryQuantMath.packFloats(q).toSeq
    val scanForm = emb.select($"vec_id".as("id"),
        vfs_hamming(vfs_binary_quantize($"embedding"), typedLit(qp))
          .as("ham"))
      .orderBy($"ham".asc, $"id".asc).limit(50)
      .as[(Long, Long)].collect().toSeq
    val cand = BinaryIndex.candidates(spark, dir, q, n = 50)
    assert(cand.as[(Long, Long)].collect().toSeq === scanForm)
    // the coarse cut reads ONLY the sidecar: its scan schema carries
    // the packed words, never the float embedding column
    val plan = cand.queryExecution.executedPlan.toString
    assert(plan.contains("packed") && !plan.contains("embedding"), plan)
    // search: exact euclidean re-rank over the candidate ids only,
    // ordered (dist, id)
    val res = BinaryIndex.search(spark, dir, emb, q, k = 10)
      .as[(Long, Long, Double)].collect().toSeq
    assert(res.size === 10)
    assert(res.head._1 === 1L && res.head._3 === 0.0) // self is nearest
    assert(res.map(_._3) === res.map(_._3).sorted)
    assert(res.map(_._1).toSet.subsetOf(scanForm.map(_._1).toSet))
  }

  test("dim frozen in the artifact; append is delta-only; rebuild " +
      "bumps generation; malformed inputs fail loudly") {
    val emb = spark.read.parquet(s"${GraftTest.sf0001}/embeddings.parquet")
    val n = emb.count()
    val dir = tmp()
    BinaryIndex.build(emb, dir)
    assert(BinaryIndex.readMeta(dir).generation === 1)
    val q = emb.filter($"vec_id" === 1L).select($"embedding")
      .head().getSeq[Float](0).toArray
    // wrong-dim query fails loudly (Q7 stance)
    val err = intercept[IllegalArgumentException] {
      BinaryIndex.candidates(spark, dir, q ++ Array(1f), 10)
    }
    assert(err.getMessage.contains("dim"))
    // append five re-identified rows: the sidecar grows by exactly
    // the delta, and the new ids are probe-visible
    BinaryIndex.append(
      emb.limit(5).select(($"vec_id" + 100000L).as("vec_id"),
        $"embedding"), dir)
    assert(spark.read.parquet(s"$dir/packed").count() === n + 5)
    val all = BinaryIndex.candidates(spark, dir, q, (n + 5).toInt)
    assert(all.filter($"id" >= 100000L).count() === 5L)
    // a wrong-dim append batch fails the job loudly (the frozen-dim
    // guard rides inside the pack projection — one pass, no silent
    // same-word-count packing) and commits nothing
    val dimErr = intercept[Exception] {
      BinaryIndex.append(
        Seq((999999L, Seq(1f, 2f))).toDF("vec_id", "embedding"), dir)
    }
    def chainMsg(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    assert(chainMsg(dimErr).contains("!= frozen"))
    assert(spark.read.parquet(s"$dir/packed").count() === n + 5)
    // rebuild folds back to the corpus and bumps the generation
    BinaryIndex.build(emb, dir)
    assert(BinaryIndex.readMeta(dir).generation === 2)
    assert(spark.read.parquet(s"$dir/packed").count() === n)
    // non-uniform dims cannot build (mixed paddings would compare)
    intercept[IllegalArgumentException] {
      BinaryIndex.build(
        Seq((1L, Seq(1f, 2f)), (2L, Seq(1f, 2f, 3f)))
          .toDF("vec_id", "embedding"), tmp())
    }
    // k > nCandidates is a contradiction, not a silent truncation
    intercept[IllegalArgumentException] {
      BinaryIndex.search(spark, dir, emb, q, k = 60, nCandidates = 50)
    }
  }

  test("null-element vectors never become candidates (NULLS FIRST " +
      "would otherwise park them at the top of every candidate list)") {
    val emb = spark.read.parquet(s"${GraftTest.sf0001}/embeddings.parquet")
    val dim = emb.select($"embedding").head().getSeq[Float](0).length
    // one corrupt row: right dim, but a null element → packs to NULL
    val corrupt = Seq((900000L,
      Option(1f) +: Seq.fill(dim - 1)(Option.empty[Float])))
      .toDF("vec_id", "embedding")
    val dir = tmp()
    BinaryIndex.build(
      emb.select($"vec_id", $"embedding").unionByName(corrupt), dir)
    // its sidecar row exists with a NULL packing...
    val packedRow = spark.read.parquet(s"$dir/packed")
      .filter($"id" === 900000L).collect()
    assert(packedRow.length === 1 && packedRow.head.isNullAt(1))
    // ...but it can never displace a real candidate
    val q = emb.filter($"vec_id" === 1L).select($"embedding")
      .head().getSeq[Float](0).toArray
    val cand = BinaryIndex.candidates(spark, dir, q, n = 50)
      .select($"id").as[Long].collect()
    assert(cand.length === 50 && !cand.contains(900000L))
    assert(cand.head === 1L) // the true self-match still leads
  }

  test("whole-NULL vectors store packed=NULL (tolerated, probe-" +
      "invisible) — they must NOT trip the frozen-dim raise_error") {
    val emb = spark.read.parquet(s"${GraftTest.sf0001}/embeddings.parquet")
      .select($"vec_id", $"embedding")
    val nullRow = Seq((910000L, Option.empty[Seq[Float]]))
      .toDF("vec_id", "embedding")
    val dir = tmp()
    BinaryIndex.build(emb.unionByName(nullRow), dir) // no throw
    val stored = spark.read.parquet(s"$dir/packed")
      .filter($"id" === 910000L).collect()
    assert(stored.length === 1 && stored.head.isNullAt(1))
    // append tolerates them identically
    BinaryIndex.append(
      Seq((910001L, Option.empty[Seq[Float]])).toDF("vec_id", "embedding"),
      dir)
    val q = emb.filter($"vec_id" === 1L).select($"embedding")
      .head().getSeq[Float](0).toArray
    val cand = BinaryIndex.candidates(spark, dir, q, n = 2000)
      .select($"id").as[Long].collect().toSet
    assert(!cand.contains(910000L) && !cand.contains(910001L))
  }

  test("replayed appends: appendIdempotent no-ops on a committed " +
      "batch id; a plain-append duplicate never occupies two top-n " +
      "slots (post-cut collapse)") {
    val emb = spark.read.parquet(s"${GraftTest.sf0001}/embeddings.parquet")
    val dir = tmp()
    BinaryIndex.build(emb, dir)
    val q = emb.filter($"vec_id" === 1L).select($"embedding")
      .head().getSeq[Float](0).toArray
    val baseline = BinaryIndex.candidates(spark, dir, q, n = 50)
      .as[(Long, Long)].collect().toSeq
    val delta = emb.filter($"vec_id" === 2L)
      .withColumn("vec_id", lit(920000L))
    // idempotent path: first apply lands, replay of the same id no-ops
    assert(BinaryIndex.appendIdempotent(delta, dir, batchId = 0L))
    assert(!BinaryIndex.appendIdempotent(delta, dir, batchId = 0L))
    val stored = spark.read.parquet(s"$dir/packed")
      .filter($"id" === 920000L).count()
    assert(stored === 1L)
    // plain append replay DOES duplicate the stored row...
    BinaryIndex.append(delta, dir)
    assert(spark.read.parquet(s"$dir/packed")
      .filter($"id" === 920000L).count() === 2L)
    // ...but candidates() collapses it: the id appears at most once
    val cand = BinaryIndex.candidates(spark, dir, q, n = 2000)
      .select($"id").as[Long].collect()
    assert(cand.length === cand.distinct.length)
    assert(cand.count(_ == 920000L) === 1)
    // and the original top-50 is unchanged by the dup (920000 packs
    // identically to vec 2 — dedup keeps one slot for it)
    val top = BinaryIndex.candidates(spark, dir, q, n = 50)
      .as[(Long, Long)].collect().toSeq
    assert(top.filterNot(_._1 == 920000L) ===
      baseline.filterNot(_._1 == 920000L).take(top.count(_._1 != 920000L)))
    // a rebuild retires the marker: batch 0 applies again
    BinaryIndex.build(emb, dir)
    assert(BinaryIndex.appendIdempotent(delta, dir, batchId = 0L))
  }

  test("over-fetched coarse cut: plain-append duplicates occupying " +
      "top-n slots do not shrink the DISTINCT candidate count below n") {
    val emb = spark.read.parquet(s"${GraftTest.sf0001}/embeddings.parquet")
    val dir = tmp()
    BinaryIndex.build(emb, dir)
    val q = emb.filter($"vec_id" === 1L).select($"embedding")
      .head().getSeq[Float](0).toArray
    val baseline = BinaryIndex.candidates(spark, dir, q, n = 10)
      .as[(Long, Long)].collect().toSeq
    assert(baseline.size === 10)
    // replay-append the 5 NEAREST ids: each now occupies two of the
    // raw top-10 slots — a bare n-cut would return only 5 distinct
    val top5 = baseline.take(5).map(_._1)
    BinaryIndex.append(emb.filter($"vec_id".isin(top5: _*)), dir)
    val cand = BinaryIndex.candidates(spark, dir, q, n = 10)
      .as[(Long, Long)].collect().toSeq
    assert(cand === baseline) // n distinct ids, order and hams intact
  }

  test("dim probe ignores whole-NULL vectors even under " +
      "spark.sql.legacy.sizeOfNull=true (size(NULL) = -1 must not " +
      "fail the uniform-dims check)") {
    val emb = spark.read.parquet(s"${GraftTest.sf0001}/embeddings.parquet")
      .select($"vec_id", $"embedding")
    val nullRow = Seq((930000L, Option.empty[Seq[Float]]))
      .toDF("vec_id", "embedding")
    val dir = tmp()
    val key = "spark.sql.legacy.sizeOfNull"
    val old = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    try BinaryIndex.build(emb.unionByName(nullRow), dir) // no throw
    finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
    assert(BinaryIndex.readMeta(dir).dim ===
      emb.select($"embedding").head().getSeq[Float](0).length)
    val stored = spark.read.parquet(s"$dir/packed")
      .filter($"id" === 930000L).collect()
    assert(stored.length === 1 && stored.head.isNullAt(1))
  }

  test("parked crash state (packed/ gone, packed_old complete): " +
      "readers refuse loudly; a build rerun heals with generation " +
      "continuity") {
    val emb = spark.read.parquet(s"${GraftTest.sf0001}/embeddings.parquet")
    val dir = tmp()
    BinaryIndex.build(emb, dir)
    BinaryIndex.build(emb, dir) // generation 2
    assert(BinaryIndex.readMeta(dir).generation === 2)
    java.nio.file.Files.move(
      java.nio.file.Paths.get(s"$dir/packed"),
      java.nio.file.Paths.get(s"$dir/packed_old"))
    val err = intercept[IllegalArgumentException] {
      BinaryIndex.readMeta(dir)
    }
    assert(err.getMessage.contains("CRASHED"))
    BinaryIndex.build(emb, dir) // auto-heal + rebuild
    assert(BinaryIndex.readMeta(dir).generation === 3) // never reset
    assert(!new java.io.File(s"$dir/packed_old").exists())
  }
}
