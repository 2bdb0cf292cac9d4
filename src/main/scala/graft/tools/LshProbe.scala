package graft.tools

/** Dev tool: stage-split timing of the MinHash-LSH dedup pipeline
  * (signatures -> banding -> bucket join -> dedup -> exact verify),
  * built from the SAME Dedup building blocks as production so the
  * stage numbers decompose the real pipeline (a drifted copy here once
  * measured a murmur-bucketed shape the code no longer runs).
  * Run: `sbt "runMain graft.tools.LshProbe [sfDir]"`.
  *
  * Also times two REJECTED variants (measured sf0.1, round 3 — kept
  * here so they aren't re-tried):
  *   A. verify-then-dedup (skip the candidate dropDuplicates): 18.5 s
  *      vs 4.2 s — per-pair intersect work dominates the pipeline, so
  *      verifying the ~1.4× duplicated candidates costs far more than
  *      the 3M-row dedup shuffle it saves.
  *   B. signature-estimated-jaccard prefilter before exact verify
  *      (persisted, so the stages are measured separately): the
  *      prefilter join+zip_with costs 3.5 s to cut 2.1M→1.3M
  *      candidates, then verify still takes 1.2 s — ~4.7 s beyond the
  *      shared banding/join/dedup vs ~1 s for plain verify. AND a 3σ
  *      slack at numHashes=64 still dropped 3 true boundary pairs —
  *      unsound for an oracle-matched operator. */
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object LshProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(
      args.headOption.getOrElse("/root/testdata/sf0.1") + "/documents.parquet")
    def time[T](n: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[lsh-probe] $n: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val banded = graft.operators.Dedup
      .bandedRelation(docs, "id", "text", "doc_id", 16, 4)
    time("signatures+banding only")(banded.count())
    val capped = graft.operators.Dedup.capBuckets(banded, 1000)
    val a = capped.as("a"); val b = capped.as("b")
    val cand = a.join(b, col("a.band") === col("b.band") &&
        col("a.bsig") === col("b.bsig") && col("a.id") < col("b.id"))
      .select(col("a.id").as("a"), col("b.id").as("b"))
    val preDedup = time("bucket self-join (pre-dedup)")(cand.count())
    val cd = time("dropDuplicates")(cand.dropDuplicates("a", "b").count())
    println(s"[lsh-probe] pairs pre-dedup=$preDedup deduped=$cd")
    val v = time("full minHashLsh")(
      graft.operators.Dedup.minHashLsh(docs, 0.8).count())
    println(s"[lsh-probe] verified pairs = $v")

    // ---- experiment A: defer the pair-dedup until AFTER verify ----
    // (swap the 3M-row candidate shuffle for a smaller verified one;
    // verify work grows by the duplicate factor)
    def wordsFor(as: String, w: String) = docs
      .select(col("doc_id").as(as),
        array_distinct(split(trim(lower(col("text"))), "\\s+")).as(w))
    val tLoose = 0.8 - 0.0005
    val vLate = time("A: verify all, dedup after") {
      cand
        .join(wordsFor("a", "wa"), Seq("a"))
        .join(wordsFor("b", "wb"), Seq("b"))
        .filter(size(col("wa")).cast("double") >= size(col("wb")) * tLoose &&
          size(col("wb")).cast("double") >= size(col("wa")) * tLoose)
        .withColumn("jaccard_milli",
          graft.operators.Dedup.jaccardMilli(col("wa"), col("wb")))
        .filter(col("jaccard_milli") >= 800)
        .select(col("a"), col("b"), col("jaccard_milli"))
        .dropDuplicates("a", "b")
        .count()
    }
    println(s"[lsh-probe] A verified pairs = $vLate")

    // ---- experiment B: signature-estimated jaccard prefilter ----
    // (matches/numHashes estimates jaccard; 3-sigma slack at n=64 over
    // the loosened bound keeps every pair the exact filter keeps)
    val sigs = graft.operators.Dedup
      .bandedRelation(docs, "sid", "text", "doc_id", 1, 64)
      .select(col("sid"), col("bsig").as("fsig"))
    val est = {
      val sigma = math.sqrt(0.8 * 0.2 / 64)
      val cut = (tLoose - 3 * sigma) * 64
      cand.dropDuplicates("a", "b")
        .join(sigs.select(col("sid").as("a"), col("fsig").as("sa")), Seq("a"))
        .join(sigs.select(col("sid").as("b"), col("fsig").as("sb")), Seq("b"))
        .filter(size(filter(zip_with(col("sa"), col("sb"),
          (x, y) => (x === y).cast("int")), e => e === 1)) >= cut)
        .select(col("a"), col("b"))
        // persist so the verify timing below measures ONLY the verify
        // stage, not a silent re-execution of this prefilter
        .persist()
    }
    val estKept = time("B: est-jaccard prefilter (post-dedup)")(est.count())
    println(s"[lsh-probe] B candidates kept = $estKept of $cd")
    val vB = time("B: verify prefiltered") {
      est.join(wordsFor("a", "wa"), Seq("a"))
        .join(wordsFor("b", "wb"), Seq("b"))
        .filter(size(col("wa")).cast("double") >= size(col("wb")) * tLoose &&
          size(col("wb")).cast("double") >= size(col("wa")) * tLoose)
        .withColumn("jaccard_milli",
          graft.operators.Dedup.jaccardMilli(col("wa"), col("wb")))
        .filter(col("jaccard_milli") >= 800)
        .count()
    }
    println(s"[lsh-probe] B verified pairs = $vB")
  }
}
