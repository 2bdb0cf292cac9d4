package graft.operators

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted MinHash-LSH band table for INCREMENTAL text near-dup —
  * the text-side twin of [[IvfIndex]]'s standing-artifact story
  * (`dedup_incremental_index` covers embeddings; this covers raw
  * text). [[Dedup.minHashLshJoin]] answers "which corpus docs does
  * this batch duplicate?" but re-tokenizes, re-signs, and re-bands the
  * ENTIRE corpus on every call — at 100 TB the corpus-side signature
  * pass (minhash over every document, every night) dwarfs the delta
  * itself. Here the corpus pays that pass once, at build:
  *
  *   - build: [[Dedup.bandedRelation]] over the corpus → `bands/`
  *     parquet of SLIM (id, band, bsig) triples (the signature slices
  *     only — ~bands × rowsPerBand longs per doc, independent of
  *     document length) + `lsh.json` banding params.
  *   - append: band ONLY the new docs with the persisted params and
  *     append their triples — cost ∝ batch, corpus untouched.
  *   - probe: band ONLY the delta, hash-join it against the stored
  *     triples on (band, bsig), verify candidate pairs by exact
  *     jaccard. Corpus text is touched ONLY to hydrate word sets for
  *     verified candidate ids (same candidates-only join as
  *     [[Dedup.minHashLsh]]).
  *
  * The bucket cap is applied to the STORED side at probe time, over
  * the table as appended — a bucket that grows hot across appends is
  * capped by its CURRENT size, exactly as a fresh
  * [[Dedup.minHashLshJoin]] would see it (build-time capping would
  * freeze each row's verdict at its insertion-time bucket size).
  *
  * Banding params are frozen in the artifact: a probe or append never
  * silently mixes band families (the failure mode of recomputing
  * params at call sites). `generation` bumps on rebuild so derived
  * artifacts can detect staleness, mirroring [[IvfIndex]].
  *
  * Reference anchor: the reference has no incremental text dedup at
  * all (vfs/src/vfs has no text pipeline) — this is part of the
  * training-data-pipeline surface built beyond it. */
object LshTextIndex {
  case class Meta(bands: Int, rowsPerBand: Int, generation: Int)

  private def metaJson(m: Meta): String =
    s"""{"bands":${m.bands},"rowsPerBand":${m.rowsPerBand},"generation":${m.generation}}"""

  private[graft] def readMeta(path: String): Meta = {
    val p = Paths.get(path, "lsh.json")
    require(Files.exists(p), s"[GRAFT] no LSH index at $path")
    val s = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
    def num(k: String) =
      ("\"" + k + "\":(-?\\d+)").r.findFirstMatchIn(s).get.group(1).toInt
    Meta(num("bands"), num("rowsPerBand"), num("generation"))
  }

  /** Build (or REBUILD — generation bumps) the band table at `path`.
    * One pass over the corpus: tokenize → portable minhash signature →
    * explode to (id, band, bsig) triples ([[Dedup.bandedRelation]];
    * slim by construction — word sets never enter the shuffle). */
  def build(docs: DataFrame, path: String, bands: Int = 16,
      rowsPerBand: Int = 4, textCol: String = "text",
      idCol: String = "doc_id"): Unit = {
    require(bands > 0 && rowsPerBand > 0,
      "[GRAFT] lsh index: bands and rowsPerBand must be positive")
    Dedup.bandedRelation(docs, "id", textCol, idCol, bands, rowsPerBand)
      .write.mode("overwrite").parquet(s"$path/bands")
    val gen =
      if (Files.exists(Paths.get(path, "lsh.json")))
        readMeta(path).generation + 1
      else 1
    Files.write(Paths.get(path, "lsh.json"),
      metaJson(Meta(bands, rowsPerBand, gen))
        .getBytes(StandardCharsets.UTF_8))
  }

  /** Band `docs` with the index's frozen params and append their
    * triples. Cost ∝ |docs|; the standing table is not read. Caller
    * contract (as [[IvfIndex.append]]): ids not already indexed. */
  def append(docs: DataFrame, path: String, textCol: String = "text",
      idCol: String = "doc_id"): Unit = {
    val m = readMeta(path)
    Dedup.bandedRelation(docs, "id", textCol, idCol, m.bands,
      m.rowsPerBand)
      .write.mode("append").parquet(s"$path/bands")
  }

  /** Near-dups of `delta` docs against the indexed corpus:
    * (probe_id, corpus_id, jaccard_milli >= round(threshold·1000)).
    *
    * `corpus` supplies text for candidate verification ONLY — it is
    * joined for the candidate ids that survive banding, never scanned
    * for signatures. `maxBucket` caps the stored side's CURRENT
    * buckets (see class doc). Delta-internal pairs are out of scope
    * (run [[Dedup.minHashLsh]] on the delta), matching
    * [[Dedup.minHashLshJoin]] semantics — spec-pinned parity. */
  def probe(spark: SparkSession, path: String, delta: DataFrame,
      corpus: DataFrame, threshold: Double = 0.8,
      textCol: String = "text", idCol: String = "doc_id",
      maxBucket: Int = 1000,
      storedBands: Option[DataFrame] = None): DataFrame = {
    val m = readMeta(path)
    // storedBands overrides the artifact read — the streaming ingest
    // loop passes a residue-scrubbed view of the same table (see
    // Ingest.textDedupIngestStream), mirroring embeddingNearDupJoin's
    // bandedCorpus hook; the cap still applies here either way
    val stored = Dedup.capBuckets(
      storedBands.getOrElse(spark.read.parquet(s"$path/bands")
        .withColumnRenamed("id", "corpus_id")), maxBucket)
    val candidates = Dedup.bandedRelation(delta, "probe_id", textCol,
        idCol, m.bands, m.rowsPerBand)
      .join(stored, Seq("band", "bsig"))
      .select(col("probe_id"), col("corpus_id"))
      .dropDuplicates("probe_id", "corpus_id")
    Dedup.verifyJaccard(candidates, delta, corpus, "probe_id",
      "corpus_id", textCol, idCol, threshold)
  }

  /** Rewrite the band table into one file per shuffle partition —
    * each [[append]] adds a file set, and probe latency grows with
    * files listed (the classic small-files problem). Same staged
    * two-rename swap and single-writer stance as
    * [[IvfIndex.compactAssignments]]; crash between the renames
    * leaves `bands_old` complete — rename back to recover. */
  def compact(spark: SparkSession, path: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val live = new org.apache.hadoop.fs.Path(s"$path/bands")
    val stage = new org.apache.hadoop.fs.Path(s"$path/bands_stage")
    val old = new org.apache.hadoop.fs.Path(s"$path/bands_old")
    spark.read.parquet(live.toString)
      .repartition(col("band"))
      .write.mode("overwrite").parquet(stage.toString)
    if (fs.exists(old)) fs.delete(old, true)
    require(fs.rename(live, old), s"[GRAFT] compact: cannot stage $live")
    require(fs.rename(stage, live),
      s"[GRAFT] compact: swap failed — recover by renaming $old back")
    fs.delete(old, true)
  }
}
