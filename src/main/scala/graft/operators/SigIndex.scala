package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted 64-bit signature table for INCREMENTAL media near-dup —
  * the fingerprint-family twin of [[LshTextIndex]]'s standing-artifact
  * story (text has the band table, embeddings have [[IvfIndex]]; this
  * covers every operator whose per-item print is one LONG: audio
  * energy-delta prints, video frame-intensity prints, text simhash).
  * [[graft.operators.Multimodal.audioNearDupPairs]] answers "which
  * assets duplicate each other?" but re-decodes and re-fingerprints
  * the ENTIRE corpus on every call — at 100 TB the corpus-side decode
  * pass dwarfs the nightly delta. Here the corpus pays it once:
  *
  *   - build: persist the corpus's SLIM (id, sig) rows — 8 bytes of
  *     signature per asset, media bytes never stored — plus a frozen
  *     `family` tag and generation in `_sig.json`.
  *   - append: add the delta's rows — cost ∝ batch, corpus untouched.
  *   - probe: band ONLY the delta ([[Dedup.sigBands]], the same 4×16
  *     derivation as the self-pair fold), hash-join it against the
  *     stored side's band projection, keep pairs with inline
  *     XOR+popcount hamming ≤ `maxHamming`. Pigeonhole over 4 bands:
  *     no false negatives for maxHamming ≤ 3, no false positives.
  *
  * The `family` tag freezes the FINGERPRINT DERIVATION in the
  * artifact (e.g. "audio-energy-w4", "video-intensity-f2"): a probe
  * or append with prints from a different kernel or parameterization
  * fails loudly instead of silently hamming-comparing apples to
  * oranges — the [[LshTextIndex]] frozen-banding-params stance
  * applied to the signature function itself.
  *
  * The bucket cap is applied to the STORED side at probe time over
  * the table as appended ([[Dedup.capBucketsAnti]] — two cheap scans
  * of the parquet artifact instead of shuffling every stored row
  * through a window), exactly the [[LshTextIndex.probe]] trade.
  * Delta-internal pairs are out of scope (run
  * [[graft.operators.Multimodal.audioNearDupPairs]] /
  * [[Dedup.simHashPairs]] on the delta) — matching the text probe's
  * semantics. Metadata rides INSIDE `sigs/` as `_sig.json` and every
  * rewrite (delete, compact) publishes via [[ArtifactIo.stagedSwap]]
  * — no crash state mixes old and new rows, the [[GramIndex]]
  * atomicity stance.
  *
  * Reference anchor: the reference has no media pipeline at all
  * (vfs/src/vfs is vectors-only) — part of the training-data-pipeline
  * surface built beyond it. */
object SigIndex {
  case class Meta(family: String, generation: Int)

  private val Dir = "sigs"

  private def requireFamilyToken(family: String): Unit =
    require(family.nonEmpty && family.matches("[A-Za-z0-9._-]+"),
      s"[GRAFT] sig index: family must be a simple token, got '$family'")

  private def metaJson(m: Meta): String =
    s"""{"family":"${m.family}","generation":${m.generation}}"""

  private def fsOf(path: String): org.apache.hadoop.fs.FileSystem =
    ArtifactIo.fsOf(path)

  private def metaPath(path: String): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(s"$path/$Dir", "_sig.json")

  /** Does an artifact exist at `path`? A parked crash state throws
    * instead of answering false ([[ArtifactIo]] doc: "false" invites
    * an ingest loop to rebuild from one micro-batch). */
  def exists(path: String): Boolean = {
    ArtifactIo.requireNotParked(path, Dir, "sig index")
    fsOf(path).exists(metaPath(path))
  }

  private def readMetaOpt(path: String): Option[Meta] = {
    ArtifactIo.requireNotParked(path, Dir, "sig index")
    val fs = fsOf(path)
    val p = metaPath(path)
    if (!fs.exists(p)) None
    else {
      val txt = ArtifactIo.readFile(fs, p)
      val fam = "\"family\"\\s*:\\s*\"([^\"]*)\"".r
        .findFirstMatchIn(txt).map(_.group(1))
        .getOrElse(throw new IllegalArgumentException(
          s"[GRAFT] sig index: corrupt _sig.json at $path"))
      val gen = "\"generation\"\\s*:\\s*(\\d+)".r
        .findFirstMatchIn(txt).map(_.group(1).toInt)
        .getOrElse(throw new IllegalArgumentException(
          s"[GRAFT] sig index: corrupt _sig.json at $path"))
      Some(Meta(fam, gen))
    }
  }

  private[graft] def readMeta(path: String): Meta =
    readMetaOpt(path).getOrElse(throw new IllegalArgumentException(
      s"[GRAFT] no sig index at $path (expected $Dir/_sig.json)"))

  private def requireFamily(m: Meta, family: String, op: String): Unit =
    require(m.family == family,
      s"[GRAFT] sig index $op: artifact holds '${m.family}' prints, " +
        s"caller supplied '$family' — fingerprint families must not " +
        "mix (re-derive the delta with the artifact's kernel, or " +
        "build a separate index)")

  private def slim(sigs: DataFrame): DataFrame = {
    require(Seq("id", "sig").forall(sigs.columns.contains),
      "[GRAFT] sig index: input must have (id, sig)")
    sigs.select(col("id"), col("sig").cast("long").as("sig"))
      .filter(col("id").isNotNull && col("sig").isNotNull)
  }

  /** Build (or REBUILD — generation bumps) the signature table at
    * `path` from (id, sig) rows, freezing `family`. */
  def build(sigs: DataFrame, path: String, family: String): Unit = {
    requireFamilyToken(family)
    val fs = fsOf(path)
    ArtifactIo.healParked(fs, path, Dir, "sig build")
    // bind a pre-binding (unbound) watermark to the LIVE generation
    // first — otherwise it would stay valid for the rebuilt
    // generation and silently refuse its fresh batch sequence
    ArtifactIo.migrateLegacyWatermark(path,
      readMetaOpt(path).map(_.generation).getOrElse(0))
    // publish PAST any generation the watermark file names, not just
    // meta's: a takedown delete parked pre-publish leaves meta at m
    // with the carried watermark bound to m+1 — a meta-only bump
    // would publish under that exact generation and silently refuse
    // the fresh batch sequence ([[ArtifactIo.watermarkGeneration]])
    val gen = math.max(readMetaOpt(path).map(_.generation).getOrElse(0),
      ArtifactIo.watermarkGeneration(path)) + 1
    val rows = slim(sigs)
    val live = new org.apache.hadoop.fs.Path(s"$path/$Dir")
    def writeStage(stage: String): Unit = {
      rows.write.mode("overwrite").parquet(stage)
      ArtifactIo.writeFileInto(stage, "_sig.json",
        metaJson(Meta(family, gen)))
      // NO watermark retirement step: the watermark is bound to the
      // generation ([[ArtifactIo.readWatermark]]), so the rebuilt
      // artifact's fresh batch sequence starts exactly when this
      // stage's bumped generation publishes — the old delete-here
      // protocol had a crash window (delete done, rename not) that
      // left the OLD artifact live without replay protection.
    }
    if (!fs.exists(live))
      ArtifactIo.publishFresh(fs, path, Dir, "sig build")(writeStage)
    else
      ArtifactIo.stagedSwap(fs, path, Dir, "sig build")(writeStage)
  }

  /** Append delta (id, sig) rows. Cost ∝ batch; the standing table is
    * not read. Caller contract (as [[LshTextIndex.append]]): ids not
    * already indexed, prints from the artifact's `family` kernel.
    *
    * AT-LEAST-ONCE hazard: this plain append has no replay marker — a
    * retried/replayed call stores the same print twice. Probe results
    * stay correct (the post-join pair dedup collapses duplicates) but
    * the duplicate rows inflate their buckets toward `maxBucket` and
    * [[compact]] never collapses them. Replay-prone callers (retried
    * jobs, streaming foreachBatch outside
    * [[graft.streaming.Ingest.mediaDedupIngestStream]]'s own ledger)
    * should use [[appendIdempotent]]. */
  def append(sigs: DataFrame, path: String, family: String): Unit = {
    requireFamilyToken(family)
    requireFamily(readMeta(path), family, "append")
    slim(sigs).write.mode("append").parquet(s"$path/$Dir")
  }

  /** [[append]] guarded by the shared generation-bound watermark
    * ([[ArtifactIo.readWatermark]] — ONE protocol for SigIndex /
    * BinaryIndex / LineIndex): a replay of an already-committed
    * `batchId` is an exact no-op, so at-least-once drivers never
    * double-store a print. Only a crash INSIDE the append→marker
    * window can still duplicate (and the probe's post-join dedup
    * keeps even that from corrupting results). [[build]] bumps the
    * generation, which starts a fresh batch sequence at publish time
    * with no delete-step crash window. Returns whether the batch was
    * applied. */
  def appendIdempotent(sigs: DataFrame, path: String, family: String,
      batchId: Long): Boolean = {
    val gen = readMeta(path).generation
    if (batchId <= ArtifactIo.readWatermark(path, gen)) return false
    append(sigs, path, family)
    ArtifactIo.commitWatermark(path, gen, batchId)
    true
  }

  /** Should an ingest loop schedule [[compact]]? Every [[append]]
    * adds a file set and probe latency grows with files listed; this
    * keys on ONE namenode listing (no data read) so the check is
    * cheap enough to run per batch — the [[IvfIndex.needsRebalance]]
    * self-scheduling pattern applied to small-files growth. */
  def needsCompaction(path: String, maxDataFiles: Int = 64): Boolean = {
    require(maxDataFiles > 0,
      "[GRAFT] sig index needsCompaction: maxDataFiles must be positive")
    ArtifactIo.requireNotParked(path, Dir, "sig index")
    ArtifactIo.shouldCompact(s"$path/$Dir", maxDataFiles)
  }

  /** Near-dups of `delta` prints against the indexed corpus:
    * (probe_id, corpus_id, hamming ≤ `maxHamming`). Both sides go
    * through the SAME band projection as the self-pair fold
    * ([[Dedup.sigBands]]); the stored side's CURRENT buckets are
    * capped at `maxBucket` ([[Dedup.capBucketsAnti]]); the hamming is
    * the codegen'd XOR+popcount, identical whichever band surfaces
    * the pair, so the post-join dedup is sound. */
  def probe(spark: SparkSession, path: String, delta: DataFrame,
      family: String, maxHamming: Int = 3,
      maxBucket: Int = 1000,
      storedSigs: Option[DataFrame] = None): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      "[GRAFT] sig index probe: 4-band blocking covers hamming <= 3")
    requireFamilyToken(family)
    requireFamily(readMeta(path), family, "probe")
    // storedSigs overrides the artifact read — the streaming ingest
    // loop passes a residue-scrubbed view of the same table
    // (Ingest.mediaDedupIngestStream), mirroring LshTextIndex.probe's
    // storedBands hook. Cap strategy follows capBucketsAnti's rescan
    // rule (see that probe's comment): anti-join form for the cheap
    // parquet artifact read, single-pass window cap for a derived
    // caller view whose derivation would otherwise run twice.
    val stored = storedSigs match {
      case Some(view) => Dedup.capBuckets(
        Dedup.sigBands(slim(view), "corpus_id")
          .withColumnRenamed("sig", "__cs"),
        maxBucket, Seq("band", "bval"))
      case None => Dedup.capBucketsAnti(
        Dedup.sigBands(spark.read.parquet(s"$path/$Dir"), "corpus_id")
          .withColumnRenamed("sig", "__cs"),
        maxBucket, Seq("band", "bval"))
    }
    val probes = Dedup.sigBands(slim(delta), "probe_id")
      .withColumnRenamed("sig", "__ps")
    probes.join(stored, Seq("band", "bval"))
      .select(col("probe_id"), col("corpus_id"),
        bit_count(col("__ps").bitwiseXOR(col("__cs"))).cast("long")
          .as("hamming"))
      .filter(col("hamming") <= maxHamming)
      // pin the dedup exchange's width against AQE coalescing — the
      // same stance as LshTextIndex.probe
      .repartition(spark.sparkContext.defaultParallelism,
        col("probe_id"), col("corpus_id"))
      .dropDuplicates("probe_id", "corpus_id")
  }

  /** Hard-delete assets from the signature table — the takedown/GDPR
    * path completing the per-artifact delete family
    * ([[IvfIndex.deleteIds]] / [[LshTextIndex.deleteIds]] /
    * [[BinaryIndex.deleteIds]] / [[GramIndex.retire]]): a deleted
    * asset's print must never surface it as a probe candidate again.
    * One anti-join rewrite via the staged swap (a crash leaves the
    * old table or the new one, never a mix); `generation` bumps.
    * `ids` are driver-sized by contract. Returns rows removed. */
  def deleteIds(spark: SparkSession, path: String,
      ids: Seq[Any]): Long = {
    if (ids.isEmpty) return 0L
    val fs = fsOf(path)
    ArtifactIo.healParked(fs, path, Dir, "sig delete")
    val m = readMeta(path)
    val rows = spark.read.parquet(s"$path/$Dir")
    val removed = rows.filter(col("id").isin(ids: _*)).count()
    val kept = rows.filter(!col("id").isin(ids: _*))
    // carry the generation-bound watermark into the new generation
    // BEFORE the swap: a takedown must not restart the batch sequence
    // (a stale replay would re-append — and could RESURRECT the very
    // ids this delete removes). Carry-then-swap means a crash in
    // between leaves the OLD generation live with a mismatched
    // watermark — stale replays then re-append DUPLICATES to the old
    // artifact (absorbed by the probe's post-join dedup), never
    // deleted rows to the new one; and a delete re-run after that
    // crash publishes a new generation whose watermark is already the
    // carried value.
    val last = ArtifactIo.readWatermark(path, m.generation)
    if (last >= 0L)
      ArtifactIo.commitWatermark(path, m.generation + 1, last)
    ArtifactIo.stagedSwap(fs, path, Dir, "sig delete") { stage =>
      kept.write.mode("overwrite").parquet(stage)
      ArtifactIo.writeFileInto(stage, "_sig.json",
        metaJson(m.copy(generation = m.generation + 1)))
    }
    removed
  }

  /** Rewrite the table into one file set — each [[append]] adds
    * files and probe latency grows with files listed. Physical
    * rewrite, metadata unchanged ([[LshTextIndex.compact]]). */
  def compact(spark: SparkSession, path: String): Unit = {
    val fs = fsOf(path)
    ArtifactIo.healParked(fs, path, Dir, "sig compact")
    val m = readMeta(path)
    val folded = spark.read.parquet(s"$path/$Dir")
      .repartition(ArtifactIo.compactWidth(s"$path/$Dir"))
    ArtifactIo.stagedSwap(fs, path, Dir, "sig compact") { stage =>
      folded.write.mode("overwrite").parquet(stage)
      ArtifactIo.writeFileInto(stage, "_sig.json", metaJson(m))
    }
  }
}
