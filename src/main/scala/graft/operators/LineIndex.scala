package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted line → doc-frequency table for INCREMENTAL boilerplate
  * removal — the standing-artifact story ([[LshTextIndex]] for text
  * near-dup, [[GramIndex]] for substrings, [[SigIndex]] for media
  * prints) applied to [[Dedup.stripBoilerplate]]: the one-call form
  * recounts the WHOLE corpus's line frequencies per run, but a
  * nightly ingest only adds a batch — at 100 TB the corpus-side count
  * pass dwarfs the delta. Here the corpus pays it once:
  *
  *   - build: persist the corpus's (line, df) rows
  *     ([[Dedup.lineDocFreqs]] — trimmed non-blank lines, distinct
  *     docs per line).
  *   - append: add the BATCH's partial (line, df) rows — cost ∝
  *     batch, the standing table is not read. Doc-frequency is
  *     additive over batches with DISJOINT document ids (each doc
  *     counts once per line corpus-wide iff no doc spans batches),
  *     which is the append contract — same stance as
  *     [[LshTextIndex.append]]'s "ids not already indexed".
  *   - counts/boilerplate: merge the partials on read (one hash
  *     aggregate over slim (line, df) rows — never over the corpus).
  *   - strip: [[Dedup.stripBoilerplateWith]] against the merged
  *     boilerplate list — ONE corpus scan, no recount.
  *
  * Storage is deliberately PARTIAL-ROW (a line may appear once per
  * appended batch until [[compact]] folds it): appends stay ∝ batch
  * with no read-modify-write of the standing table, the merge is a
  * read-side aggregate the [[BinaryIndex]] plain-append + compact
  * pattern already established, and [[compact]] both collapses the
  * partials and fixes small-files growth (data-sized width via
  * [[ArtifactIo.compactWidth]]).
  *
  * Takedown: per-line df carries no per-doc provenance, so
  * SUBTRACTING a document is undefined on this layout (the
  * [[GramIndex.retire]] rationale) — rebuild from the surviving
  * corpus ([[build]] bumps the generation and retires the append
  * watermark).
  *
  * Metadata rides INSIDE `lines/` as `_lines.json`; every rewrite
  * publishes via [[ArtifactIo.stagedSwap]] — no crash state mixes old
  * and new rows.
  *
  * Reference anchor: none (vfs/src/vfs is vectors-only) — part of the
  * training-data-pipeline surface built beyond the reference. */
object LineIndex {
  case class Meta(generation: Int)

  private val Dir = "lines"

  private def metaJson(m: Meta): String =
    s"""{"generation":${m.generation}}"""

  private def fsOf(path: String): org.apache.hadoop.fs.FileSystem =
    ArtifactIo.fsOf(path)

  private def metaPath(path: String): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(s"$path/$Dir", "_lines.json")

  /** Does an artifact exist at `path`? A parked crash state throws
    * instead of answering false (the [[SigIndex.exists]] stance). */
  def exists(path: String): Boolean = {
    ArtifactIo.requireNotParked(path, Dir, "line index")
    fsOf(path).exists(metaPath(path))
  }

  private def readMetaOpt(path: String): Option[Meta] = {
    ArtifactIo.requireNotParked(path, Dir, "line index")
    val fs = fsOf(path)
    val p = metaPath(path)
    if (!fs.exists(p)) None
    else {
      val txt = ArtifactIo.readFile(fs, p)
      val gen = "\"generation\"\\s*:\\s*(\\d+)".r
        .findFirstMatchIn(txt).map(_.group(1).toInt)
        .getOrElse(throw new IllegalArgumentException(
          s"[GRAFT] line index: corrupt _lines.json at $path"))
      Some(Meta(gen))
    }
  }

  private[graft] def readMeta(path: String): Meta =
    readMetaOpt(path).getOrElse(throw new IllegalArgumentException(
      s"[GRAFT] no line index at $path (expected $Dir/_lines.json)"))

  /** Build (or REBUILD — generation bumps, append watermark retires)
    * the line table at `path` from `docs`. */
  def build(docs: DataFrame, path: String, textCol: String = "text",
      idCol: String = "doc_id"): Unit = {
    val fs = fsOf(path)
    ArtifactIo.healParked(fs, path, Dir, "line build")
    val gen = readMetaOpt(path).map(_.generation + 1).getOrElse(1)
    val rows = Dedup.lineDocFreqs(docs, textCol, idCol)
    val live = new org.apache.hadoop.fs.Path(s"$path/$Dir")
    def writeStage(stage: String): Unit = {
      rows.write.mode("overwrite").parquet(stage)
      ArtifactIo.writeFileInto(stage, "_lines.json",
        metaJson(Meta(gen)))
      // retire the appendIdempotent high-watermark after the stage
      // write succeeds, before the publish rename — the
      // [[SigIndex.build]] window analysis verbatim
      ArtifactIo.deleteFile(path, "_append_batch")
    }
    if (!fs.exists(live))
      ArtifactIo.publishFresh(fs, path, Dir, "line build")(writeStage)
    else
      ArtifactIo.stagedSwap(fs, path, Dir, "line build")(writeStage)
  }

  /** Append the batch's partial (line, df) rows. Cost ∝ batch; the
    * standing table is not read. Caller contract: the batch's doc ids
    * are DISJOINT from every doc already counted (df is additive only
    * over disjoint doc sets). Replay-prone callers should use
    * [[appendIdempotent]] — a replayed plain append double-counts
    * every line in the batch. */
  def append(docs: DataFrame, path: String, textCol: String = "text",
      idCol: String = "doc_id"): Unit = {
    readMeta(path)
    Dedup.lineDocFreqs(docs, textCol, idCol)
      .write.mode("append").parquet(s"$path/$Dir")
  }

  /** [[append]] guarded by the monotonic `_append_batch` marker (the
    * [[SigIndex.appendIdempotent]] protocol verbatim): a replay of an
    * already-committed batch is an exact no-op — essential HERE
    * because a double-counted batch inflates df and can push clean
    * lines over the boilerplate threshold (a WRONG answer, not just a
    * fatter bucket). Returns whether the batch was applied. */
  def appendIdempotent(docs: DataFrame, path: String, batchId: Long,
      textCol: String = "text", idCol: String = "doc_id"): Boolean = {
    val last =
      if (!ArtifactIo.fileExists(path, "_append_batch")) -1L
      else ArtifactIo.readSmallFile(path, "_append_batch").trim.toLong
    if (batchId <= last) return false
    append(docs, path, textCol, idCol)
    ArtifactIo.writeSmallFileAtomic(path, "_append_batch",
      batchId.toString)
    true
  }

  /** The MERGED corpus-wide (line, df) view — partial batch rows
    * folded by one read-side hash aggregate over slim rows. */
  def counts(spark: SparkSession, path: String): DataFrame = {
    readMeta(path)
    spark.read.parquet(s"$path/$Dir")
      .groupBy(col("line")).agg(sum(col("df")).as("df"))
  }

  /** The boilerplate list at `minDocFreq` — [[Dedup.boilerplateLines]]
    * served from the standing table instead of a corpus recount. */
  def boilerplate(spark: SparkSession, path: String,
      minDocFreq: Long = 5L): DataFrame = {
    require(minDocFreq >= 2L,
      "[GRAFT] line index boilerplate: minDocFreq must be >= 2")
    counts(spark, path).filter(col("df") >= minDocFreq)
  }

  /** Strip `docs` against the standing table —
    * [[Dedup.stripBoilerplateWith]] with the merged boilerplate list:
    * one scan of `docs`, no corpus recount. `docs` may be the full
    * corpus (the batch re-clean after new boilerplate emerges) or a
    * fresh delta. */
  def strip(spark: SparkSession, path: String, docs: DataFrame,
      minDocFreq: Long = 5L, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    Dedup.stripBoilerplateWith(docs,
      boilerplate(spark, path, minDocFreq), textCol, idCol)

  /** Should an ingest loop schedule [[compact]]? One namenode listing
    * with the [[ArtifactIo.shouldCompact]] convergence contract. */
  def needsCompaction(path: String, maxDataFiles: Int = 64): Boolean = {
    require(maxDataFiles > 0,
      "[GRAFT] line index needsCompaction: maxDataFiles must be positive")
    ArtifactIo.requireNotParked(path, Dir, "line index")
    ArtifactIo.shouldCompact(s"$path/$Dir", maxDataFiles)
  }

  /** Fold the partial batch rows into one (line, df) row per line AND
    * fix small-files growth (data-sized width). Physical rewrite,
    * metadata unchanged — read results are identical before and after
    * ([[counts]] merges on read; compaction just pre-folds). */
  def compact(spark: SparkSession, path: String): Unit = {
    val fs = fsOf(path)
    ArtifactIo.healParked(fs, path, Dir, "line compact")
    val m = readMeta(path)
    val folded = spark.read.parquet(s"$path/$Dir")
      .groupBy(col("line")).agg(sum(col("df")).as("df"))
      .repartition(ArtifactIo.compactWidth(s"$path/$Dir"))
    ArtifactIo.stagedSwap(fs, path, Dir, "line compact") { stage =>
      folded.write.mode("overwrite").parquet(stage)
      ArtifactIo.writeFileInto(stage, "_lines.json", metaJson(m))
    }
  }
}
