package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Persisted SEEN-URL set for incremental URL-keyed dedup — the
  * standing-artifact story ([[LshTextIndex]] for text near-dup,
  * [[GramIndex]] for substrings, [[SigIndex]] for media prints,
  * [[LineIndex]] for boilerplate counts) applied to
  * [[WebCuration.urlDedup]]: a nightly crawl batch only needs "which
  * of these fetches is a page we already have" — one ANTI JOIN of the
  * delta against the stored keys, never a corpus rescan.
  *
  * Stored rows are the NORMALIZED urls themselves
  * ([[WebCuration.normalizeUrl]] — the dedup identity), not their
  * hashes: a 64-bit hash ledger at 10^10 urls carries birthday
  * collisions that silently DROP distinct pages, and parquet string
  * columns dictionary-compress canonical urls well. Unaddressable
  * rows (keys that normalize to NULL) are never stored and always
  * pass [[filterNew]] — a fetch with no URL identity cannot be a
  * duplicate of one.
  *
  * Layout is batch-ADDRESSED like [[LineIndex]]: [[appendIdempotent]]
  * lands the batch's distinct keys at `urls/batch=<id>` with
  * OVERWRITE — cost ∝ batch (the standing table is not read on
  * append, so a key seen in an earlier batch may recur in a later
  * partition; presence semantics absorb that, and [[compact]] folds
  * the partitions to one distinct set). A replay at ANY crash point
  * rewrites the same partition with identical content; the
  * generation-bound monotonic watermark ([[ArtifactIo.readWatermark]])
  * refuses STALE batch ids so an already-compacted batch can never
  * re-land; the watermark lives at the artifact root, OUTSIDE
  * `urls/`, so compaction's staged swap preserves it.
  *
  * Takedown ([[deleteUrls]]): keys ARE the rows, so subtraction is
  * well-defined here (unlike [[LineIndex]]'s counted lines) — an
  * anti-join staged-swap rewrite folding to the base partition, with
  * the generation bumped and the watermark carried (the
  * [[SigIndex.deleteIds]] stance: a takedown must not restart the
  * batch sequence). After a takedown the removed pages are NEW again
  * by design — a re-crawl re-admits them.
  *
  * Metadata rides INSIDE `urls/` as `_urls.json`; every rewrite
  * publishes via [[ArtifactIo.stagedSwap]] — no crash state mixes old
  * and new rows.
  *
  * Reference anchor: none (vfs/src/vfs is vectors-only) — part of the
  * training-data-pipeline surface built beyond the reference. */
object UrlIndex {
  case class Meta(generation: Int)

  private val Dir = "urls"

  /** [[build]]'s corpus keys and [[compact]]'s folded rows live here;
    * [[appendIdempotent]] requires batch ids ≥ 0, so the base can
    * never collide with a landed batch. */
  private val BaseBatch = -1L

  private def metaJson(m: Meta): String =
    s"""{"generation":${m.generation}}"""

  private def fsOf(path: String): org.apache.hadoop.fs.FileSystem =
    ArtifactIo.fsOf(path)

  private def metaPath(path: String): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(s"$path/$Dir", "_urls.json")

  /** Does an artifact exist at `path`? A parked crash state throws
    * instead of answering false (the [[SigIndex.exists]] stance). */
  def exists(path: String): Boolean = {
    ArtifactIo.requireNotParked(path, Dir, "url index")
    fsOf(path).exists(metaPath(path))
  }

  /** Heal a crash parked mid-swap (compact, delete, or rebuild died
    * between its two renames): rename the complete old table back
    * live. Ingest loops call this at the top of every batch. */
  def healParked(path: String): Unit = {
    ArtifactIo.healParked(fsOf(path), path, Dir, "url index heal")
    ()
  }

  private def readMetaOpt(path: String): Option[Meta] = {
    ArtifactIo.requireNotParked(path, Dir, "url index")
    val fs = fsOf(path)
    val p = metaPath(path)
    if (!fs.exists(p)) None
    else {
      val txt = ArtifactIo.readFile(fs, p)
      val gen = "\"generation\"\\s*:\\s*(\\d+)".r
        .findFirstMatchIn(txt).map(_.group(1).toInt)
        .getOrElse(throw new IllegalArgumentException(
          s"[GRAFT] url index: corrupt _urls.json at $path"))
      Some(Meta(gen))
    }
  }

  private[graft] def readMeta(path: String): Meta =
    readMetaOpt(path).getOrElse(throw new IllegalArgumentException(
      s"[GRAFT] no url index at $path (expected $Dir/_urls.json)"))

  /** The batch's distinct NORMALIZED keys (null keys dropped). */
  private def keysOf(docs: DataFrame, urlCol: String): DataFrame =
    docs.select(WebCuration.normalizeUrl(col(urlCol)).as("url"))
      .filter(col("url").isNotNull).distinct()

  private def writeBase(rows: DataFrame, path: String,
      gen: Int): Unit = {
    val fs = fsOf(path)
    val live = new org.apache.hadoop.fs.Path(s"$path/$Dir")
    def writeStage(stage: String): Unit = {
      rows.write.mode("overwrite").parquet(s"$stage/batch=$BaseBatch")
      ArtifactIo.writeFileInto(stage, "_urls.json",
        metaJson(Meta(gen)))
      // no watermark retirement step — generation-bound, invalidates
      // at publish ([[ArtifactIo.readWatermark]])
    }
    if (!fs.exists(live))
      ArtifactIo.publishFresh(fs, path, Dir, "url build")(writeStage)
    else
      ArtifactIo.stagedSwap(fs, path, Dir, "url build")(writeStage)
  }

  /** Build (or REBUILD — generation bumps, which starts a fresh batch
    * sequence at publish) the seen set from a corpus. */
  def build(docs: DataFrame, path: String,
      urlCol: String = "url"): Unit = {
    ArtifactIo.healParked(fsOf(path), path, Dir, "url build")
    // bind a pre-binding (unbound) watermark to the LIVE generation
    // first ([[ArtifactIo.migrateLegacyWatermark]])
    ArtifactIo.migrateLegacyWatermark(path,
      readMetaOpt(path).map(_.generation).getOrElse(0))
    // publish PAST any generation the watermark file names — a
    // takedown delete parked pre-publish binds the carried watermark
    // to m+1 while meta still says m ([[ArtifactIo.watermarkGeneration]])
    val gen = math.max(readMetaOpt(path).map(_.generation).getOrElse(0),
      ArtifactIo.watermarkGeneration(path)) + 1
    writeBase(keysOf(docs, urlCol), path, gen)
  }

  /** Create an EMPTY artifact — the incremental entry point
    * ([[LineIndex.create]] rationale: a loop that creates empty and
    * lands every batch through [[appendIdempotent]] never needs a
    * residue-vs-rebuilt heuristic). Idempotent. */
  def create(spark: SparkSession, path: String): Unit = {
    ArtifactIo.healParked(fsOf(path), path, Dir, "url create")
    if (readMetaOpt(path).isDefined) return
    val empty = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      StructType(Seq(StructField("url", StringType))))
    writeBase(empty, path, 1)
  }

  /** Land the batch's distinct keys at `urls/batch=<id>` with
    * OVERWRITE — replay-idempotent by construction (a crash between
    * the partition write and the watermark just makes the replay
    * rewrite identical content); stale ids are refused. The standing
    * table is NOT read — cost ∝ batch; cross-batch recurrences of a
    * key are absorbed by presence semantics and folded by
    * [[compact]]. Returns whether the batch was applied. */
  def appendIdempotent(docs: DataFrame, path: String, batchId: Long,
      urlCol: String = "url"): Boolean = {
    require(batchId >= 0L,
      "[GRAFT] url index append: batchId must be >= 0")
    val gen = readMeta(path).generation
    if (batchId <= ArtifactIo.readWatermark(path, gen)) return false
    keysOf(docs, urlCol).write.mode("overwrite")
      .parquet(s"$path/$Dir/batch=$batchId")
    ArtifactIo.commitWatermark(path, gen, batchId)
    true
  }

  /** Has `batchId` already been committed under the CURRENT
    * generation? Ingest loops use this to skip a replayed batch
    * WHOLESALE: the watermark only advances after the batch's doc
    * partition landed (commit order), so a committed batch's outputs
    * are complete — and recomputing them after [[compact]] has folded
    * the batch's keys into the base partition would probe against the
    * batch's OWN keys (the `excludeBatch` mask no longer covers them)
    * and overwrite the landed docs with an empty set. */
  def isCommitted(path: String, batchId: Long): Boolean =
    batchId <= ArtifactIo.readWatermark(path,
      readMeta(path).generation)

  /** The stored key set (with its `batch` address column). */
  def stored(spark: SparkSession, path: String): DataFrame = {
    readMeta(path)
    spark.read.parquet(s"$path/$Dir")
  }

  /** `docs` whose normalized URL is NOT in the seen set — ONE LEFT
    * ANTI join of the delta against slim stored keys. Rows whose URL
    * normalizes to NULL always pass (no dedup identity).
    * `excludeBatch` masks one landed partition from the probe — the
    * ingest loop probes "everything except my own batch" so a replay
    * after its append landed still computes the same survivors. */
  def filterNew(spark: SparkSession, path: String, docs: DataFrame,
      urlCol: String = "url",
      excludeBatch: Long = Long.MinValue): DataFrame = {
    WorkCols.requireFree(docs, "__nu")
    val seen = stored(spark, path)
      .filter(col("batch") =!= lit(excludeBatch))
      .select(col("url").as("__seen"))
    docs.withColumn("__nu", WebCuration.normalizeUrl(col(urlCol)))
      .join(seen, col("__nu") === col("__seen"), "left_anti")
      .drop("__nu")
  }

  /** Remove keys (matched AFTER normalizing both sides) — the
    * takedown rewrite: fold every partition minus the removed keys
    * into the base, staged swap, generation bump, watermark CARRIED
    * into the new generation. Returns rows removed (> |urls| when
    * cross-batch recurrences existed — every copy goes). */
  def deleteUrls(spark: SparkSession, path: String,
      urls: Seq[String]): Long = {
    require(urls.nonEmpty, "[GRAFT] url index delete: empty url list")
    val fs = fsOf(path)
    ArtifactIo.healParked(fs, path, Dir, "url delete")
    val m = readMeta(path)
    import spark.implicits._
    val gone = keysOf(urls.toDF("u"), "u")
      .select(col("url").as("__gone"))
    val rows = spark.read.parquet(s"$path/$Dir")
    val removed = rows.join(gone, col("url") === col("__gone"),
      "left_semi").count()
    val kept = rows.join(gone, col("url") === col("__gone"),
        "left_anti")
      .select(col("url")).distinct()
      .repartition(ArtifactIo.compactWidth(s"$path/$Dir"))
    // carry the watermark into the new generation BEFORE the swap
    // (the [[SigIndex.deleteIds]] window analysis: swap-then-carry
    // could let a stale batch replay RE-SEED the just-deleted keys
    // into the new generation, silently refusing their re-crawl;
    // carry-then-swap degrades a crash to presence-absorbed duplicate
    // keys on the OLD artifact)
    val last = ArtifactIo.readWatermark(path, m.generation)
    if (last >= 0L)
      ArtifactIo.commitWatermark(path, m.generation + 1, last)
    ArtifactIo.stagedSwap(fs, path, Dir, "url delete") { stage =>
      kept.write.mode("overwrite").parquet(s"$stage/batch=$BaseBatch")
      ArtifactIo.writeFileInto(stage, "_urls.json",
        metaJson(m.copy(generation = m.generation + 1)))
    }
    removed
  }

  /** Should an ingest loop schedule [[compact]]? One namenode listing
    * with the [[ArtifactIo.shouldCompact]] convergence contract. */
  def needsCompaction(path: String, maxDataFiles: Int = 64): Boolean = {
    require(maxDataFiles > 0,
      "[GRAFT] url index needsCompaction: maxDataFiles must be positive")
    ArtifactIo.requireNotParked(path, Dir, "url index")
    ArtifactIo.shouldCompact(s"$path/$Dir", maxDataFiles)
  }

  /** Fold all partitions into one DISTINCT key set in the base
    * partition at data-sized width. Physical rewrite, metadata
    * unchanged — probe results identical before and after; the
    * watermark survives (artifact root), so a stale replay of a
    * folded batch is still refused. */
  def compact(spark: SparkSession, path: String): Unit = {
    val fs = fsOf(path)
    ArtifactIo.healParked(fs, path, Dir, "url compact")
    val m = readMeta(path)
    val folded = spark.read.parquet(s"$path/$Dir")
      .select(col("url")).distinct()
      .repartition(ArtifactIo.compactWidth(s"$path/$Dir"))
    ArtifactIo.stagedSwap(fs, path, Dir, "url compact") { stage =>
      folded.write.mode("overwrite").parquet(s"$stage/batch=$BaseBatch")
      ArtifactIo.writeFileInto(stage, "_urls.json", metaJson(m))
    }
  }
}
