package graft.operators

import java.nio.charset.StandardCharsets

/** Shared filesystem machinery for the standing artifacts that keep
  * their metadata INSIDE the swapped data directory ([[GramIndex]]'s
  * `grams/_gram.json`, [[LshTextIndex]]'s `bands/_lsh.json`,
  * [[BinaryIndex]]'s `packed/_binary.json`): Hadoop-FS metadata I/O
  * (java.nio would resolve remote hdfs:// / s3a:// artifacts against
  * the driver's local cwd), the staged two-rename publish, and the
  * PARKED-crash detection. ONE copy — a crash-contract fix applied
  * here reaches every artifact, instead of silently missing one of
  * three near-identical twins (the stale-twin hazard the oracle CTE
  * helpers already guard against on the SQL side).
  *
  * PARKED state: a crash between the swap's two renames leaves the
  * live directory ABSENT with the complete old artifact at
  * `<live>_old`. Readers must never mistake that for "no artifact"
  * (a streaming loop would silently rebuild from one micro-batch, or
  * re-stamp different params at generation 1) — [[requireNotParked]]
  * turns it into a loud failure with the recovery instruction.
  * WRITERS hold the single-writer contract, so [[healParked]] lets
  * build/compact rename the old dir back and continue — generation
  * counters never reset. Readers never heal (a reader renaming dirs
  * would race the writer mid-swap). */
private[graft] object ArtifactIo {
  def hconf(): org.apache.hadoop.conf.Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new org.apache.hadoop.conf.Configuration())

  def fsOf(path: String): org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(path).getFileSystem(hconf())

  def readFile(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): String = {
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  /** Write a small file into `dir` (creating it) — used for the
    * `_<name>.json` metadata that rides inside a stage directory, so
    * the publish rename moves data and metadata together. */
  def writeFileInto(dir: String, name: String, content: String): Unit = {
    val fs = fsOf(dir)
    fs.mkdirs(new org.apache.hadoop.fs.Path(dir))
    val out = fs.create(new org.apache.hadoop.fs.Path(dir, name), true)
    try out.write(content.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Small-file helpers for PATH-LEVEL metadata and sentinel files
    * (the IVF/PQ family's ivf.json/pq.json/ivfpq.json + rebuild
    * sentinels, the LM model's lm.json) — Hadoop FS for the same
    * remote-path reason as the dir-internal metadata: java.nio would
    * resolve an hdfs:// or s3a:// artifact's metadata against the
    * driver's LOCAL cwd. Writes go through tmp + atomic
    * overwrite-rename, so a crash never leaves a truncated file. */
  def fileExists(path: String, name: String): Boolean =
    fsOf(path).exists(new org.apache.hadoop.fs.Path(path, name))

  def readSmallFile(path: String, name: String): String =
    readFile(fsOf(path), new org.apache.hadoop.fs.Path(path, name))

  def writeSmallFileAtomic(path: String, name: String,
      content: String): Unit = {
    val fs = fsOf(path)
    fs.mkdirs(new org.apache.hadoop.fs.Path(path))
    val tmp = new org.apache.hadoop.fs.Path(path, name + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(content.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    val dst = new org.apache.hadoop.fs.Path(path, name)
    org.apache.hadoop.fs.FileContext.getFileContext(fs.getUri, hconf())
      .rename(fs.makeQualified(tmp), fs.makeQualified(dst),
        org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  private val WatermarkFile = "_append_batch"

  /** THE append-watermark protocol — one copy shared by every
    * artifact with idempotent batch appends (SigIndex, BinaryIndex,
    * LineIndex), GENERATION-BOUND: the value commits as
    * `<generation>:<batchId>`, and a reader under a different
    * generation sees -1 (a fresh batch sequence). Binding replaces
    * the old delete-inside-build-stage retirement, which had a real
    * crash window: a rebuild that died after the delete but before
    * the publish rename left the OLD artifact live with its
    * replay protection GONE, so a stale stream replay re-landed an
    * already-compacted batch (for LineIndex that double-counts df —
    * a wrong answer with no downstream dedup to absorb it). With the
    * binding there is no delete step at all: the stale watermark
    * invalidates exactly when the new generation PUBLISHES, and
    * every crash before that leaves the old artifact with its old,
    * still-matching watermark. A legacy unbound value (plain
    * `<batchId>`) reads as valid for any generation — the
    * pre-binding behavior, rewritten on the next commit. */
  def readWatermark(path: String, generation: Int): Long = {
    if (!fileExists(path, WatermarkFile)) return -1L
    val txt = readSmallFile(path, WatermarkFile).trim
    val i = txt.indexOf(':')
    if (i < 0) txt.toLong
    else if (txt.take(i).toInt == generation) txt.drop(i + 1).toLong
    else -1L
  }

  /** Commit the watermark for `generation` (tmp + atomic
    * overwrite-rename — there is never an instant without a marker
    * on disk, so a crash mid-commit can only leave the previous
    * value, never none). */
  def commitWatermark(path: String, generation: Int,
      batchId: Long): Unit =
    writeSmallFileAtomic(path, WatermarkFile, s"$generation:$batchId")

  /** The generation a BOUND watermark names — 0 for absent or
    * legacy-unbound markers. Exists for one caller: every build()
    * derives its new generation as `max(meta.generation, this) + 1`.
    * A takedown delete commits its carried watermark bound to
    * generation m+1 BEFORE its staged swap (the carry-then-swap
    * window analysis); if that delete crashes pre-publish, meta still
    * says m while the watermark names m+1 — and a build() that
    * derived m+1 from meta alone would publish under EXACTLY the
    * generation the stale watermark is bound to, silently refusing
    * the rebuilt artifact's fresh batches 0..last (the data-loss mode
    * the binding exists to eliminate; [[migrateLegacyWatermark]] only
    * rescues UNbound markers). Reading the bound generation lets
    * build always publish PAST any generation the marker file has
    * ever named. */
  def watermarkGeneration(path: String): Int = {
    if (!fileExists(path, WatermarkFile)) return 0
    val txt = readSmallFile(path, WatermarkFile).trim
    val i = txt.indexOf(':')
    if (i < 0) 0 else txt.take(i).toInt
  }

  /** Rebind a LEGACY unbound watermark (plain `<batchId>`) to
    * `generation` — called by every artifact's build() BEFORE its
    * staged swap. Without this, rebuilding a pre-binding artifact
    * leaves the legacy value live, and since a legacy value reads as
    * valid for EVERY generation, the rebuilt artifact's fresh batch
    * sequence is silently refused up to the stale high-watermark
    * (for LineIndex that's missing counts, for the id-bearing
    * artifacts missing rows). Rebinding to the CURRENT (pre-bump)
    * generation is a semantic no-op for the live artifact — same
    * value, now bound to its own generation — so a crash anywhere
    * around it changes nothing; after the rebuild publishes its
    * bumped generation, the bound value invalidates exactly as a
    * post-binding watermark would. No-op for bound or absent
    * markers. */
  def migrateLegacyWatermark(path: String, generation: Int): Unit = {
    if (!fileExists(path, WatermarkFile)) return
    val txt = readSmallFile(path, WatermarkFile).trim
    if (txt.indexOf(':') < 0)
      commitWatermark(path, generation, txt.toLong)
  }

  def deleteFile(path: String, name: String): Unit = {
    fsOf(path).delete(new org.apache.hadoop.fs.Path(path, name), false)
    ()
  }

  /** Number of DATA files under `dir` (recursive; `_`/`.`-prefixed
    * bookkeeping files excluded) — the signal an append-heavy
    * artifact's `needsCompaction` keys on: every plain append adds a
    * file set, and probe latency grows with files listed. One
    * namenode listing, no data read. A missing dir counts 0. */
  def dataFileCount(dir: String): Long = dataFileStats(dir)._1

  /** (count, totalBytes) of the DATA files under `dir` — same single
    * recursive listing as [[dataFileCount]], with sizes summed so
    * compaction can be sized to DATA rather than to core count. */
  def dataFileStats(dir: String): (Long, Long) = {
    val fs = fsOf(dir)
    val p = new org.apache.hadoop.fs.Path(dir)
    if (!fs.exists(p)) return (0L, 0L)
    var n = 0L
    var bytes = 0L
    val it = fs.listFiles(p, true)
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (!name.startsWith("_") && !name.startsWith(".")) {
        n += 1L
        bytes += f.getLen
      }
    }
    (n, bytes)
  }

  /** How many files a compaction of `dir` should WRITE: data bytes
    * over a 128 MB target, at least 1 — sized to the data, never to
    * the core count (a `repartition(defaultParallelism)` rewrite of a
    * tiny artifact would emit more files than it collapses, so a
    * file-count compaction trigger below the core count could never
    * clear and every ingest batch would rewrite the whole artifact). */
  private val DefaultTargetBytes = 128L * 1024 * 1024

  /** The ONE width formula — shared by the [[compactWidth]] writer
    * side and the [[shouldCompact]] trigger side, so the two can
    * never drift apart and re-open the fire-forever loop the
    * convergence contract closes. */
  private def widthOf(bytes: Long, targetBytes: Long): Long =
    math.max(1L, (bytes + targetBytes - 1) / targetBytes)

  def compactWidth(dir: String,
      targetBytes: Long = DefaultTargetBytes): Int = {
    val (_, bytes) = dataFileStats(dir)
    widthOf(bytes, targetBytes).toInt
  }

  /** Progress-guaranteed compaction trigger: the file count exceeds
    * the caller's threshold AND a compaction would actually reduce it
    * (count > [[compactWidth]] under the SAME `targetBytes`). Without
    * the second conjunct a threshold below the compacted width fires
    * forever. */
  def shouldCompact(dir: String, maxDataFiles: Int,
      targetBytes: Long = DefaultTargetBytes): Boolean = {
    val (n, bytes) = dataFileStats(dir)
    n > maxDataFiles && n > widthOf(bytes, targetBytes)
  }

  /** Crash residue check: live dir gone, complete old parked. */
  def isParked(fs: org.apache.hadoop.fs.FileSystem, path: String,
      liveDir: String): Boolean = {
    val live = new org.apache.hadoop.fs.Path(s"$path/$liveDir")
    val old = new org.apache.hadoop.fs.Path(s"$path/${liveDir}_old")
    !fs.exists(live) && fs.exists(old)
  }

  /** Reader-side guard: fail loudly on the parked state instead of
    * reporting "no artifact" (which callers would treat as a
    * build-from-scratch invitation). */
  def requireNotParked(path: String, liveDir: String,
      what: String): Unit = {
    if (isParked(fsOf(path), path, liveDir))
      throw new IllegalArgumentException(
        s"requirement failed: [GRAFT] $what at $path has a CRASHED " +
          s"compact/rebuild: $liveDir/ is missing but ${liveDir}_old " +
          s"holds the complete artifact — rename ${liveDir}_old back " +
          s"(or rerun the build/compact, which auto-heals) before " +
          "reading")
  }

  /** Writer-side recovery (single-writer contract): rename the parked
    * old dir back so the operation proceeds against the complete
    * pre-crash artifact — generation counters never reset. */
  def healParked(fs: org.apache.hadoop.fs.FileSystem, path: String,
      liveDir: String, what: String): Unit = {
    if (isParked(fs, path, liveDir)) {
      require(fs.rename(
        new org.apache.hadoop.fs.Path(s"$path/${liveDir}_old"),
        new org.apache.hadoop.fs.Path(s"$path/$liveDir")),
        s"[GRAFT] $what: cannot heal parked ${liveDir}_old at $path")
    }
  }

  /** Staged two-rename publish: `writeStage` fills `<liveDir>_stage`
    * (parquet + its `_*.json` metadata), the live dir parks at
    * `<liveDir>_old`, the stage moves in, `_old` is dropped. A crash
    * between the renames leaves the PARKED state (see class doc). */
  def stagedSwap(fs: org.apache.hadoop.fs.FileSystem, path: String,
      liveDir: String, what: String)(
      writeStage: String => Unit): Unit = {
    val live = new org.apache.hadoop.fs.Path(s"$path/$liveDir")
    val stage = new org.apache.hadoop.fs.Path(s"$path/${liveDir}_stage")
    val old = new org.apache.hadoop.fs.Path(s"$path/${liveDir}_old")
    writeStage(stage.toString)
    if (fs.exists(old)) fs.delete(old, true)
    require(fs.rename(live, old), s"[GRAFT] $what: cannot stage $live")
    require(fs.rename(stage, live),
      s"[GRAFT] $what: swap failed — recover by renaming $old back")
    fs.delete(old, true)
  }

  /** Rerun-tolerant swap-in for sentinel-guarded rebuilds
    * ([[IvfIndex]]/[[PqIndex]]/IvfPq): move `<what>_stage` into
    * place, parking any live dir at `<what>_old` first. After a
    * crash the live dir may already be gone (parked but never
    * replaced) — the stage then just moves in. Runs only inside a
    * rebuild-sentinel window (the caller's readMeta refuses while it
    * stands). */
  def swapIn(fs: org.apache.hadoop.fs.FileSystem, path: String,
      what: String): Unit = {
    val live = new org.apache.hadoop.fs.Path(s"$path/$what")
    val stage = new org.apache.hadoop.fs.Path(s"$path/${what}_stage")
    val old = new org.apache.hadoop.fs.Path(s"$path/${what}_old")
    if (fs.exists(old)) fs.delete(old, true)
    if (fs.exists(live))
      require(fs.rename(live, old),
        s"[GRAFT] rebuild: cannot stage $live")
    require(fs.rename(stage, live),
      s"[GRAFT] rebuild: cannot move $stage in — rerun build to recover")
    fs.delete(old, true)
  }

  /** Fresh publish: stage → one rename to live (no existing dir). */
  def publishFresh(fs: org.apache.hadoop.fs.FileSystem, path: String,
      liveDir: String, what: String)(
      writeStage: String => Unit): Unit = {
    val live = new org.apache.hadoop.fs.Path(s"$path/$liveDir")
    val stage = new org.apache.hadoop.fs.Path(s"$path/${liveDir}_stage")
    writeStage(stage.toString)
    require(fs.rename(stage, live),
      s"[GRAFT] $what: cannot publish $stage")
  }
}
