package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Byte-budget gate for broadcast hints on the batch search paths.
  *
  * A flat row-count threshold is dim-blind: 500k rows at dim 2 is
  * ~36 MB (broadcast freely), the same rows at dim 1536 is ~3 GB — a
  * per-executor OOM in exactly the large-batch regime the batch APIs
  * exist for. Every gate therefore estimates BYTES from the two
  * numbers the call site actually knows — row count and vector
  * dimension (from index meta, or measured alongside the row count in
  * one aggregate) — and hints only when the estimate fits a fixed
  * executor-memory budget. Above the budget the join strategy is left
  * to the planner + AQE, which can still pick a broadcast from its own
  * (runtime) statistics.
  *
  * Catalyst's plan statistics are NOT used here on purpose:
  * `ArrayType.defaultSize` counts a single element, so
  * `sizeInBytes` under-estimates a dim-1536 embedding column by three
  * orders of magnitude — precisely the failure mode this gate exists
  * to prevent.
  */
object BroadcastGate {

  /** Budget for one broadcast-hinted side. Default 256 MB — large
    * enough that every plausibly-beneficial broadcast (query batches,
    * candidate id sets) passes, small enough that no admitted side can
    * pressure a 4–8 GB executor once the ~2× serialization +
    * deserialization cost of a broadcast is paid. Overridable for
    * tests / unusual clusters via system property. */
  def budgetBytes: Long =
    sys.props.get("graft.broadcast.budget.bytes").map(_.toLong)
      .getOrElse(256L * 1024L * 1024L)

  /** Fixed per-row overhead: object headers, the id/qid longs, array
    * length fields, row offsets in the broadcast hash relation. */
  val RowOverheadBytes: Long = 64L

  /** Estimated broadcast bytes of `rows` float vectors at `dim`
    * (dim 0 = id-only rows, overhead dominates). Saturates instead of
    * overflowing for absurd inputs. */
  def vectorBatchBytes(rows: Long, dim: Int): Long = {
    val perRow = dim.toLong * 4L + RowOverheadBytes
    if (rows <= 0L) 0L
    else if (rows > Long.MaxValue / perRow) Long.MaxValue
    else rows * perRow
  }

  /** Does a `rows` × `dim` batch fit the broadcast budget? */
  def fits(rows: Long, dim: Int): Boolean =
    vectorBatchBytes(rows, dim) <= budgetBytes

  /** `broadcast(df)` iff the estimated batch size fits the budget;
    * otherwise `df` unchanged (planner's choice). */
  def gated(df: DataFrame, rows: Long, dim: Int): DataFrame =
    if (fits(rows, dim)) broadcast(df) else df

  /** Budget for one driver-side COLLECT — deliberately a SEPARATE
    * knob from [[budgetBytes]]: zeroing the broadcast budget is a
    * legitimate way to strip every hint and hand join strategy to
    * the planner (spec-pinned as a pure physical-plan nudge), and
    * that must not disable or trip the collect gate, whose failure
    * IS a correctness/availability verdict (no planner fallback
    * exists for a driver OOM). */
  def collectBudgetBytes: Long =
    sys.props.get("graft.collect.budget.bytes").map(_.toLong)
      .getOrElse(256L * 1024L * 1024L)

  /** LOUD gate for driver-side collects that have no planner
    * fallback (a collected centroid table lives or OOMs with the
    * driver): fail with the caller's sizing story and escape hatch
    * instead of letting the collect kill the one process whose death
    * takes the whole job. */
  def requireCollectFits(rows: Long, dim: Int, what: String,
      hint: String): Unit = {
    val est = vectorBatchBytes(rows, dim)
    require(est <= collectBudgetBytes,
      s"[GRAFT] $what is ~$est bytes ($rows rows × dim $dim) — too " +
        s"large to collect driver-side (budget $collectBudgetBytes). " +
        s"$hint " +
        "Raise -Dgraft.collect.budget.bytes only if driver memory " +
        "truly allows.")
  }

  /** Normalize an allowed-id pre-filter side for the filtered search
    * paths: exactly one column (loud otherwise), renamed `id` for the
    * semi-join, broadcast-hinted iff the caller KNOWS the set size and
    * the id-only rows fit the budget. Unknown size (`allowedRows < 0`)
    * leaves the strategy to the planner. */
  def allowedSide(allowed: DataFrame, allowedRows: Long,
      caller: String): DataFrame = {
    require(allowed.columns.length == 1,
      s"[GRAFT] $caller: allowed must have exactly one column")
    val side = allowed.toDF("id")
    if (allowedRows >= 0L) gated(side, allowedRows, 0) else side
  }
}
