package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.BroadcastGate

class BroadcastGateSpec extends AnyFunSuite {

  test("gate is bytes, not rows: 500k narrow rows fit, 500k wide " +
      "rows do not") {
    // the round-5 failure mode: a flat 500k-row threshold admits a
    // ~3 GB broadcast at dim 1536
    assert(BroadcastGate.fits(500000L, 2))
    assert(!BroadcastGate.fits(500000L, 1536))
    assert(BroadcastGate.vectorBatchBytes(500000L, 1536) >
      3L * 1000L * 1000L * 1000L)
  }

  test("budget boundary at dim 1536 sits near 43k rows") {
    val perRow = 1536L * 4L + BroadcastGate.RowOverheadBytes
    val atBudget = BroadcastGate.budgetBytes / perRow
    assert(BroadcastGate.fits(atBudget, 1536))
    assert(!BroadcastGate.fits(atBudget + 1, 1536))
  }

  test("dim 0 (id-only rows) is overhead-sized; absurd rows saturate " +
      "instead of overflowing") {
    assert(BroadcastGate.vectorBatchBytes(10L, 0) ===
      10L * BroadcastGate.RowOverheadBytes)
    assert(BroadcastGate.vectorBatchBytes(0L, 1536) === 0L)
    assert(BroadcastGate.vectorBatchBytes(Long.MaxValue / 2, 1536) ===
      Long.MaxValue)
    assert(!BroadcastGate.fits(Long.MaxValue / 2, 1536))
  }

  test("budget override via system property") {
    val key = "graft.broadcast.budget.bytes"
    val old = sys.props.get(key)
    try {
      sys.props(key) = "1024"
      assert(BroadcastGate.budgetBytes === 1024L)
      assert(!BroadcastGate.fits(100L, 8)) // 100×96 B > 1 KiB
      assert(BroadcastGate.fits(10L, 8))
    } finally {
      old match {
        case Some(v) => sys.props(key) = v
        case None => sys.props.remove(key)
      }
    }
  }
}
