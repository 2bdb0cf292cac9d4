package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys. When one join key carries a large
  * fraction of the fact rows, the shuffle sends them all to one reducer
  * and the stage is as slow as its hottest partition. Salting splits
  * each hot key's rows across `nSalts` sub-partitions by extending the
  * join key with a salt column: the fact side gets a per-row salt, the
  * dimension side is replicated once per salt value. The join result is
  * IDENTICAL to the unsalted join (each fact row meets each matching
  * dim row exactly once, at its own salt) — which is exactly what the
  * DuckDB oracle checks.
  *
  * AQE's skew-join split covers sort-merge joins adaptively; explicit
  * salting remains the tool when the skew is known ahead of time, the
  * join is hash-based, or the engine must not rely on runtime stats.
  */
object SkewJoin {

  /** `left.join(right, leftKey === rightKey)` with `nSalts`-way key
    * salting. Key columns may share a name (both sides are qualified).
    *
    * The salt hashes the key together with the row's position
    * (`monotonically_increasing_id`), so byte-identical duplicate rows
    * of a hot key still spread across all salts — hashing only the row
    * CONTENT would send every identical duplicate to one reducer and
    * reintroduce the skew. The join RESULT is salt-independent; the
    * partition assignment is reproducible given the same input file
    * layout (the U2 determinism stance — no Math.random in the plan).
    */
  def salted(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String, nSalts: Int): DataFrame = {
    require(nSalts > 0, "nSalts must be positive")
    WorkCols.requireFree(left, "__salt")
    WorkCols.requireFree(right, "__salt")
    val l = left.withColumn("__salt",
      pmod(xxhash64(col(leftKey), monotonically_increasing_id()),
        lit(nSalts)).cast("int"))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    l.join(r, l("__salt") === r("__salt") &&
        l(leftKey) === r(rightKey))
      .drop("__salt")
  }
}
