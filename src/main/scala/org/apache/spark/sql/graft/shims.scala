package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Visibility shims: a handful of Spark internals used by graft are
  * `private[sql]` in Spark 4 (Column↔Expression bridging, the
  * AbstractDataType hierarchy used by ExpectsInputTypes). Re-exported
  * here from inside the org.apache.spark.sql namespace — the standard
  * pattern for Catalyst extension libraries.
  */
object shims {
  type AbstractDataType = org.apache.spark.sql.types.AbstractDataType

  /** Wrap a Catalyst Expression as a user-facing Column. */
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Extract the Catalyst Expression from a Column. */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
