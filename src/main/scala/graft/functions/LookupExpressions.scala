package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** O(1) constant-map lookup: `key -> Long`, NULL on a miss or a NULL
  * key — the drop-in replacement for
  * `element_at(map(<literal pairs>), key)` when the pair list is
  * driver-collected per-stratum state ([[graft.operators.Sampling]]'s
  * band maps).
  *
  * Why not the map literal (the round-12 `litMapOf` pattern): a
  * `CreateMap` over 2·N literal children (a) inlines every literal
  * into the generated code — at the `maxStrata = 512` ceiling the
  * three band maps blow the 64 KB Janino method limit and the WHOLE
  * STAGE falls back to interpreted eval (measured: the sf0.1 bench's
  * per-domain cap burned 17–24 process-CPU-seconds on a 5000-row
  * input, with the Janino "Code grows beyond 64 KB" error in the
  * log), and (b) `GetMapValue` over `ArrayBasedMapData` is a LINEAR
  * scan per probe — O(strata) per row. This expression stores the
  * pairs ONCE as a reference object and probes a transient lazily
  * built `java.util.HashMap` — O(1) per row, constant generated-code
  * size at any strata count (the [[PslDomain.Lookup]] /
  * `TermCounts.Lookup` pattern).
  *
  * Key equality: the map keys are CATALYST-INTERNAL values (the
  * caller converts driver-side externals via
  * [[ConstLongMapLookup.internalKey]]) compared with
  * `Object.equals` — byte equality for `UTF8String`, value equality
  * for boxed integrals. For float/double keys this matches the map
  * literal's interpreted `ordering.equiv` on the cases that differ
  * between the two conventions (boxed `-0.0 != 0.0` mirrors
  * `Double.compare`; boxed `NaN == NaN` likewise), so swapping the
  * implementations cannot move a row between bands. */
case class ConstLongMapLookup(child: Expression,
    pairs: Array[(Any, Long)])
    extends UnaryExpression {
  // transient: rebuilt once per deserialization site (executor), not
  // per row; the serialized form is the plain pair array
  @transient private lazy val lookup = ConstLongMapLookup.build(pairs)

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vfs_const_map_lookup"

  override def nullSafeEval(k: Any): Any =
    ConstLongMapLookup.get(k, lookup)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("constMap", this,
      classOf[ConstLongMapLookup].getName)
    val m = ctx.freshName("cml")
    ctx.addImmutableStateIfNotExists("java.util.HashMap", m,
      v => s"$v = $ref.builtLookup();")
    nullSafeCodeGen(ctx, ev, c => s"""
      Object r = $m.get($c);
      if (r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ((Long) r).longValue(); }
    """)
  }

  /** codegen entry: the built transient map (one per executor). */
  def builtLookup(): java.util.HashMap[Any, java.lang.Long] = lookup

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)

  // the pair array would make default equals reference-based; two
  // lookups are the same expression iff child + contents match
  override def equals(other: Any): Boolean = other match {
    case o: ConstLongMapLookup =>
      child == o.child && pairs.toSeq == o.pairs.toSeq
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + pairs.toSeq.hashCode()
}

object ConstLongMapLookup {
  private[functions] def build(
      pairs: Array[(Any, Long)]): java.util.HashMap[Any, java.lang.Long] = {
    val m = new java.util.HashMap[Any, java.lang.Long](
      math.max(4, pairs.length * 2))
    pairs.foreach { case (k, v) => if (k != null) m.put(k, v) }
    m
  }

  /** static entry for eval */
  def get(k: Any, m: java.util.HashMap[Any, java.lang.Long]): Any =
    m.get(k)

  /** Driver-side external value → the Catalyst-internal form rows
    * evaluate to (String → UTF8String; integrals/booleans box as-is).
    * The selector's strata are grouping keys of atomic type, so the
    * generic converter covers everything that can reach here. */
  def internalKey(v: Any): Any =
    org.apache.spark.sql.catalyst.CatalystTypeConverters
      .convertToCatalyst(v)
}
