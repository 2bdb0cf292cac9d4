package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries summary: at most `capacity` (item, count) pairs. The
  * classic frequent-items sketch (Misra & Gries 1982; merge rule from
  * Agarwal et al., "Mergeable Summaries", PODS 2012):
  *
  *   - add: increment if tracked; insert if room; else decrement ALL
  *     tracked counters by 1, dropping zeros (amortized O(1): each
  *     decrement is paid for by a prior increment).
  *   - merge: sum counterparts, then subtract the (capacity+1)-th
  *     largest count from every counter and drop non-positives —
  *     keeps the summary ≤ capacity with the SAME error bound as
  *     sequential processing.
  *
  * Guarantee: for every item, true_count − n/(capacity+1) ≤ estimate
  * ≤ true_count, so any item with frequency > n/(capacity+1) is
  * guaranteed present. EXACT (and order-independent) when the distinct
  * count never exceeds `capacity`; with a smaller capacity the kept
  * estimates may vary with partition merge order WITHIN that bound —
  * the standard trade of all mergeable heavy-hitter sketches. */
final class MgBuffer(val capacity: Int) {
  val counts: mutable.HashMap[String, Long] = mutable.HashMap.empty

  def add(item: String): Unit = {
    counts.get(item) match {
      case Some(c) => counts(item) = c + 1
      case None if counts.size < capacity => counts(item) = 1L
      case None =>
        // decrement-all step; zeros are evicted
        val dead = mutable.ArrayBuffer.empty[String]
        counts.mapValuesInPlace((_, c) => c - 1)
        counts.foreach { case (k, c) => if (c <= 0) dead += k }
        dead.foreach(counts.remove)
    }
  }

  def merge(other: MgBuffer): Unit = {
    other.counts.foreach { case (k, v) =>
      counts(k) = counts.getOrElse(k, 0L) + v
    }
    if (counts.size > capacity) {
      // subtract the (capacity+1)-th largest count, drop non-positives
      val m = counts.values.toArray.sorted(Ordering[Long].reverse)
        .apply(capacity)
      val dead = mutable.ArrayBuffer.empty[String]
      counts.mapValuesInPlace((_, c) => c - m)
      counts.foreach { case (k, c) => if (c <= 0) dead += k }
      dead.foreach(counts.remove)
    }
  }
}

/** `ARRAY<STRUCT<item, cnt>>` aggregate over a string column — the
  * whole summary crosses the shuffle as ONE ≤capacity-entry buffer per
  * partition (map-side combine), never the raw value stream. NULLs are
  * skipped. Output is sorted (cnt desc, item asc) for determinism. */
case class HeavyHitters(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MgBuffer]
  with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

  require(capacity > 0, "[GRAFT] heavy-hitters capacity must be positive")

  override def inputTypes: Seq[shims.AbstractDataType] = Seq(StringType)
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): MgBuffer = new MgBuffer(capacity)

  override def update(buf: MgBuffer, input: InternalRow): MgBuffer = {
    val v = child.eval(input)
    // copy out of the (possibly reused) unsafe buffer
    if (v != null) buf.add(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: MgBuffer, other: MgBuffer): MgBuffer = {
    buf.merge(other); buf
  }

  override def eval(buf: MgBuffer): Any = {
    val rows = buf.counts.toArray
      .sortBy { case (k, c) => (-c, k) }
      .map { case (k, c) =>
        InternalRow(UTF8String.fromString(k), c)
      }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: MgBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.counts.size)
    buf.counts.foreach { case (k, c) =>
      val b = k.getBytes(StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MgBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new MgBuffer(capacity)
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.counts(new String(b, StandardCharsets.UTF_8)) = in.readLong()
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): HeavyHitters =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HeavyHitters =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): Expression = copy(child = cs(0))
  override def prettyName: String = "vfs_heavy_hitters"
}

object HeavyHitters {
  /** Column API: the raw ≤capacity summary. */
  def summary(key: Column, capacity: Int): Column =
    shims.column(HeavyHitters(shims.expression(key), capacity)
      .toAggregateExpression())

  /** Top-k frequent items of `key`: (item, cnt) with cnt desc, item
    * asc. Exact iff the distinct count fits `capacity`; otherwise cnt
    * is a lower bound within n/(capacity+1) of the truth and every
    * item more frequent than that bound is guaranteed present. */
  def topK(df: DataFrame, key: Column, k: Int,
      capacity: Int = 4096): DataFrame =
    df.agg(summary(key, capacity).as("__hh"))
      .select(explode(col("__hh")).as("e"))
      .select(col("e.item").as("item"), col("e.cnt").as("cnt"))
      .orderBy(col("cnt").desc, col("item").asc)
      .limit(k)
}
