package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types._

/** Mutable (n, Σ per lane) accumulator for element-wise vector mean. */
final class VecMeanBuffer(var sums: Array[Double], var n: Long) {
  def add(arr: ArrayData): Unit = {
    val d = arr.numElements()
    if (sums == null) sums = new Array[Double](d)
    else if (sums.length != d)
      throw new graft.store.InvalidVectorException(
        s"[GRAFT] vector dimension mismatch: expected ${sums.length}, got $d")
    var i = 0
    while (i < d) {
      // a null LANE is data corruption, not a missing vector — reading
      // it as 0 would silently bias the mean
      if (arr.isNullAt(i))
        throw new graft.store.InvalidVectorException(
          s"[GRAFT] null element at lane $i in vector input")
      sums(i) += arr.getFloat(i); i += 1
    }
    n += 1
  }

  def merge(other: VecMeanBuffer): Unit = {
    if (other.sums == null) return
    if (sums == null) { sums = other.sums; n = other.n; return }
    if (sums.length != other.sums.length)
      throw new graft.store.InvalidVectorException(
        s"[GRAFT] vector dimension mismatch: expected ${sums.length}, got ${other.sums.length}")
    var i = 0
    while (i < sums.length) { sums(i) += other.sums(i); i += 1 }
    n += other.n
  }
}

/** Grouped element-wise mean of `ARRAY<FLOAT>` vectors — the centroid
  * aggregate every embedding pipeline needs (class prototypes, cluster
  * centers, label means). A `TypedImperativeAggregate` carrying
  * (count, per-lane double sums), so the shuffle moves ONE
  * dim-sized buffer per group per partition (map-side combine) instead
  * of the group's vectors — the same partial-aggregation shape that
  * makes [[TopKByDistance]] scale. Double accumulation per lane;
  * null vectors are skipped; an empty group yields NULL (SQL avg
  * semantics); dimension mismatch inside a group throws the engine's
  * dim-guard error (SURVEY §2.3 Q7).
  */
case class VectorMean(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VecMeanBuffer]
  with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

  // declares ARRAY<FLOAT> so a mistyped input (e.g. array<double>) is
  // an analysis error instead of getFloat reading garbage bytes
  override def inputTypes: Seq[org.apache.spark.sql.graft.shims.AbstractDataType] =
    Seq(ArrayType(FloatType))

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = false)

  override def createAggregationBuffer(): VecMeanBuffer =
    new VecMeanBuffer(null, 0L)

  override def update(buf: VecMeanBuffer, input: InternalRow): VecMeanBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[ArrayData])
    buf
  }

  override def merge(buf: VecMeanBuffer, other: VecMeanBuffer): VecMeanBuffer = {
    buf.merge(other); buf
  }

  override def eval(buf: VecMeanBuffer): Any =
    if (buf.n == 0L) null
    else new GenericArrayData(buf.sums.map(_ / buf.n))

  override def serialize(buf: VecMeanBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buf.n)
    val d = if (buf.sums == null) -1 else buf.sums.length
    out.writeInt(d)
    if (d > 0) buf.sums.foreach(out.writeDouble)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): VecMeanBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readLong()
    val d = in.readInt()
    val sums = if (d < 0) null else Array.fill(d)(in.readDouble())
    new VecMeanBuffer(sums, n)
  }

  override def withNewMutableAggBufferOffset(o: Int): VectorMean =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VectorMean =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): Expression = copy(child = cs(0))
  override def prettyName: String = "vfs_vec_mean"
}

object VectorMean {
  /** Column API: `df.groupBy("label").agg(vecMean($"embedding"))` */
  def vecMean(vec: Column): Column =
    shims.column(VectorMean(shims.expression(vec)).toAggregateExpression())
}
