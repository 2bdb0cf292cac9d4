package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Runtime error helpers callable from generated Java code. */
object VectorErrors {
  /** Dimension-mismatch guard, mirroring the reference's panic on
    * differing query/record dims (reference: vfs/src/vfs/rank.rs:271-276)
    * and the API-level 400 (vfs/src/vfs/tcp.rs:371-375). */
  def dimMismatch(a: Int, b: Int): RuntimeException =
    new IllegalArgumentException(
      s"[GRAFT] vector dimension mismatch: $a vs $b")

  def nullElement(i: Int): RuntimeException =
    new IllegalArgumentException(
      s"[GRAFT] invalid vector: null element at index $i")
}

/** Base for binary float-array → double expressions with whole-stage
  * codegen. Accumulation is in double (deterministic left-to-right fold)
  * so results are engine-portable; the reference computes in f32
  * (vfs/src/vfs/rank.rs:281-300) — differences are < 1e-6 relative.
  */
abstract class BinaryVectorExpression extends BinaryExpression
    with ExpectsInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graft.shims.AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  /** scalar kernel over two equal-length float arrays */
  protected def kernel(x: ArrayData, y: ArrayData, n: Int): Double
  /** Java source for the loop body; receives (a, b, n, result) names. */
  protected def genKernel(ctx: CodegenContext,
      a: String, b: String, n: String, result: String): String

  protected def checkDims(x: ArrayData, y: ArrayData): Int = {
    val n = x.numElements()
    val m = y.numElements()
    if (n != m) throw VectorErrors.dimMismatch(n, m)
    n
  }

  override def nullSafeEval(av: Any, bv: Any): Any = {
    val x = av.asInstanceOf[ArrayData]
    val y = bv.asInstanceOf[ArrayData]
    kernel(x, y, checkDims(x, y))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val res = ctx.freshName("res")
      s"""
         |final int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  throw graft.functions.VectorErrors.dimMismatch($n, $b.numElements());
         |}
         |double $res = 0.0;
         |${genKernel(ctx, a, b, n, res)}
         |${ev.value} = $res;
       """.stripMargin
    })
}

/** sqrt(Σ (a−b)²) — reference: vfs/src/vfs/rank.rs:281-287 ("euclidean")
  * and the SIMD twin rank.rs:14-33 (identical math). */
case class EuclideanDistance(left: Expression, right: Expression)
    extends BinaryVectorExpression {
  override def prettyName: String = "vfs_euclidean"

  protected def kernel(x: ArrayData, y: ArrayData, n: Int): Double = {
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = x.getFloat(i).toDouble - y.getFloat(i).toDouble
      acc += d * d
      i += 1
    }
    math.sqrt(acc)
  }

  protected def genKernel(ctx: CodegenContext,
      a: String, b: String, n: String, res: String): String = {
    val i = ctx.freshName("i")
    val d = ctx.freshName("d")
    s"""
       |for (int $i = 0; $i < $n; $i++) {
       |  final double $d = (double)$a.getFloat($i) - (double)$b.getFloat($i);
       |  $res += $d * $d;
       |}
       |$res = java.lang.Math.sqrt($res);
     """.stripMargin
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** 1 − dot(a,b)/(‖a‖·‖b‖) — reference: vfs/src/vfs/rank.rs:290-300
  * ("cosine"); zero-norm input yields NaN there too (0/0). */
case class CosineDistance(left: Expression, right: Expression)
    extends BinaryVectorExpression {
  override def prettyName: String = "vfs_cosine"

  protected def kernel(x: ArrayData, y: ArrayData, n: Int): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    1.0 - dot / (math.sqrt(na) * math.sqrt(nb))
  }

  protected def genKernel(ctx: CodegenContext,
      a: String, b: String, n: String, res: String): String = {
    val i = ctx.freshName("i")
    val dot = ctx.freshName("dot")
    val na = ctx.freshName("na")
    val nb = ctx.freshName("nb")
    val xi = ctx.freshName("xi")
    val yi = ctx.freshName("yi")
    s"""
       |double $dot = 0.0, $na = 0.0, $nb = 0.0;
       |for (int $i = 0; $i < $n; $i++) {
       |  final double $xi = (double)$a.getFloat($i);
       |  final double $yi = (double)$b.getFloat($i);
       |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
       |}
       |$res = 1.0 - $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
     """.stripMargin
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Σ a·b — the inner reduction of the cosine path
  * (vfs/src/vfs/rank.rs:292-294); exposed standalone for
  * normalized-embedding similarity search. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryVectorExpression {
  override def prettyName: String = "vfs_dot"

  protected def kernel(x: ArrayData, y: ArrayData, n: Int): Double = {
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  protected def genKernel(ctx: CodegenContext,
      a: String, b: String, n: String, res: String): String = {
    val i = ctx.freshName("i")
    s"""
       |for (int $i = 0; $i < $n; $i++) {
       |  $res += (double)$a.getFloat($i) * (double)$b.getFloat($i);
       |}
     """.stripMargin
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Exact-integer dot product over two ARRAY<BIGINT> columns — the
  * codegen replacement for `aggregate(zip_with(a, b, _*_), 0L, _+_)`
  * in the integer-milli retrieval paths (HOFs are interpreted, never
  * codegen'd; per-row lambda dispatch dominated the hybrid batch
  * scan). Semantics match that HOF chain EXACTLY so oracle hashes
  * cannot move: a length mismatch or a null element yields NULL (the
  * zip_with null-pad / null-propagation behavior), and overflow
  * throws like ANSI long arithmetic (Spark 4's default; the integer-
  * milli paths stay ≤ 2^30 per term, far from the edge). */
case class LongDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graft.shims.AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vfs_long_dot"
  override def nullable: Boolean = true

  override def nullSafeEval(av: Any, bv: Any): Any = {
    val x = av.asInstanceOf[ArrayData]
    val y = bv.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc = Math.addExact(acc, Math.multiplyExact(x.getLong(i), y.getLong(i)))
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("bad")
      s"""
         |final int $n = $a.numElements();
         |long $acc = 0L;
         |boolean $bad = ($b.numElements() != $n);
         |if (!$bad) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |    $acc = java.lang.Math.addExact($acc,
         |      java.lang.Math.multiplyExact($a.getLong($i), $b.getLong($i)));
         |  }
         |}
         |${ev.isNull} = $bad;
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** ‖a‖₂ — Σ a² then sqrt (vfs/src/vfs/rank.rs:295-298). */
case class L2Norm(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graft.shims.AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vfs_norm"

  override def nullSafeEval(av: Any): Any = {
    val x = av.asInstanceOf[ArrayData]
    val n = x.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) { val v = x.getFloat(i).toDouble; acc += v * v; i += 1 }
    math.sqrt(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val v = ctx.freshName("v")
      s"""
         |final int $n = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $v = (double)$a.getFloat($i);
         |  $acc += $v * $v;
         |}
         |${ev.value} = java.lang.Math.sqrt($acc);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
