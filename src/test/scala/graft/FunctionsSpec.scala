package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions._

class FunctionsSpec extends AnyFunSuite {
  lazy val spark = GraftTest.spark
  import spark.implicits._

  private def refEuclid(a: Seq[Float], b: Seq[Float]): Double =
    math.sqrt(a.zip(b).map { case (x, y) =>
      val d = x.toDouble - y.toDouble; d * d }.sum)

  private def refCosine(a: Seq[Float], b: Seq[Float]): Double = {
    val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
    val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
    1.0 - dot / (na * nb)
  }

  test("euclidean/cosine match scalar reference on real embeddings") {
    val rows = spark.read.parquet(s"${GraftTest.sf0001}/embeddings.parquet")
      .limit(20).select($"vec_id", $"embedding").as[(Long, Seq[Float])]
      .collect()
    val q = rows.head._2
    val df = spark.read.parquet(s"${GraftTest.sf0001}/embeddings.parquet")
      .limit(20)
      .select($"vec_id",
        vfs_euclidean($"embedding", typedLit(q)).as("e"),
        vfs_cosine($"embedding", typedLit(q)).as("c"))
      .as[(Long, Double, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    rows.foreach { case (id, v) =>
      assert(math.abs(df(id)._1 - refEuclid(v, q)) < 1e-9, s"euclid id=$id")
      assert(math.abs(df(id)._2 - refCosine(v, q)) < 1e-9, s"cosine id=$id")
    }
  }

  test("distance expressions work via SQL registration incl. simd aliases") {
    val r = spark.sql(
      """SELECT vfs_euclidean(array(1.0F,2.0F), array(4.0F,6.0F)) e,
        |       simd_euclidean(array(1.0F,2.0F), array(4.0F,6.0F)) se,
        |       vfs_cosine(array(1.0F,0.0F), array(0.0F,1.0F)) c,
        |       simd_cosine(array(1.0F,0.0F), array(1.0F,0.0F)) sc,
        |       vfs_dot(array(1.0F,2.0F), array(3.0F,4.0F)) d,
        |       vfs_norm(array(3.0F,4.0F)) n
        |""".stripMargin).head()
    assert(r.getDouble(0) === 5.0)
    assert(r.getDouble(1) === 5.0)
    assert(r.getDouble(2) === 1.0)
    assert(math.abs(r.getDouble(3)) < 1e-12)
    assert(r.getDouble(4) === 11.0)
    assert(r.getDouble(5) === 5.0)
  }

  test("dimension mismatch throws") {
    val ex = intercept[Exception] {
      spark.sql("SELECT vfs_euclidean(array(1.0F), array(1.0F,2.0F))").collect()
    }
    assert(ex.getMessage.contains("dimension mismatch") ||
      ex.getCause != null && ex.getCause.getMessage.contains("dimension mismatch"))
  }

  test("quantize: round half away from zero, saturate, storage path no clamp") {
    // storage path: scale 127, no clamp (vector.rs:188)
    val df = Seq((Seq(0.5f, -0.5f, 1.0f, -1.0f, 2.0f, -2.0f, 0.0037f), 127.0f))
      .toDF("v", "s")
      .select(vfs_quantize($"v", $"s").as("q"))
    val q = df.as[Seq[Byte]].head()
    // 0.5*127=63.5 → away from zero → 64; -63.5 → -64
    assert(q(0) === 64.toByte)
    assert(q(1) === (-64).toByte)
    assert(q(2) === 127.toByte)
    assert(q(3) === (-127).toByte)
    // 2*127=254 saturates to 127; -254 → -128
    assert(q(4) === 127.toByte)
    assert(q(5) === (-128).toByte)
    // 0.3f*127=0.4699 → 0
    assert(q(6) === 0.toByte)
  }

  test("quantize default path clamps to [-1,1] first") {
    val df = Seq(Tuple1(Seq(2.0f, -3.0f, 0.5f)))
      .toDF("v").select(vfs_quantize_default($"v").as("q"))
    val q = df.as[Seq[Byte]].head()
    assert(q(0) === 127.toByte)
    assert(q(1) === (-127).toByte) // clamped to -1 BEFORE scaling → -127, not -128
    assert(q(2) === 64.toByte)
  }

  test("dequantize inverts quantize within 1/254 per lane") {
    val vals = Seq(0.9f, -0.7f, 0.001f, 0.42f)
    val df = Seq(Tuple1(vals)).toDF("v")
      .select(vfs_dequantize(vfs_quantize($"v", lit(127.0f)), lit(127.0f)).as("r"))
    val r = df.as[Seq[Float]].head()
    vals.zip(r).foreach { case (orig, rt) =>
      assert(math.abs(orig - rt) <= 0.5f / 127.0f + 1e-6f)
    }
  }

  test("hashed BoW embedding: unit norm, token-order invariance, " +
      "milli twin, SQL surface, codegen") {
    val df = Seq((1L, "the cat sat"), (2L, "sat the cat"),
      (3L, "a dog runs fast"), (4L, "   ")).toDF("id", "t")
    val got = df.select($"id",
        vfs_hash_embedding($"t", 16).as("e"),
        vfs_hash_embedding_milli($"t", 16).as("m"))
      .collect().map(r => r.getLong(0) ->
        (r.getSeq[Float](1), r.getSeq[Long](2))).toMap
    // unit L2 norm for non-empty text
    val n1 = math.sqrt(got(1L)._1.map(x => x.toDouble * x).sum)
    assert(math.abs(n1 - 1.0) < 1e-6)
    // bag-of-words: token order doesn't matter
    assert(got(1L)._1 == got(2L)._1)
    // different bags differ
    assert(got(1L)._1 != got(3L)._1)
    // milli twin is the rounded unit vector
    got(1L)._1.zip(got(1L)._2).foreach { case (f, m) =>
      assert(math.abs(f * 1000 - m) <= 0.51, s"$f vs $m")
    }
    // whitespace-only text: the single empty token still lands in one
    // bucket (split semantics), so the vector is a unit one-hot
    assert(got(4L)._2.count(_ != 0L) == 1)
    // SQL registration
    graft.functions.registerAll(spark)
    df.createOrReplaceTempView("hbe")
    val viaSql = spark.sql(
      "SELECT vfs_hash_embedding_milli(t, 16) FROM hbe WHERE id = 1")
      .head().getSeq[Long](0)
    assert(viaSql == got(1L)._2)
    // stays inside whole-stage codegen (parquet-backed frame — a local
    // relation folds the projection before planning)
    val plan = spark.read
      .parquet(s"${GraftTest.sf0001}/documents.parquet")
      .select(vfs_hash_embedding($"text", 16).as("e"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [vfs_hash_embedding"), plan)
  }

  test("distance runs inside whole-stage codegen") {
    val df = spark.read.parquet(s"${GraftTest.sf0001}/embeddings.parquet")
      .select(vfs_euclidean($"embedding", $"embedding").as("d"))
    // "*(n)" prefixes mark operators inside a WholeStageCodegen stage
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [vfs_euclidean"), plan)
  }

  test("term count kernel: HOF parity on the corpus, SQL surface, " +
      "codegen, edge tokens") {
    val docs = spark.read
      .parquet(s"${GraftTest.sf0001}/documents.parquet")
    // bit parity with the Column-side token model on real text
    val mismatch = docs.select(
        vfs_term_count($"text", lit("vector")).as("k"),
        size(filter(split(trim(lower($"text")), "\\s+"),
          x => x === lit("vector"))).cast("long").as("h"))
      .filter($"k" =!= $"h").count()
    assert(mismatch === 0L)
    // case folding + multiplicity + empty text (split yields [""])
    val rows = Seq(("Vector VECTOR vector", "vector", 3L),
      ("", "vector", 0L), ("", "", 1L),
      ("  spaced   out  ", "out", 1L))
      .toDF("t", "w", "want")
    assert(rows.filter(
      vfs_term_count($"t", $"w") =!= $"want").count() === 0L)
    // SQL registration
    assert(spark.sql(
      "SELECT vfs_term_count('a b a', 'a')").head().getLong(0) === 2L)
    // stays inside whole-stage codegen
    val plan = docs.select(vfs_term_count($"text", lit("vector")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [vfs_term_count"), plan)
  }

  test("multi-term counts kernel: per-term parity with vfs_term_count " +
      "on the corpus, SQL varargs, codegen, guards") {
    val docs = spark.read
      .parquet(s"${GraftTest.sf0001}/documents.parquet")
    val terms = Seq("vector", "join", "spark", "the")
    // the one-pass array must equal the per-term kernel, element-wise,
    // on every corpus row (the bit-parity bm25's oracle hash rides on)
    val mismatch = docs.select(
        vfs_term_counts($"text", terms).as("tc"),
        array(terms.map(w => vfs_term_count($"text", lit(w))): _*)
          .as("one"))
      .filter($"tc" =!= $"one").count()
    assert(mismatch === 0L)
    // multiplicity across terms + the empty-token edge
    val got = Seq("A b a  B", "").toDF("t")
      .select(vfs_term_counts($"t", Seq("a", "b", "")).as("tc"))
      .collect().map(_.getSeq[Long](0).toSeq)
    assert(got(0) === Seq(2L, 2L, 0L))
    assert(got(1) === Seq(0L, 0L, 1L)) // split("") yields [""]
    // SQL varargs registration; non-literal terms rejected
    assert(spark.sql("SELECT vfs_term_counts('a b a', 'a', 'b')")
      .head().getSeq[Long](0).toSeq === Seq(2L, 1L))
    val err = intercept[Exception](
      spark.sql("SELECT vfs_term_counts('a', upper('a'))").collect())
    assert(err.getMessage.contains("string literals"))
    // duplicate terms rejected (ambiguous count slots)
    assert(intercept[Exception](
      docs.select(vfs_term_counts($"text", Seq("a", "a")))
    ).getMessage.contains("duplicate"))
    // stays inside whole-stage codegen
    val plan = docs.select(vfs_term_counts($"text", terms))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [vfs_term_counts"), plan)
  }

  test("long dot kernel: HOF parity incl. null/mismatch semantics, " +
      "SQL surface, codegen") {
    val rows = Seq(
      (1L, Seq(2L, -3L, 5L), Seq(7L, 11L, -13L)),     // plain
      (2L, Seq(1000L, -1000L), Seq(1000000L, 999999L)), // milli range
      (3L, Seq(1L, 2L), Seq(1L, 2L, 3L))              // length mismatch
    ).toDF("id", "a", "b")
    val hof = aggregate(zip_with($"a", $"b", (x, y) => x * y),
      lit(0L), (acc, x) => acc + x)
    val got = rows.select($"id", vfs_long_dot($"a", $"b").as("k"),
        hof.as("h")).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getLong(1),
        if (r.isNullAt(2)) null else r.getLong(2))).toSeq
    // kernel == HOF on every row, including the null mismatch case
    got.foreach { case (id, k, h) => assert(k === h, s"row $id") }
    assert(got.head._2 === 2L * 7 + -3L * 11 + 5L * -13)
    assert(got(2)._2 === null)
    // overflow throws (ANSI semantics), matching the HOF under Spark 4
    assert(intercept[Exception] {
      Seq((Seq(Long.MaxValue, 2L), Seq(2L, 1L))).toDF("a", "b")
        .select(vfs_long_dot($"a", $"b")).collect()
    }.getMessage.toLowerCase.contains("overflow"))
    // null ELEMENT propagates like the HOF chain
    val withNullElem = spark.sql(
      "SELECT vfs_long_dot(array(1L, CAST(NULL AS BIGINT)), array(2L, 3L))")
    assert(withNullElem.head().isNullAt(0))
    // codegen: the kernel stays inside whole-stage codegen (a
    // non-local child; LocalTableScan would constant-fold the project)
    val plan = spark.range(4)
      .select(array(lit(1L), $"id").as("a"),
        array(lit(2L), lit(3L)).as("b"))
      .select(vfs_long_dot($"a", $"b"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("Project [vfs_long_dot") &&
      plan.contains("*(1)"), plan)
  }

  test("binary quantize: sign-bit packing, word boundaries, zero/NaN as 0") {
    // dim 3 → one word; bits for strictly-positive lanes only
    val r1 = Seq(Tuple1(Seq(1.5f, -2f, 0.25f))).toDF("v")
      .select(vfs_binary_quantize($"v")).as[Seq[Long]].head()
    assert(r1 === Seq(1L | (1L << 2)))
    // zero and NaN pack as 0 (the SQL predicate v > 0 in any engine)
    val r2 = Seq(Tuple1(Seq(0f, Float.NaN, 3f))).toDF("v")
      .select(vfs_binary_quantize($"v")).as[Seq[Long]].head()
    assert(r2 === Seq(1L << 2))
    // dim 70 → two words; bit 64+5 lands in word 1 bit 5
    val v70 = Seq.tabulate(70)(i => if (i == 3 || i == 69) 1f else -1f)
    val r3 = Seq(Tuple1(v70)).toDF("v")
      .select(vfs_binary_quantize($"v")).as[Seq[Long]].head()
    assert(r3 === Seq(1L << 3, 1L << 5))
    // a NULL element propagates NULL (the vfs_long_dot stance) —
    // unboxing would silently pack a 0 bit
    val rn = Seq(Tuple1(Seq(Option(1f), None, Option(3f)))).toDF("v")
      .select(vfs_binary_quantize($"v")).collect().head
    assert(rn.isNullAt(0))
  }

  test("hamming distance: equals dimension-wise sign-mismatch count") {
    val rnd = new scala.util.Random(7)
    val pairs = Seq.fill(25)((Seq.fill(70)(rnd.nextFloat() - 0.5f),
      Seq.fill(70)(rnd.nextFloat() - 0.5f)))
    val got = pairs.toDF("a", "b")
      .select(vfs_hamming(vfs_binary_quantize($"a"),
        vfs_binary_quantize($"b"))).as[Long].collect()
    val want = pairs.map { case (a, b) =>
      a.zip(b).count { case (x, y) => (x > 0) != (y > 0) }.toLong }
    assert(got.toSeq === want)
    // word-count mismatch throws the shared dimension guard
    assert(intercept[Exception] {
      Seq((Seq(1L), Seq(1L, 2L))).toDF("a", "b")
        .select(vfs_hamming($"a", $"b")).collect()
    }.getMessage.contains("dimension mismatch"))
    // a NULL word propagates NULL, never a silent partial count
    val hn = Seq((Seq(Option(1L), None), Seq(Option(1L), Option(2L))))
      .toDF("a", "b").select(vfs_hamming($"a", $"b")).collect().head
    assert(hn.isNullAt(0))
    // SQL registration + whole-stage codegen over a non-local child
    val sqlRes = spark.sql(
      """SELECT vfs_hamming(vfs_binary_quantize(array(1.0F, -1.0F)),
        |                   vfs_binary_quantize(array(-1.0F, -1.0F)))
        |""".stripMargin).as[Long].head()
    assert(sqlRes === 1L)
    val plan = spark.range(4)
      .select(array($"id".cast("float"), lit(-1f)).as("a"))
      .select(vfs_hamming(vfs_binary_quantize($"a"),
        vfs_binary_quantize($"a")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("vfs_hamming") && plan.contains("*(1)"), plan)
  }
}
