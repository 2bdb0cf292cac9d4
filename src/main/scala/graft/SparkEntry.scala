package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions._
import graft.operators.{Knn, Metric}

/** Driver contract — one `queries` entry per implemented operator from
  * SURVEY.md §2, with DuckDB-equivalent `oracleSql` where SQL can
  * express the semantics.
  *
  * Conventions for oracle determinism (engine-portable hashing):
  *   - outputs carry only BIGINT / STRING columns (doubles are rounded
  *     and scaled to integers: distances ×1000 → `dist_milli`, money
  *     ×100 → `*_c`)
  *   - every query ends with a total deterministic ORDER BY (rounded
  *     measure + unique key tiebreak) expressed identically in Spark
  *     and the oracle SQL
  */
object SparkEntry {

  /** Flagship: exact cosine top-5 around a stored embedding on sf0.001
    * (driver smoke-checks rows > 0). */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("values"))
    val q = emb.filter(col("id") === 1L).head().getSeq[Float](1).toArray
    Knn.exact(emb, q, 5, Metric.Cosine)
  }

  private def emb(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  /** events.parquet carries TIMESTAMP(NANOS) which Spark 4 only reads
    * as LONG (spark.sql.legacy.parquet.nanosAsLong=true, set in
    * Verify/Bench); normalize to a proper timestamp column here. */
  private[graft] def events(s: SparkSession, dir: String): DataFrame = {
    val raw = s.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros((col("ts") / 1000).cast("long")))
      case _ => raw
    }
  }

  private def queryVec(s: SparkSession, dir: String, id: Long): Array[Float] =
    emb(s, dir).filter(col("vec_id") === id)
      .head().getSeq[Float](1).toArray

  /** rounded-integer distance column */
  private def milli(c: org.apache.spark.sql.Column) =
    round(c * 1000).cast("long")

  // DuckDB fragments: cast FLOAT[] to DOUBLE[] so accumulation is in
  // double, matching the Spark expressions
  private val qSub =
    "(SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 1)"
  private def duckCos(a: String, b: String) =
    s"(1 - list_inner_product($a, $b) / (sqrt(list_inner_product($a, $a)) * sqrt(list_inner_product($b, $b))))"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- P1: point lookup (storage_manager.rs:235-296) ----
    "p1_point_lookup" -> ((s, dir) => {
      emb(s, dir).filter(col("vec_id") === 42L)
        .select(col("vec_id"), col("label").cast("long").as("label"),
          size(col("embedding")).cast("long").as("dim"))
    }),

    // ---- Q2/Q4: exact kNN, euclidean (rank.rs:119-186, 281-287) ----
    "q2_knn_euclidean" -> ((s, dir) => {
      val q = queryVec(s, dir, 1L)
      emb(s, dir)
        .select(col("vec_id"),
          milli(vfs_euclidean(col("embedding"), typedLit(q))).as("dist_milli"))
        .orderBy(col("dist_milli").asc, col("vec_id").asc)
        .limit(10)
    }),

    // ---- Q2/Q5: exact kNN, cosine (rank.rs:290-300) ----
    "q5_knn_cosine" -> ((s, dir) => {
      val q = queryVec(s, dir, 1L)
      emb(s, dir)
        .select(col("vec_id"),
          milli(vfs_cosine(col("embedding"), typedLit(q))).as("dist_milli"))
        .orderBy(col("dist_milli").asc, col("vec_id").asc)
        .limit(10)
    }),

    // ---- Q6: simd_* aliases via SQL registration (rank.rs:14-56) ----
    "q6_knn_simd_cosine" -> ((s, dir) => {
      graft.functions.registerAll(s)
      emb(s, dir).createOrReplaceTempView("graft_emb")
      val q = queryVec(s, dir, 1L)
      val qLit = q.map(x => s"CAST($x AS FLOAT)").mkString("array(", ",", ")")
      s.sql(
        s"""SELECT vec_id,
           |       CAST(round(simd_cosine(embedding, $qLit) * 1000) AS BIGINT) AS dist_milli
           |FROM graft_emb
           |ORDER BY dist_milli ASC, vec_id ASC
           |LIMIT 10""".stripMargin)
    }),

    // ---- C1: quantize (vector.rs:94-125; storage path scale 127) ----
    "c1_quantize_checksum" -> ((s, dir) => {
      emb(s, dir)
        .select(col("vec_id"),
          aggregate(vfs_quantize(col("embedding"), lit(127.0f)),
            lit(0L), (acc, x) => acc + x.cast("long")).as("qsum"))
        .orderBy(col("vec_id").asc)
    }),

    // ---- C2: dequantize round-trip error (vector.rs:135-154) ----
    "c2_dequantize_roundtrip" -> ((s, dir) => {
      val dq = vfs_dequantize(
        vfs_quantize(col("embedding"), lit(127.0f)), lit(127.0f))
      emb(s, dir)
        .select(col("vec_id"),
          round(vfs_euclidean(col("embedding"), dq) * 1000000).cast("long")
            .as("err_micro"))
        .orderBy(col("vec_id").asc)
    }),

    // ---- J1: hydration join — top-k ids re-fetch full records
    // (tcp.rs:408-427) as a broadcast equi-join ----
    "j1_hydration_join" -> ((s, dir) => {
      val q = queryVec(s, dir, 1L)
      val top = emb(s, dir)
        .select(col("vec_id"),
          milli(vfs_cosine(col("embedding"), typedLit(q))).as("dist_milli"))
        .orderBy(col("dist_milli").asc, col("vec_id").asc)
        .limit(5)
      top.join(broadcast(emb(s, dir).select(col("vec_id"),
          col("label").cast("long").as("label"))), Seq("vec_id"), "left")
        .select(col("vec_id"), col("label"), col("dist_milli"))
        .orderBy(col("dist_milli").asc, col("vec_id").asc)
    }),

    // ---- general agg surface (Catalyst built-ins; SURVEY §2.7) ----
    "q1_agg" -> ((s, dir) => {
      s.read.parquet(s"$dir/lineitem.parquet")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity"))).cast("long").as("sum_qty"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
            .cast("long").as("revenue"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("l_returnflag").asc, col("l_linestatus").asc)
    }),

    // ---- join + agg + top-k (shuffle-heavy path; SURVEY §2.6) ----
    "q3_join_topk" -> ((s, dir) => {
      val li = s.read.parquet(s"$dir/lineitem.parquet")
      val o = s.read.parquet(s"$dir/orders.parquet")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy(col("o_orderkey"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .cast("long").as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey").asc)
        .limit(10)
    }),

    // ---- window top-k per group (SURVEY §2.8 W2 generalized) ----
    "w2_window_topk" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val o = s.read.parquet(s"$dir/orders.parquet")
        .select(col("o_custkey"), col("o_orderkey"),
          round(col("o_totalprice") * 100).cast("long").as("price_c"))
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("price_c").desc, col("o_orderkey").asc)
      o.withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 2)
        .orderBy(col("o_custkey").asc, col("rn").asc)
    }),

    // ---- set op surface (SURVEY §2.9): user-days with clicks but no
    // purchases — EXCEPT over distinct composite keys ----
    "set_except" -> ((s, dir) => {
      val ev = events(s, dir)
      def days(t: String) = ev.filter(col("event_type") === t)
        .select(col("user_id"),
          date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"))
        .distinct()
      days("click").except(days("purchase"))
        .orderBy(col("user_id").asc, col("day").asc)
    })
  )

  def oracleSql: Map[String, String] = Map(
    "p1_point_lookup" ->
      """SELECT vec_id, CAST(label AS BIGINT) AS label,
        |       CAST(len(embedding) AS BIGINT) AS dim
        |FROM embeddings WHERE vec_id = 42""".stripMargin,

    "q2_knn_euclidean" ->
      s"""SELECT vec_id,
         |       CAST(round(list_distance(CAST(embedding AS DOUBLE[]), $qSub) * 1000) AS BIGINT) AS dist_milli
         |FROM embeddings
         |ORDER BY dist_milli ASC, vec_id ASC
         |LIMIT 10""".stripMargin,

    "q5_knn_cosine" ->
      s"""SELECT vec_id,
         |       CAST(round(${duckCos("CAST(embedding AS DOUBLE[])", qSub)} * 1000) AS BIGINT) AS dist_milli
         |FROM embeddings
         |ORDER BY dist_milli ASC, vec_id ASC
         |LIMIT 10""".stripMargin,

    "q6_knn_simd_cosine" ->
      s"""SELECT vec_id,
         |       CAST(round(${duckCos("CAST(embedding AS DOUBLE[])", qSub)} * 1000) AS BIGINT) AS dist_milli
         |FROM embeddings
         |ORDER BY dist_milli ASC, vec_id ASC
         |LIMIT 10""".stripMargin,

    "c1_quantize_checksum" ->
      """SELECT vec_id,
        |       CAST(list_sum(list_transform(embedding,
        |         x -> CAST(LEAST(GREATEST(round(CAST(x AS DOUBLE) * 127), -128), 127) AS BIGINT))) AS BIGINT) AS qsum
        |FROM embeddings
        |ORDER BY vec_id ASC""".stripMargin,

    "c2_dequantize_roundtrip" ->
      """SELECT vec_id,
        |       CAST(round(list_distance(CAST(embedding AS DOUBLE[]),
        |         list_transform(embedding,
        |           x -> CAST(CAST(LEAST(GREATEST(round(CAST(x AS DOUBLE) * 127), -128), 127) AS FLOAT) / CAST(127.0 AS FLOAT) AS DOUBLE))) * 1000000) AS BIGINT) AS err_micro
        |FROM embeddings
        |ORDER BY vec_id ASC""".stripMargin,

    "j1_hydration_join" ->
      s"""WITH top AS (
         |  SELECT vec_id,
         |         CAST(round(${duckCos("CAST(embedding AS DOUBLE[])", qSub)} * 1000) AS BIGINT) AS dist_milli
         |  FROM embeddings
         |  ORDER BY dist_milli ASC, vec_id ASC
         |  LIMIT 5)
         |SELECT t.vec_id, CAST(e.label AS BIGINT) AS label, t.dist_milli
         |FROM top t LEFT JOIN embeddings e ON t.vec_id = e.vec_id
         |ORDER BY t.dist_milli ASC, t.vec_id ASC""".stripMargin,

    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(round(sum(l_quantity)) AS BIGINT) AS sum_qty,
        |       CAST(round(sum(l_extendedprice * (1.0 - l_discount))) AS BIGINT) AS revenue,
        |       count(*) AS n_rows
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag ASC, l_linestatus ASC""".stripMargin,

    "q3_join_topk" ->
      """SELECT o_orderkey,
        |       CAST(round(sum(l_extendedprice * (1.0 - l_discount))) AS BIGINT) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderkey
        |ORDER BY revenue DESC, o_orderkey ASC
        |LIMIT 10""".stripMargin,

    "w2_window_topk" ->
      """SELECT o_custkey, o_orderkey, price_c, rn FROM (
        |  SELECT o_custkey, o_orderkey,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS price_c,
        |         CAST(row_number() OVER (PARTITION BY o_custkey
        |           ORDER BY CAST(round(o_totalprice * 100) AS BIGINT) DESC, o_orderkey ASC) AS BIGINT) AS rn
        |  FROM orders)
        |WHERE rn <= 2
        |ORDER BY o_custkey ASC, rn ASC""".stripMargin,

    "set_except" ->
      """SELECT user_id, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day
        |FROM events WHERE event_type = 'click'
        |EXCEPT
        |SELECT user_id, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day
        |FROM events WHERE event_type = 'purchase'
        |ORDER BY user_id ASC, day ASC""".stripMargin
  )
}
