package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-19 measurement for the r18-verdict item 3: passageDedup
  * keeps the min(struct)+join-back shape that keepFirstDupStarts
  * shed in r18, defended by its scaladoc with a skew argument (AQE
  * can split a skewed JOIN partition, but a WINDOW partition is
  * unsplittable). This probe measures both shapes on the two
  * corpus shapes that decide it:
  *
  *  - uniform: 500k docs x 4 passages, light duplication (each
  *    passage text shared by ~4 docs) — the common case;
  *  - viral: the SAME corpus with passage 0 replaced by one
  *    corpus-wide identical passage (500k occurrences of one key)
  *    — the skew case the scaladoc defends against.
  *
  * Both shapes compute the identical survivor rule (corpus-wide
  * first occurrence by (id, idx)); the probe cross-checks their
  * kept_passages totals so a shape that silently diverges can't
  * win. Usage: sbt "runMain graft.tools.PassageProbeR19 [nDocs]"
  */
object PassageProbeR19 {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(500000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[passage-probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // 4 passages of 50 words per doc. Passage texts are drawn from
    // id/4 so ~4 docs share each passage (uniform dup pressure);
    // the viral corpus overwrites passage 0 with a constant text.
    val windowWords = 50
    def passageText(seed: Column): Column =
      concat_ws(" ", transform(sequence(lit(0), lit(windowWords - 1)),
        i => concat(lit("w"), pmod(seed * 131 + i * 7, lit(99991)))))
    def corpus(viral: Boolean): DataFrame = {
      val grp = ($"id" / 4).cast("long")
      val p0 = if (viral) passageText(lit(-1L)) else passageText(grp)
      spark.range(n).select($"id".as("doc_id"),
        concat_ws(" ", p0,
          passageText(grp + 1000000L),
          passageText(grp + 2000000L),
          passageText($"id" * 17 + 3000000L)).as("text"))
    }
    val dirs = Seq(false, true).map { viral =>
      val d = java.nio.file.Files
        .createTempDirectory(s"passage-$viral").toString
      time(s"materialize corpus viral=$viral ($n docs x 4 passages)") {
        corpus(viral).write.mode("overwrite").parquet(s"$d/docs")
      }
      viral -> s"$d/docs"
    }.toMap

    // the WINDOW shape: identical survivor rule via one row_number
    // over the passage key (no join-back, no agg), same reassembly
    def passageDedupWindow(docs: DataFrame): DataFrame = {
      val w = split(trim(col("text")), "\\s+")
      val nPass = ceil(size(w).cast("double") / windowWords).cast("int")
      val passages = transform(sequence(lit(0), nPass - 1),
        i => concat_ws(" ", slice(w, i * windowWords + 1, lit(windowWords))))
      val occ = docs.select(col("doc_id").as("__id"),
        posexplode(passages).as(Seq("__idx", "__passage")))
      val survivors = occ.withColumn("__rn", row_number().over(
          Window.partitionBy(col("__passage"))
            .orderBy(col("__id").asc, col("__idx").asc)))
        .filter(col("__rn") === 1)
      val rebuilt = survivors.groupBy(col("__id"))
        .agg(count(lit(1)).as("kept_passages"),
          array_join(transform(
            array_sort(collect_list(struct(col("__idx"), col("__passage")))),
            s => s("__passage")), " ").as("new_text"))
      docs.select(col("doc_id").as("__id"),
          size(passages).cast("long").as("n_passages"))
        .join(rebuilt, Seq("__id"), "left")
        .select(col("__id").as("doc_id"), col("n_passages"),
          coalesce(col("kept_passages"), lit(0L)).as("kept_passages"),
          coalesce(col("new_text"), lit("")).as("new_text"))
    }

    // shape C — KEEPERS-ONLY: the keeper row (min(struct) per
    // passage) IS the surviving occurrence, so the survivor set
    // falls straight out of the aggregate with no join-back and no
    // window: one partial-combining aggregate (skew collapses
    // map-side) + the per-doc reassembly
    def passageDedupKeepers(docs: DataFrame): DataFrame = {
      val w = split(trim(col("text")), "\\s+")
      val nPass = ceil(size(w).cast("double") / windowWords).cast("int")
      val passages = transform(sequence(lit(0), nPass - 1),
        i => concat_ws(" ", slice(w, i * windowWords + 1, lit(windowWords))))
      val occ = docs.select(col("doc_id").as("__id"),
        posexplode(passages).as(Seq("__idx", "__passage")))
      val survivors = occ.groupBy(col("__passage"))
        .agg(min(struct(col("__id"), col("__idx"))).as("__k"))
        .select(col("__k")("__id").as("__id"),
          col("__k")("__idx").as("__idx"), col("__passage"))
      val rebuilt = survivors.groupBy(col("__id"))
        .agg(count(lit(1)).as("kept_passages"),
          array_join(transform(
            array_sort(collect_list(struct(col("__idx"), col("__passage")))),
            s => s("__passage")), " ").as("new_text"))
      docs.select(col("doc_id").as("__id"),
          size(passages).cast("long").as("n_passages"))
        .join(rebuilt, Seq("__id"), "left")
        .select(col("__id").as("doc_id"), col("n_passages"),
          coalesce(col("kept_passages"), lit(0L)).as("kept_passages"),
          coalesce(col("new_text"), lit("")).as("new_text"))
    }

    Seq(false, true).foreach { viral =>
      val docs = spark.read.parquet(dirs(viral))
      var aggTotal = -1L
      var winTotal = -2L
      var kpTotal = -3L
      (1 to 2).foreach { rep =>
        time(s"viral=$viral rep=$rep  AGG+JOIN (shipping shape)") {
          aggTotal = graft.operators.Dedup.passageDedup(docs, windowWords)
            .agg(sum(col("kept_passages"))).head().getLong(0)
        }
        time(s"viral=$viral rep=$rep  WINDOW row_number shape") {
          winTotal = passageDedupWindow(docs)
            .agg(sum(col("kept_passages"))).head().getLong(0)
        }
        time(s"viral=$viral rep=$rep  KEEPERS-ONLY (no join, no window)") {
          kpTotal = passageDedupKeepers(docs)
            .agg(sum(col("kept_passages"))).head().getLong(0)
        }
      }
      println(s"[passage-probe] viral=$viral kept agg=$aggTotal window=$winTotal " +
        s"keepers=$kpTotal " +
        (if (aggTotal == winTotal && winTotal == kpTotal) "MATCH"
         else "*** MISMATCH ***"))
      // row-level equivalence, both directions (except is cheap here:
      // the frames are 500k x 4 slim columns)
      val a = graft.operators.Dedup.passageDedup(docs, windowWords)
      val c = passageDedupKeepers(docs)
      val d1 = a.exceptAll(c).count()
      val d2 = c.exceptAll(a).count()
      println(s"[passage-probe] viral=$viral row diff agg-vs-keepers: " +
        s"$d1 / $d2 " + (if (d1 == 0 && d2 == 0) "IDENTICAL" else "*** DIVERGED ***"))
    }
    spark.stop()
  }
}
