package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark-contamination detection — find training documents that
  * share suspiciously many word n-grams with an evaluation/benchmark
  * set. The standard decontamination pass every large-scale training
  * corpus needs (cf. the n-gram overlap checks described in the GPT-3
  * and PaLM dataset reports).
  *
  * Scale shape (inverted-index join, NOT an all-pairs comparison):
  *
  *   1. explode both sides into slim `(id, gram)` pairs — payloads
  *      never ride through the join
  *   2. drop corpus grams whose document frequency exceeds `maxDf`:
  *      stopword-heavy grams match everything, blow up the join
  *      (df² rows per hot gram) and signal nothing — the cap both
  *      bounds worst-case skew and improves precision
  *   3. equi-join on the gram (hash shuffle, AQE-splittable), count
  *      distinct shared grams per (probe doc, corpus doc)
  *   4. keep pairs with >= `minShared` shared grams
  *
  * Shuffle volume is O(Σ grams) + O(matching pairs), never O(|probe| ×
  * |corpus|).
  */
object Contamination {

  /** Pairs (probe_id, corpus_id, n_shared) of probe documents sharing
    * at least `minShared` distinct word `n`-grams with a corpus
    * document, after dropping corpus grams with document frequency
    * above `maxDf` (0 disables the cap). */
  def ngramOverlap(corpus: DataFrame, probe: DataFrame,
      idCol: String, textCol: String, n: Int,
      minShared: Int, maxDf: Long = 0L): DataFrame = {
    def grams(df: DataFrame, as: String) = df.select(
        col(idCol).as(as),
        explode(TextAnalysis.wordNGrams(col(textCol), n)).as("gram"))
    val corpusGrams = grams(corpus, "corpus_id")
    val kept =
      if (maxDf <= 0) corpusGrams
      else {
        // document frequency over the corpus side only — one extra
        // aggregation on the already-slim pairs, broadcast-joined back
        val hot = corpusGrams.groupBy(col("gram"))
          .agg(count(lit(1)).as("df"))
          .filter(col("df") > maxDf)
          .select(col("gram"))
        corpusGrams.join(broadcast(hot), Seq("gram"), "left_anti")
      }
    grams(probe, "probe_id")
      .join(kept, Seq("gram"))
      .groupBy(col("probe_id"), col("corpus_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }
}
