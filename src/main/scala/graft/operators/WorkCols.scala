package graft.operators

import org.apache.spark.sql.DataFrame

/** Internal-column hygiene for operators that inject `__`-prefixed
  * working columns (`__bin`, `__salt`, `__rn`, …): if the input already
  * carries one of those names the operator would silently overwrite it
  * and drop the user's column from the output — fail loudly instead
  * (same stance as [[graft.store.ZOrderLayout]]'s `__z` guard). */
private[operators] object WorkCols {
  def requireFree(df: DataFrame, names: String*): Unit = {
    val clash = df.columns.toSet.intersect(names.toSet)
    require(clash.isEmpty,
      s"[GRAFT] input already contains reserved working column(s) " +
        s"${clash.mkString(", ")} — rename before calling this operator")
  }
}
