package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-document site-template removal — the distributed analogue of
  * cleanBackgroundToWhite (cleanBackgroundToWhite.cpp:40-65: normalize away
  * the slowly-varying background so only per-page content remains). Within
  * one document the pipeline's maskedMean/maskedStd covers background
  * normalization; ACROSS documents of one host the background is the site
  * TEMPLATE — the units (text lines, tokens) that recur in nearly every page
  * of the host. This operator finds and strips them.
  *
  * Scale shape (100 TB): one shuffle on (group, unit) with map-side partial
  * aggregation over DISTINCT doc-unit pairs; per-group doc totals (≤ #hosts
  * rows) and the per-group chrome sets are joined back WITHOUT a broadcast
  * hint — at 10^8 hosts a per-host chrome frame exceeds any broadcast
  * budget, so the strategy is left to AQE, which sees the aggregate's
  * ACTUAL materialized size at runtime: small chrome → runtime-converted
  * broadcast join (plus local shuffle read, no network redistribution of
  * the big table); chrome above `spark.sql.adaptive.autoBroadcastJoinThreshold`
  * → plain shuffle join on (group), which is exactly the safe plan at real
  * host cardinality.
  */
object TemplateChrome {

  /** Units recurring in >= `minFrac` of the group's documents (and >=
    * `minDocs` documents). Input `df` must carry `groupCol` (e.g. host /
    * source), `idCol` (doc id) and `unitsCol` (array<string> — lines of
    * extracted text, tokens, shingles...).
    * Returns (groupCol, unit, n_docs).
    */
  def recurringUnits(
      df: DataFrame, groupCol: String, idCol: String, unitsCol: String,
      minDocs: Int = 2, minFrac: Double = 0.8): DataFrame = {
    val perDoc = df.select(col(groupCol), col(idCol),
      explode(array_distinct(col(unitsCol))).as("unit"))
    val counts = perDoc.groupBy(col(groupCol), col("unit"))
      .agg(count(lit(1)).as("n_docs")) // doc-distinct by construction
    val totals = df.groupBy(col(groupCol))
      .agg(countDistinct(col(idCol)).as("n_total"))
    counts.join(totals, groupCol)
      .filter(col("n_docs") >= minDocs &&
        col("n_docs") >= col("n_total") * minFrac)
      .select(col(groupCol), col("unit"), col("n_docs"))
  }

  /** Strip recurring units from every document: adds `<unitsCol>_clean`
    * (array with chrome units removed, multiplicity preserved) via a per-row
    * higher-order filter against the joined chrome set. The chrome join
    * carries NO broadcast hint (see scale note above): AQE broadcasts it at
    * runtime when it is actually small and falls back to a shuffle join on
    * (group) when the per-host chrome frame is beyond the broadcast budget.
    */
  def strip(
      df: DataFrame, groupCol: String, idCol: String, unitsCol: String,
      minDocs: Int = 2, minFrac: Double = 0.8): DataFrame = {
    val chrome = recurringUnits(df, groupCol, idCol, unitsCol, minDocs, minFrac)
      .groupBy(col(groupCol)).agg(collect_set(col("unit")).as("_chrome"))
    df.join(chrome, Seq(groupCol), "left")
      .withColumn(s"${unitsCol}_clean",
        when(col("_chrome").isNull, col(unitsCol))
          .otherwise(filter(col(unitsCol), u => !array_contains(col("_chrome"), u))))
      .drop("_chrome")
  }
}
