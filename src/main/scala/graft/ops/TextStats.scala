package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operations for corpus curation: quality scoring, token
  * counting, language identification — all as codegen-friendly column
  * expressions (no UDFs in the hot path).
  */
object TextStats {

  /** Whitespace token count (canonical model: runs of whitespace split). */
  def tokenCount(text: Column): Column =
    size(filter(split(text, "\\s+"), t => t =!= ""))

  /** BPE-ish subword count estimate: word-boundary pieces + digit runs +
    * punctuation marks each count (the common ~chars/4 heuristic is NOT
    * used; this is a deterministic regex segmentation).
    */
  def subwordCount(text: Column): Column =
    size(filter(split(text, "(?=[A-Z])|[^A-Za-z0-9]+"), t => t =!= ""))

  /** Quality scores per document (detector family §2.7 + curation ratios).
    * ONE string traversal via the native TextQualityCounts expression — the
    * previous shape was four separate regexp_replace full passes per
    * document (4× the string traffic; VERDICT r1 item 9).
    */
  def qualityScores(df: DataFrame, textCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val qc = expr(s"graft_quality_counts(`$textCol`)")
    val len = greatest(element_at(col("_qc"), 1), lit(1L)).cast("double")
    df.withColumn("_qc", qc)
      .withColumn("n_chars", element_at(col("_qc"), 1).cast("int"))
      .withColumn("n_tokens", element_at(col("_qc"), 2).cast("int"))
      .withColumn("punct_ratio", round(element_at(col("_qc"), 3) / len, 4))
      .withColumn("digit_ratio", round(element_at(col("_qc"), 4) / len, 4))
      .withColumn("upper_ratio", round(element_at(col("_qc"), 5) / len, 4))
      .withColumn("ws_ratio", round(element_at(col("_qc"), 6) / len, 4))
      .withColumn("mean_token_len",
        round(element_at(col("_qc"), 7) /
          greatest(element_at(col("_qc"), 2), lit(1L)).cast("double"), 4))
      .drop("_qc")
  }

  /** Stopword-profile language id over a fixed marker table (n-gram
    * heuristic family). Scores = count of distinct language markers present
    * in the token set; argmax wins, ties broken by language code order.
    * Markers chosen from top function words of each language.
    */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "with", "for", "was"),
    "de" -> Seq("der", "die", "und", "das", "nicht", "ist", "mit", "ein", "für", "auf"),
    "es" -> Seq("el", "la", "de", "que", "los", "por", "con", "una", "para", "está"),
    "fr" -> Seq("le", "la", "les", "des", "est", "dans", "pour", "que", "une", "avec"),
    "it" -> Seq("il", "di", "che", "per", "con", "non", "una", "sono", "della", "nel")
  )

  def langScores(text: Column): Seq[(String, Column)] =
    langMarkers.toSeq.sortBy(_._1).map { case (lang, markers) =>
      lang -> size(array_intersect(
        split(lower(text), "\\s+"), array(markers.map(lit): _*)))
    }

  /** Predicted language code ("und" when no marker hits). */
  def langId(text: Column): Column = {
    val scores = langScores(text)
    val best = scores.map(_._2).reduce(greatest(_, _))
    scores.foldRight(lit("und"): Column) { case ((lang, s), acc) =>
      when(s === best && best > 0, lit(lang)).otherwise(acc)
    }
  }
}
