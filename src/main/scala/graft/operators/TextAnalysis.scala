package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, token counting, document fingerprinting. All pure
  * Column expressions (whole-stage codegen; no UDFs), so they scale as
  * map-side work with zero shuffle.
  */
object TextAnalysis {

  /** whitespace tokenizer */
  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Occurrences of `needle` in `text` via length arithmetic — portable
    * to any SQL engine (used by the DuckDB oracles). */
  def occurrences(text: Column, needle: String): Column =
    ((length(text) - length(regexp_replace(text, java.util.regex.Pattern.quote(needle), ""))) /
      lit(needle.length)).cast("int")

  /** Stopword-marker language ID: score each language by marker-word
    * hits in the padded text; argmax with deterministic tie-break by
    * score order below (n-gram-heuristic family, SURVEY-adjacent
    * training-data op). Returns the predicted language code or "und". */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " and ", " of "),
    "de" -> Seq(" der ", " und ", " das "),
    "fr" -> Seq(" le ", " la ", " et "),
    "es" -> Seq(" el ", " los ", " y "),
    "zh" -> Seq("的", "是", "了")
  )

  def langScores(text: Column): Seq[(String, Column)] = {
    val padded = concat(lit(" "), text, lit(" "))
    langMarkers.map { case (lang, markers) =>
      lang -> markers.map(m => occurrences(padded, m)).reduce(_ + _)
    }
  }

  /** predicted language: the first language (in langMarkers order) with
    * the maximal positive score; all-zero → "und" */
  def langId(text: Column): Column = {
    val scores = langScores(text)
    val maxScore = scores.map(_._2).reduce((a, b) => greatest(a, b))
    // first language (marker order) attaining the positive max wins ties
    val pickFirst = scores.foldLeft(lit(null).cast("string")) { case (acc, (lang, s)) =>
      when(acc.isNotNull, acc).otherwise(when(s === maxScore && s > 0, lit(lang)))
    }
    coalesce(pickFirst, lit("und")).as("lang_pred")
  }

  /** Integer-exact quality metrics (chars, words, distinct words, max
    * word length) — ratios derivable downstream. */
  def qualityMetrics(df: DataFrame, text: Column, idCols: Column*): DataFrame = {
    val toks = tokens(text)
    df.select(idCols :+
      length(text).cast("int").as("n_chars") :+
      size(toks).as("n_words") :+
      size(array_distinct(toks)).as("n_distinct_words") :+
      array_max(transform(toks, w => length(w))).as("max_word_len"): _*)
  }

  /** Content fingerprint: sha256 over the sorted distinct token set
    * (order-insensitive document identity; rolling-hash family). */
  def fingerprint(text: Column): Column =
    sha2(concat_ws(" ", array_sort(array_distinct(tokens(text)))), 256)
}
