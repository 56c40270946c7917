package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Web-corpus cleaning rules — the two canonical rule families a
  * crawl-derived training set runs BEFORE any dedup or model-based
  * filter:
  *
  *  - C4 line-level cleaning (Raffel et al. 2020, "Exploring the Limits
  *    of Transfer Learning with a Unified Text-to-Text Transformer",
  *    §2.2): keep only lines that end in terminal punctuation and have
  *    at least `minWordsPerLine` words; drop boilerplate lines
  *    ("javascript" mentions); drop whole documents that retain too few
  *    lines or contain code/placeholder markers ("{", "lorem ipsum").
  *
  *  - Gopher quality rules (Rae et al. 2021, "Scaling Language Models:
  *    Methods, Analysis & Insights from Training Gopher", table A1):
  *    document word-count bounds, mean-word-length bounds, minimum
  *    fraction of words containing an alphabetic character, symbol-to-
  *    word ratio cap, bullet-start / ellipsis-end line-fraction caps,
  *    and duplicate-line fraction caps (by line count and by character
  *    mass). The duplicate-N-GRAM rules of the same table are already
  *    covered by [[TextAnalysis.repetitionMetrics]] (top-word /
  *    top-bigram multiplicities, zero-shuffle) — this operator holds
  *    the line-level and length-level half so together they span the
  *    published rule set.
  *
  * Both operators are pure per-row Column programs (split / filter /
  * transform / aggregate HOFs over the line and word arrays — no
  * explode, no shuffle, no UDF), so a 10^12-document corpus pays
  * exactly one map pass and the rules ride inside whole-stage codegen.
  * All ratios are reported as integer ppm (`x * 10^6 div n`) so the
  * DuckDB oracle reproduces every row bit-for-bit.
  *
  * Reference scope: beyond-reference (training-data pipeline brief);
  * the reference's own filters are entity-level (SpecCompiler F1-F9).
  */
object WebCleaning {

  /** A C4 "terminal punctuation" line end: `.`, `!`, `?`, closing quote
    * after one, or a terminal colon is NOT accepted (per the paper only
    * sentence-final punctuation counts). */
  private val TerminalLine = "[.!?][\"']?$"

  private def words(s: Column): Column = split(s, " ")

  /** C4 line-level cleaning. `text` is newline-separated. Returns one
    * row per input row: the id columns plus
    * (total_lines, kept_lines, clean_text, keep) where `clean_text`
    * re-joins the surviving lines and `keep` is the document-level
    * verdict (enough surviving lines, no code/placeholder markers).
    *
    * Line rule: ends with terminal punctuation AND has at least
    * `minWordsPerLine` whitespace words AND does not mention
    * "javascript" (case-insensitive).
    * Document rule: at least `minLinesPerDoc` surviving lines AND the
    * ORIGINAL text contains neither "{" nor "lorem ipsum" (the C4
    * code/boilerplate document drops). */
  def c4Clean(df0: DataFrame, text: Column, minWordsPerLine: Int,
              minLinesPerDoc: Int, idCols: Column*): DataFrame = {
    val df = Par.spread(df0) // regex/HOF-heavy map: widen narrow scans
    val lines = split(text, "\n")
    val kept = filter(lines, ln =>
      ln.rlike(TerminalLine) &&
        size(words(ln)) >= minWordsPerLine &&
        !lower(ln).contains("javascript"))
    df.select(idCols :+
      size(lines).cast("long").as("total_lines") :+
      size(kept).cast("long").as("kept_lines") :+
      array_join(kept, "\n").as("clean_text") :+
      (size(kept) >= minLinesPerDoc &&
        !text.contains("{") && !lower(text).contains("lorem ipsum")).as("keep"): _*)
  }

  /** Gopher line- and length-level quality metrics + verdict. `text` is
    * newline-separated; words are whitespace tokens of the whole text.
    * Output per row: id columns plus
    *  - n_words, mean_wlen_c100 (mean word length in centi-chars),
    *  - alpha_words_ppm (words containing [A-Za-z]),
    *  - symbol_word_ppm (`#` or `...` occurrences per word),
    *  - bullet_lines_ppm / ellipsis_lines_ppm (lines starting with a
    *    bullet glyph / ending with "..."),
    *  - dup_line_ppm (lines beyond their first occurrence, by count),
    *  - dup_line_char_ppm (same, by character mass),
    *  - keep: the published thresholds —
    *      minWords <= n_words <= maxWords, 300 <= mean_wlen_c100 <= 1000,
    *      alpha_words_ppm >= 800000, symbol_word_ppm <= 100000,
    *      bullet_lines_ppm <= 900000, ellipsis_lines_ppm <= 300000,
    *      dup_line_ppm <= 300000, dup_line_char_ppm <= 200000.
    * The intermediates are staged as `_gf_*` columns so the integer
    * `div` ratios can reference them by name; Catalyst collapses the
    * projections back into one map stage. */
  def gopher(df0: DataFrame, text: Column, minWords: Long,
             maxWords: Long, idCols: Column*): DataFrame = {
    val df = Par.spread(df0) // regex/HOF-heavy map: widen narrow scans
    val staged = df.withColumn("_gf_text", text)
      .withColumn("_gf_lines", split(col("_gf_text"), "\n"))
      .withColumn("_gf_ws", words(regexp_replace(col("_gf_text"), "\n", " ")))
      .withColumn("_gf_nw", size(col("_gf_ws")).cast("long"))
      .withColumn("_gf_nl", size(col("_gf_lines")).cast("long"))
      .withColumn("_gf_alpha",
        size(filter(col("_gf_ws"), w => w.rlike("[A-Za-z]"))).cast("long"))
      .withColumn("_gf_sym",
        (length(col("_gf_text")) -
          length(regexp_replace(col("_gf_text"), "#", ""))).cast("long") +
          ((length(col("_gf_text")) -
            length(regexp_replace(col("_gf_text"), "\\.\\.\\.", ""))) / 3).cast("long"))
      .withColumn("_gf_bullet",
        size(filter(col("_gf_lines"), ln => ln.rlike("^[-*•]"))).cast("long"))
      .withColumn("_gf_ellip",
        size(filter(col("_gf_lines"), ln => ln.rlike("\\.\\.\\.$"))).cast("long"))
      .withColumn("_gf_dupl",
        size(col("_gf_lines")).cast("long") -
          size(array_distinct(col("_gf_lines"))).cast("long"))
      .withColumn("_gf_chars",
        aggregate(col("_gf_lines"), lit(0L), (a, ln) => a + length(ln).cast("long")))
      .withColumn("_gf_duplc",
        col("_gf_chars") - aggregate(array_distinct(col("_gf_lines")), lit(0L),
          (a, ln) => a + length(ln).cast("long")))
    val out = staged.select(idCols :+
      col("_gf_nw").as("n_words") :+
      expr("(aggregate(_gf_ws, CAST(0 AS BIGINT), (a, w) -> a + length(w)) * 100) div " +
        "greatest(_gf_nw, 1)").as("mean_wlen_c100") :+
      expr("_gf_alpha * 1000000 div greatest(_gf_nw, 1)").as("alpha_words_ppm") :+
      expr("_gf_sym * 1000000 div greatest(_gf_nw, 1)").as("symbol_word_ppm") :+
      expr("_gf_bullet * 1000000 div greatest(_gf_nl, 1)").as("bullet_lines_ppm") :+
      expr("_gf_ellip * 1000000 div greatest(_gf_nl, 1)").as("ellipsis_lines_ppm") :+
      expr("_gf_dupl * 1000000 div greatest(_gf_nl, 1)").as("dup_line_ppm") :+
      expr("_gf_duplc * 1000000 div greatest(_gf_chars, 1)").as("dup_line_char_ppm"): _*)
    out.withColumn("keep",
      col("n_words").between(minWords, maxWords) &&
        col("mean_wlen_c100").between(300L, 1000L) &&
        col("alpha_words_ppm") >= 800000L &&
        col("symbol_word_ppm") <= 100000L &&
        col("bullet_lines_ppm") <= 900000L &&
        col("ellipsis_lines_ppm") <= 300000L &&
        col("dup_line_ppm") <= 300000L &&
        col("dup_line_char_ppm") <= 200000L)
  }
}
