package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Classifier/filter evaluation at corpus scale: the quality-filter and
  * contamination classifiers this engine trains and applies (linear
  * scorer, language ID, quality signals) need threshold curves computed
  * over the SAME 100 TB corpus they filter — which rules out the
  * textbook sort-all-scores sweep (a global sort by score).
  *
  * [[prCurve]] bins scores instead: one partial-aggregable hash agg over
  * `bins` integer bins, then the cumulative TP/FP sweep runs over the
  * `bins`-row bin table (a window over ≤ a few hundred rows, not the
  * corpus). Precision/recall come out in exact ppm integer arithmetic —
  * bit-identical in any engine, so the whole curve is DuckDB-oracled.
  * Threshold resolution = bin width; at bins=100 that is the resolution
  * anyone reads a PR curve at anyway.
  */
object Eval {

  /** Binned precision/recall curve. Input: one row per example with an
    * integer `scoreBin` in [0, bins) (caller buckets its raw score —
    * fixed-point or [[Layout.rankBucket]]) and a 0/1 `label`. Output:
    * one row per OCCUPIED bin b, evaluating the classifier "predict
    * positive iff scoreBin >= b": (bin, tp, fp, fn, precision_ppm,
    * recall_ppm) with ppm = exact integer `div`. */
  def prCurve(df: DataFrame, scoreBin: Column, label: Column): DataFrame = {
    val binned = df.select(scoreBin.cast("long").as("bin"),
      label.cast("long").as("y"))
    val perBin = binned.groupBy("bin").agg(
      sum(col("y")).as("pos"),
      sum(lit(1L) - col("y")).as("neg"))
    // descending cumulative: predictions at threshold b include every
    // bin >= b; the window spans `bins` rows, not the corpus
    val w = Window.orderBy(col("bin").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totalPos = sum(col("pos")).over(
      Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
    perBin
      .withColumn("tp", sum(col("pos")).over(w))
      .withColumn("fp", sum(col("neg")).over(w))
      .withColumn("fn", totalPos - col("tp"))
      .select(col("bin"), col("tp"), col("fp"), col("fn"),
        expr("(tp * 1000000) div (tp + fp)").as("precision_ppm"),
        expr("case when tp + fn = 0 then null else (tp * 1000000) div (tp + fn) end")
          .as("recall_ppm"))
  }

  /** Calibration (reliability) table: per score bin, how often the
    * label actually fires vs what the bin's score claims — the third
    * leg of the eval family next to [[prCurve]] (ranking) and [[auc]]
    * (discrimination). One partial-aggregable hash agg; rates in exact
    * ppm. Callers bin raw scores exactly as for prCurve; `binScorePpm`
    * = the bin's nominal predicted probability (bin·10^6 div bins) so
    * over/under-confidence reads directly off the two ppm columns. */
  def calibration(df: DataFrame, scoreBin: Column, label: Column, bins: Int): DataFrame = {
    require(bins > 0, s"bins=$bins")
    df.select(scoreBin.cast("long").as("bin"), label.cast("long").as("y"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum(col("y")).as("pos"))
      .select(col("bin"), col("n"), col("pos"),
        expr(s"(bin * 1000000) div $bins").as("bin_score_ppm"),
        expr("(pos * 1000000) div n").as("pos_rate_ppm"))
  }

  /** EXACT ROC-AUC with tie handling, via the pair (Mann-Whitney)
    * formulation instead of ranks: AUC = [#(pos-score > neg-score) +
    * ½·#(pos-score = neg-score)] / (n_pos·n_neg). Ranks need a global
    * prefix sum over the corpus; pairs only need it over the DISTINCT
    * scores — so the corpus sees ONE partial-aggregable hash agg
    * (groupBy score) and the window runs over the score-group table
    * (the prCurve bin-table pattern; callers bucket continuous scores
    * exactly like there).
    *
    * Integer-exact: everything is doubled to absorb the ½-tie term —
    * output (n_pos, n_neg, auc_num2, auc_den2, auc_ppm) with
    * auc = auc_num2/auc_den2, auc_ppm = (num2·10^6) div den2. Bound:
    * num2 ≤ 2·n_pos·n_neg must fit a signed long ⇒ per-slice AUC up to
    * ~2·10^9 examples per class; shard larger evals by slice (the
    * normal reporting axis anyway). */
  def auc(df: DataFrame, score: Column, label: Column): DataFrame = {
    val g = df.select(score.cast("long").as("s"), label.cast("long").as("y"))
      .groupBy("s").agg(sum(col("y")).as("pos"), sum(lit(1L) - col("y")).as("neg"))
    // negatives STRICTLY below this score-group: exclusive prefix sum
    // over the score-group table only
    val w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    g.withColumn("cumneg", coalesce(sum(col("neg")).over(w), lit(0L)))
      .agg(sum(col("pos")).as("n_pos"), sum(col("neg")).as("n_neg"),
        sum(lit(2L) * col("pos") * col("cumneg") + col("pos") * col("neg"))
          .as("auc_num2"))
      .select(col("n_pos"), col("n_neg"), col("auc_num2"),
        (lit(2L) * col("n_pos") * col("n_neg")).as("auc_den2"),
        expr("case when n_pos = 0 or n_neg = 0 then null " +
          "else (auc_num2 * 1000000) div (2 * n_pos * n_neg) end").as("auc_ppm"))
  }
}
