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
}
