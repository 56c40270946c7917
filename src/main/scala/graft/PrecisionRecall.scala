package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Triple-set precision/recall vs a reference set (the north rule's
  * acceptance metric: P/R ≥ 0.95 vs reference golden dumps). Computed
  * distributively — set sizes via count, intersection via inner join on
  * (subj, pred, obj) — so it works at full output scale, not just on
  * collected arrays. */
object PrecisionRecall {

  case class PR(precision: Double, recall: Double, got: Long, want: Long, matched: Long) {
    def passes(threshold: Double): Boolean = precision >= threshold && recall >= threshold
  }

  def of(got: DataFrame, want: DataFrame): PR = {
    val keys = Seq("subj", "pred", "obj")
    val g = got.select(keys.map(col): _*).distinct()
    val w = want.select(keys.map(col): _*).distinct()
    val nGot = g.count(); val nWant = w.count()
    val matched = g.join(w, keys, "left_semi").count()
    PR(
      if (nGot == 0) 1.0 else matched.toDouble / nGot,
      if (nWant == 0) 1.0 else matched.toDouble / nWant,
      nGot, nWant, matched)
  }
}
