package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Co-occurrence structures over (user, item) interaction logs — the
  * bipartite-projection family behind item-to-item recommendation,
  * related-entity suggestion, and co-citation analysis on a KG.
  *
  * The quadratic hazard and its standard mitigation: projecting a
  * bipartite graph squares each user's item list (a user with 10^6
  * items yields 10^12 pairs). `maxDegree` caps that — users above the
  * cap are EXCLUDED (the published practice in co-citation/co-purchase
  * pipelines: hub users carry almost no signal per pair and all of the
  * cost; the cap is part of the operator contract, applied identically
  * in the DuckDB oracle, not a silent approximation).
  *
  * Plan shape: one degree count + a broadcast-able semi-join to apply
  * the cap, then ONE self-equi-join on user (never a cartesian) + one
  * partial-aggregable pair count. Pair volume ≤ |users|·cap², tunable.
  */
object Cooccur {

  /** Item-item co-occurrence edges: (a, b, c_ab, d_a, d_b, cos2_ppt)
    * for item pairs a < b sharing >= minSupport users (among users with
    * <= maxDegree distinct items). `d_x` is item degree (distinct kept
    * users), and cos2_ppt = c_ab² · 10^3 div (d_a · d_b) — the SQUARE of
    * the cosine similarity of the item-user incidence vectors in exact
    * integer parts-per-thousand (squaring avoids sqrt, keeping the
    * contract integer-exact cross-engine; rank order is preserved since
    * x² is monotone on nonnegatives). */
  def itemPairs(df: DataFrame, user: Column, item: Column,
                minSupport: Long = 2L, maxDegree: Long = 1000L): DataFrame = {
    val ui = df.select(user.as("u"), item.as("i")).distinct()
    val keptUsers = ui.groupBy("u").agg(count(lit(1)).as("deg"))
      .where(col("deg") <= maxDegree).select("u")
    val kept = ui.join(keptUsers, "u")
    val itemDeg = kept.groupBy(col("i")).agg(count(lit(1)).as("d"))
    val pairs = kept.select(col("u"), col("i").as("a"))
      .join(kept.select(col("u"), col("i").as("b")), "u")
      .where(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("c_ab"))
      .where(col("c_ab") >= minSupport)
    pairs
      .join(itemDeg.select(col("i").as("a"), col("d").as("d_a")), "a")
      .join(itemDeg.select(col("i").as("b"), col("d").as("d_b")), "b")
      .select(col("a"), col("b"), col("c_ab"), col("d_a"), col("d_b"),
        expr("c_ab * c_ab * 1000 div (d_a * d_b)").as("cos2_ppt"))
  }

  /** First-order Markov transition table over per-user event sequences:
    * (state, next_state, c, p_ppm) where c counts adjacent (by `ts`
    * order within each user) state pairs and p_ppm = c · 10^6 div
    * Σ_next c — the row-normalized transition probability in exact ppm.
    * Ties in `ts` are broken by `tie` (pass a unique id) so the
    * sequence, and therefore the result, is deterministic.
    *
    * Plan shape: ONE user-partitioned window (lead) — per-user state is
    * bounded by that user's event count, the same per-key profile as
    * sessionization — then one partial-aggregable pair count and a
    * transition-table-sized (|states|²) normalization join. */
  def transitions(df: DataFrame, user: Column, state: Column, ts: Column,
                  tie: Column): DataFrame = {
    val w = Window.partitionBy("u").orderBy(col("t"), col("k"))
    val seq = df.select(user.as("u"), state.as("s"), ts.as("t"), tie.as("k"))
      .withColumn("s_next", lead(col("s"), 1).over(w))
      .where(col("s_next").isNotNull)
    val c = seq.groupBy(col("s").as("state"), col("s_next").as("next_state"))
      .agg(count(lit(1)).as("c"))
    val totals = c.groupBy(col("state")).agg(sum(col("c")).as("tot"))
    c.join(totals, "state")
      .select(col("state"), col("next_state"), col("c"),
        expr("c * 1000000 div tot").as("p_ppm"))
  }
}
