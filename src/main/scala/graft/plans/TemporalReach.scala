package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-respecting reachability on a temporal graph — earliest-arrival
  * traversal where each step's edge timestamp must be >= the arrival
  * time at its source (Wu et al. 2014, "Path Problems in Temporal
  * Graphs"). On an event/KG stream this answers provenance questions a
  * static closure gets WRONG: "what could this node have influenced?"
  * requires information to flow forward in time — a static path through
  * an edge that fired BEFORE the node was reached is not a real flow.
  *
  * Algorithm: synchronous earliest-arrival relaxation, `maxHops` rounds:
  *   arrive(v) ← min(arrive(v), min over edges u→v with ts >= arrive(u)
  *                    of ts)
  * Each round is ONE equi-join (frontier × edges on src) + ONE
  * partial-aggregable min — the [[Sssp]] shuffle shape; state is
  * (id, long) per node. The hop bound is part of the CONTRACT (k-hop
  * influence), not a convergence heuristic, so the DuckDB oracle
  * replays the identical unrolled rounds; fixpoint short-circuit (a
  * round that changes nothing ends the loop) is a pure optimization
  * under min-monotonicity.
  *
  * Scale: |edges| × maxHops join work, node-keyed equi-joins
  * throughout, frontier ≤ |V| rows; no path materialization (the
  * recursive-CTE oracle enumerates (node, time) pairs — fine at test
  * scale, the engine never does).
  */
object TemporalReach {

  private def mat(df: DataFrame): DataFrame = Iter.mat(df)

  /** @param edges (src, dst, ts) directed temporal edges.
    * @param seeds  (id) seed nodes; arrival 0 (may take any edge).
    * @param maxHops rounds of relaxation (contractual hop budget).
    * @return (id, arrival): every node reachable within `maxHops`
    *         time-respecting hops, with its earliest arrival time.
    *         Seeds appear with arrival 0. */
  def run(edges: DataFrame, seeds: DataFrame, maxHops: Int): DataFrame = {
    require(maxHops >= 1, s"maxHops=$maxHops")
    val e = mat(edges.toDF("src", "dst", "ts")
      .select(col("src").cast("long"), col("dst").cast("long"),
        col("ts").cast("long"))
      .distinct())
    val eRows = e.count() // sizes loop width + state broadcast
    Iter.withLoopConf(e.sparkSession, eRows, aqeOff = true) {
    var st = mat(seeds.toDF("id").select(col("id").cast("long")).distinct()
      .withColumn("arrival", lit(0L)))
    var hops = 0
    var changed = true
    while (changed && hops < maxHops) {
      hops += 1
      val msgs = e.join(
          Iter.bcast(st.select(col("id").as("src"), col("arrival")), 2 * eRows), "src")
        .where(col("ts") >= col("arrival"))
        .groupBy(col("dst").as("id"))
        .agg(min(col("ts")).as("in_arrival"))
      val next = st.join(msgs, Seq("id"), "full_outer")
        .select(col("id"),
          least(coalesce(col("arrival"), col("in_arrival")),
            coalesce(col("in_arrival"), col("arrival"))).as("arrival"))
      val nm = mat(next)
      // min-monotone: Σ(count, sum) unchanged ⇔ fixpoint
      val agg = nm.agg(count(lit(1)), sum(col("arrival"))).head
      val prev = st.agg(count(lit(1)), sum(col("arrival"))).head
      changed = agg.getLong(0) != prev.getLong(0) || agg.getLong(1) != prev.getLong(1)
      st = nm
    }
    st
    }
  }
}
