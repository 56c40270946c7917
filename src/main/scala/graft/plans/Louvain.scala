package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One synchronous Louvain local-move round (Blondel et al. 2008, "Fast
  * unfolding of communities in large networks", phase-1 step) — the
  * modularity OPTIMIZER that sits between [[LabelProp]] (propagation
  * without an objective) and [[Modularity]] (the objective without an
  * optimizer): every node simultaneously evaluates moving into each
  * neighboring community and takes the modularity-maximizing one.
  *
  * Scoring is [[Modularity]]'s integer convention. For node i and
  * candidate community c (its neighbors' communities plus staying put):
  *
  *   score(i→c) · 2m = 4m·k_{i,c} − 2·k_i·(Σtot(c) − [c = comm(i)]·k_i)
  *
  * where k_{i,c} counts i's edges into c, Σtot(c) is c's total degree,
  * and the own-community case excludes i's own degree (the standard
  * remove-then-insert accounting). The additive terms independent of c
  * cancel in the argmax, so this IS the Louvain gain ordering — in pure
  * BIGINT, so the choice (argmax, smallest community id on ties) is
  * bit-identical across partitionings and engines, and the DuckDB
  * oracle replays the round verbatim. Classic Louvain sweeps nodes
  * SEQUENTIALLY (inherently serial); the synchronous variant is the
  * standard distributed adaptation — one round is a well-defined
  * deterministic operator, and callers iterate rounds + [[Scc.condense]]
  * -style graph coarsening to taste.
  *
  * Plan shape: two |E|-sized equi-joins of the community map onto edge
  * endpoints → one (i, c) partial-aggregable count (k_{i,c}) → two
  * |V|-sized hash aggs (degree, Σtot) → the argmax as ONE
  * partial-aggregable `min(struct(-score, c))` per node — no window, no
  * per-node candidate arrays; candidate volume = Σ_i |neighbor
  * communities of i| ≤ 2|E|.
  */
object Louvain {

  /** @param edges (a, b) undirected; self-loops dropped, duplicates and
    *        orientation canonicalized.
    * @param communities (id, comm) total current assignment.
    * @return (id, old_comm, new_comm, best_score, stay_score, moved) —
    *         scores in the 2m-scaled integer convention above. */
  def localMoveRound(edges: DataFrame, communities: DataFrame): DataFrame = {
    val canon = edges.toDF("a", "b").where(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
      .distinct().localCheckpoint()
    val comm = communities.toDF("id", "comm")
    val m = canon.count()
    val deg = canon.select(col("u").as("id")).unionAll(canon.select(col("v").as("id")))
      .groupBy("id").agg(count(lit(1)).as("k"))
    val sigtot = deg.join(comm, "id").groupBy(col("comm").as("c"))
      .agg(sum(col("k")).as("tot"))
    // directed neighbor→community pair stream (both edge directions),
    // plus a weight-0 "stay" candidate so the own community is always
    // in the argmax even when no neighbor shares it
    val nbr = canon
      .join(comm.select(col("id").as("v"), col("comm").as("cv")), "v")
      .select(col("u").as("i"), col("cv").as("c"), lit(1L).as("w"))
      .unionAll(canon
        .join(comm.select(col("id").as("u"), col("comm").as("cu")), "u")
        .select(col("v").as("i"), col("cu").as("c"), lit(1L).as("w")))
      .unionAll(comm.select(col("id").as("i"), col("comm").as("c"), lit(0L).as("w")))
    val kic = nbr.groupBy("i", "c").agg(sum(col("w")).as("k_ic"))
    val cand = kic
      .join(sigtot, "c")
      .join(deg.select(col("id").as("i"), col("k")), "i")
      .join(comm.select(col("id").as("i"), col("comm").as("own")), "i")
      .withColumn("score",
        lit(4L) * lit(m) * col("k_ic") -
          lit(2L) * col("k") *
            (col("tot") - when(col("c") === col("own"), col("k")).otherwise(lit(0L))))
    // argmax(score), smallest c on ties — ONE partial-aggregable
    // min(struct): structs order lexicographically, so (-score, c)
    val best = cand.groupBy(col("i").as("id"))
      .agg(min(struct((-col("score")).as("ns"), col("c").as("c"))).as("b"))
      .select(col("id"), col("b.c").as("new_comm"), (-col("b.ns")).as("best_score"))
    val stay = cand.where(col("c") === col("own"))
      .select(col("i").as("id"), col("own").as("old_comm"),
        col("score").as("stay_score"))
    stay.join(best, "id")
      .select(col("id"), col("old_comm"), col("new_comm"),
        col("best_score"), col("stay_score"),
        (col("new_comm") =!= col("old_comm")).as("moved"))
  }
}
