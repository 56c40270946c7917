package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Source-sampled betweenness centrality — Brandes' dependency
  * accumulation (Brandes 2001, "A faster algorithm for betweenness
  * centrality") run from a SEED SET of sources, the standard
  * approximation for large graphs (Riondato & Kornaropoulos 2014 bound
  * the sample size; exact betweenness needs all |V| sources and is not
  * a 100 TB operation). Finds the broker/bridge nodes of a KG — the
  * complement of PageRank's popularity signal.
  *
  * Per source s (all sources advance TOGETHER, keyed by (s, v) — one
  * DataFrame round per BFS level, not per source):
  *  - forward: unweighted BFS computing dist(s,v) and σ(s,v) = number
  *    of shortest s→v paths (σ sums over predecessors — a
  *    partial-aggregable SUM);
  *  - backward, level by level descending: dependency
  *    δ(s,v) = Σ_{w: v∈pred(w)} σ(s,v)·(10^6 + δ(s,w)) div σ(s,w)
  *    in integer ppm — the div makes each term exact-integer, so the
  *    accumulated δ (and the final centrality) is bit-identical across
  *    partitionings and engines (the oracle unrolls the same rounds);
  *    truncation loses < 1 ppm per term, irrelevant for ranking.
  *  - bc_ppm(v) = Σ_s δ(s,v), v ≠ s.
  *
  * Scale shape: state is (|S|·reached) rows of (s, v, dist, sigma);
  * shortest-path DAG edges are (|S|·|E|) worst case — the sampling
  * factor |S| is the knob. Every round is ONE frontier⋈edges equi-join
  * + ONE partial-aggregable hash agg; levels bound rounds (2·maxDepth
  * driver-scheduled rounds, the [[Sssp]]/[[TemporalReach]] pattern);
  * per-round frames are localCheckpoint-ed.
  *
  * Reference analog: none (beyond-reference graph operator).
  */
object Betweenness {

  /** @param edges    directed (src, dst) in the first two columns
    *                 (duplicates collapse, self-loops dropped)
    * @param sources  one column of sampled source ids
    * @param maxDepth BFS level budget (graph-diameter cap; levels past
    *                 it contribute nothing)
    * @return (id, bc_ppm) for every node reached by any source's DAG
    *         (bc_ppm = 0 rows included for reached-but-never-between
    *         nodes; unreached nodes are absent) */
  def approx(edges: DataFrame, sources: DataFrame, maxDepth: Int): DataFrame = {
    require(maxDepth >= 1, s"maxDepth=$maxDepth")
    val c = edges.columns
    val e = Iter.mat(edges.select(col(c(0)).cast("long").as("src"),
        col(c(1)).cast("long").as("dst"))
      .where(col("src") =!= col("dst")).distinct())
    val eRows = e.count()
    val spark = edges.sparkSession

    // forward BFS: settled (s, v, dist, sigma); per level record the
    // shortest-path-DAG edges (s, pv, v, lvl) with lvl = dist(v)
    var state = Iter.mat(sources.toDF("s").select(col("s").cast("long").as("s")).distinct()
      .select(col("s"), col("s").as("v"), lit(0).as("dist"), lit(1L).as("sigma")))
    val nSources = state.count()
    // state/DAG bound: |S|·|E| rows worst case — sizes loop width and
    // gates the per-round state broadcasts
    val stBound =
      if (eRows > Long.MaxValue / math.max(1L, nSources)) Long.MaxValue
      else math.max(1L, nSources) * eRows
    Iter.withLoopConf(spark, stBound, aqeOff = true) {
    def bc(df: DataFrame): DataFrame = Iter.bcast(df, stBound)
    var frontier = state
    var preds: Option[DataFrame] = None
    var lvl = 0
    var more = true
    while (lvl < maxDepth && more) {
      val step = e.join(bc(frontier), frontier("v") === e("src"))
        .select(col("s"), frontier("v").as("pv"), e("dst").as("w"), col("sigma"))
      // only edges into NOT-YET-SETTLED nodes are shortest-path-DAG edges
      val fresh = step.join(
          bc(state.select(col("s"), col("v").as("w"))), Seq("s", "w"), "left_anti")
        .localCheckpoint(false)
      val nf = fresh.groupBy(col("s"), col("w").as("v"))
        .agg(sum(col("sigma")).as("sigma"))
        .withColumn("dist", lit(lvl + 1))
        .select(col("s"), col("v"), col("dist"), col("sigma"))
        .localCheckpoint(false)
      more = nf.limit(1).count() > 0
      if (more) {
        val pe = fresh.select(col("s"), col("pv"), col("w").as("v"),
          lit(lvl + 1).as("lvl"))
        preds = Some(Iter.mat(preds.fold(pe)(_ unionAll pe)))
        state = Iter.mat(state.unionAll(nf))
        frontier = nf
        lvl += 1
      }
    }
    val maxLvl = lvl
    if (preds.isEmpty) // no edges from any source: empty result, right schema
      state.select(col("v").as("id"), lit(0L).as("bc_ppm")).where(lit(false))
    else {
    val pe = preds.get
    val sigma = state.select(col("s"), col("v"), col("sigma"))
    // backward accumulation, levels maxLvl..1; δ starts at 0 everywhere
    var delta = Iter.mat(state.select(col("s"), col("v"), lit(0L).as("delta")))
    var l = maxLvl
    while (l >= 1) {
      val contrib = pe.where(col("lvl") === l)
        .join(bc(sigma.select(col("s"), col("v").as("pv"), col("sigma").as("sig_p"))),
          Seq("s", "pv"))
        .join(bc(sigma.select(col("s"), col("v"), col("sigma").as("sig_w"))), Seq("s", "v"))
        .join(bc(delta.select(col("s"), col("v"), col("delta").as("d_w"))), Seq("s", "v"))
        .groupBy(col("s"), col("pv").as("v"))
        .agg(sum(expr("sig_p * (1000000 + d_w) div sig_w")).as("add"))
      delta = Iter.mat(delta.join(bc(contrib), Seq("s", "v"), "left")
        .select(col("s"), col("v"),
          (col("delta") + coalesce(col("add"), lit(0L))).as("delta")))
      l -= 1
    }
    delta.where(col("s") =!= col("v"))
      .groupBy(col("v").as("id")).agg(sum(col("delta")).as("bc_ppm"))
    }
    }
  }
}
