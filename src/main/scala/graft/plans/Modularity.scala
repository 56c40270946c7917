package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Newman modularity of a community assignment over an undirected
  * graph — the standard quality score for label-prop / Louvain-style
  * partitions (Newman & Girvan 2004, public formula):
  *
  *   Q = Σ_c [ L_c / m  −  (D_c / 2m)² ]
  *
  * where m = |edges|, L_c = intra-community edge count, D_c = total
  * degree of community c. To keep the cross-engine contract integer-
  * exact (no float partial-sum order sensitivity), everything is
  * reported SCALED BY 4m²:
  *
  *   Q · 4m² = Σ_c ( 4·m·L_c − D_c² )
  *
  * — pure BIGINT arithmetic end to end; consumers divide by 4m² (or
  * compare scaled values directly, which is all ranking needs).
  *
  * Plan shape: canonicalize (one distinct shuffle), two partial-
  * aggregable hash aggs (degree per node, then L_c/D_c per community)
  * plus one broadcast-sized join of the node→community map onto edge
  * endpoints. The community map is |V|-sized; at 10^12 edges it is the
  * smaller side by orders of magnitude and shuffles as a plain equi-join
  * (AQE picks broadcast when it fits). Nothing here is per-pair or
  * windowed — modularity at 100 TB is two scans.
  */
object Modularity {

  /** edges: two columns (a, b), undirected (self-loops dropped,
    * orientation/duplicates canonicalized). communities: (id, comm) —
    * pass a total map; nodes absent from it are excluded from both the
    * degree and intra terms (inner-join semantics, deterministic).
    *
    * Returns per-community rows (comm, l_intra, d_sum, contrib) with
    * contrib = 4·m·L_c − D_c²; the sum of `contrib` over all rows IS
    * Q·4m² (kept relational per community so the oracle checks every
    * term, not just the total). */
  def scaled(edges: DataFrame, communities: DataFrame): DataFrame = {
    val canon = edges.toDF("a", "b").where(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
      .distinct()
    val comm = communities.toDF("id", "comm")
    val m = canon.count()
    val deg = canon.select(col("u").as("id")).unionAll(canon.select(col("v").as("id")))
      .groupBy("id").agg(count(lit(1)).as("d"))
    val dsum = deg.join(comm, "id")
      .groupBy("comm").agg(sum(col("d")).as("d_sum"))
    val intra = canon
      .join(comm.withColumnRenamed("id", "u").withColumnRenamed("comm", "cu"), "u")
      .join(comm.withColumnRenamed("id", "v").withColumnRenamed("comm", "cv"), "v")
      .where(col("cu") === col("cv"))
      .groupBy(col("cu").as("comm")).agg(count(lit(1)).as("l_intra"))
    dsum.join(intra, Seq("comm"), "left")
      .select(
        col("comm"),
        coalesce(col("l_intra"), lit(0L)).as("l_intra"),
        col("d_sum"),
        (lit(4L) * lit(m) * coalesce(col("l_intra"), lit(0L)) -
          col("d_sum") * col("d_sum")).as("contrib"))
  }
}
