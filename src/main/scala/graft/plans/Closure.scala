package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-depth transitive closure (min-depth reachability) over an
  * edge table — the "instance of any subclass of X, k levels deep"
  * query every KG user runs (Wikidata P279*), which the reference's
  * flat property filters cannot express (reference
  * `spec/EntityFilter.java` matches direct statements only).
  *
  * BFS with a visited set, not naive self-join powering:
  * each round joins only the NEW frontier (pairs first reached last
  * round) against the edge table, then anti-joins the accumulated
  * closure so already-reached pairs are never re-expanded — the work
  * per round is proportional to newly discovered pairs, cycles
  * terminate naturally, and every pair carries its minimal hop count.
  * Lineage is truncated per round (`localCheckpoint`; swap to
  * `checkpoint` with a cluster checkpoint dir, same note as
  * [[ConnectedComponents]]). Joins stay equi-joins on the edge source
  * key; Catalyst/AQE picks broadcast when a frontier is small.
  */
object Closure {

  /** Materialize a round's result as a CLEAN leaf. `localCheckpoint`
    * truncates lineage but keeps the analyzed plan's attribute ids and
    * constraints; since every round re-traverses the SAME edge plan and
    * the rounds are unioned together, those shared ids make Union
    * constraint rewriting fail ("key not found: src#N"). The RDD
    * round-trip yields a leaf with fresh ids and no inherited
    * constraints. (Cluster note: swap localCheckpoint → checkpoint with
    * a checkpoint dir, same as [[ConnectedComponents]].) */
  private def materialize(df: DataFrame): DataFrame = {
    val chk = df.localCheckpoint(false)
    chk.sparkSession.createDataFrame(chk.rdd, chk.schema)
  }

  /** @return columns (src, dst, depth) — depth = minimal #hops ≤ maxDepth */
  def transitive(edges: DataFrame, srcCol: String, dstCol: String,
                 maxDepth: Int): DataFrame = {
    require(maxDepth >= 1, "maxDepth must be >= 1")
    val e = materialize(
      edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).distinct())
    var acc = e.withColumn("depth", lit(1))
    var frontier = e
    for (d <- 2 to maxDepth) {
      val next = materialize(frontier.alias("f")
        .join(e.alias("g"), col("f.dst") === col("g.src"))
        .select(col("f.src").as("src"), col("g.dst").as("dst"))
        .distinct()
        // drop pairs already reached at a smaller depth (BFS visited set)
        .join(acc.select("src", "dst"), Seq("src", "dst"), "left_anti"))
      acc = acc.unionByName(next.withColumn("depth", lit(d)))
      frontier = next
    }
    acc
  }
}
