package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Triangle counting with degree-ordered edge orientation (Suri &
  * Vassilvitskii, WWW'11, "Counting triangles and the curse of the last
  * reducer" — public algorithm). Orient every undirected edge from its
  * lower-(degree, id) endpoint to the higher one; each triangle is then
  * counted exactly once, from its unique minimum-order corner.
  *
  * Why this is THE skew story for graph analytics at 10^12 edges: the
  * naive wedge join groups on each node's FULL neighborhood, so one
  * P31-like hub of degree d contributes O(d²) wedges to a single
  * reducer. Degree-ordering bounds every node's OUT-degree by O(√m)
  * (a node of degree > √m has fewer than √m higher-degree neighbors on
  * average), so total wedge work is O(m^1.5) spread evenly — the hub's
  * wedges land on its many low-degree neighbors instead of on the hub.
  *
  * Plan shape: two keyed shuffles (degree agg, wedge self-join on the
  * source) + one closing equi-join on the (x, y) wedge endpoints —
  * never a cartesian; AQE skew-join splitting covers residual hot keys.
  * The order key is a zero-padded "degree|node" string, so the oracle
  * reproduces the exact orientation with printf.
  *
  * Use on the near-dup pair graph: triangle density measures cluster
  * coherence (transitivity of the near-dup relation) — a standard
  * fuzzy-dedup diagnostic.
  */
object Triangles {

  /** edges: two string columns (a, b), undirected, self-loops and
    * duplicates tolerated. Returns one row: (n_triangles). Degrees up
    * to 10^18 keep the order key sortable (18-digit pad). */
  def count(edges: DataFrame): DataFrame = {
    val raw = edges.toDF("a", "b")
    val canon = raw.where(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
      .distinct()
    val deg = canon.select(col("u").as("node")).unionAll(canon.select(col("v").as("node")))
      .groupBy("node").agg(org.apache.spark.sql.functions.count(lit(1)).as("d"))
    val k = deg.select(col("node"), format_string("%018d|%s", col("d"), col("node")).as("key"))
    val o = canon
      .join(k.withColumnRenamed("node", "u").withColumnRenamed("key", "ku"), "u")
      .join(k.withColumnRenamed("node", "v").withColumnRenamed("key", "kv"), "v")
      .select(
        when(col("ku") < col("kv"), col("u")).otherwise(col("v")).as("s"),
        when(col("ku") < col("kv"), col("v")).otherwise(col("u")).as("t"),
        greatest(col("ku"), col("kv")).as("tkey"))
    val e1 = o.select(col("s"), col("t").as("x"), col("tkey").as("xkey"))
    val e2 = o.select(col("s"), col("t").as("y"), col("tkey").as("ykey"))
    val wedges = e1.join(e2, Seq("s")).where(col("xkey") < col("ykey"))
      .select(col("x"), col("y"))
    wedges.join(o.select(col("s").as("x"), col("t").as("y")), Seq("x", "y"))
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("n_triangles"))
  }

  /** Per-node triangle counts and local clustering coefficient
    * (Watts & Strogatz 1998, public formula):
    *
    *   cc_ppm(v) = 2·tri(v)·10^6 div (deg(v)·(deg(v)−1)),  deg ≥ 2
    *
    * — how close each node's neighborhood is to a clique; on the
    * near-dup pair graph this scores per-DOCUMENT cluster coherence
    * (the global [[count]] gives only the corpus total). Same
    * degree-ordered orientation and O(m^1.5) wedge bound as [[count]];
    * the one addition is exploding each closed triangle to its three
    * corners (3 rows per triangle — linear in the triangle count) and
    * one partial-aggregable count per corner. Integer ppm end to end.
    * Output: (node, deg, tri, cc_ppm) for every node of the simple
    * graph (tri = 0 rows included; isolated nodes absent by
    * construction — no edges, no row). */
  def clusteringCoeff(edges: DataFrame): DataFrame = {
    val raw = edges.toDF("a", "b")
    val canon = raw.where(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
      .distinct()
    val deg = canon.select(col("u").as("node")).unionAll(canon.select(col("v").as("node")))
      .groupBy("node").agg(org.apache.spark.sql.functions.count(lit(1)).as("d"))
    val k = deg.select(col("node"), format_string("%018d|%s", col("d"), col("node")).as("key"))
    val o = canon
      .join(k.withColumnRenamed("node", "u").withColumnRenamed("key", "ku"), "u")
      .join(k.withColumnRenamed("node", "v").withColumnRenamed("key", "kv"), "v")
      .select(
        when(col("ku") < col("kv"), col("u")).otherwise(col("v")).as("s"),
        when(col("ku") < col("kv"), col("v")).otherwise(col("u")).as("t"),
        greatest(col("ku"), col("kv")).as("tkey"))
    val e1 = o.select(col("s"), col("t").as("x"), col("tkey").as("xkey"))
    val e2 = o.select(col("s"), col("t").as("y"), col("tkey").as("ykey"))
    val wedges = e1.join(e2, Seq("s")).where(col("xkey") < col("ykey"))
      .select(col("s"), col("x"), col("y"))
    val tris = wedges.join(o.select(col("s").as("x"), col("t").as("y")), Seq("x", "y"))
    val corners = tris.select(explode(array(col("s"), col("x"), col("y"))).as("node"))
      .groupBy("node").agg(org.apache.spark.sql.functions.count(lit(1)).as("tri"))
    deg.join(corners, Seq("node"), "left")
      .select(col("node"), col("d").as("deg"),
        coalesce(col("tri"), lit(0L)).as("tri"))
      .withColumn("cc_ppm",
        when(col("deg") >= 2,
          expr("2 * tri * 1000000 div (deg * (deg - 1))")).otherwise(lit(0L)))
  }
}
