package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** IVF (inverted-file) approximate nearest neighbor — the second scale
  * path next to sign-bit LSH (Similarity.lshTopK):
  *
  *  1. train a coarse quantizer (Lloyd's k-means, a few iterations,
  *     deterministic stride init) — centroids are tiny and broadcast;
  *  2. assign every vector to its nearest centroid (one narrow pass:
  *     broadcast-join + per-row argmin);
  *  3. search probes only the `nProbe` nearest cells — candidate volume
  *     drops k/nProbe-fold vs brute force.
  *
  * All distance math is double-precision over float inputs via
  * higher-order array functions (codegen'd, no UDFs).
  */
object Ivf {

  /** squared L2 distance between two float-array columns (double math) */
  def dist2(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => (x.cast("double") - y.cast("double")) *
        (x.cast("double") - y.cast("double"))),
      lit(0.0d), (acc, v) => acc + v)

  /** Lloyd's k-means over (vec_id, embedding). Deterministic init: the k
    * vectors with the smallest vec_id at stride spacing. Returns
    * (cid, centroid: array<double>). */
  def train(vectors: DataFrame, k: Int, iters: Int = 4): DataFrame = {
    val n = vectors.count()
    val stride = math.max(1L, n / k)
    var centroids = vectors
      .withColumn("rn", row_number().over(Window.orderBy("vec_id")) - 1)
      .filter(col("rn") % stride === 0).limit(k)
      .select((col("rn") / stride).cast("int").as("cid"),
        transform(col("embedding"), x => x.cast("double")).as("centroid"))

    (1 to iters).foreach { _ =>
      val assigned = assign(vectors, centroids)
      // new centroid = per-dimension mean over members (posexplode → avg)
      val next = assigned.join(vectors, "vec_id")
        .select(col("cid"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy("cid", "pos").agg(avg(col("v").cast("double")).as("m"))
        .groupBy("cid").agg(
          transform(array_sort(collect_list(struct(col("pos"), col("m")))),
            s => s("m")).as("centroid"))
      centroids = next.localCheckpoint(true)
    }
    centroids
  }

  /** nearest-centroid assignment: (vec_id, cid). Broadcast the (tiny)
    * centroid table; per-row argmin with deterministic tie-break. */
  def assign(vectors: DataFrame, centroids: DataFrame): DataFrame = {
    val w = Window.partitionBy("vec_id").orderBy(col("d2"), col("cid"))
    vectors.select(col("vec_id"), col("embedding"))
      .crossJoin(broadcast(centroids))
      .withColumn("d2", dist2(col("embedding"), col("centroid")))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("vec_id"), col("cid"))
  }

  /** IVF search: probes visit their nProbe nearest cells only; top-k by
    * quantized dot product (consistent with Similarity). */
  def search(vectors: DataFrame, probes: DataFrame, centroids: DataFrame,
             k: Int, nProbe: Int = 2): DataFrame = {
    val cells = assign(vectors, centroids)
    val indexed = vectors.join(cells, "vec_id")
      .select(col("vec_id").as("nid"), col("embedding").as("emb_n"), col("cid"))
    // probe cells: nProbe nearest centroids per probe
    val wp = Window.partitionBy("vec_id").orderBy(col("d2"), col("cid"))
    val probeCells = probes.select(col("vec_id"), col("embedding"))
      .crossJoin(broadcast(centroids))
      .withColumn("d2", dist2(col("embedding"), col("centroid")))
      .withColumn("rn", row_number().over(wp)).filter(col("rn") <= nProbe)
      .select(col("vec_id").as("qid"), col("embedding").as("emb_q"), col("cid"))
    val wr = Window.partitionBy("qid").orderBy(col("dot").desc, col("nid"))
    probeCells.join(indexed, "cid")
      .filter(col("qid") =!= col("nid"))
      .withColumn("dot", Similarity.qdot(col("emb_q"), col("emb_n")))
      .withColumn("rn", row_number().over(wr)).filter(col("rn") <= k)
      .select(col("qid"), col("nid"), col("dot"), col("rn"))
  }
}
