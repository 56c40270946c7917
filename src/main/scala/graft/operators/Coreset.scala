package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

/** Diversity-maximizing subset selection (greedy k-center /
  * farthest-point traversal): pick k embeddings such that every corpus
  * vector is close to some pick — the classic coreset/dedup-aware
  * sampling step before expensive labeling or as a seed set for
  * clustering. Greedy FPT is a 2-approximation of the optimal k-center
  * cover (Gonzalez 1985) — the quality floor is a theorem, not a tune.
  *
  * Scale shape: the chosen set is ≤ k vectors BY CONSTRUCTION, so it
  * rides the expression tree as literals (same convention as IVF's
  * centroid argmin). Each round is ONE partial-aggregable
  * `max(struct(d2, tieBreak, vec))` job over a map-side min-distance
  * projection — the corpus never shuffles, never sorts, and the driver
  * holds k·dim ints. k rounds = k scan+agg jobs (cache the projected
  * input upstream if k is large).
  *
  * Determinism: quantized integer distances ([[Ivf.quantize]]), seed =
  * smallest vec_id, distance ties break to the smaller vec_id — so the
  * selection is bit-reproducible in any engine (DuckDB oracle unrolls
  * the same greedy rounds).
  */
object Coreset {

  /** Greedy k-center over `emb` (float array, quantized internally).
    * Returns (sel_order, vec_id): the k picks in selection order. */
  def kCenters(df: DataFrame, id: Column, emb: Column, k: Int): DataFrame = {
    require(k >= 1, s"k=$k")
    val spark = df.sparkSession
    val base = df.select(id.cast("long").as("vec_id"), Ivf.quantize(emb).as("q"))

    val seed = base.orderBy("vec_id").limit(1).collect()
    require(seed.nonEmpty, "empty input")
    var centers = List[(Long, Seq[Long])](
      seed(0).getLong(0) -> seed(0).getSeq[Long](1))

    while (centers.size < k) {
      // min distance to the chosen set: literal centers, map-side
      val minD = centers.map { case (_, c) => Ivf.qdist2(col("q"), typedLit(c)) }
        .reduce(least(_, _))
      // farthest point; ties -> smaller vec_id (negate for max)
      val m = base
        .select(struct(minD.as("d2"), (-col("vec_id")).as("nid"), col("q").as("q")).as("s"))
        .agg(max(col("s")).as("m"))
        .head().getStruct(0)
      centers ::= (-m.getLong(1)) -> m.getSeq[Long](2)
    }

    val rows = centers.reverse.zipWithIndex.map { case ((vid, _), i) => Row(i, vid) }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(StructField("sel_order", IntegerType), StructField("vec_id", LongType))))
  }
}
