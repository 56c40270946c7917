package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bounded top-k as a PARTIAL-AGGREGABLE custom aggregate — the typed
  * `Aggregator` surface (SURVEY §custom-vs-builtin preference (b):
  * TypedColumn agg beats UDF), solving the one plan weakness of
  * window-based per-group top-k: `row_number().over(partitionBy g)`
  * must shuffle EVERY row of a group to one task and sort it, while
  * this aggregate keeps at most k rows of state per group per task and
  * merges map-side (ObjectHashAggregate partial merge) — on a 100 TB
  * corpus the shuffle carries ≤ k·|groups| rows instead of the corpus.
  *
  * Total order (value desc, id asc) makes the result deterministic and
  * merge-order-independent; output is the sorted top-k as an
  * array<struct<v, id>> (explode for relational shape). The salted
  * window variant (`Sampling.groupTopK`) remains for rank-column
  * outputs; this is the aggregation-shaped alternative.
  */
case class TopKAgg(k: Int) extends Aggregator[(Long, Long), Seq[(Long, Long)], Seq[(Long, Long)]] {
  require(k >= 1 && k <= 10000, s"k=$k")

  private def lt(a: (Long, Long), b: (Long, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2) // (v desc, id asc)

  override def zero: Seq[(Long, Long)] = Vector.empty

  override def reduce(buf: Seq[(Long, Long)], a: (Long, Long)): Seq[(Long, Long)] =
    merge(buf, Vector(a))

  override def merge(x: Seq[(Long, Long)], y: Seq[(Long, Long)]): Seq[(Long, Long)] = {
    // both inputs sorted; linear merge, truncate at k
    val out = Vector.newBuilder[(Long, Long)]
    var (i, j, n) = (0, 0, 0)
    while (n < k && (i < x.length || j < y.length)) {
      if (j >= y.length || (i < x.length && lt(x(i), y(j)))) { out += x(i); i += 1 }
      else { out += y(j); j += 1 }
      n += 1
    }
    out.result()
  }

  override def finish(r: Seq[(Long, Long)]): Seq[(Long, Long)] = r

  override def bufferEncoder: Encoder[Seq[(Long, Long)]] =
    ExpressionEncoder[Seq[(Long, Long)]]()
  override def outputEncoder: Encoder[Seq[(Long, Long)]] =
    ExpressionEncoder[Seq[(Long, Long)]]()
}

object TopKAgg {
  /** groupBy(groupCol) top-k rows by (value desc, id asc), exploded to
    * relational shape: (group, rn, v, id). */
  def groupTopK(df: DataFrame, group: Column, value: Column, id: Column,
                k: Int): DataFrame = {
    val agg = udaf(TopKAgg(k))
    df.select(group.as("g"), value.cast("long").as("v"), id.cast("long").as("id"))
      .groupBy("g").agg(agg(col("v"), col("id")).as("top"))
      .select(col("g"), posexplode(col("top")).as(Seq("i", "e")))
      .select(col("g"), (col("i") + 1).cast("long").as("rn"),
        col("e._1").as("v"), col("e._2").as("id"))
  }
}
