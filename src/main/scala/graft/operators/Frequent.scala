package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Exact heavy hitters over a 100 TB item stream without shuffling the
  * stream: a per-partition Misra-Gries summary proposes candidates, an
  * exact count over only those candidates verifies. Result is EXACTLY
  * `GROUP BY item HAVING count >= ceil(f·N)` — the MG stage is a lossless
  * prefilter (guaranteed superset, proof in [[heavyHitters]]) — so the
  * oracle is the plain SQL aggregate.
  *
  * Why not just groupBy-count: the full aggregate shuffles one partial
  * row per distinct item per task — for web-token streams (billions of
  * distinct items, Zipf-distributed) that's the dominant shuffle of the
  * job, only to discard all but a few hundred rows. Here the shuffle
  * carries only rows matching ≤ ceil(1/f) candidates per partition.
  *
  * This is one of the rare justified `mapPartitions` sites (SURVEY §2
  * preference order d): the MG decrement step is genuinely imperative
  * per-partition state with data-dependent eviction — no Column
  * composition expresses it.
  */
object Frequent {

  /** Items of `item` whose global count is ≥ ceil(minFraction·N), with
    * their exact counts: (item, cnt).
    *
    * Superset proof for the MG stage: with capacity c = ceil(1/f), an
    * item surviving NO partition summary has per-partition count ≤
    * n_p/(c+1) (Misra-Gries bound), so globally ≤ N/(c+1) < N·f ≤
    * threshold — below threshold. Contrapositive: every true heavy
    * hitter survives somewhere. False candidates are removed by the
    * exact verify count. */
  def heavyHitters(df: DataFrame, item: Column, minFraction: Double): DataFrame = {
    require(minFraction > 0 && minFraction <= 1, s"minFraction=$minFraction")
    val vals = df.select(item.cast("string").as("item"))
    val n = vals.count()
    val threshold = math.max(1L, math.ceil(minFraction * n).toLong)
    val capacity = math.ceil(1.0 / minFraction).toInt

    val candidates = vals.as(Encoders.STRING).mapPartitions { it =>
      val counters = scala.collection.mutable.HashMap.empty[String, Long]
      it.foreach { v =>
        counters.get(v) match {
          case Some(c) => counters(v) = c + 1
          case None if counters.size < capacity => counters(v) = 1L
          case None => // full: decrement-all, evict zeros (MG step)
            val keys = counters.keysIterator.toArray
            var i = 0
            while (i < keys.length) {
              val k = keys(i)
              val nv = counters(k) - 1
              if (nv == 0L) counters.remove(k) else counters(k) = nv
              i += 1
            }
        }
      }
      counters.keysIterator
    }(Encoders.STRING).toDF("item").distinct()

    vals.join(broadcast(candidates), "item")
      .groupBy("item").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= threshold)
  }
}
