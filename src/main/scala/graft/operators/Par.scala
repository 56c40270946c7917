package graft.operators

import org.apache.spark.sql.DataFrame

/** Input-parallelism repair (guide §2.5 "input skew / one unsplittable
  * file"): a small parquet table arrives as 1-2 scan partitions, so any
  * compute-heavy per-row stage (regex/sha/HOF-dot scoring, exploding
  * joins) runs on 1-2 cores while the rest of the cluster idles.
  * `spread` widens a NARROW input to cluster parallelism with one
  * round-robin shuffle of the (small by construction) input; when the
  * input is already at cluster width — the production case, where scans
  * split by `maxPartitionBytes` — it is a NO-OP and never adds a
  * shuffle. Row set unchanged (round-robin repartition).
  *
  * Call it on scan-level frames only: `.rdd` on a frame with upstream
  * exchanges would trigger AQE stage execution. */
object Par {
  import org.apache.spark.sql.catalyst.plans.logical._

  def spread(df: DataFrame): DataFrame = {
    // a plan that already shuffles (join/agg/repartition/...) has its
    // post-shuffle width set by shuffle.partitions + AQE — leave it
    // alone (also avoids `.rdd` on an exchange-bearing plan, which
    // would execute AQE stages eagerly)
    val shuffles = df.queryExecution.analyzed.collectFirst {
      case _: Repartition => (); case _: RepartitionByExpression => ()
      case _: Join => (); case _: Aggregate => (); case _: Distinct => ()
      case _: Window => (); case _: Sort => ()
    }.isDefined
    if (shuffles) df
    else {
      val p = df.sparkSession.sparkContext.defaultParallelism
      if (df.rdd.getNumPartitions >= p) df else df.repartition(p)
    }
  }
}
