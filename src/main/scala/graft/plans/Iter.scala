package graft.plans

import org.apache.spark.sql.SparkSession

/** Loop-execution tuning for the iterative plan family (guide §1.2:
  * fix the distributed shape first, then per-round fixed cost; §2.2:
  * fewer/larger partitions; §2.4: remove needless exchanges).
  *
  * The iterative operators (CC / SCC / k-truss / Louvain / BFS family)
  * run O(log n)..O(depth) driver-synchronized rounds. At production
  * scale each round's shuffle dominates and the session defaults (AQE
  * on, cluster-sized `spark.sql.shuffle.partitions`) are right. At the
  * other end — a working set of a few thousand rows after the input
  * aggregation — a round's compute is sub-millisecond but pays a fixed
  * overhead per round:
  *
  *  - with AQE on, every Exchange materializes as its own query-stage
  *    JOB (a 2-join + 1-agg round is 4-6 scheduled jobs instead of 1);
  *  - every exchange runs `spark.sql.shuffle.partitions` tasks no
  *    matter how few rows flow through it (AQE coalescing fixes the
  *    post-shuffle side only after paying the stage-split above).
  *
  * `withLoopConf` therefore sizes the loop's shuffle width from the
  * MEASURED row count of the materialized loop input (never from the
  * local core count — the production path is untouched): when
  * `rows / rowsPerPartition` is below the session's shuffle width it
  * pins `spark.sql.shuffle.partitions` to that quotient (≥ 1) and
  * disables AQE for the loop's rounds — partitions are already exactly
  * sized, so adaptive re-planning only costs stage-split jobs; when the
  * working set is large the session conf is left completely alone.
  * Confs are restored in a `finally`, so the caller's session (and the
  * final returned plan, which executes after this scope) keeps the
  * session-level configuration.
  *
  * Correctness: every operator in this family is partitioning-invariant
  * by contract (partial-aggregable messages, deterministic tie-breaks —
  * partition-invariance is test-asserted per plan), so shuffle width and
  * AQE cannot change any result, only the per-round fixed cost.
  */
object Iter {

  /** Default per-partition row target for loop state: small enough
    * that one task's state stays far under execution memory, large
    * enough that a sub-100k-row working set runs single-task. */
  val RowsPerPartition = 262144L

  /** Row bound under which a loop-state frame is explicitly broadcast
    * in per-round joins (narrow (id, long…) rows → ≤ ~tens of MB).
    * The hint is gated on the MEASURED input size, never assumed: at
    * production scale the state exceeds the bound and every join keeps
    * its scale-out shuffle path. Rationale (guide §2.4/§3.1): a round's
    * state⋈edges join already ends as a broadcast join at runtime via
    * AQE when the state is tiny — but only after materializing each
    * shuffle stage as its own scheduled job (~3-5 extra jobs per round,
    * the dominant cost of a sub-second round). The explicit hint gives
    * the same plan with the stage-materialization jobs skipped, and
    * leaves the big cached edge side entirely exchange-free. */
  val BroadcastRows = 1000000L

  /** Broadcast-hint `df` when the loop's measured working set is under
    * [[BroadcastRows]]; identity otherwise. */
  def bcast(df: org.apache.spark.sql.DataFrame, rows: Long): org.apache.spark.sql.DataFrame =
    if (rows >= 0 && rows <= BroadcastRows) org.apache.spark.sql.functions.broadcast(df) else df

  /** Per-round lineage truncation + fresh attribute ids, zero-copy:
    * lazy localCheckpoint (materialized by the round's one change-
    * detection action, in the same job) re-wrapped as a fresh leaf
    * WITHOUT the InternalRow→Row→InternalRow encoder round-trip the
    * old `createDataFrame(chk.rdd, chk.schema)` idiom paid on every
    * subsequent scan (see [[org.apache.spark.sql.GraftLeaf]]). */
  def mat(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.GraftLeaf.fresh(df.localCheckpoint(false))

  /** Run `body` (the driver-synchronized round loop) with the shuffle
    * width derived from `rows` (the materialized loop input's row
    * count). No-op when the derived width would not shrink the
    * session's — the production configuration always wins at scale. */
  def withLoopConf[A](spark: SparkSession, rows: Long,
                      rowsPerPartition: Long = RowsPerPartition,
                      aqeOff: Boolean = false)(body: => A): A = {
    val conf = spark.conf
    val sessionParts =
      try conf.get("spark.sql.shuffle.partitions").toInt catch { case _: Throwable => 200 }
    val target = math.max(1L, (math.max(0L, rows) + rowsPerPartition - 1) / rowsPerPartition)
    if (target >= sessionParts) body
    else {
      val prevParts = conf.getOption("spark.sql.shuffle.partitions")
      val prevAqe = conf.getOption("spark.sql.adaptive.enabled")
      try {
        // AQE normally stays ON: its runtime size observation converts
        // the loop's state⋈edges joins to broadcast (checkpointed RDD
        // leaves carry no stats, so the static planner would pick
        // sort-merge and pay two extra exchanges per join), and it
        // materializes independent join-side stages concurrently.
        // Measured on q_scc: AQE off + width 1 was 8.7 s vs 6.8 s
        // baseline when the rounds relied on that conversion.
        // `aqeOff` is for loops whose per-round joins ALL carry
        // explicit size-gated broadcast hints (bcast): the static plan
        // is then already the AQE plan, and each round's remaining AQE
        // contribution is one scheduled query-stage job per exchange.
        conf.set("spark.sql.shuffle.partitions", target.toString)
        if (aqeOff) conf.set("spark.sql.adaptive.enabled", "false")
        body
      } finally {
        prevParts.fold(conf.unset("spark.sql.shuffle.partitions"))(
          v => conf.set("spark.sql.shuffle.partitions", v))
        prevAqe.fold(conf.unset("spark.sql.adaptive.enabled"))(
          v => conf.set("spark.sql.adaptive.enabled", v))
      }
    }
  }
}
