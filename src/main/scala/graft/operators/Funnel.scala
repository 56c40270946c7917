package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis over an event stream: how many users reached
  * step i of a step sequence, where step i must occur STRICTLY AFTER
  * that user's earliest completion of step i-1 (the standard product-
  * analytics funnel; each step's time is the EARLIEST valid one, which
  * makes the result deterministic and order-independent).
  *
  * Plan shape: one partial-aggregable min() hash agg per step plus one
  * equi-join of the (user, t_{i-1}) frontier onto the step's events —
  * `steps.length` passes, each a single shuffle on the user key. The
  * frontier is |users|-sized (one row per user still in the funnel,
  * shrinking monotonically), so at 10^12 events every join is the
  * fact-stream-vs-small-frontier shape AQE broadcasts when it fits.
  * Nothing is windowed or collected: no per-user event array ever
  * materializes (the usual sort_array(collect_list) funnel implodes on
  * hub users; this one is bounded regardless of per-user event count).
  */
object Funnel {

  /** events: (user, step, ts) via the column args. `steps`: ordered step
    * names. Returns one row per step: (step_idx, step, users) — users
    * whose earliest valid completion chain reaches that step. */
  def funnel(events: DataFrame, user: Column, step: Column, ts: Column,
             steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "steps must be non-empty")
    val ev = events.select(user.as("user"), step.as("step"), ts.as("ts"))
    // frontier_i: (user, t_i) = earliest completion time of step i given
    // the user's earliest chain through steps 0..i-1. Built lazily; the
    // whole funnel is ONE unioned plan (no driver-side actions).
    val frontiers = steps.zipWithIndex.tail.scanLeft(
      ev.where(col("step") === steps.head).groupBy("user").agg(min(col("ts")).as("t"))) {
      case (prev, (s, _)) =>
        ev.where(col("step") === s)
          .join(prev.select(col("user"), col("t").as("prev_t")), "user")
          .where(col("ts") > col("prev_t"))
          .groupBy("user").agg(min(col("ts")).as("t"))
    }
    frontiers.zip(steps.zipWithIndex).map { case (f, (s, i)) =>
      f.agg(count(lit(1)).as("users"))
        .select(lit(i).as("step_idx"), lit(s).as("step"), col("users"))
    }.reduce(_ unionAll _)
  }
}
