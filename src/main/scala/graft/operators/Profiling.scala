package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** One-pass column profiling (dataset-card / data-quality stats): for
  * each requested column — non-null count, null count, exact distinct
  * count, min and max (cast to string for a uniform schema). The kind
  * of table a training-data pipeline publishes next to every corpus
  * snapshot.
  *
  * Scale shape: ONE aggregate job over the table; everything except the
  * exact distinct counts is partial-aggregable map-side. Multiple exact
  * COUNT(DISTINCT) in one agg plan through Spark's Expand (one pass,
  * |cols|× row expansion before partial aggregation) — exact by
  * contract here because the oracle must match bit-for-bit; swap in
  * approx_count_distinct at deploy if ±2% is acceptable (one line,
  * noted in SCALE.md).
  */
object Profiling {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__n"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        countDistinct(col(c)).as(s"${c}__distinct"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    // single row → one output row per column (stack is a plain
    // projection; the data never re-shuffles)
    val stackExpr = cols.map { c =>
      s"'$c', `${c}__n`, `${c}__nulls`, `${c}__distinct`, `${c}__min`, `${c}__max`"
    }.mkString(s"stack(${cols.size}, ", ", ", ")")
    row.select(expr(stackExpr).as(Seq("column", "n", "n_nulls", "n_distinct", "min_s", "max_s")))
  }

  /** Fixed-width histogram of a non-negative integer column (document
    * length / token-count distributions for dataset cards). Bucket
    * identity is integer arithmetic (`c - c % width`), never float
    * division — exact in any engine, and the whole histogram is one
    * partial-aggregable hash agg (map-side combine shrinks 100 TB of
    * rows to |buckets| partials per task). */
  def histogram(df: DataFrame, c: Column, width: Long): DataFrame = {
    require(width > 0, s"bucket width must be positive: $width")
    df.groupBy((c - pmod(c, lit(width))).as("bucket_lo"))
      .agg(count(lit(1)).as("n"))
  }

  /** Log2-binned histogram of a positive integer column — the
    * power-law profile (degree distributions, token frequencies, file
    * sizes) that drives skew decisions: the top bins tell you which
    * hub keys need salting before any join touches them. bin =
    * bitlength(v) (the HLL-rho device: exact integer log2 + 1), so the
    * result is engine-exact; one partial-aggregable hash agg over ≤ 64
    * bins. Non-positive values land in bin 0. */
  def log2Histogram(df: DataFrame, c: Column): DataFrame = {
    val v = c.cast("long")
    df.select(when(v <= 0, lit(0L))
        .otherwise(length(conv(v, 10, 2)).cast("long")).as("bin"), v.as("v"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), min("v").as("min_v"), max("v").as("max_v"))
  }

  /** MERGEABLE approximate quantiles off the log2 histogram — the
    * DDSketch idea at γ=2: the histogram is the sketch (≤ 64 rows,
    * merges across corpora/partitions/days by plain bin-wise SUM, the
    * [[graft.operators.Sketch]] family convention), and a quantile
    * query walks its cumulative counts. The q-th value is bracketed by
    * the answering bin's OBSERVED [min_v, max_v] (≤ 2× relative error
    * by construction, usually far tighter). Unlike
    * [[graft.operators.Quantiles]] (exact, driver-bounded refinement)
    * this needs no second pass and no driver state — the 100 TB
    * pattern: histogram once per partition, merge forever, query any
    * quantile later.
    *
    * Scale shape: one hash agg over ≤ 64 bins + a window over the BIN
    * table only (the prCurve pattern). Output one row per requested
    * q_ppm: (q_ppm, rank, bin, lo, hi). Rank convention:
    * ceil(q·N / 10^6), clamped to ≥ 1. */
  def log2Quantiles(df: DataFrame, c: Column, qsPpm: Seq[Long]): DataFrame = {
    require(qsPpm.nonEmpty && qsPpm.forall(q => q > 0 && q <= 1000000L), s"qsPpm=$qsPpm")
    val hist = log2Histogram(df, c)
    val w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cum = hist
      .withColumn("n_cum", sum(col("n")).over(w))
      .withColumn("total", sum(col("n")).over(all))
    val spark = df.sparkSession
    import spark.implicits._
    val qs = qsPpm.toDF("q_ppm")
    qs.crossJoin(broadcast(cum))
      // ceil(q·N/10^6) in all-positive arithmetic (Spark div == DuckDB
      // // only on non-negatives)
      .withColumn("rank", expr("greatest(1L, (q_ppm * total + 999999) div 1000000)"))
      .filter(col("n_cum") >= col("rank") && col("n_cum") - col("n") < col("rank"))
      .select(col("q_ppm"), col("rank"), col("bin"),
        col("min_v").as("lo"), col("max_v").as("hi"))
  }

  /** Exponentially time-decayed event count per key — the standard
    * recency-weighted popularity / trending score. An event aged `a`
    * seconds (relative to the table's max event time, so the reference
    * instant is deterministic and data-derived) weighs
    * 2^(−floor(a / halfLifeSec)).
    *
    * Cross-engine exactness: weights are reported SCALED by 2^scaleBits
    * as BIGINT — weight_scaled = 1 << (scaleBits − floor(a/h)) when
    * floor(a/h) ≤ scaleBits, else 0 (beyond `scaleBits` half-lives the
    * true weight is < 2^-scaleBits ≈ 0 and is floored away) — pure
    * integer arithmetic, bit-identical in any engine and immune to
    * float partial-sum ordering. Sum bound: n·2^scaleBits, safe in
    * int64 for n < 2^(62−scaleBits).
    *
    * Scale shape: ONE partial-aggregable hash agg; the weight is a
    * map-side expression over a broadcast 1-row max-time frame (same
    * pattern as [[log2Quantiles]]'s total). No window, no per-key
    * state. */
  def timeDecayCount(df: DataFrame, key: Column, ts: Column,
                     halfLifeSec: Long, scaleBits: Int = 32): DataFrame = {
    require(halfLifeSec > 0, s"halfLifeSec=$halfLifeSec")
    require(scaleBits >= 1 && scaleBits <= 62, s"scaleBits=$scaleBits")
    val ev = df.select(key.as("key"), ts.cast("timestamp").cast("long").as("tsec"))
    val tmax = ev.agg(max(col("tsec")).as("tmax"))
    ev.crossJoin(broadcast(tmax))
      .withColumn("n_half", expr(s"(tmax - tsec) div ${halfLifeSec}L"))
      .withColumn("w", when(col("n_half") <= scaleBits,
        expr(s"shiftleft(1L, cast($scaleBits - n_half as int))")).otherwise(lit(0L)))
      .groupBy("key")
      .agg(sum(col("w")).as("decayed_scaled"), count(lit(1)).as("n"))
  }
}
