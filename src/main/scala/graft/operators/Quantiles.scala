package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Exact per-group quantiles WITHOUT sorting a group onto one task.
  *
  * The window formulation (`row_number().over(partitionBy(group))`, see
  * q_percentile) is exact but serializes each group through a single
  * task — for low-cardinality groups over a 100 TB fact table that's
  * the scale-killer. This operator computes the same exact k-th-smallest
  * values by iterative range refinement (the classic distributed
  * selection algorithm): each round builds one histogram of the
  * still-active (group, quantile) probes' value ranges — a single
  * partial-aggregable hash agg over (probe, bucket), collecting at most
  * |probes|·buckets counter rows — then narrows every probe's range to
  * the bucket containing its rank. Ranges shrink ×buckets per round, so
  * a 64-bit domain resolves in ≤ ceil(64/log2(buckets)) rounds (7 at
  * B=1024). The data is never sorted, never shuffled by value, and only
  * histogram counters ever reach the driver — the driver loop is control
  * plane only, same contract as IVF's Lloyd iterations.
  */
object Quantiles {

  /** Exact quantiles of a LONG value column per group: for each q in
    * `qs` (fraction → output column name), the k-th smallest value of
    * the group in multiset order with k = ceil(q·n) — identical to the
    * rank-window definition, bit-exact in any engine (pure integer
    * arithmetic; callers fixed-point-scale doubles first).
    * Returns one row per group: (g, <name per q>...).
    *
    * Guards (both fail fast with actionable messages):
    *  - `maxGroups`: probe state is driver-resident (|groups|·|qs| probes,
    *    |probes|·buckets histogram counters per round) — the design point
    *    is FEW groups over a HUGE fact table. High-cardinality grouping
    *    belongs on the per-group window path (q_percentile shape), where
    *    each group is small enough to sort within a task.
    *  - 63-bit domain: per-group (max − min) must fit in a positive Long,
    *    because bucket ids are computed distributedly as `(v - lo) div w`
    *    in 64-bit integer arithmetic — a wider domain would silently
    *    wrap. Callers fixed-point-scale doubles; scale so the spread
    *    fits (the guard names the offending group). */
  def quantiles(df: DataFrame, group: Column, value: Column,
                qs: Seq[(Double, String)], buckets: Int = 1024,
                maxGroups: Int = 65536): DataFrame = {
    require(qs.nonEmpty && qs.forall { case (q, _) => q > 0 && q <= 1 }, qs.toString)
    require(buckets >= 2, s"buckets=$buckets")
    val spark = df.sparkSession
    // quantiles are over the NON-NULL values (a null would inflate n but
    // never land in a histogram bucket, overrunning the rank walk)
    val base = df.select(group.cast("string").as("g"), value.cast("long").as("v"))
      .where(col("v").isNotNull)

    // one pass: per-group count + value range seeds every probe
    final case class Probe(g: String, name: String, var k: Long,
                           var lo: Long, var hi: Long) {
      def done: Boolean = lo == hi
      def width: Long = (hi - lo) / buckets + 1 // == ceil(range/buckets)
    }
    val seeds = base.groupBy("g")
      .agg(count(lit(1)).as("n"), min("v").as("lo"), max("v").as("hi"))
      .collect()
    require(seeds.length <= maxGroups,
      s"${seeds.length} groups exceeds maxGroups=$maxGroups: probe state is " +
        "driver-resident; use the per-group rank-window formulation for " +
        "high-cardinality grouping, or raise maxGroups deliberately")
    seeds.foreach { r =>
      // (hi - lo) must not overflow: bucket ids are 64-bit (v - lo) div w
      require(BigInt(r.getLong(3)) - BigInt(r.getLong(2)) <= BigInt(Long.MaxValue) - buckets,
        s"group ${r.getString(0)} value spread ${r.getLong(2)}..${r.getLong(3)} " +
          "exceeds 63 bits; rescale the fixed-point domain")
    }
    val probes = for {
      r <- seeds.toSeq
      (q, name) <- qs
    } yield Probe(r.getString(0), name, math.ceil(q * r.getLong(1)).toLong,
      r.getLong(2), r.getLong(3))

    while (probes.exists(!_.done)) {
      val active = probes.filter(!_.done)
      val pdf = spark.createDataFrame(
        spark.sparkContext.parallelize(
          active.map(p => Row(p.g, p.name, p.lo, p.hi, p.width)), 1),
        StructType(Seq(StructField("g", StringType), StructField("pname", StringType),
          StructField("lo", LongType), StructField("hi", LongType),
          StructField("w", LongType))))
      // histogram: every row feeds each of its group's active probes;
      // `div` keeps the bucket index in exact integer arithmetic
      val hist = base.join(broadcast(pdf), "g")
        .where(col("v") >= col("lo") && col("v") <= col("hi"))
        .groupBy(col("g"), col("pname"), expr("(v - lo) div w").as("b"))
        .agg(count(lit(1)).as("c"))
        .collect()
        .groupBy(r => (r.getString(0), r.getString(1)))
      active.foreach { p =>
        val counts = hist((p.g, p.name)).map(r => r.getLong(2) -> r.getLong(3))
          .sortBy(_._1)
        var remaining = p.k
        val (b, _) = counts.find { case (_, c) =>
          if (remaining <= c) true else { remaining -= c; false }
        }.getOrElse(sys.error(s"rank ${p.k} exceeds probe population for $p"))
        val w = p.width
        p.k = remaining
        p.hi = math.min(p.hi, p.lo + (b + 1) * w - 1)
        p.lo = p.lo + b * w
      }
    }

    val byGroup = probes.groupBy(_.g)
    val schema = StructType(StructField("g", StringType) +:
      qs.map { case (_, name) => StructField(name, LongType) })
    val rows = byGroup.keys.toSeq.sorted.map { g =>
      val m = byGroup(g).map(p => p.name -> p.lo).toMap
      Row.fromSeq(g +: qs.map { case (_, name) => m(name) })
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** Per-group winsorization (quantile clipping) — the standard
    * heavy-tail tamer for numeric features before training: values
    * clip to the group's EXACT [pLo, pHi] cutpoints (rank-ceil
    * convention, computed by [[quantiles]] — the fact table is never
    * sorted). Both q fractions should be exactly representable doubles
    * OR the oracle must replay the same double arithmetic (the
    * q_winsorize oracle does: CEIL(CAST(n AS DOUBLE) * q) — identical
    * IEEE multiply in both engines).
    * Output: (g, v, lo, hi, v_clipped), one row per input row. */
  def winsorize(df: DataFrame, group: Column, value: Column,
                qLo: Double = 0.05, qHi: Double = 0.95, buckets: Int = 1024,
                maxGroups: Int = 65536): DataFrame = {
    require(qLo > 0 && qHi <= 1 && qLo < qHi, s"qLo=$qLo qHi=$qHi")
    val base = df.select(group.cast("string").as("g"), value.cast("long").as("v"))
      .where(col("v").isNotNull)
    val cuts = quantiles(base, col("g"), col("v"),
      Seq((qLo, "lo"), (qHi, "hi")), buckets, maxGroups)
    base.join(broadcast(cuts), "g")
      .select(col("g"), col("v"), col("lo"), col("hi"),
        greatest(col("lo"), least(col("hi"), col("v"))).as("v_clipped"))
  }

  /** Robust per-group outlier flags by Median Absolute Deviation —
    * the quality-filter pass a training pipeline runs on numeric
    * document metrics (lengths, scores): unlike z-scores, the median /
    * MAD pair is immune to the outliers it hunts (50% breakdown point;
    * Hampel 1974, public statistic). A row is flagged when
    *
    *   |v − median(g)| · 10^6  >  kPpm · MAD(g)
    *
    * with MAD(g) = median(|v − median(g)|) and both medians in the
    * engine's exact rank-ceil convention (k = ceil(n/2)-th smallest —
    * SQL-replayable, integer-exact). kPpm = 3·10^6 is the classic "3
    * MADs out". Degenerate MAD = 0 (over half the group identical)
    * flags every deviating row — the documented Hampel behavior.
    *
    * Plan shape: two [[quantiles]] passes (each ≤ 7 partial-aggregable
    * histogram rounds; the fact table is never sorted or re-shuffled by
    * value) + two broadcast joins of the per-group medians — the same
    * few-groups-over-huge-table design point, inheriting `maxGroups`.
    * Output: (g, v, med, d, mad, outlier) — one row per input row. */
  def madOutliers(df: DataFrame, group: Column, value: Column,
                  kPpm: Long = 3000000L, buckets: Int = 1024,
                  maxGroups: Int = 65536): DataFrame = {
    require(kPpm >= 0, s"kPpm=$kPpm")
    val base = df.select(group.cast("string").as("g"), value.cast("long").as("v"))
      .where(col("v").isNotNull)
    val med = quantiles(base, col("g"), col("v"), Seq((0.5, "med")),
      buckets, maxGroups)
    val dev = base.join(broadcast(med), "g")
      .select(col("g"), col("v"), col("med"), abs(col("v") - col("med")).as("d"))
    val mad = quantiles(dev, col("g"), col("d"), Seq((0.5, "mad")),
      buckets, maxGroups)
    dev.join(broadcast(mad), "g")
      .select(col("g"), col("v"), col("med"), col("d"), col("mad"),
        (col("d") * lit(1000000L) > lit(kPpm) * col("mad")).as("outlier"))
  }
}
