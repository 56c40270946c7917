package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: cluster rows so per-file column ranges are
  * tight on MORE THAN ONE dimension, making min/max file-skipping (the
  * SnapshotTable manifest stats / Iceberg file stats) effective for
  * filters on either column. A linear sort gives perfect skipping on the
  * sort key and NONE on every other column; Z-ordering interleaves the
  * bits of two keys so files become ~square tiles of the (x, y) domain —
  * both dimensions' per-file ranges shrink to ~√filesCount of the
  * domain.
  *
  * The z-value is pure unrolled integer arithmetic (static shifts —
  * whole-stage-codegen, no UDF), and reproducible in any SQL engine,
  * so its computation is DuckDB-oracled (q_zvalue); the layout effect
  * itself is asserted quantitatively in OperatorsSpec.
  */
object Layout {

  /** Morton/Z interleave of the low `bits` of two non-negative longs:
    * bit i of x lands at position 2i, bit i of y at 2i+1. Callers clamp
    * or bucket inputs into [0, 2^bits) first (2·bits ≤ 62). */
  def zValue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits=$bits")
    (0 until bits).map { i =>
      shiftright(x.cast("long"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(y.cast("long"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)
  }

  /** Rank-bucket an integral column into [0, 2^bits) by EXACT value
    * quantiles — the dimension normalizer for [[zValue]] when the raw
    * domain is skewed or unbounded (fixed-point-scale doubles first,
    * repo convention). No global sort anywhere: the 2^bits−1 cutpoints
    * come from [[Quantiles.quantiles]] (≤7 partial-aggregable hash-agg
    * rounds, distributed selection), and rows are then bucketed
    * MAP-SIDE by an O(bits) binary search over the literal sorted
    * cutpoint array (aggregate HOF — constant-size expression, codegen
    * loop) — zero shuffle and zero Window on the data path, asserted in
    * OperatorsSpec. Bucket of v = #cutpoints ≤ v; nulls bucket to null.
    *
    * Resolution: min/max file skipping needs O(#output files) distinct
    * tiles, not O(rows) — bits ≤ 8 already yields 2^16 z-tiles per
    * dimension pair, far above any realistic file count, so the exact
    * cutpoint pass stays tiny (255 probes) while the bucketing handles
    * any corpus size. (The previous formulation — ntile over an
    * unpartitioned window — sorted the entire input through ONE task;
    * this replaces it.) */
  def rankBucket(df: DataFrame, valueCol: String, bits: Int, out: String): DataFrame = {
    require(bits >= 1 && bits <= 8, s"bits=$bits not in [1,8] — see resolution note")
    val nBuckets = 1 << bits
    val qs = (1 to nBuckets - 1).map(i => i.toDouble / nBuckets -> s"c$i")
    val seed = Quantiles.quantiles(
      df.select(col(valueCol).cast("long").as("v")).where(col("v").isNotNull),
      lit("all"), col("v"), qs).collect()
    if (seed.isEmpty) return df.withColumn(out, lit(null).cast("int"))
    val cuts: Seq[Long] = (1 to nBuckets - 1).map(i => seed(0).getAs[Long](s"c$i"))
    df.withColumn(out, bucketOf(col(valueCol).cast("long"), cuts))
  }

  /** #cuts ≤ v via binary search over the literal sorted array:
    * invariant — the answer lies in [lo, hi]; after ceil(log2(n+1))
    * halvings lo = hi = answer. O(log n) element_at probes per row,
    * expression size O(1) (the loop lives in the HOF, not the tree). */
  private[operators] def bucketOf(v: Column, cuts: Seq[Long]): Column = {
    val n = cuts.length
    val steps = 32 - Integer.numberOfLeadingZeros(n) // ceil(log2(n+1))
    val arr = typedlit(cuts)
    val search = aggregate(
      sequence(lit(1), lit(steps)),
      struct(lit(0).as("lo"), lit(n).as("hi")),
      (acc, _) => {
        val lo = acc.getField("lo"); val hi = acc.getField("hi")
        val mid = shiftright(lo + hi + lit(1), 1)
        // greatest() keeps element_at's index ≥ 1 when lo=hi=0 (the
        // probe result is unused on that branch but must not throw)
        val midOk = mid >= lit(1) && element_at(arr, greatest(mid, lit(1))) <= v
        struct(
          when(lo === hi, lo).when(midOk, mid).otherwise(lo).as("lo"),
          when(lo === hi, hi).when(midOk, hi).otherwise(mid - lit(1)).as("hi"))
      },
      acc => acc.getField("lo"))
    when(v.isNull, lit(null).cast("int")).otherwise(search)
  }

  /** Write `df` Z-clustered on (x, y): range-partition by z-value into
    * `files` output partitions, sort within each, write parquet. Each
    * file covers a compact z-range ⇒ a ~square (x, y) tile ⇒ min/max
    * stats on BOTH x and y are tight (asserted in OperatorsSpec).
    * Combine with `SnapshotTable.commit(..., statsCols = Seq(x, y))`
    * for manifest-level skipping. */
  def zOrderWrite(df: DataFrame, path: String, x: String, y: String,
                  bits: Int = 16, files: Int = 32): Unit =
    df.withColumn("_z", zValue(col(x), col(y), bits))
      .repartitionByRange(files, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(path)
}
