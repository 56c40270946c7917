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

  /** Rank-bucket a column into [0, 2^bits) by value quantiles — the
    * dimension normalizer for [[zValue]] when the raw domain is skewed
    * or unbounded. ntile is a single window over the SORTED column; for
    * a 100 TB layout job this is the write-side prep pass (the same
    * cost class as the repartitionByRange the write needs anyway). */
  def rankBucket(c: Column, bits: Int): Column =
    ntile(1 << bits).over(org.apache.spark.sql.expressions.Window.orderBy(c)) - 1

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
