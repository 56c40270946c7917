package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Hash-bucketed, sorted table layout: the storage-level answer to "this
  * join shuffles 100 TB every night". Writing both sides of a recurring
  * join bucketed by the join key (same bucket count) lets every
  * subsequent join read co-located buckets — the scan itself reports
  * `hashpartitioning(key, n)`, so the planner needs NO Exchange on
  * either side (asserted in OperatorsSpec). The one-time write pays the
  * shuffle once; every downstream join, groupBy, or dedup on the key
  * rides it for free.
  *
  * This is the parquet-bucketing equivalent of the Iceberg
  * bucket-partition transform named by the deployment target (SCALE.md
  * maps the two); the engine's own snapshot table ([[SnapshotTable]])
  * covers the manifest/commit side, this covers the join-layout side.
  */
object BucketedTable {

  /** Write `df` as a bucketed+sorted parquet table registered as `name`
    * with files at `path`. Bucket count fixes the join parallelism —
    * size it so one bucket of the BIG side fits an executor's memory
    * (e.g. 100 TB / 4096 buckets ≈ 25 GB splittable files). */
  def write(df: DataFrame, name: String, path: String,
            key: String, buckets: Int): Unit =
    df.write.format("parquet").mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .option("path", path)
      .saveAsTable(name)

  /** Join two tables previously written with [[write]] on their shared
    * bucket key — plans with zero Exchange when bucket counts match. */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
                    leftKey: String, rightKey: String): DataFrame =
    spark.table(left).join(spark.table(right),
      spark.table(left)(leftKey) === spark.table(right)(rightKey))
}
