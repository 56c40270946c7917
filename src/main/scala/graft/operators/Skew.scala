package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities for power-law keys (P31/P279-like hub
  * entities make aggregation and join keys power-law; SURVEY §7.4.3).
  *
  * Spark's own mitigations are preferred where they apply (partial
  * aggregation makes plain groupBy-count skew-proof; AQE
  * `skewJoin` splits oversized join partitions at runtime). Explicit
  * salting is for the cases they don't cover: high-cardinality
  * aggregates per key (e.g. collect-like or exact distinct counts per
  * hub key), where every row of a hub key would otherwise land in one
  * reducer.
  */
object Skew {

  /** Two-stage salted aggregation: count rows per key with `salt`
    * partial buckets per key, then merge. Semantically identical to
    * `df.groupBy(key).count()`; the first stage spreads each hub key
    * over `salt` reducers. */
  def saltedCount(df: DataFrame, key: Column, salt: Int = 16): DataFrame =
    df.select(key.as("key"), pmod(xxhash64(monotonically_increasing_id()), lit(salt)).as("_salt"))
      .groupBy(col("key"), col("_salt")).agg(count(lit(1)).as("c"))
      .groupBy(col("key")).agg(sum("c").as("count"))

  /** Exact count-distinct per key, hub-key-safe in BOUNDED memory:
    * stage 1 dedups (key, value) pairs — that shuffle hash-partitions
    * on the PAIR, so a hub key's rows spread across reducers by value
    * hash (the value hash IS the salt; no explicit `_salt` column
    * needed) and each reducer holds one pair at a time (sort/hash agg
    * row-by-row, never a per-bucket array) — then stage 2 counts rows
    * per key with map-side partial aggregation, so the hub key enters
    * the second shuffle as at most one (key, partial-count) row per
    * partition. Semantically identical to
    * `df.groupBy(key).agg(countDistinct(value))`, but no reducer ever
    * materializes a hub key's full value set (the earlier collect_set
    * variant held one array per (key, salt) bucket — O(distinct/salt)
    * memory, a hazard at extreme cardinality; this holds O(1)). */
  def saltedCountDistinct(df: DataFrame, key: Column, value: Column, salt: Int = 16): DataFrame =
    df.select(key.as("key"), value.as("v"))
      .distinct()
      .groupBy(col("key")).agg(count(lit(1)).as("n_distinct"))

  /** Broadcast-salted join for a skewed left key against a small-ish
    * right side: right is exploded `salt`-fold so each (key, salt)
    * bucket joins independently. Use when AQE skew-join can't kick in
    * (e.g. pre-AQE stages or non-shuffle joins). */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String, salt: Int = 8): DataFrame = {
    val saltedLeft = left.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salt)))
    val saltedRight = right.withColumn("_salt", explode(lit((0L until salt.toLong).toArray)))
    saltedLeft.join(saltedRight, Seq(key, "_salt")).drop("_salt")
  }
}
