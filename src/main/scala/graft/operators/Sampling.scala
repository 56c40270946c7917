package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic stratified sampling — the data-mixture primitive for
  * assembling training sets ("at most n documents per language / domain /
  * quality bucket").
  *
  * Membership is a pure function of (id, seed): rows are ranked inside
  * each stratum by a deterministic hash of the id and the n smallest are
  * kept. Like the spec sampler (F7, `SpecCompiler.scala` — reference
  * `DumpSpec.java` sampling), this deliberately trades scan-order
  * `Random(seed)` for hash ranking: same marginal behavior, but
  * reproducible under any partitioning, retry, or engine — which is what
  * makes the DuckDB oracle possible at all.
  *
  * Scale shape: a single `row_number` window over a 100 TB stratum would
  * shuffle the entire stratum to one task (a hub stratum — "en" — becomes
  * the straggler). Stage 1 therefore pre-ranks inside (stratum, salt)
  * groups, where the salt is ALSO hash-derived from the id (deterministic
  * under task retries, unlike `spark_partition_id`), keeping at most n
  * rows per salted group. The final exact window then sees at most
  * n·salts rows per stratum regardless of stratum size. Both stages are
  * plain hash-shuffle windows; no driver state, no collect.
  */
object Sampling {

  /** Weighted-mixture sampling: keep each row with a per-stratum rate
    * (parts-per-million, exact integers so Spark and any SQL oracle
    * agree bit-for-bit). Membership = hash(id, seed) mod 1e6 < rate —
    * a pure map-side filter: zero shuffle, pushable into the scan, and
    * the sample is a subset-stable function of (id, seed) (raising a
    * stratum's rate only ADDS rows — mixture re-weighing between
    * pipeline runs never churns previously selected documents).
    * The small rate table becomes a literal CASE chain (codegen'd), not
    * a join: mixture configs are O(strata), never data-sized. */
  def byRate(df: DataFrame, stratum: Column, id: Column,
             ratesPerMillion: Map[String, Long], defaultPerMillion: Long = 0L,
             seed: Long = 42L, rankExpr: Option[Column] = None): DataFrame = {
    require((ratesPerMillion.values ++ Seq(defaultPerMillion)).forall(r => r >= 0 && r <= 1000000L),
      "rates are parts-per-million in [0, 1000000]")
    val h = rankExpr.getOrElse(xxhash64(id, lit(seed)))
    val rate = ratesPerMillion.toSeq.sortBy(_._1).foldLeft(lit(defaultPerMillion)) {
      case (acc, (k, r)) => when(stratum === k, lit(r)).otherwise(acc)
    }
    df.filter(pmod(h, lit(1000000L)) < rate)
  }

  /** Deterministic train/val/test split assignment: each row gets a
    * split label as a pure function of (id, salt) — no shuffle, no
    * state, reproducible under any partitioning or retry, and STABLE
    * across corpus versions (a document keeps its split when other
    * documents are added or removed, so incremental refreshes never
    * leak val/test rows into train).
    *
    * `splits` are (name, parts-per-million) consuming consecutive
    * hash-bucket ranges in the given order; they must sum to 1e6.
    * Because ranges are consecutive, growing an EARLIER split only
    * steals rows from the split immediately after it — put train first
    * so eval sets churn minimally under re-weighing. The split table is
    * O(splits) and becomes a literal CASE chain (codegen'd), never a
    * join. `rankExpr` defaults to xxhash64 (the scale path); pass a
    * SQL-portable hash for oracle parity. */
  def splitAssign(df: DataFrame, id: Column, splits: Seq[(String, Long)],
                  salt: String = "#split", seed: Long = 42L,
                  rankExpr: Option[Column] = None): DataFrame = {
    require(splits.nonEmpty && splits.map(_._2).sum == 1000000L,
      "split weights are parts-per-million and must sum to 1000000")
    val h = rankExpr.getOrElse(xxhash64(concat(id.cast("string"), lit(salt)), lit(seed)))
    val bucket = pmod(h, lit(1000000L))
    val cum = splits.map(_._2).scanLeft(0L)(_ + _).tail
    val label = splits.init.zip(cum.init).foldRight(lit(splits.last._1): Column) {
      case (((name, _), hi), acc) => when(bucket < hi, lit(name)).otherwise(acc)
    }
    df.withColumn("split", label)
  }

  /** Keep the `n` rows with the smallest rank-hash per stratum.
    * `rankExpr` defaults to xxhash64(id, seed) (the scale path); pass a
    * SQL-portable hash (e.g. `Dedup.polyTokenId` over the id rendered as
    * a string) when oracle parity is required. Ties (hash collisions)
    * break on the id itself, so the output is a total function of the
    * input set. */
  def stratified(df: DataFrame, stratum: Column, id: Column, n: Int,
                 seed: Long = 42L, salts: Int = 64,
                 rankExpr: Option[Column] = None): DataFrame = {
    require(n > 0, s"sample size must be positive: $n")
    require(salts > 0, s"salt count must be positive: $salts")
    val salted = df
      .withColumn("__rank_h", rankExpr.getOrElse(xxhash64(id, lit(seed))))
      .withColumn("__salt", pmod(xxhash64(id, lit(seed + 1)), lit(salts.toLong)))
    val local = salted
      .withColumn("__rn", row_number().over(
        Window.partitionBy(stratum, col("__salt")).orderBy(col("__rank_h"), id)))
      .filter(col("__rn") <= n)
      .drop("__rn")
    local
      .withColumn("__rn", row_number().over(
        Window.partitionBy(stratum).orderBy(col("__rank_h"), id)))
      .filter(col("__rn") <= n)
      .drop("__rn", "__salt", "__rank_h")
  }
}
