package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked fuzzy string matching — the entity-resolution candidate
  * generation + verification step (alias/label matching when two KG
  * records name the same thing with a typo'd or variant string). The
  * engine's other dedup operators key on token sets (MinHash/SimHash) or
  * exact hashes; this one matches on EDIT DISTANCE, the unit that catches
  * single-character variants token-level methods miss.
  *
  * Shape (the standard scale formulation — Papadakis et al., "Blocking
  * and Filtering Techniques for Entity Resolution", CSUR 2020):
  *  1. BLOCK: records sharing a caller-supplied deterministic block key
  *     land together (the key function is domain knowledge: a prefix, a
  *     phonetic code, a sorted-token slice). Pairs in different blocks
  *     are out of contract BY DESIGN — that recall/cost trade is the
  *     operator, not a shortcut.
  *  2. FILTER: a length lower bound |len(a)−len(b)| ≤ maxDist (every
  *     edit changes length by ≤ 1) runs inside the join before any
  *     distance evaluation.
  *  3. VERIFY: exact Levenshtein distance, evaluated with Spark's
  *     banded threshold form (O(len·maxDist) per pair instead of
  *     O(len²); pairs above the threshold return −1 and are dropped).
  *
  * Scale shape: ONE equi-join keyed on the block key (both sides hash
  * shuffle on blk — never a cartesian); per-block work is O(|block|²),
  * which `maxBlockSize` bounds explicitly: oversized blocks (the
  * "Customer#" hub prefix, an empty-string key) are EXCLUDED by a
  * partial-aggregable count + semi-join, because a 10^6-row block is a
  * 10^12-pair task no verifier survives — the standard block-purging
  * step. At 100 TB: block keys distribute the join; skewed blocks are
  * purged, not salted (salting doesn't help quadratic per-block work).
  *
  * Determinism: Levenshtein is exact integer; both Spark and DuckDB
  * implement the classic unit-cost form, so results are
  * oracle-comparable bit-for-bit (q_fuzzy_match).
  *
  * Reference analog: none (beyond-reference ER operator; nearest
  * reference concept is the label-based entity matching wdumper leaves
  * to Wikidata itself).
  */
object Fuzzy {

  /** All record pairs (id_a < id_b) sharing a block key whose keys are
    * within `maxDist` Levenshtein edits.
    *
    * @param records      input table
    * @param id           unique record id column (long-castable)
    * @param key          the string to match on (pre-normalize upstream:
    *                     lower/trim is the caller's domain decision)
    * @param blockKey     deterministic blocking function of the key
    *                     (e.g. `substring(k, 1, 16)`, a phonetic code)
    * @param maxDist      maximum edit distance (≥ 0)
    * @param maxBlockSize blocks larger than this are purged (with the
    *                     count available via `purgedBlocks`); pass
    *                     Long.MaxValue to keep all
    * Output: (id_a, id_b, key_a, key_b, dist), dist ≤ maxDist. */
  def blockedMatches(records: DataFrame, id: Column, key: Column,
                     blockKey: Column, maxDist: Int,
                     maxBlockSize: Long = Long.MaxValue): DataFrame = {
    require(maxDist >= 0, s"maxDist=$maxDist")
    require(maxBlockSize >= 1, s"maxBlockSize=$maxBlockSize")
    val recs = records.select(id.cast("long").as("rid"), key.as("k"),
      blockKey.as("blk"))
    val kept =
      if (maxBlockSize == Long.MaxValue) recs
      else recs.join(
        recs.groupBy("blk").agg(count(lit(1)).as("bsz"))
          .filter(col("bsz") <= maxBlockSize).select("blk"),
        Seq("blk"), "left_semi")
    val a = kept.select(col("blk"), col("rid").as("id_a"), col("k").as("key_a"))
    val b = kept.select(col("blk"), col("rid").as("id_b"), col("k").as("key_b"))
    a.join(b, Seq("blk"))
      .filter(col("id_a") < col("id_b"))
      .filter(abs(length(col("key_a")) - length(col("key_b"))) <= maxDist)
      .withColumn("dist",
        levenshtein(col("key_a"), col("key_b"), maxDist).cast("long"))
      .filter(col("dist") >= 0) // banded form returns −1 above threshold
      .select("id_a", "id_b", "key_a", "key_b", "dist")
  }

  /** The blocks `blockedMatches` would purge at `maxBlockSize` —
    * telemetry for choosing a better block key. Output: (blk, bsz). */
  def purgedBlocks(records: DataFrame, key: Column, blockKey: Column,
                   maxBlockSize: Long): DataFrame =
    records.select(blockKey.as("blk"))
      .groupBy("blk").agg(count(lit(1)).as("bsz"))
      .filter(col("bsz") > maxBlockSize)
}
