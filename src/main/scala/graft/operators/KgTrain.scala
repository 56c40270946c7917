package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** KG-embedding training-pair generation — the step between a
  * materialized triple table and a TransE/DistMult-style trainer:
  * every positive (h, r, t) needs corrupted negatives (random head or
  * tail replacement; Bordes et al. 2013, "Translating Embeddings for
  * Modeling Multi-relational Data"), and the standard "filtered"
  * protocol (Bordes et al.; formalized in Dettmers et al. 2018)
  * requires knowing whether a corruption accidentally reconstructs a
  * TRUE triple — such false negatives poison the margin loss and must
  * be flagged (training) or excluded from ranking (eval).
  *
  * Determinism: the corrupted entity is
  * `sha256-52bit(h || '|' || r || '|' || t || '|' || side) mod nEntities`
  * — the [[Sketch.regRho]] hash-slice convention, so draws are
  * reproducible across runs, partitionings, and engines (the DuckDB
  * oracle replays them bit-for-bit).
  *
  * Scale shape: corruption is a per-row projection (zero shuffle); the
  * filtered flag is ONE left-semi-style join of the corrupted pairs
  * against the triple table on the full (h, r, t) key — the same
  * equi-join any dedup pays, AQE-handled when the true set is small.
  * Nothing enumerates the entity vocabulary per row.
  */
object KgTrain {

  private def hash52(c: Column): Column =
    conv(substring(sha2(c, 256), 1, 13), 16, 10).cast("long")

  /** One tail- and one head-corrupted negative per positive triple:
    * (h, r, t, t_neg, h_neg, t_neg_is_true, h_neg_is_true) where the
    * `_is_true` flags mark corruptions that collide with an existing
    * true triple (the "filtered" protocol's false negatives). Entity
    * ids must live in [0, nEntities). */
  def corruptedNegatives(triples: DataFrame, h: Column, r: Column, t: Column,
                         nEntities: Long): DataFrame = {
    require(nEntities > 0, s"nEntities=$nEntities")
    val base = triples.select(h.cast("long").as("h"), r.cast("string").as("r"),
      t.cast("long").as("t")).distinct()
    val corrupted = base
      .withColumn("t_neg", pmod(hash52(concat_ws("|",
        col("h"), col("r"), col("t"), lit("T"))), lit(nEntities)))
      .withColumn("h_neg", pmod(hash52(concat_ws("|",
        col("h"), col("r"), col("t"), lit("H"))), lit(nEntities)))
    val truth = base.select(col("h").as("th"), col("r").as("tr"), col("t").as("tt"))
    corrupted
      .join(truth.select(col("th"), col("tr"), col("tt").as("t_hit")),
        col("h") === col("th") && col("r") === col("tr") &&
          col("t_neg") === col("t_hit"), "left_outer")
      .withColumn("t_neg_is_true", col("t_hit").isNotNull)
      .drop("th", "tr", "t_hit")
      .join(truth.select(col("th").as("h_hit"), col("tr"), col("tt")),
        col("h_neg") === col("h_hit") && col("r") === col("tr") &&
          col("t") === col("tt"), "left_outer")
      .withColumn("h_neg_is_true", col("h_hit").isNotNull)
      .drop("h_hit", "tr", "tt")
  }
}
