package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over an embedding column (Array[Float]).
  *
  * Determinism convention: embeddings are quantized to integers
  * (round(x*1000)) before the dot product, so similarity scores are
  * exact integer arithmetic — bit-identical across engines, partial-agg
  * orders, and the SQL oracle. Cosine on L2-normalized inputs is
  * order-equivalent to the dot product, so top-k is unaffected.
  *
  *  - brute-force top-k: probes × corpus join (the correctness
  *    baseline; bounded by the probe set);
  *  - LSH-bucketed ANN (scale path): sign-bit bucket on leading
  *    dimensions (fixed deterministic hyperplanes) → join only within
  *    buckets; candidate volume drops 2^bits-fold.
  */
object Similarity {

  /** exact integer dot product of two float-array columns */
  def qdot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) =>
        round(x.cast("double") * 1000).cast("long") * round(y.cast("double") * 1000).cast("long")),
      lit(0L), (acc, x) => acc + x)

  /** Brute-force top-k neighbors for a probe set. */
  def bruteForceTopK(corpus: DataFrame, probes: DataFrame, k: Int): DataFrame = {
    val c = corpus.select(col("vec_id").as("nid"), col("embedding").as("emb_n"))
    val p = probes.select(col("vec_id").as("qid"), col("embedding").as("emb_q"))
    val pairs = p.crossJoin(c).filter(col("qid") =!= col("nid"))
      .withColumn("dot", qdot(col("emb_q"), col("emb_n")))
    val w = Window.partitionBy("qid").orderBy(col("dot").desc, col("nid"))
    pairs.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("qid"), col("nid"), col("dot"), col("rn"))
  }

  /** Sign-bit LSH bucket over the first `bits` dimensions. */
  def signBucket(emb: Column, bits: Int = 8): Column =
    (0 until bits).map(i =>
      when(element_at(emb, i + 1) > 0f, lit(1L << i)).otherwise(lit(0L))).reduce(_ + _)

  /** LSH-bucketed ANN: probes join the corpus only within their bucket.
    * Recall < 1 by construction (scale/recall tradeoff); k=1 default. */
  def lshTopK(corpus: DataFrame, probes: DataFrame, k: Int, bits: Int = 8): DataFrame = {
    val c = corpus.select(col("vec_id").as("nid"), col("embedding").as("emb_n"),
      signBucket(col("embedding"), bits).as("bucket"))
    val p = probes.select(col("vec_id").as("qid"), col("embedding").as("emb_q"),
      signBucket(col("embedding"), bits).as("bucket"))
    val pairs = p.join(c, "bucket").filter(col("qid") =!= col("nid"))
      .withColumn("dot", qdot(col("emb_q"), col("emb_n")))
    val w = Window.partitionBy("qid").orderBy(col("dot").desc, col("nid"))
    pairs.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("qid"), col("nid"), col("dot"), col("rn"))
  }

  /** Embedding-cosine near-duplicate pairs: quantized-dot threshold
    * within LSH buckets (the near-dup flavor of the same machinery). */
  def cosineNearDups(corpus: DataFrame, minDot: Long, bits: Int = 8): DataFrame = {
    val c = corpus.select(col("vec_id"), col("embedding"),
      signBucket(col("embedding"), bits).as("bucket"))
    val a = c.select(col("vec_id").as("id_a"), col("embedding").as("emb_a"), col("bucket"))
    val b = c.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"), col("bucket"))
    a.join(b, "bucket").filter(col("id_a") < col("id_b"))
      .withColumn("dot", qdot(col("emb_a"), col("emb_b")))
      .filter(col("dot") >= minDot)
      .select(col("id_a"), col("id_b"), col("dot"))
  }
}
