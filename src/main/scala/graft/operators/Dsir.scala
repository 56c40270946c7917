package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
  * arXiv:2302.03169): given a small TARGET corpus (the domain you want
  * more of) and a huge RAW corpus, weight every raw document by how
  * target-like its hashed n-gram distribution is, then keep the top
  * weighted slice. The standard "make the pretraining mix look like
  * the eval domain" selection operator.
  *
  * Features are hashed unigrams + bigrams (the paper's choice): each
  * n-gram maps to one of `buckets` slots via the SQL-portable
  * polynomial hash ([[Dedup.polyTokenId]] mod B — zero vocabulary
  * state, reproducible in any engine). Both corpora reduce to B-row
  * bucket-count tables; the per-bucket importance ratio with add-1
  * smoothing is
  *
  *   ratio_ppm(b) = ⌊ (ct(b)+1)·(Nr+B)·10^6 / ((cr(b)+1)·(Nt+B)) ⌋
  *
  * (ct/cr = target/raw bucket counts, Nt/Nr = total feature counts) —
  * computed in DECIMAL(38,0), so it stays exact to Nt·Nr·10^6 < 10^38,
  * far past 100 TB. A document's importance score is the MEAN
  * ratio_ppm over its features. The paper scores with Σ log-ratios;
  * log-space needs floats (not hash-stable cross-engine — the
  * [[TextAnalysis.lmScore]] precedent), and the mean ratio is the same
  * kind of monotone "more target-mass ⇒ higher score" signal, exact in
  * integers. Selection is deterministic top-k (DSIR's temperature→0
  * limit); for sampled selection, Efraimidis–Spirakis keys
  * (u^{1/w}, u from xxhash64) drop in where ranking does.
  *
  * Scale shape: feature extraction is an in-row flat map (zero
  * shuffle); each corpus pays ONE partial-aggregable groupBy(bucket)
  * (B ≤ 2^20 rows out); the ratio table is broadcast (B rows by
  * construction); scoring is map-side join + one per-doc agg;
  * selection is sort+limit = TakeOrderedAndProject. No stage holds
  * unbounded state. Reference scope: beyond-reference (training-data
  * pipeline brief).
  */
object Dsir {

  /** Hashed n-gram feature stream: one row per unigram AND bigram
    * occurrence, bucketed. (doc_id, bucket) — in-row, zero shuffle. */
  def docFeatures(df: DataFrame, id: Column, text: Column, buckets: Int): DataFrame = {
    val src = Par.spread(df) // n-gram hashing is the heavy map stage
    // one JIT kernel pass per doc: unigram buckets then bigram buckets,
    // exactly explode(concat(toks, bigrams)) → pmod(polyTokenId, B)
    // (Kernels scaladoc; the interpreted per-gram per-character fold
    // dominated this operator's profile)
    val feat = Kernels.dsirBucketsKernel(buckets.toLong)
    src.select(id.as("doc_id"),
      explode(feat(TextAnalysis.tokens(text))).as("bucket"))
  }

  /** Per-bucket importance ratios (bucket, ct, cr, ratio_ppm) over the
    * union of buckets either corpus touches (≤ 2B rows). The two total
    * feature counts are control-plane scalars (two longs). */
  def bucketRatios(raw: DataFrame, target: DataFrame, id: Column, text: Column,
                   buckets: Int): DataFrame = {
    // materialize the two ≤B-row count tables once (bounded by
    // construction): each is consumed TWICE — by its total-count scalar
    // below and by the ratio join — and without the checkpoint both
    // corpus feature passes ran twice (guide §1.2 step 1: don't compute
    // things twice; §5: cutting lineage of a tiny reused frame is free)
    val tf = docFeatures(target, id, text, buckets)
      .groupBy("bucket").agg(count(lit(1)).as("ct")).localCheckpoint()
    val rf = docFeatures(raw, id, text, buckets)
      .groupBy("bucket").agg(count(lit(1)).as("cr")).localCheckpoint()
    // totals re-aggregate the ≤B-row count tables: bounded by construction
    val nt = tf.agg(coalesce(sum("ct"), lit(0L))).head.getLong(0)
    val nr = rf.agg(coalesce(sum("cr"), lit(0L))).head.getLong(0)
    tf.join(rf, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("ct"), lit(0L)).as("ct"),
        coalesce(col("cr"), lit(0L)).as("cr"))
      .withColumn("ratio_ppm", expr(
        s"cast((cast(ct + 1 as decimal(38,0)) * ${nr + buckets} * 1000000) div " +
          s"(cast(cr + 1 as decimal(38,0)) * ${nt + buckets}) as bigint)"))
  }

  /** Importance score per document of `df` against precomputed ratios:
    * (doc_id, n_features, score_ppm). The ratio table is broadcast —
    * ≤ 2B rows by construction — so scoring never shuffles the corpus
    * except the one per-doc aggregation. Buckets unseen by either
    * training corpus (scoring a third corpus) fall back to the neutral
    * both-unseen ratio carried in `defaultRatioPpm`. */
  def scoreAgainst(df: DataFrame, ratios: DataFrame, id: Column, text: Column,
                   buckets: Int, defaultRatioPpm: Long): DataFrame =
    docFeatures(df, id, text, buckets)
      .join(broadcast(ratios.select(col("bucket"), col("ratio_ppm"))), Seq("bucket"), "left_outer")
      .withColumn("ratio_ppm", coalesce(col("ratio_ppm"), lit(defaultRatioPpm)))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_features"),
        expr("sum(ratio_ppm) div count(1)").as("score_ppm"))

  /** End-to-end: score every raw document against the target corpus. */
  def importanceScores(raw: DataFrame, target: DataFrame, id: Column, text: Column,
                       buckets: Int = 1024): DataFrame = {
    val ratios = bucketRatios(raw, target, id, text, buckets)
    // raw's own buckets are always present in the ratio table, so the
    // default is never hit here; pass the neutral ratio for the contract
    scoreAgainst(raw, ratios, id, text, buckets, defaultRatioPpm = 1000000L)
  }

  /** Deterministic top-k selection (sort+limit ⇒ TakeOrderedAndProject;
    * ties broken by doc_id for reproducibility). */
  def selectTopK(scores: DataFrame, k: Int): DataFrame =
    scores.orderBy(col("score_ppm").desc, col("doc_id").asc).limit(k)
}
