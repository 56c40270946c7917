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

  /** Exact integer dot product of two float-array columns. The
    * rounding-sensitive quantization (round(x·1000), half-up) stays in
    * the Column path (Ivf.quantize); the 64-multiply fold runs as a
    * JIT-compiled kernel instead of an interpreted CodegenFallback
    * zip_with/aggregate chain (guide §1.2 per-task work; measured
    * ~40 µs → <1 µs per 64-dim pair). Hot pair-join call sites
    * pre-quantize each side once before the join and call
    * [[Kernels.dotQ]] directly. */
  def qdot(a: Column, b: Column): Column =
    Kernels.dotQ(Ivf.quantize(a), Ivf.quantize(b))

  /** Brute-force top-k neighbors for a probe set. */
  def bruteForceTopK(corpus: DataFrame, probes: DataFrame, k: Int): DataFrame = {
    val c = corpus.select(col("vec_id").as("nid"), Ivf.quantize(col("embedding")).as("qn"))
    val p = probes.select(col("vec_id").as("qid"), Ivf.quantize(col("embedding")).as("qq"))
    val pairs = p.crossJoin(c).filter(col("qid") =!= col("nid"))
      .withColumn("dot", Kernels.dotQ(col("qq"), col("qn")))
    val w = Window.partitionBy("qid").orderBy(col("dot").desc, col("nid"))
    pairs.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("qid"), col("nid"), col("dot"), col("rn"))
  }

  /** Hard-negative mining for contrastive training: for each probe, the
    * top-k most SIMILAR corpus vectors with a DIFFERENT label — the
    * near-miss negatives that actually move a contrastive loss (random
    * negatives are trivially separable). Same quantized-int dot and
    * per-probe window as [[bruteForceTopK]] with the label-inequality
    * predicate inside the pair filter. This brute path is the exact
    * verification baseline; at corpus scale use [[hardNegativesLsh]]
    * (same semantics over bucketed candidates, sublinear). */
  def hardNegatives(corpus: DataFrame, probes: DataFrame, k: Int): DataFrame = {
    val c = corpus.select(col("vec_id").as("nid"), Ivf.quantize(col("embedding")).as("qn"),
      col("label").as("lbl_n"))
    val p = probes.select(col("vec_id").as("qid"), Ivf.quantize(col("embedding")).as("qq"),
      col("label").as("lbl_q"))
    val pairs = p.crossJoin(c)
      .filter(col("qid") =!= col("nid") && col("lbl_q") =!= col("lbl_n"))
      .withColumn("dot", Kernels.dotQ(col("qq"), col("qn")))
    val w = Window.partitionBy("qid").orderBy(col("dot").desc, col("nid"))
    pairs.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("qid"), col("nid"), col("dot"), col("rn"))
  }

  /** Sign-bit LSH bucket over the first `bits` dimensions. */
  def signBucket(emb: Column, bits: Int = 8): Column =
    (0 until bits).map(i =>
      when(element_at(emb, i + 1) > 0f, lit(1L << i)).otherwise(lit(0L))).reduce(_ + _)

  /** Corpus-scaled bucket width: enough bits that the average bucket
    * holds ~targetBucketSize vectors (candidate volume per probe), so
    * the same call sites stay right from 10^3 to 10^9 vectors. Clamped
    * to [2, 24]. */
  def bitsFor(corpusSize: Long, targetBucketSize: Long = 4096L): Int = {
    val buckets = math.max(1.0, corpusSize.toDouble / targetBucketSize)
    math.min(24, math.max(2, math.ceil(math.log(buckets) / math.log(2)).toInt))
  }

  /** All XOR masks within Hamming distance `r` of 0 over `bits` bits
    * (r ≤ 2 supported — 1, bits, or bits(bits−1)/2 extra probes). */
  def probeMasks(bits: Int, r: Int): Seq[Long] = {
    require(r >= 0 && r <= 2, s"probeHamming $r not in [0,2]")
    val singles = if (r >= 1) (0 until bits).map(i => 1L << i) else Nil
    val pairs = if (r >= 2)
      for { i <- 0 until bits; j <- (i + 1) until bits } yield (1L << i) | (1L << j)
    else Nil
    0L +: (singles ++ pairs)
  }

  /** LSH-bucketed ANN: probes join the corpus only within their bucket —
    * plus, with probeHamming ≥ 1, the buckets within that Hamming
    * distance (multi-probe: the standard recall knob — a boundary
    * dimension near zero flips one bit, and the true neighbor sits one
    * bucket over). Candidate volume is (1+bits+…)/2^bits of the corpus;
    * recall < 1 by construction (scale/recall tradeoff). Recall is only
    * meaningful when neighbors are actually near (clustered corpora);
    * on isotropic random vectors no sublinear index can do well. */
  def lshTopK(corpus: DataFrame, probes: DataFrame, k: Int, bits: Int = 8,
              probeHamming: Int = 0): DataFrame =
    lshRank(corpus, probes, k, bits, probeHamming, labelAware = false)

  /** Scale path for hard-negative mining: [[lshTopK]]'s bucketed
    * candidate generation with the label-inequality predicate pushed into
    * the candidate filter — per-probe work is one bucket (× multi-probe),
    * not the corpus, so mining stays sublinear at 1M probes × 1B corpus
    * where [[hardNegatives]]' cross join is 10^15 pairs. Exactness caveat
    * is [[lshTopK]]'s: recall < 1 by construction; the brute path remains
    * the verification baseline (equality-tested on clustered corpora). */
  def hardNegativesLsh(corpus: DataFrame, probes: DataFrame, k: Int, bits: Int = 8,
                       probeHamming: Int = 0): DataFrame =
    lshRank(corpus, probes, k, bits, probeHamming, labelAware = true)

  /** Shared LSH candidate-generation + exact rescoring. `labelAware`
    * carries `label` on both sides and keeps only cross-label pairs. */
  private def lshRank(corpus: DataFrame, probes: DataFrame, k: Int, bits: Int,
                      probeHamming: Int, labelAware: Boolean): DataFrame = {
    // pre-quantize each side ONCE before the bucket join (guide §2.3:
    // the join fan-out then reuses the integer vectors; the dot is the
    // JIT kernel, not an interpreted per-pair fold)
    val c = corpus.select(Seq(col("vec_id").as("nid"),
      Ivf.quantize(col("embedding")).as("qn"),
      signBucket(col("embedding"), bits).as("bucket")) ++
      (if (labelAware) Seq(col("label").as("lbl_n")) else Nil): _*)
    val masks = probeMasks(bits, probeHamming)
    val p = probes.select(Seq(col("vec_id").as("qid"),
        Ivf.quantize(col("embedding")).as("qq"),
        explode(transform(typedlit(masks),
          m => signBucket(col("embedding"), bits).bitwiseXOR(m))).as("bucket")) ++
        (if (labelAware) Seq(col("label").as("lbl_q")) else Nil): _*)
    val filt = col("qid") =!= col("nid") &&
      (if (labelAware) col("lbl_q") =!= col("lbl_n") else lit(true))
    val joined = p.join(c, "bucket").filter(filt)
      .select(col("qid"), col("nid"), col("qq"), col("qn"))
    // a candidate can surface through several probe buckets — dedupe
    // BEFORE scoring so row_number ranks distinct neighbors (single-
    // probe can't duplicate, skip the extra shuffle there)
    val cand = if (probeHamming == 0) joined else joined.dropDuplicates("qid", "nid")
    val pairs = cand.withColumn("dot", Kernels.dotQ(col("qq"), col("qn")))
    val w = Window.partitionBy("qid").orderBy(col("dot").desc, col("nid"))
    pairs.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("qid"), col("nid"), col("dot"), col("rn"))
  }

  /** Embedding-cosine near-duplicate pairs: quantized-dot threshold
    * within LSH buckets (the near-dup flavor of the same machinery). */
  def cosineNearDups(corpus: DataFrame, minDot: Long, bits: Int = 8): DataFrame = {
    val c = corpus.select(col("vec_id"), Ivf.quantize(col("embedding")).as("qe"),
      signBucket(col("embedding"), bits).as("bucket"))
    val a = c.select(col("vec_id").as("id_a"), col("qe").as("qa"), col("bucket"))
    val b = c.select(col("vec_id").as("id_b"), col("qe").as("qb"), col("bucket"))
    a.join(b, "bucket").filter(col("id_a") < col("id_b"))
      .withColumn("dot", Kernels.dotQ(col("qa"), col("qb")))
      .filter(col("dot") >= minDot)
      .select(col("id_a"), col("id_b"), col("dot"))
  }

  /** Deterministic ±1 sign for the random-projection matrix cell
    * (j, i): parity of the first hex digit of sha256("j_i") — the same
    * rule the SQL oracle replays with substr(sha256(...), 1, 1). */
  def rpSign(j: Int, i: Int): Long = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val h = md.digest(s"${j}_$i".getBytes("UTF-8"))
    if (((h(0) >> 4) & 1) == 0) 1L else -1L
  }

  /** Johnson-Lindenstrauss random projection (Achlioptas ±1 variant):
    * compress d-dim embeddings to outDim sign-weighted sums —
    * proj_j = Σ_i sign(j,i)·q_i over the quantized (round(x*1000))
    * coordinates. Distances are preserved within (1±ε) for
    * outDim = O(log n / ε²), which is what makes 100 TB embedding
    * shuffles (LSH banding, near-dup joins, coresets) d/outDim-fold
    * cheaper: project first, shuffle the short vectors, verify survivors
    * on the full vectors.
    *
    * Scale shape: the sign matrix rides as a LITERAL (outDim·d ints,
    * driver-computed from the sha256 rule), so projection is a pure
    * map-side transform — zero shuffle, codegen-friendly, and
    * integer-exact (DuckDB-oracled). Output exploded to
    * (vec_id, j, p) rows for engine-portable comparison. */
  def randomProject(vectors: DataFrame, outDim: Int = 16): DataFrame = {
    val d = vectors.select(size(col("embedding"))).head.getInt(0)
    val signs: Array[Array[Long]] = Array.tabulate(outDim, d)((j, i) => rpSign(j, i))
    // quantization stays in the Column path; the outDim×d multiply-
    // accumulate runs as one JIT kernel pass per row instead of outDim
    // interpreted zip_with/aggregate chains (Kernels scaladoc)
    val proj = Kernels.jlProjectKernel(signs)
    vectors.select(col("vec_id"),
        posexplode(proj(Ivf.quantize(col("embedding")))).as(Seq("j", "p")))
      .select(col("vec_id"), col("j").cast("long").as("j"), col("p"))
  }
}
