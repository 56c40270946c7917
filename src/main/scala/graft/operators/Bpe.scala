package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING: iteratively find the most
  * frequent adjacent token pair and merge its greedy left-to-right
  * non-overlapping occurrences (Sennrich et al. 2016 — public
  * algorithm). `TextAnalysis.topPairs` is one selection step; this is
  * the full loop, the "train a tokenizer on the corpus" stage of an
  * LLM data pipeline.
  *
  * The merge itself is SET-ORIENTED, not a per-document fold: greedy
  * non-overlapping matching has a closed form over positions — inside
  * every maximal run of consecutive pair-matches, exactly the odd
  * (1-based) offsets merge ("a a a" matches at 1,2 but only 1 merges).
  * Runs are gaps-and-islands over two window functions, so a document
  * is never folded on the driver and a 10^12-token corpus merges in
  * one distributed pass per round.
  *
  * Shuffle audit (asserted in BpeSpec): the three windows partition by
  * (doc), (doc, m), (doc, island) — HashPartitioning(doc) satisfies the
  * wider clusterings, so one round = ONE window shuffle (+ the
  * partial-aggregable pair count). The per-round 1-row collect of the
  * winning pair is BPE's inherent sequential control dependency, not a
  * driver-side data path. Lineage is truncated every few rounds so long
  * trainings (vocab-size merges) don't accumulate a 2k-deep plan.
  */
object Bpe {

  /** Positional token table (doc_id, pos, token) — whitespace
    * tokenization, consistent with `TextAnalysis.tokens`. */
  def tokenTable(df: DataFrame, id: Column, text: Column): DataFrame =
    df.select(id.as("doc_id"), posexplode(split(text, " ")))
      .toDF("doc_id", "pos", "token")

  /** Adjacent-pair counts over a positional token table. Pair identity
    * is (left, right) as two columns — immune to tokens that themselves
    * contain the join separator after earlier merges. */
  def pairCounts(tok: DataFrame): DataFrame = {
    val wDoc = Window.partitionBy("doc_id").orderBy("pos")
    tok.withColumn("nxt", lead(col("token"), 1).over(wDoc))
      .where(col("nxt").isNotNull)
      .groupBy(col("token").as("pair_l"), col("nxt").as("pair_r"))
      .agg(count(lit(1)).as("n"))
  }

  /** One greedy merge round: replace left-to-right non-overlapping
    * occurrences of (pa, pb) with the single token "pa pb". Positions
    * keep their original values (gaps are fine — only order matters). */
  def mergeRound(tok: DataFrame, pa: String, pb: String): DataFrame =
    mergeRoundMulti(tok, Seq((pa, pb)))

  /** One pass merging SEVERAL pairs at once. Correct exactly when the
    * pairs are pairwise non-interacting in the output-inclusive sense
    * (see [[interacts]]): then no position can match two selected pairs,
    * every island of consecutive matches belongs to a single pair (two
    * consecutive matches share their middle token, which disjointness
    * forbids across pairs), and no pair's merge creates or destroys
    * another selected pair's occurrences — so one multi-pair pass equals
    * the pair-by-pair sequence. [[learnBpeBatched]] enforces the
    * precondition; callers composing this directly must too. */
  def mergeRoundMulti(tok: DataFrame, pairs: Seq[(String, String)]): DataFrame = {
    require(pairs.nonEmpty, "pairs must be non-empty")
    val wDoc = Window.partitionBy("doc_id").orderBy("pos")
    val wM = Window.partitionBy("doc_id", "m").orderBy("pos")
    val isMatch = pairs.map { case (pa, pb) =>
      col("token") === pa && col("nxt") === pb
    }.reduce(_ || _)
    val marked = tok
      .withColumn("nxt", lead(col("token"), 1).over(wDoc))
      .withColumn("m", when(isMatch, 1).otherwise(0))
      .withColumn("rn", row_number().over(wDoc))
      .withColumn("rnm", when(col("m") === 1, row_number().over(wM)))
      .withColumn("island", col("rn") - col("rnm"))
    val wIsland = Window.partitionBy("doc_id", "island").orderBy("pos")
    marked
      .withColumn("mrg",
        when(col("m") === 1 && row_number().over(wIsland) % 2 === 1, 1).otherwise(0))
      .withColumn("pmrg", lag(col("mrg"), 1, 0).over(wDoc))
      .where(col("pmrg") === 0)
      .select(col("doc_id"), col("pos"),
        when(col("mrg") === 1, concat(col("token"), lit(" "), col("nxt")))
          .otherwise(col("token")).as("token"))
  }

  /** Train `rounds` merges; returns (round, pair_l, pair_r, n) — the
    * merge table, in learned order. Selection tie-break (n desc, l asc,
    * r asc) is total, so training is deterministic under any
    * partitioning. Stops early when no pair remains. */
  def learnBpe(df: DataFrame, id: Column, text: Column, rounds: Int,
               checkpointEvery: Int = 8): DataFrame = {
    require(rounds > 0, s"rounds must be positive: $rounds")
    val spark = df.sparkSession
    import spark.implicits._
    var tok = tokenTable(df, id, text)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val top = pairCounts(tok)
        .orderBy(col("n").desc, col("pair_l").asc, col("pair_r").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, rr, n) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((r, l, rr, n))
        tok = mergeRound(tok, l, rr)
        if (r % checkpointEvery == 0) tok = tok.localCheckpoint()
      }
      r += 1
    }
    merges.toSeq.toDF("round", "pair_l", "pair_r", "n")
  }

  /** Output-inclusive interaction test between two merge pairs: they
    * interact iff they share any token among {left, right, merged
    * output}. When FALSE for every pair in a set, one
    * [[mergeRoundMulti]] pass provably equals applying the pairs
    * sequentially in any order: no position matches two pairs, islands
    * are single-pair (consecutive matches share their middle token),
    * and no merge creates or destroys another selected pair's
    * occurrences (created adjacencies involve only the new output
    * token; destroyed ones involve a consumed input token — both
    * excluded from the other pair's token set). */
  def interacts(p: (String, String), q: (String, String)): Boolean = {
    val ps = Set(p._1, p._2, p._1 + " " + p._2)
    val qs = Set(q._1, q._2, q._1 + " " + q._2)
    (ps & qs).nonEmpty
  }

  /** BPE training at VOCAB SCALE: per pass, select the top-`batch`
    * pairwise NON-INTERACTING pairs (by the same total order as
    * [[learnBpe]]) and merge them all in ONE corpus pass — a 32k-merge
    * training becomes ~32k/batch Spark jobs instead of 32k. Returns
    * (round, pass, pair_l, pair_r, n): `round` is the global merge
    * order, `pass` the corpus pass that learned it.
    *
    * Exactness: APPLYING the selected pairs is provably order-safe
    * ([[interacts]]; equality-tested vs the sequential loop). SELECTION
    * is per-pass-snapshot — the standard industrial approximation: a
    * pair created by an earlier merge in the same pass (one involving a
    * new output token) only becomes a candidate next pass, so the
    * learned sequence can deviate from [[learnBpe]]'s when such a pair
    * would have out-ranked a later batch member. Counts recorded ARE
    * exact for the table they were measured on (non-interaction keeps
    * them invariant across the batch). Use [[learnBpe]] when bit-exact
    * sequential semantics matter; this when the corpus is large.
    *
    * The other standard scale lever composes freely: sample-then-train
    * (see [[learnBpeSampled]]) bounds the corpus a pass scans, batching
    * bounds the number of passes. */
  def learnBpeBatched(df: DataFrame, id: Column, text: Column, merges: Int,
                      batch: Int = 16, checkpointEvery: Int = 4): DataFrame = {
    require(merges > 0 && batch >= 1, s"merges=$merges batch=$batch")
    val spark = df.sparkSession
    import spark.implicits._
    var tok = tokenTable(df, id, text)
    val learned = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, String, String, Long)]
    var pass = 1
    var exhausted = false
    while (learned.size < merges && !exhausted) {
      val want = math.min(batch, merges - learned.size)
      // 4× headroom over the batch so interaction skips rarely starve a
      // pass; if they do, the pass just merges fewer pairs — correctness
      // never depends on the headroom, only pass count does
      val cand = pairCounts(tok)
        .orderBy(col("n").desc, col("pair_l").asc, col("pair_r").asc)
        .limit(want * 4).collect()
      if (cand.isEmpty) exhausted = true
      else {
        val selected = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
        val it = cand.iterator
        while (selected.size < want && it.hasNext) {
          val r = it.next()
          val p = (r.getString(0), r.getString(1))
          if (!selected.exists(s => interacts((s._1, s._2), p)))
            selected += ((p._1, p._2, r.getLong(2)))
        }
        selected.foreach { case (l, r, n) =>
          learned += ((learned.size + 1, pass, l, r, n))
        }
        tok = mergeRoundMulti(tok, selected.map(s => (s._1, s._2)).toSeq)
        if (pass % checkpointEvery == 0) tok = tok.localCheckpoint()
      }
      pass += 1
    }
    learned.toSeq.toDF("round", "pass", "pair_l", "pair_r", "n")
  }

  /** Sample-then-train: learn merges on a deterministic Bernoulli
    * document sample (xxhash64(id, seed) — partition-invariant, the
    * repo's F7 sampling convention), then [[applyMerges]] the learned
    * table to the FULL corpus. Pair frequencies concentrate (each
    * document contributes independently), so a 1% sample of a 100 TB
    * corpus learns essentially the same merge table at 1% of the
    * per-pass scan cost — the standard way real tokenizers are trained. */
  def learnBpeSampled(df: DataFrame, id: Column, text: Column, merges: Int,
                      fraction: Double, seed: Long = 42L, batch: Int = 16): DataFrame = {
    require(fraction > 0 && fraction <= 1, s"fraction=$fraction")
    val sample = df.where(
      pmod(xxhash64(id, lit(seed)), lit(1000000L)) < lit((fraction * 1000000).toLong))
    learnBpeBatched(sample, id, text, merges, batch)
  }

  /** Apply a learned merge table to (possibly different) text — the
    * inference half: replay merges in learned order. */
  def applyMerges(df: DataFrame, id: Column, text: Column,
                  merges: Seq[(String, String)]): DataFrame =
    merges.foldLeft(tokenTable(df, id, text)) { case (tok, (l, r)) => mergeRound(tok, l, r) }
}
