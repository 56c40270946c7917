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
  def mergeRound(tok: DataFrame, pa: String, pb: String): DataFrame = {
    val wDoc = Window.partitionBy("doc_id").orderBy("pos")
    val wM = Window.partitionBy("doc_id", "m").orderBy("pos")
    val marked = tok
      .withColumn("nxt", lead(col("token"), 1).over(wDoc))
      .withColumn("m", when(col("token") === pa && col("nxt") === pb, 1).otherwise(0))
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

  /** Apply a learned merge table to (possibly different) text — the
    * inference half: replay merges in learned order. */
  def applyMerges(df: DataFrame, id: Column, text: Column,
                  merges: Seq[(String, String)]): DataFrame =
    merges.foldLeft(tokenTable(df, id, text)) { case (tok, (l, r)) => mergeRound(tok, l, r) }
}
