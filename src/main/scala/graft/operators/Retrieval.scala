package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Sparse lexical retrieval over the document corpus — BM25, the
  * ranking function behind every RAG/BEIR-style keyword retriever. The
  * engine's other text scorers (TF-IDF argmax, quality, LM fluency) are
  * per-document; this one ranks documents AGAINST A QUERY, which is the
  * missing retrieval half.
  *
  * Integer-exact formulation (the repo-wide determinism convention —
  * cross-engine bit-identical, DuckDB-oracled):
  *  - idf: floor-log2 via bitlength of the Robertson ratio
  *    (2N−2df+1)/(2df+1) (the exact integer form of
  *    (N−df+0.5)/(df+0.5); bitlength == 1+floor(log2), the same device
  *    as the HLL rho). Terms in more than half the corpus get idf 0 —
  *    the BM25-idf-floor convention (Lucene clamps negatives the same
  *    way).
  *  - tf normalization: k1=1.2 and b=0.75 as ppm fixed-point with
  *    `div`, evaluated in one documented operand order:
  *    ratio_ppm  = dl·10^12 div avgdl_ppm
  *    norm_ppm   = 250000 + 750·ratio_ppm div 1000
  *    den_ppm    = tf·10^6 + 1200·norm_ppm div 1000
  *    tfc_ppm    = tf·2 200 000·10^6 div den_ppm      (= tf(k1+1)/den)
  *    score_ppm  = Σ_terms idf_bits · tfc_ppm
  *  Overflow headroom: dl·10^12 needs dl < 9.2·10^6 tokens/doc and
  *  tf·2.2·10^12 needs tf < 4·10^6 — both orders of magnitude beyond
  *  real documents.
  *
  * Scale shape: tokenization is an in-row flat map; the query-term
  * semi-join prunes the token stream map-side (broadcast); df/tf/dl are
  * three partial-aggregable hash aggs; corpus stats (N, avgdl) are a
  * one-row broadcast cross join; final top-k is a per-query-scoped
  * window over only the scored (doc × matched-term) rows. No global
  * sort, no cartesian.
  *
  * Reference analog: none (beyond-reference retrieval operator).
  */
object Retrieval {

  /** floor-log2-based integer idf over columns `n_docs` and `df`:
    * bitlength((2N−2df+1) div (2df+1)), 0 when the ratio is < 1
    * (df > ~N/2). */
  private def idfBits: Column = {
    val q = expr("(2 * n_docs - 2 * df + 1) div (2 * df + 1)")
    when(q <= 0, lit(0L)).otherwise(length(conv(q, 10, 2)).cast("long"))
  }

  /** BM25 top-k: score every document of `docs` against the (small)
    * one-column `queryTerms` DataFrame; returns the topK docs by
    * (score_ppm desc, doc id) with the matched-term count.
    * Output: (doc_id, n_terms, score_ppm, rn). */
  def bm25TopK(docs: DataFrame, id: Column, text: Column,
               queryTerms: DataFrame, topK: Int): DataFrame = {
    val tok = docs.select(id.as("doc_id"), explode(split(text, " ")).as("term"))
    val dl = tok.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    // one-row corpus stats, broadcast everywhere they appear
    val stats = dl.agg(count(lit(1)).as("n_docs"),
      expr("(sum(dl) * 1000000) div count(1)").as("avgdl_ppm"))
    val qt = broadcast(queryTerms.select(col(queryTerms.columns.head).as("term")))
    val matched = tok.join(qt, "term") // map-side prune to query terms
    val tf = matched.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dft = matched.select("doc_id", "term").distinct()
      .groupBy("term").agg(count(lit(1)).as("df"))
    // dft is ≤ |query terms| rows (broadcast); dl is CORPUS-sized — it
    // joins tf on doc_id as a plain shuffle join (both sides hash on
    // doc_id; AQE may still broadcast it at small scale, but nothing
    // forces a corpus-sized build side); the one-row stats ride as a
    // broadcast cross join
    val scored = tf
      .join(broadcast(dft), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("idf_bits", idfBits)
      .withColumn("ratio_ppm", expr("(dl * 1000000000000) div avgdl_ppm"))
      .withColumn("norm_ppm", expr("250000 + (750 * ratio_ppm) div 1000"))
      .withColumn("den_ppm", expr("tf * 1000000 + (1200 * norm_ppm) div 1000"))
      .withColumn("tfc_ppm", expr("(tf * 2200000 * 1000000) div den_ppm"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_terms"),
        sum(expr("idf_bits * tfc_ppm")).as("score_ppm"))
    // global top-k via sort+limit = TakeOrderedAndProject (per-partition
    // heaps, never a global sort — a stopword query matches the whole
    // corpus, so the scored table can be corpus-sized); the rank window
    // then runs over exactly topK rows
    val top = scored.orderBy(col("score_ppm").desc, col("doc_id")).limit(topK)
    top.withColumn("rn",
      row_number().over(Window.orderBy(col("score_ppm").desc, col("doc_id")))
        .cast("long"))
  }

  /** Batched multi-query BM25 — real retrieval evals score MANY
    * queries per corpus pass. `queries` carries (query_id, term) rows
    * (first two columns, any names); scoring arithmetic is identical
    * to [[bm25TopK]] per query.
    *
    * Scale shape: the per-(doc, term) contribution idf·tfc is
    * query-INDEPENDENT, so it is computed once over the distinct term
    * set of all queries (one corpus pass, same three hash aggs as the
    * single-query path) and only then fanned out to the query-term
    * table (a broadcast join on term — the query table is eval-sized,
    * not corpus-sized). Per-query top-k is the partial-aggregable
    * [[graft.functions.TopKAgg]]: each task keeps ≤ k rows of state
    * per query, so the final shuffle carries ≤ k·|queries| rows —
    * never the scored table, never a per-query sort of it (a stopword
    * term can make `scored` corpus-sized × |queries|).
    *
    * Output: (query_id, rn, doc_id, score_ppm), rn 1..topK by
    * (score_ppm desc, doc_id asc) within each query. */
  def bm25MultiTopK(docs: DataFrame, id: Column, text: Column,
                    queries: DataFrame, topK: Int): DataFrame = {
    val tok = docs.select(id.as("doc_id"), explode(split(text, " ")).as("term"))
    val dl = tok.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"),
      expr("(sum(dl) * 1000000) div count(1)").as("avgdl_ppm"))
    val qt = queries.select(col(queries.columns(0)).as("query_id"),
      col(queries.columns(1)).as("term"))
    val matched = tok.join(broadcast(qt.select("term").distinct()), "term")
    val tf = matched.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dft = matched.select("doc_id", "term").distinct()
      .groupBy("term").agg(count(lit(1)).as("df"))
    val contrib = tf
      .join(broadcast(dft), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("idf_bits", idfBits)
      .withColumn("ratio_ppm", expr("(dl * 1000000000000) div avgdl_ppm"))
      .withColumn("norm_ppm", expr("250000 + (750 * ratio_ppm) div 1000"))
      .withColumn("den_ppm", expr("tf * 1000000 + (1200 * norm_ppm) div 1000"))
      .withColumn("contrib_ppm", expr("idf_bits * ((tf * 2200000 * 1000000) div den_ppm)"))
      .select("doc_id", "term", "contrib_ppm")
    val scored = contrib.join(broadcast(qt), "term")
      .groupBy("query_id", "doc_id").agg(sum("contrib_ppm").as("score_ppm"))
    graft.functions.TopKAgg.groupTopK(scored, col("query_id"), col("score_ppm"),
        col("doc_id"), topK)
      .select(col("g").as("query_id"), col("rn"), col("id").as("doc_id"),
        col("v").as("score_ppm"))
  }
}
