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

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009) —
    * the standard hybrid-retrieval combiner: fuse the ranked lists of
    * heterogeneous retrievers (BM25 lexical + ANN dense is the classic
    * pair) without comparing their incommensurable scores. A document's
    * fused score is Σ over every list it appears in of 1/(κ + rank);
    * here in exact ppm integers: `1000000 div (κ + rn)` (κ = 60, the
    * paper's constant). Rank-only fusion makes it score-scale-free —
    * exactly why it wins over linear score interpolation in practice.
    *
    * `rankings` is the UNION of all lists: (query_id, doc_id, rn) rows
    * (first three columns, any names; rn is the 1-based rank within its
    * own list). Which retriever produced a row is irrelevant — RRF is
    * symmetric in its lists, and a doc ranked by M lists contributes M
    * reciprocal terms.
    *
    * Scale shape: the input is already top-k-sized (Σ lists k·|queries|
    * rows — never corpus-sized), so the whole fusion is ONE
    * partial-aggregable hash agg on (query_id, doc_id) plus the
    * bounded-state [[graft.functions.TopKAgg]] per-query top-k; the
    * final shuffle carries ≤ topK·|queries| rows.
    *
    * Output: (query_id, rn, doc_id, rrf_ppm), rn 1..topK by
    * (rrf_ppm desc, doc_id asc) within each query.
    * Reference analog: none (beyond-reference retrieval operator). */
  def rrfFuse(rankings: DataFrame, kRrf: Int = 60, topK: Int = 10): DataFrame = {
    require(kRrf >= 1, s"kRrf=$kRrf")
    val c = rankings.columns
    val r = rankings.select(col(c(0)).cast("long").as("query_id"),
      col(c(1)).cast("long").as("doc_id"), col(c(2)).cast("long").as("rn"))
    val scored = r
      .select(col("query_id"), col("doc_id"),
        expr(s"1000000 div ($kRrf + rn)").as("c_ppm"))
      .groupBy("query_id", "doc_id").agg(sum("c_ppm").as("rrf_ppm"))
    graft.functions.TopKAgg.groupTopK(scored, col("query_id"), col("rrf_ppm"),
        col("doc_id"), topK)
      .select(col("g").as("query_id"), col("rn"), col("id").as("doc_id"),
        col("v").as("rrf_ppm"))
  }

  /** Rank-based retrieval evaluation — MRR and recall@k of a ranked
    * run against a relevance-judgment table, both exact in integers
    * (reciprocal ranks as ppm: `1000000 div rank`; means as `div` —
    * the repo-wide cross-engine determinism convention; nDCG is
    * deliberately absent: its log2 discount forces floats).
    *
    * `run` carries (query_id, doc_id, rn) ranked rows; `qrels` carries
    * (query_id, doc_id) relevant pairs. Per query:
    *  - mrr_ppm      = 1000000 div (rank of the FIRST relevant hit),
    *                   0 when no relevant doc is retrieved;
    *  - n_rel        = total relevant docs (from qrels);
    *  - n_hit        = relevant docs retrieved at rank ≤ cutoff;
    *  - recall_ppm   = n_hit·10^6 div n_rel.
    *
    * Scale shape: run and qrels are both eval-sized (top-k·|queries|
    * and judgment-sized); one equi-join on (query_id, doc_id), one
    * hash agg per side, a broadcastable left join back to the per-query
    * qrel counts. Nothing corpus-sized. Output: (query_id, n_rel,
    * n_hit, mrr_ppm, recall_ppm) — one row per judged query. */
  def rankEval(run: DataFrame, qrels: DataFrame, cutoff: Int): DataFrame = {
    val rc = run.columns
    val r = run.select(col(rc(0)).cast("long").as("query_id"),
      col(rc(1)).cast("long").as("doc_id"), col(rc(2)).cast("long").as("rn"))
    val qc = qrels.columns
    val q = qrels.select(col(qc(0)).cast("long").as("query_id"),
      col(qc(1)).cast("long").as("doc_id"))
    val relCounts = q.groupBy("query_id").agg(count(lit(1)).as("n_rel"))
    val hits = r.join(q, Seq("query_id", "doc_id"))
      .groupBy("query_id")
      .agg(min("rn").as("first_rel"),
        sum(when(col("rn") <= cutoff, 1L).otherwise(0L)).as("n_hit"))
    relCounts.join(hits, Seq("query_id"), "left_outer")
      .select(col("query_id"), col("n_rel"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        when(col("first_rel").isNull, lit(0L))
          .otherwise(expr("1000000 div first_rel")).as("mrr_ppm"))
      .withColumn("recall_ppm", expr("(n_hit * 1000000) div n_rel"))
  }

  /** Blocked inverted index — the materialized posting-list layout
    * keyword search serves from (the artifact BM25 computes against on
    * the fly). Postings are sharded into fixed doc-id ranges of
    * `blockSize` (block = doc_id div blockSize): per aggregation buffer
    * the collected list is ≤ blockSize entries, so a stopword term —
    * whose FULL posting list is corpus-sized — never accumulates
    * unbounded state in one buffer (the same hazard class as the old
    * salted collect_set, avoided by construction). Real engines shard
    * hot posting lists exactly this way (doc-partitioned indexes).
    *
    * Within a block, ids are array_sort'ed numerically before joining —
    * collect_list is partitioning-dependent, the sort restores a
    * canonical order (the q_sequence_assembly convention), making the
    * whole index state hash-comparable cross-engine.
    *
    * Scale shape: one in-row flat map + ONE partial-aggregable hash agg
    * on (term, blk); the per-term global df joins back from a term-level
    * re-agg of the block dfs (≤ |vocab| rows, AQE-broadcastable).
    * Output: (term, blk, blk_df, df, postings). */
  def invertedIndex(docs: DataFrame, id: Column, text: Column,
                    blockSize: Int): DataFrame = {
    require(blockSize >= 1, s"blockSize=$blockSize")
    val tok = docs.select(id.cast("long").as("doc_id"),
        explode(split(text, " ")).as("term"))
      .distinct() // presence, not frequency: one posting per (term, doc)
      .withColumn("blk", expr(s"doc_id div $blockSize"))
    val blocks = tok.groupBy("term", "blk")
      .agg(count(lit(1)).as("blk_df"),
        concat_ws("|",
          transform(array_sort(collect_list(col("doc_id"))),
            x => x.cast("string"))).as("postings"))
    val dfTot = blocks.groupBy("term").agg(sum("blk_df").as("df"))
    blocks.join(dfTot, Seq("term"))
      .select("term", "blk", "blk_df", "df", "postings")
  }

  /** Conjunctive boolean retrieval (AND of all query terms): the doc
    * ids containing EVERY term of the one-column `terms` frame. The
    * broadcast term semi-join prunes the token stream map-side; a doc
    * qualifies when its distinct matched-term count equals |terms|
    * (the posting-list-intersection result, computed without
    * materializing any posting list). Output: (doc_id, n_terms). */
  def booleanAnd(docs: DataFrame, id: Column, text: Column,
                 terms: DataFrame): DataFrame = {
    val tm = terms.select(col(terms.columns.head).as("term")).distinct()
    val nq = tm.agg(count(lit(1)).as("n_q"))
    docs.select(id.cast("long").as("doc_id"),
        explode(split(text, " ")).as("term"))
      .join(broadcast(tm), "term")
      .select("doc_id", "term").distinct()
      .groupBy("doc_id").agg(count(lit(1)).as("n_terms"))
      .crossJoin(broadcast(nq))
      .filter(col("n_terms") === col("n_q"))
      .select("doc_id", "n_terms")
  }
}
