package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, each designed
  * around its shuffle profile at 100 TB:
  *
  *  - exact: one hash-aggregate shuffle on the content key;
  *  - MinHash+LSH: map-side signatures (no shuffle), band-bucket join
  *    (shuffle on small band keys), exact Jaccard verify only on
  *    candidates — never the O(n²) cross join;
  *  - SimHash: map-side 32-bit signature + bit_count XOR verify;
  *  - n-gram Jaccard: relational token join bounded to a grouping key.
  *
  * Two token-id strategies: xxhash64 (the scale path) and a rank-based
  * id (dense_rank over the sorted global vocabulary) that is exactly
  * reproducible in portable SQL — the DuckDB oracle uses the latter.
  */
object Dedup {

  /** Exact dedup: canonical = min(id) per identical content. */
  def exact(df: DataFrame, id: Column, content: Column): DataFrame =
    df.groupBy(content.as("content"))
      .agg(min(id).as("canonical_id"), count(lit(1)).as("n_copies"))
      .select(col("canonical_id"), col("n_copies"))

  /** (docId, token) pairs — distinct tokens per doc. */
  def docTokens(df: DataFrame, id: Column, text: Column): DataFrame =
    df.select(id.as("doc_id"), explode(array_distinct(split(text, " "))).as("token"))

  /** (doc_id, idx, chunk): overlapping sliding windows of `chunkTokens`
    * tokens advancing by `stride` — the RAG/embedding passage splitter
    * (overlap = chunkTokens - stride keeps sentences that straddle a
    * boundary retrievable from both sides). Window count is
    * `1 + ceil((len - chunkTokens) / stride)` (one window when the doc
    * fits), integer-exact so an oracle re-derives it. Pure in-row
    * array arithmetic (sequence → slice), zero shuffle: the operator
    * is a flat map whatever the corpus size. */
  def slidingChunks(df: DataFrame, id: Column, text: Column,
                    chunkTokens: Int, stride: Int): DataFrame = {
    require(chunkTokens > 0 && stride > 0, s"chunk=$chunkTokens stride=$stride")
    val len = size(col("toks"))
    val nWin = when(len <= chunkTokens, lit(1)).otherwise(
      ((len - lit(chunkTokens) + lit(stride - 1)) / lit(stride)).cast("int") + lit(1))
    df.select(id.cast("long").as("doc_id"), split(text, " ").as("toks"))
      .select(col("doc_id"), posexplode(transform(sequence(lit(0), nWin - 1),
        i => concat_ws(" ", slice(col("toks"), i * stride + 1, lit(chunkTokens))))))
      .toDF("doc_id", "idx", "chunk")
  }

  /** (doc_id, idx, chunk): each document split into fixed-size token
    * chunks (the last chunk may be short). */
  def chunks(df: DataFrame, id: Column, text: Column, chunkTokens: Int): DataFrame = {
    val nChunks = ((size(col("toks")) + lit(chunkTokens - 1)) / lit(chunkTokens)).cast("int")
    df.select(id.cast("long").as("doc_id"), split(text, " ").as("toks"))
      .select(col("doc_id"), posexplode(transform(sequence(lit(0), nChunks - 1),
        i => concat_ws(" ", slice(col("toks"), i * chunkTokens + 1, lit(chunkTokens))))))
      .toDF("doc_id", "idx", "chunk")
  }

  /** Chunk-level exact dedup (the paragraph-dedup family used on web
    * training corpora): keep only the globally FIRST occurrence of each
    * distinct chunk — first = minimal (doc_id, idx) — then reassemble
    * each document from its surviving chunks in original order.
    * Documents whose every chunk already appeared elsewhere vanish
    * entirely (pure duplicates). Returns (doc_id, text_dedup,
    * n_chunks_kept).
    *
    * Scale shape: winner selection is groupBy(chunk).agg(min(struct)) —
    * partial-aggregable, so a chunk duplicated 10^9 times combines
    * map-side into one record per partition instead of skewing a window;
    * the survivor join is keyed on the chunk (AQE skew-split covers hot
    * chunks); reassembly is one groupBy(doc_id) with an IN-ROW
    * array_sort, never a global sort. Three shuffles total, each keyed. */
  def dedupChunks(df: DataFrame, id: Column, text: Column, chunkTokens: Int): DataFrame = {
    val c = chunks(df, id, text, chunkTokens)
    val firstSeen = c.groupBy("chunk").agg(min(struct(col("doc_id"), col("idx"))).as("w"))
    c.join(firstSeen, Seq("chunk"))
      .where(struct(col("doc_id"), col("idx")) === col("w"))
      .groupBy("doc_id").agg(
        concat_ws(" ", transform(array_sort(collect_list(struct(col("idx"), col("chunk")))),
          x => x.getField("chunk"))).as("text_dedup"),
        count(lit(1)).as("n_chunks_kept"))
  }

  /** Fuzzy-dedup canonicalization: cluster documents by their near-dup
    * pair list (connected components — a pair list is NOT transitive,
    * so clusters, not pairs, are the unit a dedup pass keeps one doc
    * from), then keep the best-quality document per cluster (ties →
    * smallest doc_id). Every document not in any pair is its own
    * singleton cluster. Returns (cluster, keep_id, cluster_size,
    * best_q).
    *
    * Scale shape: CC is the O(log n)-round large/small-star plan
    * (`plans.ConnectedComponents`); the mapping join is keyed on doc id
    * and size-gated by the planner (the mapping covers only paired docs,
    * usually ≪ corpus, but is never force-broadcast); the per-cluster
    * argmax is max_by — partial-aggregable, no window. */
  def keepBestPerCluster(docs: DataFrame, pairs: DataFrame,
                         id: Column, quality: Column): DataFrame = {
    // CC's node ids are strings with lexicographic min — zero-pad so the
    // representative is the NUMERIC min id and survives the cast back
    def pad(c: Column) = lpad(c.cast("string"), 20, "0")
    val edges = pairs.select(pad(col("id_a")).as("a"), pad(col("id_b")).as("b"))
    val mapping = graft.plans.ConnectedComponents // pairs have id_a < id_b
      .run(edges, selfLoopFree = true)
      .withColumnRenamed("node", "node_id")
    docs.select(id.cast("long").as("doc_id"), quality.cast("long").as("q"))
      .join(mapping, pad(col("doc_id")) === col("node_id"), "left_outer")
      .withColumn("cluster", coalesce(col("component").cast("long"), col("doc_id")))
      .groupBy("cluster").agg(
        max_by(col("doc_id"), struct(col("q"), -col("doc_id"))).as("keep_id"),
        count(lit(1)).as("cluster_size"),
        max(col("q")).as("best_q"))
  }

  /** Rank-based token ids: dense_rank over the sorted distinct global
    * vocabulary. One extra shuffle over the (small) vocabulary; portable
    * to the SQL oracle. */
  def rankTokenIds(tok: DataFrame): DataFrame = {
    val vocab = tok.select("token").distinct()
      .withColumn("token_id", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy("token")).cast("long"))
    tok.join(vocab, "token")
  }

  /** SQL-portable map-side token hash: polynomial codepoint hash
    * h = fold(h*31 + codepoint) mod P over a LARGE prime. No global
    * vocabulary state (unlike rankTokenIds' window) — same zero-shuffle
    * profile as xxhash64 — while staying integer-reproducible in any SQL
    * engine (the DuckDB oracle mirrors it with list_reduce/ord).
    *
    * P sizing: with a ~1M-token vocabulary the birthday bound gives
    * V²/2P expected aliased token pairs; at P≈1e6 that was ~5×10^5 pairs
    * (pervasive aliasing at exactly the advertised scale), at
    * P≈1.46×10^17 it is ~3×10^-6 — negligible. P is the largest prime
    * with both P*31+127 < 2^63 (fold step exact) and 63*P < 2^63
    * (the a*id+b minhash step exact for k ≤ 30), so every intermediate
    * stays inside signed-64 arithmetic in Spark AND DuckDB. */
  def polyTokenId(token: Column): Column = Kernels.polyHash(token)
  // (JIT kernel — the per-character substr/ascii/pmod interpreted fold
  // this replaces is bit-identical; see Kernels.polyHashOf)

  /** MinHash over poly token ids: the oracle-checkable SCALE path —
    * map-side hashing, partial-aggregable min, no vocabulary shuffle.
    * The per-function hash stays in the big-prime space: reducing ids to
    * a small modulus first would alias the SAME token pairs for every
    * hash function (a(t1−t2)≡0 mod P iff t1≡t2 mod P), defeating the
    * signature. */
  def minhashPoly(df: DataFrame, id: Column, text: Column, k: Int = 8): DataFrame = {
    val withIds = docTokens(df, id, text).withColumn("token_id", polyTokenId(col("token")))
    val aggs = minhashCoeffs(k).zipWithIndex.map { case ((a, b), i) =>
      min(pmod(lit(a) * col("token_id") + lit(b), lit(minhashBigPrime))).as(s"mh$i")
    }
    withIds.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  /** MinHash signatures with k hash functions.
    * rankBased=false (scale path): h_i(t) = xxhash64(token, i) — pure
    * map-side, signature agg is partial-aggregable (min).
    * rankBased=true (oracle path): h_i(t) = (a_i * token_id + b_i) mod p
    * over rank token ids — integer-exact in any SQL engine. */
  val minhashPrime = 1000003L
  /** large prime for the poly-hash paths — see polyTokenId scaladoc */
  val minhashBigPrime = 146402730743726503L
  def minhashCoeffs(k: Int): Seq[(Long, Long)] =
    (0 until k).map(i => (2L * i + 3L, 7L * i + 1L))

  def minhash(df: DataFrame, id: Column, text: Column, k: Int = 8,
              rankBased: Boolean = false): DataFrame = {
    val tok = docTokens(df, id, text)
    if (rankBased) {
      val withIds = rankTokenIds(tok)
      val aggs = minhashCoeffs(k).zipWithIndex.map { case ((a, b), i) =>
        min(pmod(lit(a) * col("token_id") + lit(b), lit(minhashPrime))).as(s"mh$i")
      }
      withIds.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
    } else {
      val aggs = (0 until k).map(i => min(xxhash64(col("token"), lit(i))).as(s"mh$i"))
      tok.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
    }
  }

  /** LSH banding over a minhash signature: bands of `rowsPerBand`
    * columns hashed to one bucket key each. Docs sharing any
    * (band, bucket) become candidate pairs. */
  def lshCandidates(sig: DataFrame, k: Int, rowsPerBand: Int = 2): DataFrame = {
    val nBands = k / rowsPerBand
    val bands = (0 until nBands).map { bnd =>
      val cols = (0 until rowsPerBand).map(r => col(s"mh${bnd * rowsPerBand + r}"))
      // band key = raw signature slice (portable: tuple equality, no
      // engine-specific hash; a real deployment may hash for key width)
      sig.select(col("doc_id"), lit(bnd).as("band"), concat_ws("|", cols: _*).as("bucket"))
    }.reduce(_ union _)
    val a = bands.as("a"); val b = bands.as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
  }

  /** Exact token-set Jaccard for a pair set (verification stage):
    * inter/union counts via the token join, integer-exact. */
  def jaccardVerify(candidates: DataFrame, tok: DataFrame, minPercent: Int): DataFrame = {
    val sizes = tok.groupBy("doc_id").agg(count(lit(1)).as("n_tok"))
    val ta = tok.select(col("doc_id").as("id_a"), col("token"))
    val tb = tok.select(col("doc_id").as("id_b"), col("token").as("token_b"))
    val inter = candidates.join(ta, "id_a").join(tb, "id_b")
      .filter(col("token") === col("token_b")) // pushed into the join by Catalyst
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "id_a").withColumnRenamed("n_tok", "n_a"), "id_a")
      .join(sizes.withColumnRenamed("doc_id", "id_b").withColumnRenamed("n_tok", "n_b"), "id_b")
      .filter(lit(100) * col("inter") >= lit(minPercent) * (col("n_a") + col("n_b") - col("inter")))
      .select(col("id_a"), col("id_b"), col("inter"), col("n_a"), col("n_b"))
  }

  /** Full MinHash+LSH near-dup pipeline: signatures → banding → exact
    * verify. Returns verified near-dup pairs. */
  def minhashNearDups(df: DataFrame, id: Column, text: Column,
                      k: Int = 8, rowsPerBand: Int = 2, minJaccardPercent: Int = 60,
                      rankBased: Boolean = false): DataFrame = {
    val sig = minhash(df, id, text, k, rankBased)
    val cand = lshCandidates(sig, k, rowsPerBand)
    jaccardVerify(cand, docTokens(df, id, text), minJaccardPercent)
  }

  /** All-pairs n-gram Jaccard within a grouping key (bounded relational
    * formulation — the group key caps the quadratic blowup). */
  def jaccardPairs(df: DataFrame, id: Column, text: Column, group: Column,
                   minPercent: Int): DataFrame = {
    val tok = df.select(id.as("doc_id"), group.as("grp"),
      explode(array_distinct(split(text, " "))).as("token"))
    val sizes = tok.groupBy("doc_id").agg(count(lit(1)).as("n_tok"))
    val a = tok.select(col("doc_id").as("id_a"), col("grp"), col("token"))
    val b = tok.select(col("doc_id").as("id_b"), col("grp").as("grp_b"), col("token").as("token_b"))
    val inter = a.join(b, col("grp") === col("grp_b") && col("token") === col("token_b") &&
        col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "id_a").withColumnRenamed("n_tok", "n_a"), "id_a")
      .join(sizes.withColumnRenamed("doc_id", "id_b").withColumnRenamed("n_tok", "n_b"), "id_b")
      .filter(lit(100) * col("inter") >= lit(minPercent) * (col("n_a") + col("n_b") - col("inter")))
      .select(col("id_a"), col("id_b"), col("inter"), col("n_a"), col("n_b"))
  }

  /** Cross-corpus fuzzy decontamination: (doc_id, bench_id, inter, n_a,
    * n_b) for every corpus doc whose token-set Jaccard with a benchmark
    * doc reaches `minPercent` — the near-dup contamination check run
    * before training (exact-key decontamination misses paraphrased /
    * lightly-edited benchmark leaks).
    *
    * Same MinHash(poly-id)+banding+exact-verify shape as
    * [[minhashNearDups]], but the band join is CROSS-corpus: corpus
    * bands probe only benchmark bands. The benchmark side is tiny
    * relative to a 100 TB corpus, so its band table (nBands rows per
    * bench doc) broadcasts and the corpus side never shuffles for the
    * candidate stage; only candidate pairs (ε·|corpus|) reach the
    * exact-Jaccard verify joins. Poly token ids keep both signature and
    * verify integer-exact in any SQL engine. */
  def fuzzyContaminated(docs: DataFrame, id: Column, text: Column,
                        bench: DataFrame, bid: Column, btext: Column,
                        k: Int = 4, rowsPerBand: Int = 2,
                        minPercent: Int = 60): DataFrame = {
    val nBands = k / rowsPerBand
    def bandsOf(sig: DataFrame, idName: String): DataFrame =
      (0 until nBands).map { bnd =>
        val cols = (0 until rowsPerBand).map(r => col(s"mh${bnd * rowsPerBand + r}"))
        sig.select(col("doc_id").as(idName), lit(bnd).as("band"),
          concat_ws("|", cols: _*).as("bucket"))
      }.reduce(_ union _)
    val bandsA = bandsOf(minhashPoly(docs, id, text, k), "id_a")
    val bandsB = bandsOf(minhashPoly(bench, bid, btext, k), "bench_id")
      .withColumnRenamed("band", "band_b").withColumnRenamed("bucket", "bucket_b")
    val cand = bandsA.join(bandsB,
        col("band") === col("band_b") && col("bucket") === col("bucket_b"))
      .select(col("id_a"), col("bench_id").as("id_b")).distinct()

    val tokA = docTokens(docs, id, text).withColumn("token_id", polyTokenId(col("token")))
    val tokB = docTokens(bench, bid, btext).withColumn("token_id", polyTokenId(col("token")))
    val sizesA = tokA.groupBy("doc_id").agg(count(lit(1)).as("n_a"))
    val sizesB = tokB.groupBy("doc_id").agg(count(lit(1)).as("n_b"))
    val inter = cand
      .join(tokA.select(col("doc_id").as("id_a"), col("token_id")), "id_a")
      .join(tokB.select(col("doc_id").as("id_b"), col("token_id").as("tid_b")), "id_b")
      .filter(col("token_id") === col("tid_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
    inter
      .join(sizesA.withColumnRenamed("doc_id", "id_a"), "id_a")
      .join(sizesB.withColumnRenamed("doc_id", "id_b"), "id_b")
      .filter(lit(100) * col("inter") >= lit(minPercent) * (col("n_a") + col("n_b") - col("inter")))
      .select(col("id_a").as("doc_id"), col("id_b").as("bench_id"),
        col("inter"), col("n_a"), col("n_b"))
  }

  /** 32-bit SimHash over rank token ids (portable arithmetic:
    * h(t) = (token_id * 2654435761) mod 2^32; bit j weighted ±1;
    * signature bit j set iff the weighted sum is positive). */
  def simhash(df: DataFrame, id: Column, text: Column, bits: Int = 32): DataFrame = {
    val tok = rankTokenIds(docTokens(df, id, text))
      .withColumn("h", pmod(col("token_id") * lit(2654435761L), lit(4294967296L)))
    val bitSums = (0 until bits).map { j =>
      sum(when(pmod(col("h").divide(lit(1L << j)).cast("long"), lit(2L)) === 1L, 1)
        .otherwise(-1)).as(s"b$j")
    }
    val sums = tok.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until bits).map(j => when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)
    sums.select(col("doc_id"), sig.as("simhash"))
  }

  /** Banded simhash near-dup pairs (Hamming ≤ maxHamming), EXACT and
    * never all-pairs: the `bits`-bit signature splits into
    * nBands = maxHamming+1 contiguous bands — a pair within maxHamming
    * differs in at most maxHamming bands, so by pigeonhole it must agree
    * on at least one whole band. Candidates come from per-band bucket
    * equality (shuffle on small band keys), then the cheap bit_count
    * XOR verify. Same trick as MinHash-LSH but with zero recall loss. */
  def simhashPairs(sig: DataFrame, maxHamming: Int, bits: Int = 32): DataFrame = {
    val nBands = maxHamming + 1
    val base = bits / nBands
    val bands = (0 until nBands).map { bnd =>
      val lo = bnd * base
      val width = if (bnd == nBands - 1) bits - lo else base
      sig.select(col("doc_id"), col("simhash"), lit(bnd).as("band"),
        pmod(shiftright(col("simhash"), lo), lit(1L << width)).as("bucket"))
    }.reduce(_ union _)
    val a = bands.select(col("doc_id").as("id_a"), col("simhash").as("sh_a"),
      col("band"), col("bucket"))
    val b = bands.select(col("doc_id").as("id_b"), col("simhash").as("sh_b"),
      col("band").as("band_b"), col("bucket").as("bucket_b"))
    a.join(b, col("band") === col("band_b") && col("bucket") === col("bucket_b") &&
        col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b"))
      .distinct() // a pair can agree on several bands
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** ExactSubstr duplicate-SPAN removal (the Lee et al. 2022
    * "Deduplicating Training Data Makes Language Models Better"
    * operation, as its released suffix-array tool behaves): every
    * character lying inside some length-`window` substring that occurs
    * ≥ 2 times in the corpus — counting multiplicity, including twice
    * within ONE document — is excised from EVERY occurrence; what
    * survives is the concatenation of the uncovered gaps. Detection is
    * exact on window CONTENT (the reference tool's suffix array); here
    * content is keyed by xxhash64 of the window, so two distinct
    * windows merge only on a 64-bit collision (~2^-64 per pair —
    * documented trade for not shuffling `window` bytes per position).
    *
    * Returns (doc_id, text_dedup, n_dup_spans, n_removed) for every
    * input document: `n_dup_spans` = maximal contiguous covered runs
    * after merging overlapping/abutting duplicate windows, `n_removed`
    * = covered characters. Docs shorter than `window` pass through
    * untouched (no window ⇒ no evidence).
    *
    * Scale shape: the position table is O(total chars) rows of ~20
    * bytes — the same asymptotic footprint as the reference's suffix
    * array, built as an in-row transform (the struct array is built
    * BEFORE the explode so the document text is never replicated per
    * position) and exploded. Duplicate detection is one
    * partial-aggregable count on the window hash plus one left-semi
    * join back (both keyed on the hash; boilerplate hub windows are
    * exactly the shape AQE skew-split handles). Excision is one
    * groupBy(doc_id) whose per-doc state — the sorted duplicate-start
    * array — is bounded by the document's own length (same magnitude
    * as the text value already on the row), then a pure in-row fold
    * that walks starts left-to-right, merging intervals and
    * concatenating the gaps. No step is quadratic; nothing is
    * cartesian. */
  def exactSubstrDedup(df: DataFrame, id: Column, text: Column, window: Int = 20): DataFrame = {
    require(window >= 2 && window <= 4096, s"window=$window")
    val w = lit(window)
    // per-position hashing is O(chars) heavy map work: widen narrow scans
    val base = Par.spread(df).select(id.cast("long").as("doc_id"), text.as("text"))
    // 1. the distributed suffix-array stand-in: (doc_id, p, h) per window
    // — one JIT kernel pass per doc sharing a single UTF-8 encoding
    // (Kernels.posHashKernel; the interpreted per-position substr +
    // xxhash64 chain dominated this operator's profile)
    val posHashes = Kernels.posHashKernel(window)
    val pos = base.where(length(col("text")) >= window)
      .select(col("doc_id"), explode(posHashes(col("text"))).as("ph"))
      .select(col("doc_id"), col("ph.p").as("p"), col("ph.h").as("h"))
    // 2. window hashes seen ≥2 times anywhere → the duplicate starts
    val dupH = pos.groupBy("h").agg(count(lit(1)).as("c")).where(col("c") > 1).select("h")
    val dupStarts = pos.join(dupH, Seq("h"), "left_semi")
      .groupBy("doc_id").agg(sort_array(collect_list(col("p"))).as("ps"))
    // 3. merge intervals + excise, one in-row fold per document
    val folded = aggregate(coalesce(col("ps"), array().cast("array<int>")),
      struct(lit(0).as("cur"), lit("").as("kept"), lit(0).as("n_spans")),
      (acc, s) => {
        val cur = acc.getField("cur")
        struct(
          greatest(cur, s + w).as("cur"),
          when(s > cur, concat(acc.getField("kept"), col("text").substr(cur + 1, s - cur)))
            .otherwise(acc.getField("kept")).as("kept"),
          (acc.getField("n_spans") +
            when(acc.getField("n_spans") === 0 || s > cur, 1).otherwise(0)).as("n_spans"))
      },
      acc => struct(
        concat(acc.getField("kept"),
          col("text").substr(acc.getField("cur") + 1, length(col("text")) - acc.getField("cur")))
          .as("text_dedup"),
        acc.getField("n_spans").as("n_dup_spans")))
    base.join(dupStarts, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), folded.as("f"), length(col("text")).as("n_orig"))
      .select(col("doc_id"), col("f.text_dedup").as("text_dedup"),
        col("f.n_dup_spans").as("n_dup_spans"),
        (col("n_orig") - length(col("f.text_dedup"))).as("n_removed"))
  }
}
