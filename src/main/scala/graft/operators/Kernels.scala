package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** JIT-compiled per-row kernels for the interpreted-expression hot
  * paths (optimization guide §1.2 step 2 / §4: make the per-task work
  * fast once the distributed shape is right).
  *
  * Spark's higher-order array functions (`transform`, `zip_with`,
  * `aggregate`) are `CodegenFallback` expressions: every element of
  * every row walks an interpreted expression tree with boxed
  * intermediates. That is invisible at production shuffle scale but
  * dominates the compute-bound map stages here — measured 40 µs per
  * 64-dim quantized dot in the SemDeDup pair stage (≈ 11 s for 275k
  * pairs) vs < 0.1 µs for the same arithmetic as a JIT-compiled JVM
  * loop.
  *
  * Every kernel is BIT-EXACT equivalent to the Column expression it
  * replaces (same integer arithmetic, same null semantics, same
  * tie-breaks — asserted by the DuckDB oracle rows, which replay the
  * original formulation, and by the operator test suites). The exact
  * rounding-sensitive step — float → integer quantization
  * (round(x·1000), half-up) — deliberately STAYS in the Column path
  * ([[Ivf.quantize]]); kernels only consume already-quantized longs,
  * so no floating-point rounding is ever re-implemented here. */
object Kernels {

  /** Exact integer dot of two pre-quantized long arrays. Null → null;
    * length mismatch → null (zip_with pads with null, and null kills
    * the running aggregate — replicated). */
  val dotQ = udf((a: Seq[Long], b: Seq[Long]) =>
    if (a == null || b == null || a.length != b.length) null
    else {
      var i = 0; var s = 0L; val n = a.length
      while (i < n) { s += a(i) * b(i); i += 1 }
      java.lang.Long.valueOf(s)
    })

  /** Nearest-centroid id by integer squared L2 with the repo-wide
    * lexicographic (d2, cid) argmin tie-break: centroids are visited in
    * ascending-cid order and only a STRICTLY smaller d2 replaces the
    * winner — identical to `array_min` over (d2, cid) structs. */
  def nearestCidKernel(centroids: Array[(Int, Array[Long])]): Column => Column = {
    val sorted = centroids.sortBy(_._1)
    val k = udf((qe: Seq[Long]) =>
      if (qe == null) null
      else {
        var bestCid = -1; var bestD2 = Long.MaxValue; var first = true
        var ci = 0
        while (ci < sorted.length) {
          val (cid, c) = sorted(ci)
          var i = 0; var d2 = 0L; val n = math.min(qe.length, c.length)
          while (i < n) { val d = qe(i) - c(i); d2 += d * d; i += 1 }
          if (first || d2 < bestD2) { bestD2 = d2; bestCid = cid; first = false }
          ci += 1
        }
        java.lang.Integer.valueOf(bestCid)
      })
    (qe: Column) => k(qe)
  }

  /** JL ±1 projection: all `outDim` sign-weighted sums of a quantized
    * vector in one pass (replaces outDim interpreted zip_with/aggregate
    * chains per row). Signs are the driver-computed sha256-parity
    * matrix — bit-identical to the literal the Column path inlined. */
  def jlProjectKernel(signs: Array[Array[Long]]): Column => Column = {
    val k = udf((qe: Seq[Long]) =>
      if (qe == null) null
      else signs.map { row =>
        var i = 0; var s = 0L; val n = math.min(qe.length, row.length)
        while (i < n) { s += qe(i) * row(i); i += 1 }
        s
      }.toSeq)
    (qe: Column) => k(qe)
  }

  /** |A ∩ B| of two token SETS, each given as a parallel (tdf array,
    * space-joined token string) pair sorted by the global (tdf, token)
    * order (SetSim's ordered-set layout): a single O(|A|+|B|) merge —
    * replaces the per-pair `array_intersect` hash build in the
    * set-similarity verify. The tokens ride as ONE string per doc
    * (tokens cannot contain the separator — they come from a
    * split-on-space), so the UDF boundary copies two strings and two
    * primitive arrays instead of materializing hundreds of String
    * objects per candidate pair. Exact: the comparator (tdf asc, then
    * token code-point order) is bit-identical to Spark's struct
    * ordering over (tdf, token) — code-point order == UTF8String
    * binary order — and per-doc tokens are distinct by construction. */
  val interSorted = udf((atd: Seq[Long], as: String, btd: Seq[Long], bs: String) => {
    // token k of a doc spans [start_k, end_k) in its packed string
    var i = 0; var j = 0; var c = 0L
    var ia = 0; var ib = 0 // char cursors into as / bs
    val n = atd.length; val m = btd.length
    def tokEnd(s: String, start: Int): Int = {
      val e = s.indexOf(' ', start); if (e < 0) s.length else e
    }
    while (i < n && j < m) {
      val ea = tokEnd(as, ia); val eb = tokEnd(bs, ib)
      var cmp = java.lang.Long.compare(atd(i), btd(j))
      if (cmp == 0) {
        // code-point comparison of as[ia,ea) vs bs[ib,eb), no substrings
        var x = ia; var y = ib
        while (cmp == 0 && x < ea && y < eb) {
          val cx = as.codePointAt(x); val cy = bs.codePointAt(y)
          if (cx != cy) cmp = Integer.compare(cx, cy)
          else { x += Character.charCount(cx); y += Character.charCount(cy) }
        }
        if (cmp == 0) cmp = Integer.compare(ea - x, eb - y)
      }
      if (cmp == 0) { c += 1L; i += 1; j += 1; ia = ea + 1; ib = eb + 1 }
      else if (cmp < 0) { i += 1; ia = ea + 1 }
      else { j += 1; ib = eb + 1 }
    }
    c
  })

  /** Repetition metrics over a token array in ONE pass: (n_words,
    * n_distinct_words, top_word_count, n_bigrams, top_bigram_count).
    * Exactly the five expressions of `repetitionMetrics` (max run of
    * the sorted array == max multiplicity; bigram key = "w1 w2"), with
    * the null-text semantics of the originals: size(null) = null,
    * greatest(null-1, 0) = 0, when(null >= 2 …).otherwise(0) = 0. */
  case class RepStats(n_words: java.lang.Long, n_distinct_words: java.lang.Long,
                      top_word_count: java.lang.Long, n_bigrams: java.lang.Long,
                      top_bigram_count: java.lang.Long)
  val repStats = udf((toks: Seq[String]) =>
    if (toks == null) RepStats(null, null, null, 0L, 0L)
    else {
      val n = toks.length
      val wc = new java.util.HashMap[String, Long](n * 2)
      var topW = 0L
      var i = 0
      while (i < n) {
        val c = wc.merge(toks(i), 1L, _ + _)
        if (c > topW) topW = c
        i += 1
      }
      var topB = 0L
      if (n >= 2) {
        val bc = new java.util.HashMap[String, Long](n * 2)
        var j = 1
        while (j < n) {
          val c = bc.merge(toks(j - 1) + " " + toks(j), 1L, _ + _)
          if (c > topB) topB = c
          j += 1
        }
      }
      RepStats(n.toLong, wc.size.toLong, topW, math.max(n - 1L, 0L), topB)
    })
}
