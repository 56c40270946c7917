package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog as an explicit, MERGEABLE register sketch — approximate
  * distinct counting whose intermediate state is a table, not an opaque
  * binary blob. `approx_count_distinct` hides its HLL++ sketch inside an
  * aggregation buffer; materializing the registers instead makes the
  * sketch (a) persistable next to the data (per-partition / per-day
  * register tables), (b) mergeable with a plain `groupBy(reg).max(rho)`
  * — union two corpora's register tables and re-max to get the sketch
  * of the union without rescanning either corpus — and (c) exactly
  * reproducible cross-engine, since every step is integer arithmetic on
  * a sha256 both Spark and DuckDB compute identically (the basis of the
  * DuckDB oracle: q_hll_registers hash-matches the full register table).
  *
  * Hash layout (sha256 hex of the value's canonical string form):
  *  - register index = first b/4 hex chars (b bits, m = 2^b registers);
  *  - rho           = 1 + leading-zero count of the NEXT 52 bits
  *                    (13 hex chars — fits a signed long exactly),
  *                    i.e. rho = 53 - bitlength(v), rho(0) = 53.
  *
  * Scale shape: one projection (sha256 + two substring-conv's, all
  * codegen'd built-ins) and ONE partial-aggregable max shuffle whose
  * output is ≤ m rows — the sketch never grows with the data. The raw
  * estimate is `alpha_m * m^2 / sum_j 2^-M[j]`, computed here over the
  * 2^52-scaled harmonic sum so the only floating-point step is a single
  * IEEE division of two exactly-agreed numbers (deterministic
  * cross-engine; floored to a BIGINT).
  */
object Sketch {

  /** The per-row (reg, rho) pair of a value — the insert half of the
    * sketch, exposed so other operators (e.g. [[graft.plans.HyperBall]])
    * can build per-KEY register tables with the identical derivation. */
  def regRho(value: Column, b: Int): (Column, Column) = {
    require(b >= 4 && b <= 16 && b % 4 == 0, s"b=$b must be a multiple of 4 in [4,16]")
    val nHex = b / 4
    val h = sha2(value.cast("string"), 256)
    val vHex = substring(h, nHex + 1, 13) // 52 bits — exact in a long
    val v = conv(vHex, 16, 10).cast("long")
    // conv(_,16,2) drops leading zeros, so length == bitlength (v>0)
    val bitlen = when(v === 0, lit(0)).otherwise(length(conv(vHex, 16, 2)))
    (conv(substring(h, 1, nHex), 16, 10).cast("long"),
      (lit(53) - bitlen).cast("long"))
  }

  /** Per-register max-rho table: (reg: long, rho_max: long), only
    * non-empty registers present (empty ⇔ rho 0 by convention). */
  def hllRegisters(df0: DataFrame, value: Column, b: Int = 8): DataFrame = {
    val df = Par.spread(df0) // sha256 per row: widen narrow scans
    val (reg, rho) = regRho(value, b)
    df.select(reg.as("reg"), rho.as("rho"))
      .groupBy("reg").agg(max("rho").as("rho_max"))
  }

  /** The estimate derivation over a per-key register table — the read
    * half of the sketch, shared by [[hllEstimate]] (one global key) and
    * HyperBall (one key per node). Input: (key..., reg, rho) with one
    * row per non-empty register; output per key: (nonzero_regs,
    * harmonic_scaled, estimate). All integer except the single final
    * IEEE division (exactly-agreed operands, floored). */
  def estimateFromRegs(regs: DataFrame, keys: Seq[String], b: Int): DataFrame = {
    require(b <= 11, s"b=$b: harmonic_scaled must stay within a signed long (m·2^52)")
    val m = 1 << b
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val num = alpha * m.toDouble * m.toDouble * 4503599627370496.0 // ·2^52
    regs.groupBy(keys.map(col): _*).agg(
        count(lit(1)).as("nonzero_regs"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), greatest(0, CAST(52 - rho AS INT)))")).as("s_nonzero"))
      .select(keys.map(col) ++ Seq(
        col("nonzero_regs"),
        (col("s_nonzero") + (lit(m.toLong) - col("nonzero_regs")) * lit(4503599627370496L))
          .as("harmonic_scaled"),
        floor(lit(num) / col("s_nonzero").plus(
          (lit(m.toLong) - col("nonzero_regs")) * lit(4503599627370496L)).cast("double"))
          .cast("long").as("estimate")): _*)
  }

  /** One-row summary: (m, nonzero_regs, harmonic_scaled, hll_estimate,
    * exact_distinct). `harmonic_scaled` = sum over all m registers of
    * 2^(52 - rho_j) (empty register ⇒ rho 0 ⇒ 2^52; rho 53 — the
    * ~2^-52 all-zero-slice case — clamps to shift 0, since a negative
    * Java shift would wrap to 1<<63 and corrupt the sum) — an exact long
    * (≤ m·2^52 ≤ 2^68... bounded by b ≤ 11 here to stay in 63 bits).
    * `hll_estimate` = floor(alpha_m · m² · 2^52 / harmonic_scaled).
    * `exact_distinct` rides along so the sketch's error is visible. */
  def hllEstimate(df: DataFrame, value: Column, b: Int = 8): DataFrame = {
    require(b <= 11, s"b=$b: harmonic_scaled must stay within a signed long (m·2^52)")
    val m = 1 << b
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val num = alpha * m.toDouble * m.toDouble * 4503599627370496.0 // ·2^52
    val regs = hllRegisters(df, value, b)
    val agg = regs.agg(
      count(lit(1)).as("nonzero_regs"),
      sum(expr("shiftleft(CAST(1 AS BIGINT), greatest(0, CAST(52 - rho_max AS INT)))")).as("s_nonzero"))
    val exact = df.agg(countDistinct(value).as("exact_distinct"))
    agg.crossJoin(exact).select(
      lit(m.toLong).as("m"),
      col("nonzero_regs"),
      (col("s_nonzero") + (lit(m.toLong) - col("nonzero_regs")) * lit(4503599627370496L))
        .as("harmonic_scaled"),
      floor(lit(num) / col("s_nonzero").plus(
        (lit(m.toLong) - col("nonzero_regs")) * lit(4503599627370496L)).cast("double"))
        .cast("long").as("hll_estimate"),
      col("exact_distinct"))
  }

  /** Count-Min sketch as an explicit register table — approximate
    * frequencies in bounded space, the counting counterpart of
    * [[hllRegisters]]. Four independent hash rows from disjoint
    * 13-hex-char (52-bit) slices of the value's sha256; column =
    * slice mod width. The sketch is (row, col, cnt) with cnt summed —
    * mergeable across corpora/partitions/days by plain
    * `groupBy(row, col).sum(cnt)`, and integer-exact end to end (the
    * DuckDB oracle hash-matches the full state).
    *
    * Scale shape: one in-row flat map (4 pairs per input row, no data
    * widening beyond ×4) and ONE partial-aggregable count shuffle with
    * ≤ depth·width output rows. Point estimate = min over the 4 rows
    * (always ≥ the true count; ≤ true + 2eN/width w.p. 1−2^-4). */
  /** the 4 (row, col) sketch coordinates of a value — the insert half,
    * exposed for the streaming windowed variant */
  def cmsPairs(value: Column, width: Int): Column = {
    require(width >= 2 && width <= (1 << 20), s"width=$width")
    val h = sha2(value.cast("string"), 256)
    transform(sequence(lit(0), lit(3)), j => struct(
      j.as("row"),
      pmod(conv(h.substr(j * 13 + 1, lit(13)), 16, 10).cast("long"), lit(width.toLong))
        .as("col")))
  }

  def cmsSketch(df: DataFrame, value: Column, width: Int = 256): DataFrame =
    Par.spread(df).select(explode(cmsPairs(value, width)).as("p"))
      .select(col("p.row").cast("long").as("row"), col("p.col").as("col"))
      .groupBy("row", "col").agg(count(lit(1)).as("cnt"))

  /** KMV (bottom-k) distinct sketch: the k smallest 52-bit sha256
    * hashes of the column's distinct values — (h: long) rows, ≤ k of
    * them. The third mergeable sketch next to HLL (distinct) and CMS
    * (frequency), and the one that supports SET OPERATIONS: bottom-k of
    * a union = re-take bottom-k of the concatenated sketches, which is
    * what [[kmvJaccard]] exploits for cross-corpus similarity without
    * comparing the corpora. Purely integer (the estimate is one integer
    * division), so state AND estimates hash-match the DuckDB oracle.
    *
    * Scale shape: one projection + distinct + sort-limit =
    * TakeOrderedAndProject (per-partition heaps of k; never a global
    * sort). */
  def kmvSketch(df: DataFrame, value: Column, k: Int = 64): DataFrame = {
    require(k >= 2 && k <= (1 << 20), s"k=$k")
    df.select(conv(substring(sha2(value.cast("string"), 256), 1, 13), 16, 10)
        .cast("long").as("h"))
      .distinct().orderBy("h").limit(k)
  }

  /** One-row distinct estimate from a KMV sketch: when the sketch is
    * saturated (n_hashes == k), est = (k−1)·2^52 div kth-smallest-hash;
    * under-filled sketches saw every distinct value, so the count is
    * exact. */
  def kmvEstimate(sketch: DataFrame, k: Int): DataFrame =
    sketch.agg(count(lit(1)).as("n_hashes"), max(col("h")).as("kth"))
      .select(col("n_hashes"), col("kth"),
        when(col("n_hashes") < k, col("n_hashes"))
          .otherwise(expr(s"((${k - 1} * 4503599627370496) div kth)"))
          .cast("long").as("distinct_estimate"))

  /** Jaccard similarity of two value sets from their KMV sketches only:
    * take the bottom-k of the sketch union, count how many of those
    * hashes appear in BOTH input sketches — J ≈ both/k_used, reported
    * in exact ppm. The two corpora never meet; only ≤ 3k hash rows do. */
  def kmvJaccard(a: DataFrame, b: DataFrame, k: Int = 64): DataFrame = {
    val u = a.select("h").union(b.select("h")).distinct().orderBy("h").limit(k)
    u.join(a.select(col("h"), lit(1L).as("ina")), Seq("h"), "left_outer")
      .join(b.select(col("h"), lit(1L).as("inb")), Seq("h"), "left_outer")
      .agg(count(lit(1)).as("k_used"),
        sum(when(col("ina") === 1L && col("inb") === 1L, 1L).otherwise(0L)).as("n_both"))
      .select(col("k_used"), col("n_both"),
        expr("(n_both * 1000000) div k_used").as("jaccard_ppm"))
  }

  /** Equi-join SIZE estimation from two Count-Min sketches — the
    * planner question ("will this join explode? broadcast or shuffle or
    * salt?") answered from ≤ 4·width rows per side without scanning
    * either table: |A ⋈_k B| = Σ_v f_A(v)·f_B(v) ≤ min over hash rows
    * of Σ_col cntA(row,col)·cntB(row,col) (the classic CM inner-product
    * estimate — never underestimates, error ≤ εN_A·N_B/width per row).
    * Integer-exact, so the oracle replays it verbatim. One broadcast
    * equi-join of two tiny sketches + one agg. */
  def cmsJoinSize(a: DataFrame, b: DataFrame): DataFrame =
    a.select(col("row"), col("col"), col("cnt").as("cnt_a"))
      .join(broadcast(b.select(col("row"), col("col"), col("cnt").as("cnt_b"))),
        Seq("row", "col"))
      .groupBy("row").agg(sum(expr("cnt_a * cnt_b")).as("est"))
      .agg(min(col("est")).as("join_size_est"))

  /** Point-frequency estimates for `probes` (a one-column DataFrame of
    * values) against a sketch from [[cmsSketch]]: min over the 4 rows.
    * The probe side re-derives its (row, col) pairs and LEFT-joins the
    * ≤ depth·width-row sketch — broadcast-size by construction. An
    * empty sketch cell counts as 0 (canonical CMS: the min ranges over
    * ALL depth rows), so a never-seen probe estimates 0 instead of
    * vanishing or inflating to the min of its non-empty cells. */
  def cmsLookup(sketch: DataFrame, probes: DataFrame, value: Column, width: Int = 256): DataFrame = {
    val h = sha2(value.cast("string"), 256)
    val pairs = transform(sequence(lit(0), lit(3)), j => struct(
      j.as("row"),
      pmod(conv(h.substr(j * 13 + 1, lit(13)), 16, 10).cast("long"), lit(width.toLong))
        .as("col")))
    probes.select(value.cast("string").as("probe"), explode(pairs).as("p"))
      .select(col("probe"), col("p.row").cast("long").as("row"), col("p.col").as("col"))
      .join(broadcast(sketch), Seq("row", "col"), "left_outer")
      .groupBy("probe").agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }
}
