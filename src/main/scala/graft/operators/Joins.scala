package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Join shapes Spark's optimizer does not provide natively, built so the
  * physical plan stays a single keyed shuffle (as-of), a bucketed
  * equi-join (range), or a map-side prefilter (bloom) instead of the
  * range-explosion / cartesian fallback a naive formulation triggers.
  *
  * The reference has no temporal joins (wdumper is a one-shot batch
  * exporter); these are the beyond-reference operators a training-data /
  * event-attribution pipeline needs at 100 TB, where
  * `l JOIN r ON l.k = r.k AND l.ts >= r.ts` would otherwise plan as an
  * equi-join producing |matches-per-key|² intermediate rows (or, without
  * the key, a BroadcastNestedLoopJoin).
  */
object Joins {

  /** As-of join: each left row gets the columns of the single right row
    * with the greatest `rightTs <= leftTs` for the same `key` (left
    * outer: unmatched left rows keep nulls). Ties on `rightTs` within a
    * key resolve to the greatest `tieBreak` — REQUIRED so the result is
    * deterministic (and therefore oracle-checkable) when the right side
    * has duplicate timestamps per key.
    *
    * Plan shape: tag + union the two inputs, ONE hash shuffle on `key`,
    * per-key sort, running `last(_, ignoreNulls)` over
    * rows-unbounded-preceding..current — O(n log n) per key, zero row
    * amplification, never a range join. Right rows sort BEFORE left rows
    * at equal timestamps, making the match inclusive. Hub keys
    * serialize within their window; salt upstream (Skew) or sub-key by
    * time-bucket if one key dominates the corpus.
    *
    * `rightCols` are the right-side columns to carry (returned under
    * their own names — they must not collide with left column names).
    */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String, tieBreak: String,
               rightCols: Seq[String]): DataFrame = {
    require(rightCols.nonEmpty, "rightCols must name at least one right-side column")
    val leftCols = left.columns.toSeq
    val collide = rightCols.toSet.intersect(leftCols.toSet)
    require(collide.isEmpty, s"right columns collide with left: $collide")

    val l = left.select(
      col(key).as("_k"), col(leftTs).as("_ts"), lit(1).as("_side"),
      lit(null).cast(right.schema(tieBreak).dataType).as("_tie"),
      struct(leftCols.map(col): _*).as("_l"),
      lit(null).cast(org.apache.spark.sql.types.StructType(
        rightCols.map(c => right.schema(c)))).as("_r"))
    val r = right.select(
      col(key).as("_k"), col(rightTs).as("_ts"), lit(0).as("_side"),
      col(tieBreak).as("_tie"),
      lit(null).cast(org.apache.spark.sql.types.StructType(
        leftCols.map(c => left.schema(c)))).as("_l"),
      struct(rightCols.map(col): _*).as("_r"))

    // right (_side=0) sorts before left (_side=1) at equal _ts → inclusive;
    // among right rows at equal _ts the greatest _tie is nearest the left row
    val w = Window.partitionBy("_k")
      .orderBy(col("_ts").asc, col("_side").asc, col("_tie").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l.unionByName(r)
      .withColumn("_match", last(col("_r"), ignoreNulls = true).over(w))
      .where(col("_side") === 1)
    matched.select(
      leftCols.map(c => col(s"_l.$c").as(c)) ++
        rightCols.map(c => col(s"_match.$c").as(c)): _*)
  }

  /** Range (interval) join: every (point, interval) pair with
    * `start <= point <= end`, as a bucketed equi-join. Intervals are
    * replicated to each width-`bucketWidth` bucket they span; a point
    * probes exactly its own bucket, so each qualifying pair meets in
    * exactly ONE bucket (no post-join dedup) and the residual
    * `[start,end]` predicate runs inside the join. All values are Longs
    * (epoch micros / scaled numerics — caller converts).
    *
    * Scale: replication factor = avg interval length / bucketWidth + 1;
    * pick bucketWidth ≈ the median interval length so the factor is ~2
    * while buckets stay selective. A naive `ON p BETWEEN s AND e` plans
    * as BroadcastNestedLoopJoin (every point × every interval); this is
    * a plain hash shuffle on the bucket id, AQE-splittable when one
    * time bucket is hot.
    */
  def rangeJoin(points: DataFrame, pointCol: String,
                intervals: DataFrame, startCol: String, endCol: String,
                bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth=$bucketWidth")
    val iv = intervals.withColumn("_bucket",
      explode(sequence(floor(col(startCol) / bucketWidth),
        floor(col(endCol) / bucketWidth))))
    val pt = points.withColumn("_bucket", floor(col(pointCol) / bucketWidth))
    pt.join(iv, pt("_bucket") === iv("_bucket") &&
        col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("_bucket")
  }

  /** Bloom-prefiltered anti join (exact-key decontamination): rows of
    * `left` whose `leftKey` appears nowhere in `right(rightKey)` —
    * semantically IDENTICAL to `LEFT ANTI JOIN` (bloom false positives
    * are removed by an exact verify join), so the DuckDB oracle is the
    * plain anti join.
    *
    * Why not just the anti join: at 100 TB the anti join shuffles the
    * ENTIRE left side on the key. Here the bloom filter (built with one
    * partial-aggregable `bit_or` pass over `right`, collected as
    * `bits/64` longs — the filter itself, driver-safe by construction)
    * is evaluated map-side on `left`; only the `maybe` rows (true
    * overlap + fpp of the rest) reach the exact verify join. With a
    * contamination rate ε and false-positive rate p, the shuffle
    * carries (ε+p)·|left| instead of |left|.
    *
    * The filter is pure Column arithmetic (k xxhash64 probes into a
    * literal word array) — codegen'd, no UDF, deterministic. Size
    * `bits ≥ 1.44·|right|·log2(1/p)`; k ≈ 0.7·bits/|right|. The word
    * array travels in the plan as one literal (bits/8 bytes — 128 KB at
    * bits=2^20); for benchmark sets needing ≥2^27 bits, ship the words
    * as a broadcast table and probe via a tiny broadcast join on the
    * word index instead of the literal (same semantics, plan stays
    * small).
    */
  def bloomAntiJoin(left: DataFrame, leftKey: String,
                    right: DataFrame, rightKey: String,
                    bits: Int = 1 << 20, k: Int = 5): DataFrame = {
    require(bits >= 64 && k >= 1, s"bits=$bits k=$k")
    val nWords = (bits + 63) / 64
    def positions(keyCol: Column): Seq[Column] =
      (0 until k).map(i => pmod(xxhash64(lit(i), keyCol), lit(bits.toLong)))

    // build: k positions per right key → (word, or-of-bits) → driver map
    val words = right
      .select(explode(array(positions(col(rightKey)): _*)).as("_p"))
      .select((col("_p") / 64).cast("int").as("_w"),
        expr("shiftleft(1L, cast(_p % 64 as int))").as("_b"))
      .groupBy("_w").agg(expr("bit_or(_b)").as("_word"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val arr = Array.tabulate(nWords)(i => words.getOrElse(i, 0L))

    // probe: the SAME k hashes (identical literal types ⇒ identical
    // xxhash64 input encoding as the build side — a type drift here
    // would silently produce false negatives)
    val bf = typedLit(arr.toSeq)
    val probed = (0 until k).foldLeft(left) { (df, i) =>
      df.withColumn(s"_p$i", positions(col(leftKey))(i))
    }
    val maybe = (0 until k).map { i =>
      element_at(bf, (col(s"_p$i") / 64).cast("int") + 1)
        .bitwiseAND(expr(s"shiftleft(1L, cast(_p$i % 64 as int))")) =!= 0L
    }.reduce(_ && _)
    val flagged = probed.withColumn("_maybe", maybe)
      .drop((0 until k).map(i => s"_p$i"): _*)
    verifyMaybes(left, leftKey, right, rightKey, flagged)
  }

  /** [[bloomAntiJoin]]'s BIG-FILTER variant (the scaladoc's promised
    * broadcast-table path): identical semantics — exactly `LEFT ANTI
    * JOIN` — but the filter words ride as a BROADCAST TABLE instead of
    * a plan literal. Use when `bits` is large (≥ ~2^24): a 2^30-bit
    * filter is 16M words = 128 MB — broadcastable, but inlining it as a
    * literal would bloat the plan/codegen catastrophically (the literal
    * path's array is serialized into every task binary and the plan
    * string itself).
    *
    * Probe shape: k map-side BROADCAST hash joins on the word index —
    * `left` is never shuffled; a word index absent from the table means
    * no right key hashed there, so `coalesce(word, 0)` keeps those rows
    * definitely-out. The build side never collects: the `bit_or` word
    * aggregation stays a DataFrame end to end (the literal path's
    * driver collect is what caps it at small `bits`). Verify-join tail
    * is shared with the literal path — false positives are removed
    * exactly. */
  def bloomAntiJoinBroadcast(left: DataFrame, leftKey: String,
                             right: DataFrame, rightKey: String,
                             bits: Long = 1L << 27, k: Int = 5): DataFrame = {
    require(bits >= 64 && k >= 1, s"bits=$bits k=$k")
    def positions(keyCol: Column): Seq[Column] =
      (0 until k).map(i => pmod(xxhash64(lit(i), keyCol), lit(bits)))

    // build: (word index, or-of-bits) — partial-aggregable, never collected
    val words = right
      .select(explode(array(positions(col(rightKey)): _*)).as("_p"))
      .select(expr("_p div 64").as("_w"),
        expr("shiftleft(1L, cast(_p % 64 as int))").as("_b"))
      .groupBy("_w").agg(expr("bit_or(_b)").as("_word"))

    // probe: same k hashes (same literal types as the build side), one
    // broadcast join per hash on the word index
    val probed0 = (0 until k).foldLeft(left) { (df, i) =>
      df.withColumn(s"_p$i", positions(col(leftKey))(i))
    }
    val probed = (0 until k).foldLeft(probed0) { (df, i) =>
      df.join(
        broadcast(words.select(col("_w").as(s"_w$i"), col("_word").as(s"_word$i"))),
        expr(s"_p$i div 64") === col(s"_w$i"), "left")
    }
    val maybe = (0 until k).map { i =>
      coalesce(col(s"_word$i"), lit(0L))
        .bitwiseAND(expr(s"shiftleft(1L, cast(_p$i % 64 as int))")) =!= 0L
    }.reduce(_ && _)
    verifyMaybes(left, leftKey, right, rightKey, probed.withColumn("_maybe", maybe))
  }

  /** Shared exact tail: `_maybe=false` rows are definitely out (bloom
    * has no false negatives); `_maybe=true` rows take the exact anti
    * join, which removes the false positives. */
  private def verifyMaybes(left: DataFrame, leftKey: String,
                           right: DataFrame, rightKey: String,
                           flagged: DataFrame): DataFrame = {
    val keep = left.columns.map(col).toSeq
    val definiteOut = flagged.where(!col("_maybe")).select(keep: _*)
    val maybeIn = flagged.where(col("_maybe")).select(keep: _*)
      .join(right.select(col(rightKey).as("_rk")).distinct(),
        col(leftKey) === col("_rk"), "left_anti")
    definiteOut.unionByName(maybeIn)
  }
}
