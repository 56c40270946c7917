package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Structural checks for the driver-contract queries added in round 3:
  * as-of join, range join, TF-IDF, cube, near-dup clusters, moving
  * average, PII scrub, salted distinct. Value-level correctness is the
  * driver's DuckDB oracle (SparkEntry.oracleSql); here we pin the
  * SCALE-relevant plan shapes and the invariants an oracle can't see.
  */
class EntryQueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"
  def available: Boolean = new java.io.File(s"$sf/events.parquet").exists
  def run(name: String) = SparkEntry.queries(name)(spark, sf)
  def physical(name: String): String =
    run(name).queryExecution.executedPlan.toString

  test("q_asof_join: join-free (one window, one shuffle), as-of semantics hold") {
    assume(available)
    val plan = physical("q_asof_join")
    assert(!plan.contains("Join"), s"as-of should be a union+window, not a join:\n$plan")
    val rows = run("q_asof_join").collect()
    assert(rows.length > 0)
    // every non-null last_purchase is the ts of a purchase by that user
    // at or before... spot-check monotonicity: per user, ordered by
    // event ts the last_purchase column is non-decreasing
    import spark.implicits._
    // ts is TIMESTAMP_NTZ — read epochs as longs for the invariant checks
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select($"event_id", $"ts".cast("timestamp").cast("long").as("ets"))
    val joined = run("q_asof_join")
      .select($"event_id", $"user_id", $"last_purchase".cast("timestamp").cast("long").as("lp"))
      .join(ev, "event_id")
      .select($"user_id", $"ets", $"lp").collect()
      .groupBy(_.getLong(0))
    joined.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      val lp = sorted.map(r => if (r.isNullAt(2)) None else Some(r.getLong(2)))
      assert(lp.zip(lp.drop(1)).forall {
        case (Some(a), Some(b)) => a <= b
        case (None, _) => true
        case (Some(_), None) => false
      }, "last_purchase must be non-decreasing in event time per user")
      // and never in the future of the probe
      sorted.foreach { r =>
        if (!r.isNullAt(2)) assert(r.getLong(2) <= r.getLong(1))
      }
    }
  }

  test("q_range_join: bucketed equi-join — no cartesian / nested-loop in the plan") {
    assume(available)
    val plan = physical("q_range_join")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"range join must go through the hour-bucket equi-join:\n$plan")
    // every probe window is (pts, pts+1h]: n_events bounded by total rows
    val n = spark.read.parquet(s"$sf/events.parquet").count()
    assert(run("q_range_join").agg(max("n_events")).head().getLong(0) <= n)
  }

  test("q_decontaminate: bloom branch is a map-side filter; only the maybe branch anti-joins") {
    assume(available)
    val plan = physical("q_decontaminate")
    assert(plan.contains("Union"), s"definite-out ∪ verified-maybe expected:\n$plan")
    assert(plan.contains("LeftAnti"), s"exact verify anti join expected:\n$plan")
    // exactly one anti join — the definite-out branch must NOT join
    assert("LeftAnti".r.findAllIn(plan).size == 1, plan)
  }

  test("q_heavy_hitters: candidate verify join is broadcast — the stream never shuffles for it") {
    assume(available)
    val plan = physical("q_heavy_hitters")
    assert(plan.contains("BroadcastHashJoin"), s"candidates must broadcast:\n$plan")
  }

  test("q_kcore / q_asof_attrib / q_interval_join: no cartesian or nested-loop anywhere") {
    assume(available)
    Seq("q_kcore", "q_asof_attrib", "q_interval_join").foreach { q =>
      val plan = physical(q)
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
        s"$q:\n$plan")
    }
  }

  test("q_tfidf: one row per doc with tokens, top term has max tf/df score") {
    assume(available)
    val out = run("q_tfidf").cache()
    val docs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(out.count() == docs) // every doc has ≥1 token in this corpus
    assert(out.filter(col("tf") < 1 || col("df") < 1).count() == 0)
    out.unpersist()
  }

  test("q_cube: lattice covers all four grouping sets consistently") {
    assume(available)
    val out = run("q_cube").cache()
    val grand = out.filter(col("st") === "ALL" && col("pri") === "ALL")
    assert(grand.count() == 1)
    val total = grand.head().getLong(2)
    // each one-dimension slice sums back to the grand total
    val bySt = out.filter(col("st") =!= "ALL" && col("pri") === "ALL")
      .agg(sum("n")).head().getLong(0)
    val byPri = out.filter(col("st") === "ALL" && col("pri") =!= "ALL")
      .agg(sum("n")).head().getLong(0)
    assert(bySt == total && byPri == total)
    out.unpersist()
  }

  test("q_neardup_clusters: clusters are consistent with the pair graph") {
    assume(available)
    import spark.implicits._
    val clusters = run("q_neardup_clusters").as[(Long, Long)].collect().toMap
    val pairs = graft.operators.Dedup.minhashNearDups(
      spark.read.parquet(s"$sf/documents.parquet"), $"doc_id", $"text",
      k = 4, rowsPerBand = 2, minJaccardPercent = 60, rankBased = true)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(pairs.nonEmpty && clusters.nonEmpty)
    // every edge endpoint pair shares a cluster; representative = min id
    pairs.foreach { case (a, b) =>
      assert(clusters(a) == clusters(b), s"pair ($a,$b) split across clusters")
    }
    clusters.groupBy(_._2).foreach { case (rep, members) =>
      assert(members.keys.min == rep, s"cluster $rep rep isn't its min member")
    }
  }

  test("q_moving_avg: ma7 equals the trailing-7 mean of the revenue column") {
    assume(available)
    val rows = run("q_moving_avg").collect()
    val rev = rows.map(_.getDouble(1))
    rows.zipWithIndex.foreach { case (r, i) =>
      val wnd = rev.slice(math.max(0, i - 6), i + 1)
      assert(math.abs(r.getDouble(2) - wnd.sum / wnd.length) < 1e-6)
    }
  }

  test("q_pii_scrub: planted PII found; scrub is idempotent on redacted text") {
    assume(available)
    val out = run("q_pii_scrub")
    assert(out.filter(col("n_emails") < 1 || col("n_urls") < 1).count() == 0,
      "every doc has at least the planted email and URL")
  }

  test("q_closure: edges ⊂ closure, depths within bound, halving-tree invariant") {
    assume(available)
    import spark.implicits._
    val out = run("q_closure").as[(Long, Long, Int)].collect()
    assert(out.nonEmpty && out.forall { case (_, _, d) => d >= 1 && d <= 4 })
    val byPair = out.map { case (s, t, d) => (s, t) -> d }.toMap
    assert(byPair.size == out.length, "one row per (src,dst)")
    // halving tree: the depth-d ancestor of src is src >> d
    byPair.foreach { case ((s, t), d) => assert((s >> d) == t, s"($s,$t,$d)") }
  }

  test("q_pagerank: no cartesian, one row per node, mass bounded by scale") {
    assume(available)
    val plan = physical("q_pagerank")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"pagerank iterations must stay equi-joins:\n$plan")
    import spark.implicits._
    val out = run("q_pagerank").as[(Long, Long)].collect()
    val nodes = out.map(_._1)
    assert(nodes.distinct.length == nodes.length)
    // floor rounding + dangling-mass drop only ever LOSE mass
    assert(out.map(_._2).sum <= 1000000000000L)
    assert(out.forall(_._2 > 0))
  }

  test("q_skew_distinct equals plain countDistinct") {
    assume(available)
    import spark.implicits._
    val salted = run("q_skew_distinct").as[(Long, Long)].collect().toMap
    val plain = spark.read.parquet(s"$sf/events.parquet")
      .groupBy($"user_id").agg(countDistinct($"event_type").as("n"))
      .as[(Long, Long)].collect().toMap
    assert(salted == plain)
  }

  test("splitAssign: zero shuffle, exhaustive+disjoint labels, version-stable") {
    assume(available)
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val splits = Seq("train" -> 800000L, "val" -> 100000L, "test" -> 100000L)
    val assigned = operators.Sampling.splitAssign(docs, $"doc_id", splits)
    assert(!assigned.queryExecution.executedPlan.toString.contains("Exchange"),
      "split assignment must be a pure map-side projection")
    val labels = assigned.select($"doc_id".as[Long], $"split".as[String]).collect()
    assert(labels.length == docs.count(), "every row labeled exactly once")
    assert(labels.map(_._2).toSet.subsetOf(Set("train", "val", "test")))
    // train dominates at 80% ppm on 500 docs (loose 3-sigma-ish bound)
    val n = labels.length.toDouble
    assert(labels.count(_._2 == "train") / n > 0.7)
    // version stability: labels are a pure function of the id — the
    // same ids in a half-sized "older corpus" get the same splits
    val half = operators.Sampling.splitAssign(
      docs.filter($"doc_id" % 2 === 0), $"doc_id", splits)
      .select($"doc_id".as[Long], $"split".as[String]).collect().toMap
    val full = labels.toMap
    half.foreach { case (id, sp) => assert(full(id) == sp, s"doc $id churned splits") }
  }

  test("normalizeText: lowercases, strips non-printables, collapses runs") {
    import spark.implicits._
    val cases = Seq(
      ("A\tB  c\n", "a b c"),
      ("  hello   WORLD ", "hello world"),
      ("x \u0000y\u00e9z", "x y z"), // NUL and e-acute both map to space
      ("", ""))
    val got = cases.toDF("in", "want")
      .select(operators.TextAnalysis.normalizeText($"in").as[String], $"want".as[String])
      .collect()
    got.foreach { case (g, w) => assert(g == w) }
  }

  test("histogram: buckets tile the domain and counts sum to the row count") {
    assume(available)
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val h = operators.Profiling.histogram(docs, $"n_chars", 100L)
      .as[(Long, Long)].collect()
    assert(h.map(_._2).sum == docs.count())
    h.foreach { case (lo, _) => assert(lo % 100 == 0 && lo >= 0) }
    assert(h.map(_._1).distinct.length == h.length)
  }

  test("round-4 queries: scale-relevant plan shapes") {
    assume(available)
    // BM25: global top-k must be TakeOrderedAndProject (per-partition
    // heaps), never a global Sort of the scored corpus
    val bm25 = physical("q_bm25")
    assert(bm25.contains("TakeOrderedAndProject"), bm25)
    // KMV: bottom-k of the hash stream is a TakeOrdered too
    assert(physical("q_kmv_jaccard").contains("TakeOrderedAndProject"))
    // iterative graph ops and ADC scoring: equi-joins only. The one-row
    // corpus-stats cross joins (BM25 avgdl, HLL exact rider) are
    // broadcast by construction and allowed; a CartesianProduct is not.
    Seq("q_hyperball", "q_ppr", "q_pq_topk").foreach { q =>
      val p = physical(q)
      assert(!p.contains("CartesianProduct"), s"$q:\n$p")
    }
    // degree profile: one hash aggregate, no window, no join
    val dp = physical("q_degree_profile")
    assert(!dp.contains("Window") && !dp.contains("Join"), dp)
  }

  test("enrichedEvents: stream-static left join keeps unmatched rows, broadcasts dim") {
    assume(available)
    import spark.implicits._
    // dim covering only even user ids: odd ids must survive with nulls
    val dim = spark.range(0, 150, 2).select($"id".as("c_custkey"),
      lit("SEG").as("c_mktsegment"))
    val joined = streaming.StreamingPipeline.enrichedEvents(
      spark, s"$sf/events.parquet", dim, "user_id", "c_custkey")
    val name = "ssjt" + java.util.UUID.randomUUID.toString.replace("-", "")
    val q = joined.writeStream.format("memory").queryName(name).outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val out = spark.table(name)
    val ev = spark.read.parquet(s"$sf/events.parquet")
    assert(out.count() == ev.count(), "left join must preserve the stream")
    val oddNulls = out.filter($"user_id" % 2 === 1 && $"c_mktsegment".isNull).count()
    val oddTotal = ev.filter($"user_id" % 2 === 1).count()
    assert(oddNulls == oddTotal, "odd user ids have no dim row -> null segment")
  }
}
