package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Bpe

/** BPE training: greedy-merge closed form vs a literal fold reference,
  * overlap semantics, determinism, and the one-shuffle plan shape. */
class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def toksOf(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[String]] =
    df.orderBy("doc_id", "pos").collect()
      .groupBy(_.getLong(0)).map { case (k, rs) => k -> rs.map(_.getString(2)).toSeq }

  // literal greedy left-to-right merge (the textbook definition)
  private def refMerge(toks: List[String], pa: String, pb: String): List[String] = toks match {
    case a :: b :: rest if a == pa && b == pb => s"$pa $pb" :: refMerge(rest, pa, pb)
    case a :: rest => a :: refMerge(rest, pa, pb)
    case Nil => Nil
  }

  private def refLearn(docs: Map[Long, List[String]], rounds: Int): Seq[(Int, String, String, Long)] = {
    var cur = docs
    (1 to rounds).flatMap { r =>
      val counts = cur.values.flatMap(ts => ts.zip(ts.drop(1)))
        .groupBy(identity).map { case (p, v) => (p, v.size.toLong) }
      if (counts.isEmpty) None
      else {
        val ((l, rr), n) = counts.minBy { case ((l, rr), n) => (-n, l, rr) }
        cur = cur.map { case (k, ts) => k -> refMerge(ts, l, rr) }
        Some((r, l, rr, n))
      }
    }
  }

  test("mergeRound: overlap runs merge at odd offsets only") {
    val df = Seq((1L, "a a a"), (2L, "a a a a"), (3L, "x a a y a a"), (4L, "a"), (5L, "b a"))
      .toDF("doc_id", "text")
    val merged = Bpe.mergeRound(Bpe.tokenTable(df, $"doc_id", $"text"), "a", "a")
    assert(toksOf(merged) == Map(
      1L -> Seq("a a", "a"), 2L -> Seq("a a", "a a"),
      3L -> Seq("x", "a a", "y", "a a"), 4L -> Seq("a"), 5L -> Seq("b", "a")))
  }

  test("learnBpe matches the literal fold reference on random corpora") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val docs = (1L to 12L).map { i =>
        i -> List.fill(3 + rnd.nextInt(12))(Seq("a", "b", "c")(rnd.nextInt(3)))
      }.toMap
      val df = docs.toSeq.map { case (i, ts) => (i, ts.mkString(" ")) }.toDF("doc_id", "text")
      val got = Bpe.learnBpe(df, $"doc_id", $"text", rounds = 4)
        .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
      val want = refLearn(docs, 4)
      assert(got == want, s"trial $trial: got $got want $want")
      // inference replays training: applying the merge table reproduces
      // the trained token stream
      val applied = toksOf(Bpe.applyMerges(df, $"doc_id", $"text", want.map(m => (m._2, m._3))))
      var ref = docs
      want.foreach { case (_, l, r, _) => ref = ref.map { case (k, ts) => k -> refMerge(ts, l, r) } }
      assert(applied == ref.map { case (k, v) => k -> v.toSeq })
    }
  }

  test("learnBpe on the sf0.001 documents matches the fold reference") {
    val sf = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$sf/documents.parquet").exists)
    val df = spark.read.parquet(s"$sf/documents.parquet")
    val docs = df.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toList).toMap
    val got = Bpe.learnBpe(df, $"doc_id", $"text", rounds = 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got == refLearn(docs, 3), s"got $got")
  }

  test("mergeRoundMulti == sequential mergeRound for non-interacting pairs (incl. self-overlap)") {
    val rnd = new scala.util.Random(11)
    // alphabet a..h; the pair set is pairwise non-interacting in the
    // output-inclusive sense — ("a","a") exercises the odd-offset island
    // rule INSIDE a multi-pair pass
    val pairs = Seq(("a", "a"), ("b", "c"), ("d", "e"))
    for (trial <- 1 to 3) {
      val docs = (1L to 10L).map { i =>
        i -> List.fill(4 + rnd.nextInt(14))("abcdefgh" (rnd.nextInt(8)).toString)
      }.toMap
      val df = docs.toSeq.map { case (i, ts) => (i, ts.mkString(" ")) }.toDF("doc_id", "text")
      val tok = Bpe.tokenTable(df, $"doc_id", $"text")
      val multi = toksOf(Bpe.mergeRoundMulti(tok, pairs))
      val seqFwd = toksOf(pairs.foldLeft(tok) { case (t, (l, r)) => Bpe.mergeRound(t, l, r) })
      val seqRev = toksOf(pairs.reverse.foldLeft(tok) { case (t, (l, r)) => Bpe.mergeRound(t, l, r) })
      assert(multi == seqFwd, s"trial $trial fwd")
      assert(multi == seqRev, s"trial $trial: order-safety violated")
    }
  }

  test("interacts: output-inclusive token sharing") {
    assert(Bpe.interacts(("a", "b"), ("b", "c")))   // shared input token
    assert(Bpe.interacts(("a", "b"), ("c", "a")))   // chain
    assert(Bpe.interacts(("a", "b"), ("a b", "c"))) // output of one is input of other
    assert(Bpe.interacts(("x", "y"), ("w", "x y"))) // symmetric output case
    assert(!Bpe.interacts(("a", "b"), ("c", "d")))
    assert(!Bpe.interacts(("a", "a"), ("b", "c")))
  }

  test("learnBpeBatched == learnBpe where batching is provably safe") {
    // isolated 2-token documents: merges never create a new adjacency
    // (the merged token fills the whole document), so the sequential
    // learner's next choice is always the next pre-existing pair —
    // exactly the regime where batch selection equals sequential
    val freqs = Seq(("a", "b", 16), ("c", "d", 8), ("e", "f", 4), ("g", "h", 2), ("i", "j", 1))
    val rows = for { ((l, r, n), pi) <- freqs.zipWithIndex; k <- 0 until n }
      yield (pi * 100L + k, s"$l $r")
    val df = rows.toDF("doc_id", "text")
    val seqM = Bpe.learnBpe(df, $"doc_id", $"text", rounds = 5)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val bat = Bpe.learnBpeBatched(df, $"doc_id", $"text", merges = 5, batch = 3)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(bat.map(m => (m._1, m._3, m._4, m._5)).toSeq == seqM)
    assert(bat.map(_._2).max == 2, "5 merges at batch=3 must take 2 passes")
    // interacting candidates are deferred, never merged in the same pass
    val chain = Seq.fill(8)((1L, "a b c")).zipWithIndex.map { case ((_, t), i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = Bpe.learnBpeBatched(chain, $"doc_id", $"text", merges = 2, batch = 8)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2), r.getString(3))).toSeq
    assert(got == Seq((1, 1, "a", "b"), (2, 2, "a b", "c")), got.toString)
  }

  test("learnBpeBatched: 256 merges complete in <= 64 corpus passes") {
    // 256 disjoint-alphabet pairs with distinct frequencies: every pass
    // fills its whole batch, so 256 merges = 16 passes at batch=16
    val rows = for { p <- 0 until 256; k <- 0 to (256 - p) / 32 }
      yield (p * 1000L + k, s"L$p R$p")
    val df = rows.toDF("doc_id", "text").repartition(8)
    val m = Bpe.learnBpeBatched(df, $"doc_id", $"text", merges = 256, batch = 16)
      .select("round", "pass").collect()
    assert(m.length == 256)
    val passes = m.map(_.getInt(1)).max
    assert(passes <= 64, s"256 merges took $passes passes")
  }

  test("learnBpeSampled: deterministic sample, merges apply to the full corpus") {
    val rnd = new scala.util.Random(3)
    val df = (1L to 400L).map(i =>
      (i, List.fill(6)(Seq("a", "b", "c")(rnd.nextInt(3))).mkString(" "))).toDF("doc_id", "text")
    val m1 = Bpe.learnBpeSampled(df, $"doc_id", $"text", merges = 3, fraction = 0.5)
      .collect().map(_.toSeq).toSeq
    val m2 = Bpe.learnBpeSampled(df.repartition(7), $"doc_id", $"text", merges = 3, fraction = 0.5)
      .collect().map(_.toSeq).toSeq
    assert(m1 == m2, "sample must be partition-invariant")
    assert(m1.nonEmpty)
    // the learned table applies to the FULL corpus
    val applied = Bpe.applyMerges(df, $"doc_id", $"text",
      m1.map(r => (r(2).toString, r(3).toString)))
    assert(applied.count() > 0)
  }

  test("mergeRound is one window shuffle: doc-prefixed partition keys reuse the exchange") {
    val df = Seq((1L, "a b a b")).toDF("doc_id", "text")
    val plan = Bpe.mergeRound(Bpe.tokenTable(df, $"doc_id", $"text"), "a", "b")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 shuffle, got $exchanges:\n$plan")
  }
}
