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

  test("mergeRound is one window shuffle: doc-prefixed partition keys reuse the exchange") {
    val df = Seq((1L, "a b a b")).toDF("doc_id", "text")
    val plan = Bpe.mergeRound(Bpe.tokenTable(df, $"doc_id", $"text"), "a", "b")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 shuffle, got $exchanges:\n$plan")
  }
}
