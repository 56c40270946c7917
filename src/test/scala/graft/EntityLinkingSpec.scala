package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.EntityLinking
import graft.sources.EntityCorpus

class EntityLinkingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("dictionary: labels outrank aliases; ambiguity splits the prior") {
    import spark.implicits._
    val corpus = EntityCorpus.generate(spark, 300).toDF()
    val dict = EntityLinking.buildDictionary(EntityCorpus.parse(corpus)).cache()
    assert(dict.count() > 0)
    // label surfaces ("labels en of Qx") present with prior 2000 (unambiguous)
    val label = dict.filter($"surface" === "labels en of q1").collect()
    if (label.nonEmpty) assert(label.head.getLong(2) == 2000L)
    // every prior positive and <= 2000
    assert(dict.filter($"prior" <= 0 || $"prior" > 2000).count() == 0)
    dict.unpersist()
  }

  test("mention detection finds planted multi-token mentions via broadcast join") {
    import spark.implicits._
    val corpus = EntityCorpus.generate(spark, 200).toDF()
    val parsed = EntityCorpus.parse(corpus)
    val dict = EntityLinking.buildDictionary(parsed)
    // plant documents around surfaces that actually exist in the dictionary
    val surfaces = dict.select("surface").distinct().orderBy("surface")
      .limit(2).collect().map(_.getString(0))
    val Array(s1, s2) = surfaces
    val docs = Seq(
      (1L, s"we discussed $s1 yesterday"),
      (2L, "nothing relevant here at all"),
      (3L, s"both $s1 and $s2 appear")
    ).toDF("doc_id", "text")
    val mentions = EntityLinking.detectMentions(docs, $"doc_id", $"text", dict, maxGram = 5)
    val byDoc = mentions.groupBy("doc_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byDoc.contains(1L) && byDoc.contains(3L), s"mentions missed: $byDoc")
    assert(!byDoc.contains(2L), s"false mention in doc 2: $byDoc")
    // doc 3 mentions two distinct entities
    val d3 = mentions.filter($"doc_id" === 3L).select("entity").distinct().count()
    assert(d3 >= 2)
  }

  test("ngrams: single-pass scan — one Generate in the plan, reference-exact grams") {
    import spark.implicits._
    val docs = Seq(
      (1L, "Alan Turing broke Enigma"),
      (2L, "a"),          // shorter than maxGram: only the unigram
      (3L, "x y"),        // exactly two tokens
      (4L, "")            // split("") = [""] -> filtered out entirely
    ).toDF("doc_id", "text")
    val maxGram = 3
    val got = EntityLinking.ngrams(docs, $"doc_id", $"text", maxGram)
    // plan: ONE Generate (the union formulation had maxGram of them)
    val generates = "Generate".r.findAllIn(got.queryExecution.executedPlan.toString).size
    assert(generates == 1, s"expected 1 Generate, got $generates")
    // reference semantics computed literally
    val want = (for {
      (id, text) <- Seq((1L, "alan turing broke enigma"), (2L, "a"), (3L, "x y"))
      toks = text.split(" ").toSeq
      n <- 1 to maxGram
      p <- 0 to toks.length - n
    } yield (id, p, toks.slice(p, p + n).mkString(" "), n)).toSet
    val rows = got.collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
    assert(rows.length == rows.toSet.size, "duplicate grams")
    assert(rows.toSet == want, s"got ${rows.toSet} want $want")
  }

  test("link scoring prefers context-supported candidates deterministically") {
    import spark.implicits._
    // synthetic ambiguity: surface "apple" → Q_FRUIT or Q_CORP; doc A has
    // another fruit mention, doc B a corp mention — context must decide
    val dict = Seq(
      ("apple", "Q_CORP", 500L), ("apple", "Q_FRUIT", 500L),
      ("banana", "Q_BANANA", 1000L), ("iphone", "Q_IPHONE", 1000L)
    ).toDF("surface", "entity", "prior")
    val classes = Seq(
      ("Q_CORP", "C_COMPANY"), ("Q_FRUIT", "C_FRUIT"),
      ("Q_BANANA", "C_FRUIT"), ("Q_IPHONE", "C_COMPANY")
    ).toDF("entity", "cls")
    val docs = Seq(
      (10L, "apple and banana salad"),
      (20L, "apple released a new iphone")
    ).toDF("doc_id", "text")
    val mentions = EntityLinking.detectMentions(docs, $"doc_id", $"text", dict, maxGram = 1)
    val linked = EntityLinking.scoreLinks(mentions, classes)
      .filter($"surface" === "apple")
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(linked(10L) == "Q_FRUIT", s"doc 10 linked ${linked(10L)}")
    assert(linked(20L) == "Q_CORP", s"doc 20 linked ${linked(20L)}")
  }

  test("overlap resolution: longer mention suppresses contained shorter ones") {
    import spark.implicits._
    val dict = Seq(
      ("alan turing", "Q7251", 2000L),
      ("alan", "Q123", 500L),
      ("turing", "Q7251", 1000L),
      ("turing", "Q163992", 1000L),
      ("enigma", "Q160925", 1500L)
    ).toDF("surface", "entity", "prior")
    val classes = Seq(("Q7251", "Q5"), ("Q163992", "Q618779")).toDF("entity", "cls")
    val docs = Seq((1L, "alan turing broke enigma"), (2L, "turing alone here")).toDF("doc_id", "text")
    val mentions = EntityLinking.detectMentions(docs, $"doc_id", $"text", dict, maxGram = 3)
    val resolved = EntityLinking.resolveOverlaps(EntityLinking.scoreLinks(mentions, classes))
      .select("doc_id", "surface", "pos").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    // doc 1: the bigram "alan turing" [0,2) suppresses "alan" [0,1) and
    // "turing" [1,2); "enigma" is untouched
    assert(resolved.contains((1L, "alan turing", 0)), resolved.toString)
    assert(!resolved.contains((1L, "alan", 0)) && !resolved.contains((1L, "turing", 1)),
      s"contained mention survived: $resolved")
    assert(resolved.contains((1L, "enigma", 3)))
    // doc 2: no longer mention exists → the unigram stands
    assert(resolved.contains((2L, "turing", 0)))
  }

  test("end-to-end link over generated corpus + documents table shape") {
    import spark.implicits._
    val corpus = EntityCorpus.generate(spark, 300).toDF()
    val surfaces = EntityLinking.buildDictionary(EntityCorpus.parse(corpus))
      .select("surface").distinct().orderBy("surface").limit(2).collect().map(_.getString(0))
    val docs = Seq(
      (1L, s"report about ${surfaces(0)} and ${surfaces(1)}"),
      (2L, "no entities at all")).toDF("doc_id", "text")
    val linked = EntityLinking.link(EntityCorpus.parse(corpus), docs, $"doc_id", $"text", maxGram = 5)
    assert(linked.filter($"doc_id" === 1L).count() > 0)
    assert(linked.filter($"doc_id" === 2L).count() == 0)
    // deterministic across runs
    val l2 = EntityLinking.link(EntityCorpus.parse(corpus), docs, $"doc_id", $"text", maxGram = 5)
    assert(linked.collect().map(_.toString).sorted.toSeq == l2.collect().map(_.toString).sorted.toSeq)
  }
}
