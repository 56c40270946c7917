package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.emit.NTriples
import graft.sources.{EntityCorpus, NtReader}

class NtReaderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("unescape inverts escape on every escape class") {
    val nasty = Seq(
      "plain",
      "",
      "quote\" backslash\\ tab\t nl\n cr\r",
      "\\n is two chars, \n is one",
      "controlchars",
      "unicode é中😀 passthrough", // é中😀 (surrogate pair)
      "trailing backslash\\",
      "\\\\\\\"" // \\\" → literal \ then "
    )
    nasty.foreach { s =>
      assert(NTriples.unescape(NTriples.escape(s)) == s, s"round-trip of ${s.toList}")
    }
    // explicit decodes incl. \uXXXX, \UXXXXXXXX, \b \f, unknown-escape tolerance
    assert(NTriples.unescape("a\\u0041b") == "aAb")
    assert(NTriples.unescape("a\\U0001F600b") == "a😀b")
    assert(NTriples.unescape("a\\b\\fb") == "a\b\fb")
    assert(NTriples.unescape("odd\\xkeep") == "oddxkeep")
  }

  test("malformed UCHAR escapes degrade to pass-through instead of throwing") {
    // non-hex digits after \u / \U: pass-through like any unknown escape
    assert(NTriples.unescape("a\\uZZZZb") == "auZZZZb")
    assert(NTriples.unescape("a\\uZ123b") == "auZ123b")
    assert(NTriples.unescape("a\\UGGGGGGGGb") == "aUGGGGGGGGb")
    // \U beyond U+10FFFF (incl. the unsigned-wrap case \UFFFFFFFF):
    // Character.toChars would throw — must degrade, not fail the task
    assert(NTriples.unescape("a\\UFFFFFFFFb") == "aUFFFFFFFFb")
    assert(NTriples.unescape("a\\U00110000b") == "aU00110000b")
    assert(NTriples.unescape("a\\U80000000b") == "aU80000000b")
    // the maximum valid codepoint still decodes
    assert(NTriples.unescape("a\\U0010FFFFb") ==
      "a" + new String(Character.toChars(0x10FFFF)) + "b")
    // truncated escapes at end-of-string pass through
    assert(NTriples.unescape("trunc\\u00") == "truncu00")
    assert(NTriples.unescape("trunc\\U0001F60") == "truncU0001F60")
  }

  test("parseLines classifies terms, drops comments/blanks, flags malformed") {
    import spark.implicits._
    val lines = Seq(
      "<http://s/1> <http://p/a> <http://o/1> .",
      "  <http://s/1> <http://p/b> \"v\\\"w\\nx\"@en-GB .", // leading spaces, escapes
      "<http://s/2> <http://p/c> \"42\"^^<http://dt/int> .",
      "_:b0 <http://p/d> _:b1 .",
      "# a comment",
      "",
      "not a triple at all"
    ).toDF("line")
    val got = NtReader.parseLines(lines, $"line").collect()
    assert(got.length == 5) // comment + blank dropped, malformed kept as err
    val byPred = got.filter(_.getAs[String]("objKind") != "err")
      .map(r => r.getAs[String]("pred") -> r).toMap
    assert(byPred("http://p/a").getAs[String]("objIri") == "http://o/1")
    val lit1 = byPred("http://p/b")
    assert(lit1.getAs[String]("lexical") == "v\"w\nx")
    assert(lit1.getAs[String]("lang") == "en-GB")
    assert(lit1.getAs[String]("datatype") == null)
    val lit2 = byPred("http://p/c")
    assert(lit2.getAs[String]("lexical") == "42")
    assert(lit2.getAs[String]("lang") == null)
    assert(lit2.getAs[String]("datatype") == "http://dt/int")
    val bn = byPred("http://p/d")
    assert(bn.getAs[String]("subj") == "_:b0" && bn.getAs[String]("objKind") == "bnode")
    assert(got.count(_.getAs[String]("objKind") == "err") == 1)
  }

  test("reader round-trips the emitter's gzip N-Triples output exactly") {
    import spark.implicits._
    val spec = graft.spec.SpecJson.parse(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("src/main/resources/specs/humans.json"))))
    val triples = Pipeline.triples(EntityCorpus.generate(spark, 500).toDF(), spec)
      .select("subj", "pred", "obj").cache()
    val dir = java.nio.file.Files.createTempDirectory("graft-ntread").toString
    Pipeline.writeNt(triples, dir)
    val back = NtReader.triples(spark, dir)
    // set equality both ways via anti-joins (exact, no collect of full sets)
    assert(back.exceptAll(triples).count() == 0, "reader produced extra triples")
    assert(triples.exceptAll(back).count() == 0, "reader lost triples")
    // all three object kinds occur in real emitter output, none malformed
    val kinds = NtReader.readNt(spark, dir).groupBy("objKind").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kinds.contains("iri") && kinds.contains("literal"), kinds.toString)
    assert(!kinds.contains("err"), kinds.toString)
    triples.unpersist()
  }

  test("dump-to-dump diff reports exactly the added and removed triples") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-ntdiff")
    val t0 = Seq(
      ("http://s/1", "http://p", "<http://o/1>"),
      ("http://s/2", "http://p", "\"kept\"@en"),
      ("http://s/3", "http://p", "\"gone\"")).toDF("subj", "pred", "obj")
    val t1 = Seq(
      ("http://s/1", "http://p", "<http://o/1>"),
      ("http://s/2", "http://p", "\"kept\"@en"),
      ("http://s/4", "http://p", "\"new\"")).toDF("subj", "pred", "obj")
    Pipeline.writeNt(t0, s"$base/old")
    Pipeline.writeNt(t1, s"$base/new")
    val got = NtReader.diff(spark, s"$base/old", s"$base/new")
      .collect().map(r => (r.getString(0), r.getString(2), r.getString(3))).toSet
    assert(got == Set(
      ("http://s/4", "\"new\"", "added"),
      ("http://s/3", "\"gone\"", "removed")), got.toString)
  }

  test("parse stays in whole-stage codegen (no UDF, native nt_unescape)") {
    // a file-backed scan (a local Seq constant-folds to LocalTableScan)
    val f = java.nio.file.Files.createTempDirectory("graft-ntplan").resolve("a.nt")
    java.nio.file.Files.writeString(f, "<http://s> <http://p> \"x\" .\n")
    val df = NtReader.readNt(spark, f.toString)
    val plan = df.queryExecution.executedPlan.toString
    // "*(n)" prefixes mark operators inside a WholeStageCodegen stage
    assert(plan.contains("*(1) Project"), plan)
    assert(!plan.toLowerCase.contains("batchevalpython") && !plan.contains("ScalaUDF"), plan)
    assert(df.count() == 1)
  }
}
