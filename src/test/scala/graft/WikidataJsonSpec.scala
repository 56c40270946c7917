package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.{DumpFormat, EntityCorpus, WikidataJson}
import graft.spec.SpecJson

/** S2 over the REAL Wikidata dump JSON dialect: claims object keyed by
  * property, mainsnak/datavalue snaks, `{lang:{language,value}}` terms,
  * sitelinks object (reference input format: wdtk's Jackson model,
  * `DumpRunner.java:84`). Two directions of evidence:
  *  1. hand-written genuine dump lines (copied structurally from the
  *     documented format, NOT via our converter) parse to the expected
  *     internal docs and triples;
  *  2. corpus-level equivalence — the fixture corpus re-encoded as real
  *     dump JSON yields the identical triple set through the
  *     DumpFormat.Wikidata path for every example spec.
  */
class WikidataJsonSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  def specNamed(name: String): graft.spec.DumpSpec =
    SpecJson.parse(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"src/test/resources/specs/$name"))))

  /** a genuine-format item document exercising every datavalue type,
    * snak kinds, qualifiers-order, references and sitelinks. */
  val realItem: String =
    """{"type":"item","id":"Q42",
      |"labels":{"en":{"language":"en","value":"Douglas Adams"},"de":{"language":"de","value":"Douglas Adams"}},
      |"descriptions":{"en":{"language":"en","value":"writer"}},
      |"aliases":{"en":[{"language":"en","value":"DNA"},{"language":"en","value":"Douglas N. Adams"}]},
      |"claims":{
      | "P31":[{"mainsnak":{"snaktype":"value","property":"P31","datatype":"wikibase-item",
      |   "datavalue":{"value":{"entity-type":"item","numeric-id":5,"id":"Q5"},"type":"wikibase-entityid"}},
      |   "type":"statement","id":"Q42$F078E5B3","rank":"normal",
      |   "references":[{"hash":"abc","snaks":{"P854":[{"snaktype":"value","property":"P854","datatype":"url",
      |     "datavalue":{"value":"https://example.org/x","type":"string"}}]},"snaks-order":["P854"]}]}],
      | "P569":[{"mainsnak":{"snaktype":"value","property":"P569","datatype":"time",
      |   "datavalue":{"value":{"time":"+1952-03-11T00:00:00Z","timezone":0,"before":0,"after":0,
      |     "precision":11,"calendarmodel":"http://www.wikidata.org/entity/Q1985727"},"type":"time"}},
      |   "type":"statement","id":"Q42$D5E2C0E5","rank":"preferred",
      |   "qualifiers":{"P1545":[{"snaktype":"value","property":"P1545","datatype":"string",
      |     "datavalue":{"value":"1","type":"string"}}]},"qualifiers-order":["P1545"]}],
      | "P1082":[{"mainsnak":{"snaktype":"value","property":"P1082","datatype":"quantity",
      |   "datavalue":{"value":{"amount":"+42","unit":"http://www.wikidata.org/entity/Q11573"},"type":"quantity"}},
      |   "type":"statement","id":"Q42$QQ1","rank":"normal"}],
      | "P625":[{"mainsnak":{"snaktype":"value","property":"P625","datatype":"globe-coordinate",
      |   "datavalue":{"value":{"latitude":52.75,"longitude":-2.25,"altitude":null,"precision":0.01,
      |     "globe":"http://www.wikidata.org/entity/Q2"},"type":"globecoordinate"}},
      |   "type":"statement","id":"Q42$GC1","rank":"normal"}],
      | "P1448":[{"mainsnak":{"snaktype":"value","property":"P1448","datatype":"monolingualtext",
      |   "datavalue":{"value":{"text":"The Answer","language":"en"},"type":"monolingualtext"}},
      |   "type":"statement","id":"Q42$MT1","rank":"normal"}],
      | "P40":[{"mainsnak":{"snaktype":"somevalue","property":"P40","datatype":"wikibase-item"},
      |   "type":"statement","id":"Q42$SV1","rank":"normal"}],
      | "P22":[{"mainsnak":{"snaktype":"novalue","property":"P22","datatype":"wikibase-item"},
      |   "type":"statement","id":"Q42$NV1","rank":"normal"}]},
      |"sitelinks":{"enwiki":{"site":"enwiki","title":"Douglas Adams","badges":["Q17437796"]},
      | "dewiki":{"site":"dewiki","title":"Douglas Adams","badges":[]}}}""".stripMargin.replace("\n", "")

  val realProperty: String =
    """{"type":"property","id":"P569","datatype":"time",
      |"labels":{"en":{"language":"en","value":"date of birth"}},
      |"descriptions":{},"aliases":{},
      |"claims":{"P31":[{"mainsnak":{"snaktype":"value","property":"P31","datatype":"wikibase-item",
      |  "datavalue":{"value":{"entity-type":"item","numeric-id":18608871},"type":"wikibase-entityid"}},
      |  "type":"statement","id":"P569$1","rank":"normal"}]}}""".stripMargin.replace("\n", "")

  val realLexeme: String =
    """{"type":"lexeme","id":"L99","lemmas":{"en":{"language":"en","value":"run"}},
      |"lexicalCategory":"Q24905","language":"Q1860"}""".stripMargin.replace("\n", "")

  def corpusOf(lines: String*): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    lines.zipWithIndex
      .map { case (c, i) => EntityCorpus.CorpusRow("dump", s"l$i", s"c$i", "wikidata-json", c) }
      .toDF()
  }

  test("real dump line parses to the internal doc shape (all value types)") {
    val doc = EntityCorpus.parse(corpusOf(realItem), DumpFormat.Wikidata)
      .select("doc.*").head()
    assert(doc.getAs[String]("id") == "Q42")
    assert(doc.getAs[String]("type") == "item")
    assert(doc.getAs[Map[String, String]]("labels") ==
      Map("en" -> "Douglas Adams", "de" -> "Douglas Adams"))
    assert(doc.getAs[Map[String, scala.collection.Seq[String]]]("aliases")("en").toSeq ==
      Seq("DNA", "Douglas N. Adams"))
    val stmts = doc.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("statements")
    assert(stmts.size == 7)
    val byProp = stmts.map(s => s.getAs[String]("property") -> s).toMap
    // entityid
    val p31 = byProp("P31")
    assert(p31.getAs[org.apache.spark.sql.Row]("mainSnak").getAs[String]("valueType") == "entityid")
    assert(p31.getAs[org.apache.spark.sql.Row]("mainSnak")
      .getAs[org.apache.spark.sql.Row]("value").getAs[String]("id") == "Q5")
    assert(p31.getAs[scala.collection.Seq[scala.collection.Seq[org.apache.spark.sql.Row]]]("references").size == 1)
    // time with qualifiers-order
    val p569 = byProp("P569")
    assert(p569.getAs[String]("rank") == "preferred")
    val tSnak = p569.getAs[org.apache.spark.sql.Row]("mainSnak")
    assert(tSnak.getAs[org.apache.spark.sql.Row]("value").getAs[String]("time") == "+1952-03-11T00:00:00Z")
    assert(tSnak.getAs[org.apache.spark.sql.Row]("value").getAs[String]("calendar") == "Q1985727")
    assert(p569.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("qualifiers").size == 1)
    // quantity unit IRI stripped to Q-id
    val qSnak = byProp("P1082").getAs[org.apache.spark.sql.Row]("mainSnak")
    assert(qSnak.getAs[org.apache.spark.sql.Row]("value").getAs[String]("amount") == "+42")
    assert(qSnak.getAs[org.apache.spark.sql.Row]("value").getAs[String]("unit") == "Q11573")
    // coordinates
    val gSnak = byProp("P625").getAs[org.apache.spark.sql.Row]("mainSnak")
    assert(gSnak.getAs[org.apache.spark.sql.Row]("value").getAs[Double]("lat") == 52.75)
    assert(gSnak.getAs[org.apache.spark.sql.Row]("value").getAs[String]("globe") == "Q2")
    // snak kinds
    assert(byProp("P40").getAs[org.apache.spark.sql.Row]("mainSnak").getAs[String]("snaktype") == "somevalue")
    assert(byProp("P22").getAs[org.apache.spark.sql.Row]("mainSnak").getAs[String]("snaktype") == "novalue")
    // sitelinks object → array
    assert(doc.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("sitelinks").map(_.getAs[String]("site")).toSet ==
      Set("enwiki", "dewiki"))
  }

  test("entity-id reconstruction when the dump omits 'id' (old-dump shape)") {
    val doc = EntityCorpus.parse(corpusOf(realProperty), DumpFormat.Wikidata)
      .select("doc.*").head()
    assert(doc.getAs[String]("datatype") == "time")
    val s = doc.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("statements").head
    assert(s.getAs[org.apache.spark.sql.Row]("mainSnak")
      .getAs[org.apache.spark.sql.Row]("value").getAs[String]("id") == "Q18608871")
  }

  test("real-format pipeline: humans spec includes Q42, lexeme routed to error channel") {
    val spec = specNamed("humans.json")
    val corpus = corpusOf(realItem, realProperty, realLexeme, "{not json", "{}")
    val triples = Pipeline.triples(corpus, spec, format = DumpFormat.Wikidata)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(triples.exists(t => t._1.endsWith("Q42") &&
      t._2 == graft.emit.Vocab.WDT + "P31" && t._3 == "<" + graft.emit.Vocab.WD + "Q5>"))
    val errs = Pipeline.errors(corpus, spec, DumpFormat.Wikidata).collect()
    assert(errs.count(_.error.contains("malformed")) == 2) // bad JSON + id-less {}
    // lexemes error-channel only when a spec includes them: humans is
    // item-typed, english-labels is include-all
    assert(!errs.exists(_.id == "L99"))
    val errsAll = Pipeline.errors(corpus, specNamed("english-labels.json"), DumpFormat.Wikidata).collect()
    assert(errsAll.count(_.id == "L99") == 1)
  }

  test("scan pre-gate never drops an old-dump doc whose entity value is numeric-only") {
    // P31=Q5 carried ONLY as numeric-id (no "id" string): the Wikidata
    // dialect's pre-gate must include it via the numeric token
    val oldStyle =
      """{"type":"item","id":"Q77","labels":{"en":{"language":"en","value":"old style"}},
        |"descriptions":{},"aliases":{},
        |"claims":{"P31":[{"mainsnak":{"snaktype":"value","property":"P31","datatype":"wikibase-item",
        |  "datavalue":{"value":{"entity-type":"item","numeric-id":5},"type":"wikibase-entityid"}},
        |  "type":"statement","id":"Q77$1","rank":"normal"}]},"sitelinks":{}}"""
        .stripMargin.replace("\n", "")
    val spec = specNamed("humans.json")
    val triples = Pipeline.triples(corpusOf(oldStyle), spec, format = DumpFormat.Wikidata)
    assert(triples.filter(org.apache.spark.sql.functions.col("subj")
      .endsWith("Q77")).count() > 0, "old-dump numeric-only P31=Q5 doc was dropped")
  }

  test("wdref: node ids use the dump-provided reference hash (Wikibase RDF parity)") {
    // references-enabled include-all spec; realItem's P31 statement
    // carries {"hash":"abc"} exactly like genuine dump JSON
    val spec = SpecJson.parse(
      """{"version":"1","entities":[],"labels":false,"descriptions":false,"aliases":false,
        |"meta":false,"sitelinks":false,
        |"statements":[{"simple":false,"full":true,"rank":"all","references":true,"qualifiers":false}]}"""
        .stripMargin)
    val triples = Pipeline.triples(corpusOf(realItem), spec, format = DumpFormat.Wikidata)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    val refIris = triples.collect {
      case (s, p, o) if p == graft.emit.Vocab.PROV_DERIVED_FROM => o
    }
    assert(refIris.nonEmpty, s"no reference triples in ${triples.take(5).toSeq}")
    assert(refIris.forall(_ == "<" + graft.emit.Vocab.WDREF + "abc>"), refIris.toSeq.toString)
    // the reference node itself is emitted under the dump hash
    assert(triples.exists(t => t._1 == graft.emit.Vocab.WDREF + "abc" &&
      t._2 == graft.emit.Vocab.RDF_TYPE))
    // fixture path (no dump hash) keeps the engine's content hash — the
    // fallback is still content-addressed and deduplicating
    val viaFixtureDialect = Pipeline.triples(
      corpusOf("""{"id":"Q1","type":"item","labels":{},"descriptions":{},"aliases":{},
        |"sitelinks":[],"statements":[{"id":"Q1$s1","property":"P31","rank":"normal",
        |"mainSnak":{"property":"P31","snaktype":"value","valueType":"entityid","value":{"id":"Q5"}},
        |"qualifiers":[],"references":[[{"property":"P854","snaktype":"value","valueType":"string",
        |"value":{"str":"https://example.org/x"}}]]}]}""".stripMargin.replace("\n", "")),
      spec)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    val fallback = viaFixtureDialect.collect {
      case (s, p, o) if p == graft.emit.Vocab.PROV_DERIVED_FROM => o
    }
    assert(fallback.nonEmpty && fallback.forall(o =>
      o.startsWith("<" + graft.emit.Vocab.WDREF) && !o.contains("abc")))
  }

  test("equivalence: converted real-dump corpus emits the identical triple set per spec") {
    val fixture = EntityCorpus.generate(spark, 500).toDF().cache()
    val real = WikidataJson.convertCorpus(fixture).cache()
    Seq("humans.json", "english-labels.json", "politicians.json", "nothing.json").foreach { f =>
      val spec = specNamed(f)
      val a = Pipeline.triples(fixture, spec).collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
      val b = Pipeline.triples(real, spec, format = DumpFormat.Wikidata).collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
      assert(a == b, s"$f: real-dump path diverges " +
        s"(fixture-only=${(a -- b).take(3)} real-only=${(b -- a).take(3)})")
    }
    // counters agree too (A1 over the minimal-schema parse)
    val spec = specNamed("humans.json")
    assert(Pipeline.counters(fixture, spec) ==
      Pipeline.counters(real, spec, DumpFormat.Wikidata))
    fixture.unpersist(); real.unpersist()
  }

  test("detectFormat sniffs the dialect from the first dump line") {
    val dir = java.nio.file.Files.createTempDirectory("wjson").toString
    EntityCorpus.writeDump(spark, 50, s"$dir/fixture")
    assert(EntityCorpus.detectFormat(spark, s"$dir/fixture") == DumpFormat.Fixture)
    import spark.implicits._
    WikidataJson.convertCorpus(EntityCorpus.generate(spark, 50).toDF())
      .select("content").as[String]
      .write.option("compression", "gzip").text(s"$dir/real")
    assert(EntityCorpus.detectFormat(spark, s"$dir/real") == DumpFormat.Wikidata)
  }
}
