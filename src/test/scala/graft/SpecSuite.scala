package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.spec._

/** Spec parse/validate/migrate unit tests (the reference's
  * DumpSpecTest.java + DumpLoadingIntegrationTest.java roles). */
class SpecSuite extends AnyFunSuite {

  def fixture(name: String): String =
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"src/test/resources/specs/$name")), "UTF-8")

  test("scan pre-gate token derivation (conservative, per-dialect)") {
    import graft.sources.DumpFormat
    // humans: item AND P31=Q5 → the entity-id value token(s)
    val humans = SpecJson.parse(fixture("humans.json"))
    assert(SpecCompiler.prefilterTokens(humans, DumpFormat.Fixture) == Some(Seq("\"Q5\"")))
    assert(SpecCompiler.prefilterTokens(humans, DumpFormat.Wikidata) ==
      Some(Seq("\"Q5\"", "\"numeric-id\":5")))
    // include-all spec (entities empty) → no pre-gate possible
    val all = SpecJson.parse(fixture("english-labels.json"))
    assert(SpecCompiler.prefilterTokens(all, DumpFormat.Fixture).isEmpty)
    // non-entityid restriction → property-name token
    val someval = SpecJson.parse(
      """{"entities":[{"type":"item","properties":[
        |{"type":"somevalue","property":"P40"}]}],
        |"statements":[],"labels":false,"descriptions":false,"aliases":false,
        |"meta":false,"sitelinks":false}""".stripMargin)
    assert(SpecCompiler.prefilterTokens(someval, DumpFormat.Fixture) == Some(Seq("\"P40\"")))
    // disjunction: one token per branch, OR'd
    val disj = SpecJson.parse(
      """{"entities":[
        |{"type":"item","properties":[{"type":"entityid","property":"P31","value":"Q5"}]},
        |{"type":"item","properties":[{"type":"somevalue","property":"P22"}]}],
        |"statements":[],"labels":false,"descriptions":false,"aliases":false,
        |"meta":false,"sitelinks":false}""".stripMargin)
    assert(SpecCompiler.prefilterTokens(disj, DumpFormat.Fixture) ==
      Some(Seq("\"Q5\"", "\"P22\"")))
    // a type-only branch poisons the whole pre-gate (no selective token)
    val typeOnly = SpecJson.parse(
      """{"entities":[
        |{"type":"item","properties":[{"type":"entityid","property":"P31","value":"Q5"}]},
        |{"type":"property","properties":[]}],
        |"statements":[],"labels":false,"descriptions":false,"aliases":false,
        |"meta":false,"sitelinks":false}""".stripMargin)
    assert(SpecCompiler.prefilterTokens(typeOnly, DumpFormat.Fixture).isEmpty)
  }

  test("simple-spec parses to the expected typed model (DumpSpecTest.java:27-63)") {
    val s = SpecJson.parse(fixture("simple-spec.json"))
    assert(s.version == "1")
    assert(s.samplingPercent == 90 && s.seed == 132L)
    assert(s.labels && s.meta && !s.aliases && !s.descriptions && !s.sitelinks)
    assert(s.entities == Seq(EntityFilter("item", Seq(
      PropertyRestriction("P31", SnakFilterType.EntityId, Some("Q101352"), RankFilter.NonDeprecated)))))
    assert(s.statements == Seq(StatementFilter(None,
      StatementOptions(RankFilter.All, simple = true, full = false, references = false, qualifiers = false))))
  }

  test("migrations: missing version→1, missing seed+sampling→100/0, missing rank→ALL") {
    val s = SpecJson.parse("""{"entities":[],"statements":[{"simple":true}]}""")
    assert(s.version == "1" && s.samplingPercent == 100 && s.seed == 0L)
    assert(s.statements.head.options.rank == RankFilter.All)
    // seed alone present → samplingPercent defaults 100 (not migrated pair)
    val s2 = SpecJson.parse("""{"entities":[],"statements":[],"seed":7}""")
    assert(s2.samplingPercent == 100 && s2.seed == 7L)
  }

  test("validation: sampling out of range, entityid value rules, truthy") {
    intercept[IllegalArgumentException](SpecJson.parse(
      """{"entities":[],"statements":[],"samplingPercent":101,"seed":1}"""))
    intercept[IllegalArgumentException](SpecJson.parse(
      """{"entities":[{"type":"item","properties":[{"property":"P1","type":"entityid"}]}],"statements":[]}"""))
    intercept[IllegalArgumentException](SpecJson.parse(
      """{"entities":[{"type":"item","properties":[{"property":"P1","type":"somevalue","value":"Q1"}]}],"statements":[]}"""))
    intercept[IllegalArgumentException](SpecJson.parse(
      """{"entities":[],"statements":[],"truthy":true}"""))
    // truthy:false tolerated (legacy)
    SpecJson.parse("""{"entities":[],"statements":[],"truthy":false}""")
  }

  test("unknown fields and frontend ids are ignored") {
    val s = SpecJson.parse(
      """{"entities":[{"id":2,"type":"item","properties":[
        |{"id":1,"property":"P31","type":"entityid","value":"Q5","bogus":3}]}],
        |"statements":[{"id":0,"simple":true}],"unknownTopLevel":{"x":1}}""".stripMargin)
    assert(s.entities.head.properties.head.value.contains("Q5"))
  }

  test("round-trip: parse→toJson→parse is a fixpoint for all example specs") {
    Seq("nothing.json", "english-labels.json", "humans.json", "politicians.json",
      "scholarly-articles.json", "scholarly-authors.json", "simple-spec.json").foreach { f =>
      val s1 = SpecJson.parse(fixture(f))
      val j1 = SpecJson.toJson(s1)
      val s2 = SpecJson.parse(j1)
      assert(s1 == s2, s"$f model round-trip")
      assert(j1 == SpecJson.toJson(s2), s"$f byte round-trip")
    }
  }

  test("pre-v1 family-filter.json is rejected (schema mismatch)") {
    intercept[Exception](SpecJson.parse(fixture("family-filter.json")))
  }

  test("statement-options resolution (DumpSpec.java:75-91 semantics)") {
    val humans = SpecJson.parse(fixture("humans.json"))
    // default = the property-less simple-only filter
    assert(humans.defaultOptions == StatementOptions(RankFilter.All, true, false, false, false))
    // P569: full+non-deprecated, no union with default (default bucket is separate)
    assert(humans.findOptions("P569") ==
      StatementOptions(RankFilter.NonDeprecated, false, true, false, false))
    assert(humans.findOptions("P31") == humans.defaultOptions)
    assert(humans.hasFullStatements)

    // union: two filters on the same property merge most-permissively
    val merged = SpecJson.parse(
      """{"entities":[],"statements":[
        |{"properties":["P1"],"simple":true,"rank":"best-rank"},
        |{"properties":["P1"],"full":true,"rank":"non-deprecated"}]}""".stripMargin)
    assert(merged.findOptions("P1") ==
      StatementOptions(RankFilter.NonDeprecated, true, true, false, false))
    // default falls back to (BEST_RANK, false×4) with no property-less filter
    assert(merged.defaultOptions == StatementOptions.default)
  }

  test("rank union is most-permissive-wins (RankFilter.java:23-34)") {
    import RankFilter._
    assert(Best.union(All) == All && All.union(Best) == All)
    assert(Best.union(NonDeprecated) == NonDeprecated)
    assert(NonDeprecated.union(All) == All)
    assert(NonDeprecated.union(Best) == NonDeprecated)
    Seq(Best, NonDeprecated, All).foreach(r => assert(r.union(r) == r))
  }

  test("rank matches semantics (RankFilter.java:11-21)") {
    import RankFilter._
    assert(Best.matches("deprecated", best = true)) // best flag governs
    assert(!Best.matches("preferred", best = false))
    assert(NonDeprecated.matches("normal", best = false))
    assert(!NonDeprecated.matches("deprecated", best = true))
    assert(All.matches("deprecated", best = false))
  }
}
