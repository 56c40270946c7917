package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.spec._
import graft.sources.EntityCorpus
import graft.oracle.OracleEmitter

/** Systematic micro-spec sweep (FIXTURES.md §3): one spec per filter
  * axis — every snak-filter type × every rank filter × each statement
  * option bit × language filter × toggles × options-union overlap —
  * each run through BOTH the engine and the independent oracle,
  * asserting set equality. Complements GoldenSpec's 7 real specs with
  * exhaustive single-axis coverage. */
class MicroSpecSweepSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  val n = 250
  lazy val contents: Seq[String] = (0L until n.toLong).map(i => EntityCorpus.contentFor(42L, i))
  lazy val corpus = EntityCorpus.generate(spark, n).toDF().cache()

  def base: DumpSpec = DumpSpec("1", Nil, Nil, 100, 0L, None,
    labels = false, descriptions = false, aliases = false, meta = false, sitelinks = false)
  def sf(opts: StatementOptions, props: Option[Set[String]] = None) =
    StatementFilter(props, opts)
  def so(rank: RankFilter = RankFilter.All, simple: Boolean = false, full: Boolean = false,
         refs: Boolean = false, quals: Boolean = false) =
    StatementOptions(rank, simple, full, refs, quals)

  val microSpecs: Seq[(String, DumpSpec)] = {
    val snakTypes = Seq(
      "any" -> PropertyRestriction("P569", SnakFilterType.Any, None, RankFilter.All),
      "anyvalue" -> PropertyRestriction("P569", SnakFilterType.AnyValue, None, RankFilter.All),
      "somevalue" -> PropertyRestriction("P569", SnakFilterType.SomeValue, None, RankFilter.All),
      "novalue" -> PropertyRestriction("P40", SnakFilterType.NoValue, None, RankFilter.All),
      "entityid" -> PropertyRestriction("P31", SnakFilterType.EntityId, Some("Q5"), RankFilter.All))
    val rankAxes = Seq(
      "rank-best" -> PropertyRestriction("P569", SnakFilterType.Any, None, RankFilter.Best),
      "rank-nondep" -> PropertyRestriction("P569", SnakFilterType.Any, None, RankFilter.NonDeprecated),
      // P22 groups are deprecated-only in the corpus: non-deprecated must
      // select NOTHING there (still engine==oracle, intentionally empty)
      "rank-nondep-empty" -> PropertyRestriction("P22", SnakFilterType.Any, None, RankFilter.NonDeprecated),
      "rank-all-deprecated-group" -> PropertyRestriction("P22", SnakFilterType.Any, None, RankFilter.All))

    (snakTypes ++ rankAxes).map { case (name, r) =>
      s"filter-$name" -> base.copy(
        entities = Seq(EntityFilter("item", Seq(r))),
        statements = Seq(sf(so(simple = true))), labels = true)
    } ++ Seq(
      "etype-property" -> base.copy(entities = Seq(EntityFilter("property", Nil))),
      "etype-any" -> base.copy(entities = Seq(EntityFilter("any", Nil))),
      "opt-simple" -> base.copy(statements = Seq(sf(so(simple = true)))),
      "opt-full" -> base.copy(statements = Seq(sf(so(full = true))), meta = true),
      "opt-refs" -> base.copy(statements = Seq(sf(so(refs = true)))),
      "opt-quals" -> base.copy(statements = Seq(sf(so(full = true, quals = true)))),
      "opt-full-bestrank" -> base.copy(statements = Seq(sf(so(rank = RankFilter.Best, full = true)))),
      "opt-simple-nondep" -> base.copy(statements = Seq(sf(so(rank = RankFilter.NonDeprecated, simple = true)))),
      "opt-perprop" -> base.copy(statements = Seq(
        sf(so(simple = true), Some(Set("P31"))),
        sf(so(full = true, refs = true), Some(Set("P1082"))))),
      "opt-union-overlap" -> base.copy(statements = Seq(
        sf(so(rank = RankFilter.Best, simple = true), Some(Set("P569"))),
        sf(so(rank = RankFilter.NonDeprecated, full = true), Some(Set("P569"))))),
      "toggle-labels" -> base.copy(labels = true),
      "toggle-descriptions" -> base.copy(descriptions = true),
      "toggle-aliases" -> base.copy(aliases = true),
      "toggle-sitelinks" -> base.copy(sitelinks = true),
      "toggle-meta" -> base.copy(meta = true),
      "lang-en-only" -> base.copy(labels = true, descriptions = true, aliases = true,
        languages = Some(Set("en"))),
      "lang-empty" -> base.copy(labels = true, languages = Some(Set.empty)),
      "sampling-37" -> base.copy(labels = true, samplingPercent = 37, seed = 99L),
      "sampling-0" -> base.copy(labels = true, samplingPercent = 0, seed = 1L),
      "conjunction-two-restrictions" -> base.copy(entities = Seq(EntityFilter("item", Seq(
        PropertyRestriction("P31", SnakFilterType.EntityId, Some("Q5"), RankFilter.All),
        PropertyRestriction("P569", SnakFilterType.AnyValue, None, RankFilter.All)))),
        statements = Seq(sf(so(simple = true)))),
      "disjunction-two-filters" -> base.copy(entities = Seq(
        EntityFilter("item", Seq(PropertyRestriction("P31", SnakFilterType.EntityId, Some("Q5"), RankFilter.All))),
        EntityFilter("property", Nil)),
        statements = Seq(sf(so(simple = true))))
    )
  }

  microSpecs.foreach { case (name, spec) =>
    test(s"micro-spec $name: engine == oracle") {
      val oracle = OracleEmitter.run(spec, contents, EntityCorpus.sites)
      val engine = Pipeline.triples(corpus, spec)
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
      val missing = oracle.triples -- engine
      val extra = engine -- oracle.triples
      assert(missing.isEmpty && extra.isEmpty,
        s"$name: ${missing.size} missing ${missing.take(2)}, ${extra.size} extra ${extra.take(2)}")
      // non-triviality guard: the axis should select SOMETHING unless it
      // is an intentionally-empty case
      val emptyOk = Set("sampling-0", "lang-empty", "filter-rank-nondep-empty")
      if (!emptyOk(name))
        assert(oracle.triples.size > OracleEmitter.prologue.size, s"$name selected nothing — axis untested")
    }
  }
}
