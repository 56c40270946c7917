package graft

import org.scalacheck.Gen
import graft.spec._

/** Shared scalacheck generators over the whole DumpSpec surface
  * (reference `DumpSpec.java` field space): entity filters (type +
  * restriction conjunctions), statement filters (property sets ×
  * options), rank filters, snak-filter types, language filters, term
  * toggles — used by PropertySpec's algebraic laws and by
  * RandomSpecSweepSpec's engine==oracle equality sweep. */
object SpecGens {
  val genRank: Gen[RankFilter] =
    Gen.oneOf(RankFilter.Best, RankFilter.NonDeprecated, RankFilter.All)
  val genOptions: Gen[StatementOptions] = for {
    r <- genRank; s <- Gen.prob(0.5); f <- Gen.prob(0.5)
    re <- Gen.prob(0.4); q <- Gen.prob(0.4)
  } yield StatementOptions(r, s, f, re, q)
  val genProps: Gen[Option[Set[String]]] = Gen.option(
    Gen.nonEmptyContainerOf[Set, String](Gen.oneOf("P31", "P569", "P106", "P1082", "P625")))
  val genStatementFilter: Gen[StatementFilter] =
    for { p <- genProps; o <- genOptions } yield StatementFilter(p, o)
  val genRestriction: Gen[PropertyRestriction] = for {
    p <- Gen.oneOf("P31", "P569", "P106", "P40")
    t <- Gen.oneOf(SnakFilterType.Any, SnakFilterType.AnyValue, SnakFilterType.SomeValue,
      SnakFilterType.NoValue, SnakFilterType.EntityId)
    v <- Gen.oneOf("Q5", "Q101352", "Q13442814")
    r <- genRank
  } yield PropertyRestriction(p, t, if (t == SnakFilterType.EntityId) Some(v) else None, r)
  val genEntityFilter: Gen[EntityFilter] = for {
    t <- Gen.oneOf("item", "property", "any")
    rs <- Gen.listOfN(2, genRestriction).map(_.take(2))
    n <- Gen.choose(0, 2)
  } yield EntityFilter(t, rs.take(n))
  val genSpec: Gen[DumpSpec] = for {
    ents <- Gen.listOfN(2, genEntityFilter).flatMap(l => Gen.choose(0, 2).map(l.take))
    stmts <- Gen.listOfN(2, genStatementFilter).flatMap(l => Gen.choose(0, 2).map(l.take))
    labels <- Gen.prob(0.5); descr <- Gen.prob(0.5); aliases <- Gen.prob(0.5)
    meta <- Gen.prob(0.5); sl <- Gen.prob(0.5)
    langs <- Gen.option(Gen.someOf(Seq("en", "de", "fr")).map(_.toSet))
  } yield DumpSpec("1", ents, stmts, 100, 0L, langs, labels, descr, aliases, meta, sl)

  /** genSpec widened with the sampling axis (F7) — the full production
    * spec surface in one generator. */
  val genSpecSampled: Gen[DumpSpec] = for {
    spec <- genSpec
    pct <- Gen.frequency(3 -> Gen.const(100), 2 -> Gen.choose(1, 99), 1 -> Gen.const(0))
    seed <- Gen.choose(0L, 999L)
  } yield spec.copy(samplingPercent = pct, seed = seed)
}
