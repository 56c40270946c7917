package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.oracle.OracleEmitter
import graft.sources.EntityCorpus

/** Randomized whole-spec round-trip: N seeded random DumpSpecs drawn
  * from the FULL spec surface (SpecGens.genSpecSampled — entity filter
  * disjunctions, restriction conjunctions, all snak/rank filter kinds,
  * per-property statement options, languages, toggles, sampling), each
  * run through BOTH the distributed engine and the independent
  * single-threaded oracle, asserting exact triple-set equality AND A1
  * counter equality.
  *
  * This is the stand-in for the reference's 63-production-spec
  * integration corpus (`DumpLoadingIntegrationTest.java:27-62`; the
  * actual spec JSONs are git-LFS pointers with content absent) —
  * GoldenSpec covers the 7 recoverable example specs, MicroSpecSweep
  * covers each axis singly, and this sweep covers the combinatorial
  * interaction space. Seeds are fixed, so failures reproduce exactly. */
class RandomSpecSweepSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  val n = 250
  lazy val contents: Seq[String] = (0L until n.toLong).map(i => EntityCorpus.contentFor(42L, i))
  lazy val corpus = EntityCorpus.generate(spark, n).toDF().cache()

  private val params = Gen.Parameters.default
  val sweeps = 30
  val specs: Seq[(Int, graft.spec.DumpSpec)] = (0 until sweeps).map { i =>
    i -> SpecGens.genSpecSampled.pureApply(params, Seed(7000L + i), retries = 100)
  }

  /** the same corpus rendered as REAL Wikidata dump JSON — every 4th
    * random spec also runs through the `DumpFormat.Wikidata` parse, so
    * the combinatorial spec space exercises both dialects */
  lazy val realCorpus = graft.sources.WikidataJson.convertCorpus(corpus).cache()

  specs.foreach { case (i, spec) =>
    test(s"random spec #$i: engine == oracle (triples + counters)") {
      val oracle = OracleEmitter.run(spec, contents, EntityCorpus.sites)
      val engine = Pipeline.triples(corpus, spec)
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
      val missing = oracle.triples -- engine
      val extra = engine -- oracle.triples
      assert(missing.isEmpty && extra.isEmpty,
        s"#$i $spec: ${missing.size} missing ${missing.take(2)}, ${extra.size} extra ${extra.take(2)}")
      val (ents, stmts) = Pipeline.counters(corpus, spec)
      assert(ents == oracle.entities, s"#$i entities: engine $ents vs oracle ${oracle.entities}")
      assert(stmts == oracle.statements, s"#$i statements: engine $stmts vs oracle ${oracle.statements}")
      if (i % 4 == 0) {
        val real = Pipeline.triples(realCorpus, spec, format = graft.sources.DumpFormat.Wikidata)
          .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
        assert(real == oracle.triples,
          s"#$i real-dump dialect diverges: ${(oracle.triples -- real).take(3)} missing, " +
            s"${(real -- oracle.triples).take(3)} extra")
      }
    }
  }

  test("random sweep is non-trivial: most sampled specs select beyond the prologue") {
    val selecting = specs.count { case (_, spec) =>
      OracleEmitter.run(spec, contents, EntityCorpus.sites).triples.size >
        OracleEmitter.prologue.size
    }
    assert(selecting >= sweeps / 2,
      s"only $selecting/$sweeps random specs selected anything — generator degenerate")
  }
}
