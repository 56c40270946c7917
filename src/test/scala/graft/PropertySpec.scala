package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.spec._
import graft.sources.EntityCorpus
import graft.oracle.OracleEmitter

/** Property-based invariants (FIXTURES.md §5) — checked on the oracle
  * emitter (pure, fast); the GoldenSpec equality transfers them to the
  * engine. Deterministic driver over scalacheck Gen (seeded pureApply;
  * scalatestplus bridge is not in the offline cache). */
class PropertySpec extends AnyFunSuite {

  private val params = Gen.Parameters.default
  def forAllN[A](g: Gen[A], n: Int)(f: A => Unit): Unit =
    (0 until n).foreach(i => f(g.pureApply(params, Seed(i.toLong), retries = 100)))
  def forAllN2[A, B](ga: Gen[A], gb: Gen[B], n: Int)(f: (A, B) => Unit): Unit =
    (0 until n).foreach { i =>
      f(ga.pureApply(params, Seed(i.toLong), retries = 100),
        gb.pureApply(params, Seed(i.toLong + 10000), retries = 100))
    }

  val contents: Seq[String] = (0L until 120L).map(i => EntityCorpus.contentFor(42L, i))

  import SpecGens._

  def emit(spec: DumpSpec): Set[(String, String, String)] =
    OracleEmitter.run(spec, contents, EntityCorpus.sites).triples

  test("monotonicity: adding a statement filter never shrinks the triple set") {
    forAllN2(genSpec, genStatementFilter, 25) { (spec, extra) =>
      val bigger = spec.copy(statements = spec.statements :+ extra)
      val a = emit(spec); val b = emit(bigger)
      assert(a.subsetOf(b), s"lost ${(a -- b).take(3)}")
    }
  }

  test("monotonicity: widening languages never shrinks the triple set") {
    forAllN(genSpec, 15) { spec0 =>
      val spec = spec0.copy(languages = Some(Set("en")))
      val wider = spec0.copy(languages = Some(Set("en", "de", "fr")))
      assert(emit(spec).subsetOf(emit(wider)))
    }
  }

  test("entity filters are a disjunction: adding a filter never shrinks") {
    forAllN2(genSpec, genEntityFilter, 20) { (spec0, extra) =>
      // nonEmpty baseline (empty list means include-all)
      if (spec0.entities.nonEmpty) {
        val bigger = spec0.copy(entities = spec0.entities :+ extra)
        assert(emit(spec0).subsetOf(emit(bigger)))
      }
    }
  }

  test("empty entities ⇒ every serializable document included (DumpSpec.java:120)") {
    val spec = DumpSpec("1", Nil, Nil, 100, 0, None, false, false, false, false, false)
    val included = contents.count { c =>
      val n = new com.fasterxml.jackson.databind.ObjectMapper().readTree(c)
      OracleEmitter.includeDocument(spec, n)
    }
    assert(included == contents.size)
  }

  test("sampling subset property: pct1 <= pct2 ⇒ sample(pct1) ⊆ sample(pct2), same seed") {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    forAllN2(Gen.zip(Gen.choose(0, 100), Gen.choose(0, 100)), Gen.choose(0L, 5L), 20) {
      case ((p1, p2), seed) =>
      val (lo, hi) = (math.min(p1, p2), math.max(p1, p2))
      def sample(p: Int) = {
        val spec = DumpSpec("1", Nil, Nil, p, seed, None, false, false, false, false, false)
        contents.filter(c => OracleEmitter.includeDocument(spec, mapper.readTree(c))).toSet
      }
      assert(sample(lo).subsetOf(sample(hi)))
    }
  }

  test("rank-filter widening never shrinks (union order Best<NonDep<All)") {
    forAllN(genSpec, 15) { spec0 =>
      def withRank(r: RankFilter) = spec0.copy(statements =
        Seq(StatementFilter(None, StatementOptions(r, simple = true, full = true, references = true, qualifiers = true))))
      val best = emit(withRank(RankFilter.Best))
      val nd = emit(withRank(RankFilter.NonDeprecated))
      val all = emit(withRank(RankFilter.All))
      assert(best.subsetOf(nd) && nd.subsetOf(all))
    }
  }

  test("NT escape round-trips") {
    def unescape(s: String): String = {
      val sb = new StringBuilder; var i = 0
      while (i < s.length) {
        if (s.charAt(i) == '\\' && i + 1 < s.length) {
          s.charAt(i + 1) match {
            case '\\' => sb.append('\\'); i += 2
            case '"'  => sb.append('"'); i += 2
            case 'n'  => sb.append('\n'); i += 2
            case 'r'  => sb.append('\r'); i += 2
            case 't'  => sb.append('\t'); i += 2
            case 'u'  => sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar); i += 6
            case c    => sb.append(c); i += 2
          }
        } else { sb.append(s.charAt(i)); i += 1 }
      }
      sb.toString
    }
    forAllN(Gen.asciiStr, 200) { s =>
      assert(unescape(graft.emit.NTriples.escape(s)) == s)
    }
    // unicode passthrough + control-char escapes
    assert(graft.emit.NTriples.escape("a\"b\\c\nd\t\u0001\u00fc") == "a\\\"b\\\\c\\nd\\t\\u0001\u00fc")
  }

  test("SC6: dateTime lexical - Julian->Gregorian, zero clamp, year forms") {
    import graft.emit.NTriples._
    // Julian->Gregorian reference pairs (public calendar arithmetic):
    // the 1582 reform boundary, the 1900 12-day gap, era start, 44 BCE
    assert(julianToGregorian(1582, 10, 5) == (1582, 10, 15))
    assert(julianToGregorian(1900, 1, 1) == (1900, 1, 13))
    assert(julianToGregorian(1700, 2, 19) == (1700, 3, 1))
    assert(julianToGregorian(1, 1, 1) == (0, 12, 30))
    assert(julianToGregorian(-43, 3, 15) == (-43, 3, 13))
    // literal forms
    assert(dateTimeLexical("+1582-10-05T00:00:00Z", 11, "Q1985786") == "1582-10-15T00:00:00Z")
    assert(dateTimeLexical("+1952-03-11T00:00:00Z", 11, "Q1985727") == "1952-03-11T00:00:00Z")
    // zero month/day at coarse precision clamp to 01 (both calendars,
    // Julian NOT converted below day precision)
    assert(dateTimeLexical("+1800-00-00T00:00:00Z", 9, "Q1985727") == "1800-01-01T00:00:00Z")
    assert(dateTimeLexical("+1500-00-00T00:00:00Z", 9, "Q1985786") == "1500-01-01T00:00:00Z")
    // negative + 5-digit years
    assert(dateTimeLexical("-0044-03-15T00:00:00Z", 11, "Q1985727") == "-0044-03-15T00:00:00Z")
    assert(dateTimeLexical("+12000-01-01T00:00:00Z", 11, "Q1985727") == "12000-01-01T00:00:00Z")
    assert(dateTimeLexical("-13000000000-00-00T00:00:00Z", 0, "Q1985727") ==
      "-13000000000-01-01T00:00:00Z")
  }

  test("SC6: decimal lexical - sign strip, exponent expansion, fidelity") {
    import graft.emit.NTriples._
    assert(decimalLexical("+1.5") == "1.5")
    assert(decimalLexical("-2") == "-2")
    assert(decimalLexical("1.5E-7") == "0.00000015")
    assert(decimalLexical("-2E3") == "-2000")
    assert(decimalLexical("+1.50") == "1.50") // trailing zeros preserved
  }

  test("SC5: language-code canonicalization (deprecated map + BCP-47 casing)") {
    import graft.emit.Vocab.fixLanguageCode
    assert(fixLanguageCode("als") == "gsw")
    assert(fixLanguageCode("sr-ec") == "sr-Cyrl")
    assert(fixLanguageCode("sr-el") == "sr-Latn")
    assert(fixLanguageCode("zh-hans") == "zh-Hans")
    assert(fixLanguageCode("zh-min-nan") == "nan")
    assert(fixLanguageCode("kk-cyrl") == "kk-Cyrl")
    assert(fixLanguageCode("en-gb") == "en-GB")
    assert(fixLanguageCode("pt-br") == "pt-BR")
    assert(fixLanguageCode("be-x-old") == "be-tarask")
    assert(fixLanguageCode("en") == "en")
    assert(fixLanguageCode("de-formal") == "de-formal") // documented deviation
  }
}
