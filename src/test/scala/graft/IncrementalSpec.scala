package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.plans.Incremental
import graft.sources.EntityCorpus

/** Incremental refresh must be indistinguishable from a full recompute
  * while provably touching only the changed slice of the corpus. */
class IncrementalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def humans = graft.spec.SpecJson.parse(new String(
    java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      "src/main/resources/specs/humans.json"))))

  test("refresh == full recompute; stats count exactly the delta") {
    import spark.implicits._
    val n = 600L
    val seq = regexp_extract(col("path"), "entities/(\\d+)\\.json", 1).cast("long")

    // corpus v1: entities 0..n-1 (seed 42)
    val v1 = EntityCorpus.generate(spark, n).toDF()
    // corpus v2: delete seq%17==0; REPLACE content of seq%13==0 with a
    // seed-43 regeneration (different labels/statements — sha and
    // triples both change); append 40 brand-new entities
    val deleted = (0L until n).count(_ % 17 == 0)
    val changed = (0L until n).count(i => i % 13 == 0 && i % 17 != 0)
    val unchanged = n - deleted - changed
    val v2 = v1.filter(seq % 17 =!= 0 && seq % 13 =!= 0)
      .unionByName(EntityCorpus.generate(spark, n, seed = 43L).toDF()
        .filter(seq % 13 === 0 && seq % 17 =!= 0))
      .unionByName(EntityCorpus.generate(spark, n + 40L).toDF().filter(seq >= n))

    val oldTriples = Incremental.triplesWithLineage(v1, humans).cache()
    val oldShas = Incremental.corpusShas(v1).cache()
    val (refreshed, stats) = Incremental.refresh(oldTriples, oldShas, v2, humans)

    assert(stats == Incremental.RefreshStats(
      recomputed = changed + 40, unchanged = unchanged, removed = deleted),
      s"entity-level delta accounting: $stats")

    val full = Incremental.triplesWithLineage(v2, humans)
    assert(refreshed.exceptAll(full).isEmpty && full.exceptAll(refreshed).isEmpty,
      "refresh must be bag-equal to recomputing everything")

    // a second refresh with nothing changed recomputes nothing and
    // returns the same table (idempotent resume)
    val (again, stats2) = Incremental.refresh(refreshed, Incremental.corpusShas(v2),
      v2, humans)
    assert(stats2.recomputed == 0 && stats2.removed == 0)
    assert(again.exceptAll(full).isEmpty && full.exceptAll(again).isEmpty)

    // materialized dump equals the normal pipeline over v2
    val dump = Incremental.dump(refreshed)
    val direct = Pipeline.triples(v2, humans)
    assert(dump.exceptAll(direct).isEmpty && direct.exceptAll(dump).isEmpty,
      "dedup + prologue materialization must match Pipeline.triples")
  }
}
