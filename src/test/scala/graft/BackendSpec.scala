package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

/** S7 claim protocol: concurrent workers over the same specsDir/outDir
  * must produce each spec exactly once (the reference's transactional
  * 3-step claim, `Database.java:56-103`, re-expressed as atomic
  * create-if-absent claim files + atomic done markers). */
class BackendSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val specsDir = "src/test/resources/specs"
  /** parseable specs only — the fixture dir deliberately includes an
    * unparseable one (family-filter) for the skip path */
  private def allSpecNames: Set[String] =
    new java.io.File(specsDir).listFiles()
      .filter(_.getName.endsWith(".json"))
      .filter(f => scala.util.Try(graft.spec.SpecJson.parse(
        Files.readString(f.toPath))).isSuccess)
      .map(_.getName.stripSuffix(".json")).toSet

  test("two concurrent workers produce each spec exactly once; third run skips all") {
    val out = Files.createTempDirectory("graft-backend-claims").toString
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val fa = Future(Backend.run(spark, specsDir, "gen:800", out))
      val fb = Future(Backend.run(spark, specsDir, "gen:800", out))
      val ra = Await.result(fa, 10.minutes)
      val rb = Await.result(fb, 10.minutes)
      // exactly-once: the produced sets are disjoint and together cover
      // every spec (each pending spec's claim has exactly one winner)
      assert(ra.produced.toSet.intersect(rb.produced.toSet).isEmpty,
        s"double-produced: ${ra.produced.toSet.intersect(rb.produced.toSet)}")
      assert(ra.produced.toSet ++ rb.produced.toSet == allSpecNames,
        s"coverage gap: ${allSpecNames -- ra.produced.toSet -- rb.produced.toSet}")
      // every spec is live in the snapshot table's current manifest and
      // has one done marker; the two workers' commits are two distinct
      // snapshot versions (the manifest CAS serialized them)
      val table = s"$out/triples"
      val head = graft.sources.SnapshotTable.currentVersion(table)
      val committers = Seq(ra, rb).count(_.produced.nonEmpty)
      assert(head == committers,
        s"expected $committers snapshot versions (one per producing worker), got $head")
      val live = graft.sources.SnapshotTable.snapshotAt(table, head).partitions
      allSpecNames.foreach { n =>
        assert(live.get(n).exists(_.nonEmpty), s"missing live partition $n")
        assert(Files.exists(Paths.get(s"$out/_meta/done/$n.tsv")), s"missing done marker $n")
      }
      // resume: a third worker finds nothing pending
      val rc = Backend.run(spark, specsDir, "gen:800", out)
      assert(rc.produced.isEmpty && rc.skipped.toSet == allSpecNames)
      // stats visible to the third worker cover all specs with rows
      assert(rc.stats.map(_.dumpId).toSet == allSpecNames)
      assert(rc.stats.exists(_.tripleCount > 0))
      // stale-resume guard: a DIFFERENT corpus re-opens every spec —
      // done markers from the old corpus must not be trusted
      val rd = Backend.run(spark, specsDir, "gen:400", out)
      assert(rd.produced.toSet == allSpecNames && rd.skipped.isEmpty,
        s"new corpus must recompute all specs: skipped ${rd.skipped}")
      // and the snapshot's triples now reflect the smaller corpus
      val head2 = graft.sources.SnapshotTable.currentVersion(s"$out/triples")
      assert(head2 == head + 1)
    } finally pool.shutdown()
  }

  test("editing a spec re-opens only that spec under a fresh claim") {
    val out = Files.createTempDirectory("graft-backend-edit").toString
    val mydir = Files.createTempDirectory("graft-backend-specs")
    // two specs: copy from the fixture dir
    Seq("humans.json", "nothing.json").foreach { n =>
      Files.copy(Paths.get(s"$specsDir/$n"), mydir.resolve(n))
    }
    val r1 = Backend.run(spark, mydir.toString, "gen:500", out)
    assert(r1.produced.toSet == Set("humans", "nothing"))
    // touch one spec's CONTENT (append whitespace changes the sha)
    Files.writeString(mydir.resolve("nothing.json"),
      Files.readString(mydir.resolve("nothing.json")) + "\n")
    val r2 = Backend.run(spark, mydir.toString, "gen:500", out)
    assert(r2.produced == Seq("nothing") && r2.skipped == Seq("humans"), r2.toString)
    // the re-run is a REPLACE-PARTITIONS snapshot: only `nothing` was
    // rewritten — `humans` kept its exact v1 data files — and v1 is
    // still time-travelable
    val table = s"$out/triples"
    assert(graft.sources.SnapshotTable.currentVersion(table) == 2)
    val v1 = graft.sources.SnapshotTable.snapshotAt(table, 1).partitions
    val v2 = graft.sources.SnapshotTable.snapshotAt(table, 2).partitions
    assert(graft.sources.SnapshotTable.snapshotAt(table, 2).operation == "replace-partitions")
    assert(v1("humans") == v2("humans"), "untouched partition must keep its files")
    assert(v1("nothing") != v2("nothing"), "edited spec's partition must be rewritten")
    assert(graft.sources.SnapshotTable.read(spark, table, version = 1).count() > 0)
  }

  test("stale claims are taken over; fresh claims are respected") {
    val out = Files.createTempDirectory("graft-backend-stale").toString
    val mydir = Files.createTempDirectory("graft-backend-specs2")
    Files.copy(Paths.get(s"$specsDir/nothing.json"), mydir.resolve("nothing.json"))
    val json = Files.readString(mydir.resolve("nothing.json"))
    // claims are keyed on (spec content, corpus fingerprint) identity
    val ident = json + "\n@corpus:" + Backend.corpusFingerprint("gen:300")
    val sha = java.security.MessageDigest.getInstance("SHA-256")
      .digest(ident.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val claim = Paths.get(s"$out/_meta/claims/nothing-${sha.take(8)}.claim")
    Files.createDirectories(claim.getParent)
    Files.writeString(claim, "run-dead\t0\n")
    // fresh claim (default staleness) → respected, nothing produced
    val r1 = Backend.run(spark, mydir.toString, "gen:300", out)
    assert(r1.produced.isEmpty, r1.toString)
    // with staleness 0 the dead worker's claim is taken over
    val r2 = Backend.run(spark, mydir.toString, "gen:300", out, staleClaimMs = 0L)
    assert(r2.produced == Seq("nothing"), r2.toString)
  }
}
