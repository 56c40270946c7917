package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import graft.spec.{DumpSpec, SpecJson}
import graft.sources.EntityCorpus
import java.util.concurrent.atomic.AtomicLong

/** Multi-spec batch worker — the reference's production path
  * (`Backend.java:100-156`): claim pending specs, run them all over ONE
  * shared scan, persist per-spec stats + run metadata, report progress.
  *
  * The reference's MariaDB job store becomes a `_meta` parquet directory
  * with `dump` (spec registry), `run`, and `dump_stats` tables; the
  * claim protocol (S7, `Database.createRun` 3-step token) degenerates to
  * an atomic rename of the claimed spec list (single worker here; a real
  * deployment would use a lakehouse table with optimistic commit).
  * Progress (A2) comes from a SparkListener counting task rows on a
  * timer, like the reference's `ProgressReporter.java:24-66`.
  *
  * Usage: runMain graft.Backend <specsDir> <corpusParquet|gen:N> <outDir> [cores]
  */
object Backend {

  case class DumpRow(dumpId: String, specJson: String, createdAt: String)
  case class RunRow(runId: String, startedAt: String, finishedAt: String, count: Long)
  case class StatsRow(runId: String, dumpId: String, entityCount: Long,
                      statementCount: Long, tripleCount: Long)

  def main(args: Array[String]): Unit = {
    val specsDir = if (args.length > 0) args(0) else "src/main/resources/specs"
    val corpusArg = if (args.length > 1) args(1) else "gen:20000"
    val outDir = if (args.length > 2) args(2) else "/tmp/graft-backend"
    val cores = if (args.length > 3) args(3) else sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")

    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-backend")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // ---- S7: claim pending specs (directory-scan intake) ----
    val specFiles = new java.io.File(specsDir).listFiles()
      .filter(f => f.getName.endsWith(".json"))
      .sortBy(_.getName)
      .flatMap { f =>
        val json = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
        try Some((f.getName.stripSuffix(".json"), json, SpecJson.parse(json)))
        catch { case e: Exception =>
          System.err.println(s"[backend] skipping unparseable spec ${f.getName}: ${e.getMessage}")
          None
        }
      }.toSeq
    require(specFiles.nonEmpty, s"no parseable specs in $specsDir")
    val runId = "run-" + java.util.UUID.randomUUID.toString.take(8)
    val startedAt = java.time.Instant.now.toString

    // ---- resume from checkpoint (north rule): a spec is DONE iff the
    // checkpoint manifest records the sha256 of its exact spec JSON and
    // its per-spec triple partition exists. Re-runs skip completed specs
    // without recomputation; changing a spec's content invalidates only
    // that spec. (Deploy-time this is an Iceberg snapshot + REPLACE
    // PARTITION commit; parquet + manifest stands in here.)
    def specSha(json: String): String = {
      val md = java.security.MessageDigest.getInstance("SHA-256")
      md.digest(json.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    val ckptPath = java.nio.file.Paths.get(s"$outDir/_meta/checkpoint.tsv")
    val done: Map[String, String] =
      if (java.nio.file.Files.exists(ckptPath))
        scala.io.Source.fromFile(ckptPath.toFile).getLines().filter(_.nonEmpty)
          .map { l => val Array(k, v) = l.split("\t"); k -> v }.toMap
      else Map.empty
    val (skipped, pending) = specFiles.partition { case (name, json, _) =>
      done.get(name).contains(specSha(json)) &&
        new java.io.File(s"$outDir/triples/specId=$name").exists
    }
    skipped.foreach { case (n, _, _) => println(s"[backend] resume: $n already complete, skipping") }

    // ---- A2: progress reporter (processing-time timer over listener counts)
    val rowsSeen = new AtomicLong()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null) rowsSeen.addAndGet(t.taskMetrics.inputMetrics.recordsRead)
    })
    val timer = new java.util.Timer("graft-progress", true)
    timer.scheduleAtFixedRate(new java.util.TimerTask {
      def run(): Unit = System.err.println(s"[backend] progress: ~${rowsSeen.get} input records read")
    }, 10000, 10000)

    val corpus =
      if (corpusArg.startsWith("gen:")) EntityCorpus.generate(spark, corpusArg.drop(4).toLong).toDF()
      else if (corpusArg.endsWith(".gz") || corpusArg.endsWith(".bz2") || corpusArg.endsWith(".zst")
        || corpusArg.contains("dump")) EntityCorpus.readDump(spark, corpusArg)
      else spark.read.parquet(corpusArg)

    // ---- D3/S3: ONE multiplexed pass serves every pending spec ----
    val specs = pending.map { case (name, _, spec) => name -> spec }.toSeq
    val t0 = System.nanoTime()
    if (specs.nonEmpty) {
      // dynamic partition overwrite: only pending specId partitions are
      // replaced, completed ones stay untouched (resume-safe)
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      val triples = Pipeline.triplesMultiplexed(corpus, specs)
      triples.repartition(specs.size, col("specId"))
        .write.mode("overwrite").partitionBy("specId").parquet(s"$outDir/triples")
    }

    // ---- per-spec stats (A1/A5) from the written table + counters ----
    val written = spark.read.parquet(s"$outDir/triples")
    val tripleCounts = written.groupBy("specId").agg(count(lit(1)).as("tripleCount"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val prevStats: Map[String, StatsRow] =
      if (new java.io.File(s"$outDir/_meta/dump_stats").exists)
        spark.read.parquet(s"$outDir/_meta/dump_stats").as[StatsRow].collect()
          .map(s => s.dumpId -> s).toMap
      else Map.empty
    val allCounters =
      if (specs.nonEmpty) Pipeline.countersMultiplexed(corpus, specs)
      else Map.empty[String, (Long, Long)]
    val stats = specs.map { case (name, _) =>
      val (ents, stmts) = allCounters(name)
      StatsRow(runId, name, ents, stmts, tripleCounts.getOrElse(name, 0L))
    } ++ skipped.flatMap { case (name, _, _) => prevStats.get(name) }
    val finishedAt = java.time.Instant.now.toString

    // per-partition lineage manifest for the triple table (resume audit)
    written.groupBy(col("specId"), spark_partition_id().as("part"))
      .agg(count(lit(1)).as("triples"), min("subj").as("min_subj"), max("subj").as("max_subj"))
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/_meta/partition_manifest")

    // commit the checkpoint (spec name -> content sha) LAST — crash
    // before this line means the spec reruns, which is safe (idempotent
    // partition overwrite)
    val ckpt = specFiles.map { case (n, j, _) => s"$n\t${specSha(j)}" }.mkString("", "\n", "\n")
    java.nio.file.Files.createDirectories(ckptPath.getParent)
    java.nio.file.Files.writeString(ckptPath, ckpt)

    // ---- metadata tables (the MariaDB analog; J4/J5 join-able) ----
    specFiles.map { case (n, j, _) => DumpRow(n, j, startedAt) }.toSeq.toDF()
      .write.mode("overwrite").parquet(s"$outDir/_meta/dump")
    Seq(RunRow(runId, startedAt, finishedAt, rowsSeen.get)).toDF()
      .write.mode("overwrite").parquet(s"$outDir/_meta/run")
    stats.toSeq.toDF().write.mode("overwrite").parquet(s"$outDir/_meta/dump_stats")

    // ---- A5: run-level stats over the joined metadata (dump ⋈ run ⋈ stats)
    val report = spark.read.parquet(s"$outDir/_meta/dump_stats").as("s")
      .join(spark.read.parquet(s"$outDir/_meta/run").as("r"), $"s.runId" === $"r.runId")
      .join(spark.read.parquet(s"$outDir/_meta/dump").as("d"), $"s.dumpId" === $"d.dumpId", "left_outer")
      .select($"s.dumpId", $"s.entityCount", $"s.statementCount", $"s.tripleCount")
      .orderBy($"s.dumpId")
    timer.cancel()
    val secs = (System.nanoTime() - t0) / 1e9
    report.collect().foreach(r => println(s"[backend] ${r.mkString(" | ")}"))
    println(f"[backend] run=$runId specs=${specs.size} wall=$secs%.1fs out=$outDir")
    spark.stop()
  }
}
