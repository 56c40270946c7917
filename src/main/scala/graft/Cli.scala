package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.EntityCorpus
import graft.spec.SpecJson

/** CLI entry point: one spec, one corpus, one N-Triples output —
  * the reference's `Cli` path (`Cli.java:27-75`): parse/compile spec →
  * plan → execute → report counts and wall time.
  *
  * Usage: runMain graft.Cli <spec.json path|classpath name> <outDir>
  *          [corpusParquetDir|gen:<n>|dump:<path>] [cores] [sitesFile]
  *
  * `dump:` inputs accept line-JSON dumps (gzip/bz2/zstd) in either the
  * fixture or the real Wikidata dump dialect — sniffed from the first
  * line. `sitesFile` loads the sitelink resolution table (JSON lines or
  * CSV: site, url_pattern, lang) in place of the built-in fixture map
  * (reference `DumpRunner.java:71`).
  */
object Cli {
  def main(args: Array[String]): Unit = {
    val specArg = if (args.length > 0) args(0) else "humans.json"
    val outDir = if (args.length > 1) args(1) else "/tmp/graft-out"
    val corpusArg = if (args.length > 2) args(2) else "gen:2000"
    val cores = if (args.length > 3) args(3) else sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val sitesArg = if (args.length > 4) Some(args(4)) else None

    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-cli")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val specJson =
      if (new java.io.File(specArg).exists)
        new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(specArg)), "UTF-8")
      else {
        val in = getClass.getResourceAsStream(s"/specs/$specArg")
        require(in != null, s"spec not found: $specArg")
        val src = scala.io.Source.fromInputStream(in, "UTF-8")
        try src.mkString finally src.close()
      }
    val spec = SpecJson.parse(specJson)

    val (corpus, format) =
      if (corpusArg.startsWith("gen:"))
        (EntityCorpus.generate(spark, corpusArg.drop(4).toLong).toDF(),
          graft.sources.DumpFormat.Fixture: graft.sources.DumpFormat)
      else if (corpusArg.startsWith("dump:")) {
        val p = corpusArg.drop(5)
        (EntityCorpus.readDump(spark, p), EntityCorpus.detectFormat(spark, p))
      } else (spark.read.parquet(corpusArg),
        graft.sources.DumpFormat.Fixture: graft.sources.DumpFormat)
    val sites = sitesArg.map(EntityCorpus.readSites(spark, _)).getOrElse(EntityCorpus.sites)

    val t0 = System.nanoTime()
    val triples = Pipeline.triples(corpus, spec, sites = sites, format = format)
    Pipeline.writeNt(triples, outDir + "/nt")
    Pipeline.writeTripleTable(triples, outDir + "/triples")
    val errs = Pipeline.errors(corpus, spec, format)
    errs.write.mode("overwrite").parquet(outDir + "/_errors")
    val nTriples = spark.read.parquet(outDir + "/triples").count()
    val nErrors = spark.read.parquet(outDir + "/_errors").count()
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"[graft.Cli] triples=$nTriples%d errors=$nErrors%d wall=$secs%.1fs out=$outDir")
    spark.stop()
  }
}
