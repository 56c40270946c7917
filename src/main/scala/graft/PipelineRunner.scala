package graft

import org.apache.spark.sql.SparkSession

/** Child-JVM pipeline runner for honest scaling measurements: the parent
  * (Bench/Scaling) forks this main under `taskset -c 0..N-1`, so ALL of
  * the JVM's threads (workers, GC, netty, parquet IO) are bounded to N
  * cores — a faithful stand-in for an N-core cluster allocation, unlike
  * in-process local[N] which only bounds task slots.
  *
  * args: <corpusParquetDir> <cores> <specName> [reps]
  * prints one line per measured run: SECS=<seconds> TRIPLES=<count>
  */
object PipelineRunner {
  def main(args: Array[String]): Unit = {
    val Array(corpusDir, coresS, specName) = args.take(3)
    val reps = if (args.length > 3) args(3).toInt else 1
    val cores = coresS.toInt
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-pipeline-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val spec = graft.spec.SpecJson.parse(new String(
      getClass.getResourceAsStream(s"/specs/$specName").readAllBytes(), "UTF-8"))
    val corpus = spark.read.parquet(corpusDir)
    // warm-up (JIT/codegen/parquet footers) on a 10% sample: C2 needs
    // ~10^4 invocations, a 10% pass provides ~10^5 rows through every
    // operator at a tenth of the cost of a full warm pass; the measured
    // run's own plan still pays only its one-off ~100ms janino compile
    Pipeline.triples(corpus.sample(0.1, 42L), spec).count()
    (1 to reps).foreach { _ =>
      val t0 = System.nanoTime()
      val n = Pipeline.triples(corpus, spec).count()
      println(f"SECS=${(System.nanoTime() - t0) / 1e9}%.3f TRIPLES=$n%d")
    }
    spark.stop()
  }
}
