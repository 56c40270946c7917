package graft

import org.apache.spark.sql.SparkSession

/** Scaling evidence for the north rule's two-cluster-size criterion:
  * the same KG pipeline job over the same staged parquet corpus at two
  * local parallelism levels (default 8 vs 32 threads), repeated runs,
  * median-reported. Prints one JSON line.
  *
  * Usage: runMain graft.Scaling [corpusN] [reps]
  */
object Scaling {

  private def session(cores: Int): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-scaling-$cores")
      .config("spark.sql.shuffle.partitions", math.max(cores, 32).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def gcMillis: Long =
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .stream.mapToLong(_.getCollectionTime).sum

  def main(args: Array[String]): Unit = {
    val corpusN = if (args.length > 0) args(0).toLong else 400000L
    val reps = if (args.length > 1) args(1).toInt else 3
    val loCores = 8; val hiCores = 32

    val corpusDir = java.nio.file.Files.createTempDirectory("graft-scaling").toString
    locally {
      val s = session(hiCores)
      try sources.EntityCorpus.generate(s, corpusN).toDF()
        .repartition(256).write.mode("overwrite").parquet(corpusDir)
      finally s.stop()
    }
    val humans = graft.spec.SpecJson.parse(new String(
      getClass.getResourceAsStream("/specs/humans.json").readAllBytes(), "UTF-8"))

    def run(cores: Int): (Double, Long, Long) = {
      val s = session(cores)
      try {
        val corpus = s.read.parquet(corpusDir)
        var triples = 0L
        val gc0 = gcMillis
        val t0 = System.nanoTime()
        triples = Pipeline.triples(corpus, humans).count()
        val sec = (System.nanoTime() - t0) / 1e9
        (sec, triples, gcMillis - gc0)
      } finally s.stop()
    }

    // warm-up both paths once (codegen/classloading), then alternate
    run(loCores); run(hiCores)
    val lo = (1 to reps).map { _ => run(loCores) }
    val hi = (1 to reps).map { _ => run(hiCores) }
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    val loSec = median(lo.map(_._1)); val hiSec = median(hi.map(_._1))
    val tputLo = corpusN / loSec; val tputHi = corpusN / hiSec
    val eff = (tputHi / tputLo) / (hiCores.toDouble / loCores)
    val triples = hi.head._2
    System.err.println(s"lo runs: ${lo.map(r => f"${r._1}%.1fs gc=${r._3}ms")}")
    System.err.println(s"hi runs: ${hi.map(r => f"${r._1}%.1fs gc=${r._3}ms")}")
    println(f"""{"metric":"kg pipeline scaling local[$loCores]->local[$hiCores]","corpus_rows":$corpusN,"triples":$triples,"sec_$loCores%dt":$loSec%.2f,"sec_$hiCores%dt":$hiSec%.2f,"entities_per_sec_$loCores%dt":$tputLo%.0f,"entities_per_sec_$hiCores%dt":$tputHi%.0f,"scaling_efficiency":$eff%.3f}""")
  }
}
