package graft

import org.apache.spark.sql.SparkSession

/** Scaling evidence for the north rule's two-cluster-size criterion:
  * the same KG pipeline job over the same staged parquet corpus at two
  * CPU allocations. Each measured run is a CHILD JVM pinned with
  * `taskset -c 0..N-1`, so the N-core run really only gets N cores
  * (in-process local[N] bounds task slots but lets GC/IO threads borrow
  * idle cores, inflating the low-parallelism baseline). Runs alternate
  * between levels; the min per level is reported (least-noise estimate
  * on a shared-tenant box). Prints one JSON line.
  *
  * Usage: runMain graft.Scaling [corpusN] [reps]
  */
object Scaling {

  def main(args: Array[String]): Unit = {
    val corpusN = if (args.length > 0) args(0).toLong else 2000000L
    val reps = if (args.length > 1) args(1).toInt else 2
    val loCores = 8; val hiCores = 32

    val corpusDir = java.nio.file.Files.createTempDirectory("graft-scaling").toString
    locally {
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      val s = SparkSession.builder().master(s"local[$hiCores]")
        .config("spark.sql.shuffle.partitions", hiCores.toString)
        .config("spark.ui.enabled", "false").getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      try sources.EntityCorpus.generate(s, corpusN).toDF()
        .repartition(256).write.mode("overwrite").parquet(corpusDir)
      finally s.stop()
    }

    var triples = 0L
    def forkedRuns(cores: Int, n: Int): Seq[Double] = {
      val java = System.getProperty("java.home") + "/bin/java"
      val cp = System.getProperty("java.class.path")
      val addOpens = Seq(
        "java.base/java.lang", "java.base/java.lang.invoke", "java.base/java.lang.reflect",
        "java.base/java.io", "java.base/java.net", "java.base/java.nio",
        "java.base/java.util", "java.base/java.util.concurrent",
        "java.base/java.util.concurrent.atomic", "java.base/sun.nio.ch",
        "java.base/sun.nio.cs", "java.base/sun.security.action",
        "java.base/sun.util.calendar").flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
      val cmd = Seq("taskset", "-c", s"0-${cores - 1}", java) ++ addOpens ++ Seq(
        "-Xmx40g", "-Dspark.ui.enabled=false", "-cp", cp,
        "graft.PipelineRunner", corpusDir, cores.toString, "humans.json", n.toString)
      val out = scala.sys.process.Process(cmd).!!
      out.linesIterator.filter(_.startsWith("SECS=")).map { l =>
        val parts = l.split(" ")
        triples = parts(1).stripPrefix("TRIPLES=").toLong
        parts(0).stripPrefix("SECS=").toDouble
      }.toSeq
    }

    // alternate levels so ambient load hits both equally
    val lo = scala.collection.mutable.ArrayBuffer.empty[Double]
    val hi = scala.collection.mutable.ArrayBuffer.empty[Double]
    (1 to reps).foreach { _ =>
      lo ++= forkedRuns(loCores, 1)
      hi ++= forkedRuns(hiCores, 1)
    }
    val loSec = lo.min; val hiSec = hi.min
    val tputLo = corpusN / loSec; val tputHi = corpusN / hiSec
    val eff = (tputHi / tputLo) / (hiCores.toDouble / loCores)
    System.err.println(s"lo runs: ${lo.map(s => f"$s%.1fs")}; hi runs: ${hi.map(s => f"$s%.1fs")}")
    println(f"""{"metric":"kg pipeline scaling cpuset $loCores->$hiCores cores","corpus_rows":$corpusN,"triples":$triples,"sec_$loCores%dt":$loSec%.2f,"sec_$hiCores%dt":$hiSec%.2f,"entities_per_sec_$loCores%dt":$tputLo%.0f,"entities_per_sec_$hiCores%dt":$tputHi%.0f,"scaling_efficiency":$eff%.3f}""")
  }
}
