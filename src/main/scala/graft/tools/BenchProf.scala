package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Profiling harness for the optimization round (guide §1: measure
  * first; §1.4 noop sink; §1.5 labeled jobs). NOT part of the frozen
  * bench — a separate main, as the driver contract prescribes for extra
  * benchmarks.
  *
  * For each query it reports, after a warm-up run: wall seconds (min
  * over reps), Spark job count, stage count, task count and summed task
  * time of ONE forced run — the fixed-overhead profile that dominates
  * tiny-input iterative queries.
  *
  * Usage: runMain graft.tools.BenchProf [--explain outDir] [--reps N] [query ...]
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
  *      SPARK_GRAFT_CPUS (default 32) — same contract as graft.Bench.
  */
object BenchProf {

  final class Counts extends SparkListener {
    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    val taskTimeMs = new java.util.concurrent.atomic.AtomicLong()
    override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
      stages += 1
      tasks += s.stageInfo.numTasks
    }
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
      if (t.taskInfo != null) taskTimeMs.addAndGet(t.taskInfo.duration)
    def reset(): Unit = { jobs = 0; stages = 0; tasks = 0; taskTimeMs.set(0) }
  }

  /** Per-stage metrics of one action: stage id, name, tasks, task time,
    * shuffle read/write, input bytes — the §7.1 stage table without the UI. */
  final class StageTable extends SparkListener {
    case class Row(id: Int, name: String, tasks: Int, taskTimeMs: Long,
                   shufReadMB: Double, shufWriteMB: Double, inputMB: Double)
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[Row]()
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
      val i = s.stageInfo
      val m = i.taskMetrics
      rows.add(Row(i.stageId, i.name.takeWhile(_ != '\n').take(70), i.numTasks,
        m.executorRunTime,
        m.shuffleReadMetrics.totalBytesRead / 1e6,
        m.shuffleWriteMetrics.bytesWritten / 1e6,
        m.inputMetrics.bytesRead / 1e6))
    }
    def dump(): Unit = {
      import scala.jdk.CollectionConverters._
      println(f"${"stage"}%6s ${"tasks"}%5s ${"tasktime_s"}%10s ${"shufR_MB"}%9s ${"shufW_MB"}%9s ${"input_MB"}%9s  name")
      rows.asScala.toSeq.sortBy(_.id).foreach { r =>
        println(f"${r.id}%6d ${r.tasks}%5d ${r.taskTimeMs / 1000.0}%10.1f ${r.shufReadMB}%9.1f ${r.shufWriteMB}%9.1f ${r.inputMB}%9.1f  ${r.name}")
      }
    }
  }

  def pipelineProfile(corpusDir: String, cores: Int): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-pipeline-prof")
      .config("spark.sql.shuffle.partitions", (cores * 2).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val spec = graft.spec.SpecJson.parse(new String(
      getClass.getResourceAsStream("/specs/humans.json").readAllBytes(), "UTF-8"))
    val corpus = spark.read.parquet(corpusDir)
    graft.Pipeline.triples(corpus.sample(0.1, 42L), spec).count() // warm
    val st = new StageTable
    spark.sparkContext.addSparkListener(st)
    val t0 = System.nanoTime()
    val n = graft.Pipeline.triples(corpus, spec).count()
    val secs = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    println(f"pipeline: $n%d triples in $secs%.2f s at $cores cores")
    st.dump()
    spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    if (args.headOption.contains("--pipeline")) {
      pipelineProfile(args(1), if (args.length > 2) args(2).toInt else cores)
      return
    }
    if (args.headOption.contains("--stages")) {
      val name = args(1)
      val spark = SparkSession.builder()
        .master(s"local[$cores]")
        .config("spark.sql.shuffle.partitions", cores.toString)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val q = graft.SparkEntry.queries(name)
      q(spark, sfDir).write.format("noop").mode("overwrite").save() // warm
      val st = new StageTable
      spark.sparkContext.addSparkListener(st)
      val t0 = System.nanoTime()
      q(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      Thread.sleep(500)
      st.dump()
      spark.stop()
      return
    }
    var explainDir: Option[String] = None
    var reps = 3
    val names = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--explain" => explainDir = Some(args(i + 1)); i += 2
        case "--reps"    => reps = args(i + 1).toInt; i += 2
        case q           => names += q; i += 1
      }
    }
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-bench-prof")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val counts = new Counts
    spark.sparkContext.addSparkListener(counts)

    val qs = graft.SparkEntry.queries
    val run = if (names.nonEmpty) names.toSeq else graft.Bench.headline

    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    println(f"${"query"}%-24s ${"min_s"}%8s ${"warm_s"}%8s jobs stages tasks tasktime_s")
    run.foreach { name =>
      try {
        spark.sparkContext.setJobDescription(s"$name warmup")
        val w0 = System.nanoTime()
        force(qs(name)(spark, sfDir))
        val warmS = (System.nanoTime() - w0) / 1e9
        // counted run
        counts.reset()
        spark.sparkContext.setJobDescription(s"$name counted")
        val c0 = System.nanoTime()
        force(qs(name)(spark, sfDir))
        val countedS = (System.nanoTime() - c0) / 1e9
        val (j, st, tk, tt) = (counts.jobs, counts.stages, counts.tasks,
          counts.taskTimeMs.get / 1000.0)
        // min over remaining reps
        val more = (1 until reps).map { _ =>
          val t0 = System.nanoTime(); force(qs(name)(spark, sfDir)); (System.nanoTime() - t0) / 1e9
        }
        val minS = (countedS +: more).min
        println(f"$name%-24s $minS%8.2f $warmS%8.2f $j%4d $st%6d $tk%5d $tt%10.1f")
        explainDir.foreach { d =>
          val sb = new StringBuilder
          sb.append(qs(name)(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
          java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d))
          java.nio.file.Files.writeString(java.nio.file.Paths.get(d, s"$name.txt"),
            sb.toString)
        }
      } catch {
        case e: Throwable =>
          println(f"$name%-24s ERROR ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
