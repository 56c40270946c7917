package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off probe: phase/round telemetry + wall time of the q_scc
  * fixture graph (measure-first aid; not part of the frozen bench). */
object SccProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val s = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val ev = s.read.parquet(s"$sfDir/events.parquet")
    val g1 = ev.groupBy((col("user_id") % 101L).as("src"))
      .agg((min(col("event_id")) % 101L).as("dst"))
    val g2 = ev.groupBy((col("event_id") % 101L).as("src"))
      .agg((max(col("user_id")) % 101L).as("dst"))
    val edges = g1.union(g2)
    (1 to 2).foreach { rep =>
      val t0 = System.nanoTime()
      graft.plans.Scc.run(edges,
        telemetry = st => println(s"  phase ${st.phase}: trim=${st.trimRounds} " +
          s"color=${st.colorRounds} harvest=${st.harvestRounds} assigned=${st.assignedThisPhase}"))
        .write.format("noop").mode("overwrite").save()
      println(f"rep $rep: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    s.stop()
  }
}
