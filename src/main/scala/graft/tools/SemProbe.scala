package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measure-first breakdown of q_semdedup's stages (not part of the
  * frozen bench). */
object SemProbe {
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
    import graft.operators._
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[semprobe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val emb0 = s.read.parquet(s"$sfDir/embeddings.parquet").select(col("vec_id"), col("embedding"))
    val copies = emb0.filter(pmod(col("vec_id"), lit(20)) === 0)
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
    val emb = emb0.unionByName(copies)
    (1 to 2).foreach { rep =>
      val v0 = time("spread")(Par.spread(emb))
      val cents = time("train")(Ivf.train(v0, 8, 2))
      val assigned = time("assign+mat") { val a = Ivf.assign(v0, cents); a.count(); a }
      val edges = time("pairs") {
        val e = SemDedup.duplicateEdges(v0, assigned, 950000L)
        println("  edges=" + e.count()); e
      }
      val edgesM = time("edges-mat") {
        val m = graft.plans.Iter.mat(edges); m.count(); m
      }
      val groups = time("cc")(graft.plans.ConnectedComponents.run(edgesM))
      time("final") {
        assigned.join(groups.withColumnRenamed("node", "vec_id"), Seq("vec_id"), "left_outer")
          .select(col("vec_id"), col("cid"),
            coalesce(col("component"), col("vec_id")).as("rep_id"))
          .withColumn("keep", (col("vec_id") === col("rep_id")).cast("int"))
          .write.format("noop").mode("overwrite").save()
      }
      println(s"rep $rep done")
    }
    s.stop()
  }
}
