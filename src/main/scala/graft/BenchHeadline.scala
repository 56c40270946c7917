package graft

/** Headline-queries-only bench pass: the per-query half of [[Bench]]
  * without the corpus staging or the scaling-pair protocol — for
  * re-measuring query timings in a quiet window after a full run's
  * headline phase was tenant-contended (the scaling record and the
  * headline don't have to share a window; each is gated separately).
  * Prints the same one-line JSON shape (`queries` map only). */
object BenchHeadline {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val s = Bench.session(32)
    val qs = SparkEntry.queries
    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    Bench.headline.foreach { name =>
      Bench.force(qs(name)(s, sfDir)) // warm-up excluded from timing
      val secs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        Bench.force(qs(name)(s, sfDir))
        (System.nanoTime() - t0) / 1e9
      }.min
      results(name) = secs
      System.err.println(f"[bench-headline] $name: $secs%.3f s")
    }
    val qJson = results.map { case (k, v) => f""""$k":$v%.3f""" }.mkString("{", ",", "}")
    println(s"""{"metric":"graft headline queries (quiet re-run)","value":${results.values.sum},"unit":"sec","queries":$qJson,"sf":"$sfDir"}""")
    s.stop()
  }
}
