package graft

import org.apache.spark.sql.SparkSession

/** One shared session for the whole test run. Parallelism is
  * env-tunable so the suite can be proven green at two levels
  * (north-rule gate): `GRAFT_TEST_CORES=16 sbt -batch test`. */
object TestSpark {
  private val cores = sys.env.getOrElse("GRAFT_TEST_CORES", "4")
  lazy val spark: SparkSession = SparkSession.builder()
    .master(s"local[$cores]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", cores)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.adaptive.enabled", "true")
    .getOrCreate()
}
