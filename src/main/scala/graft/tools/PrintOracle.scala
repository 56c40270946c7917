package graft.tools

/** Dev helper: print one query's oracle SQL (so a single oracle can be
  * smoke-tested in DuckDB without a full Verify run). */
object PrintOracle {
  def main(args: Array[String]): Unit = args.foreach { name =>
    println(s"-- $name")
    println(graft.SparkEntry.oracleSql.getOrElse(name, s"<no oracle for $name>"))
  }
}
