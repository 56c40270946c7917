package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data export: gzip JSONL, the lingua franca LLM trainers
  * consume (one JSON object per line, schema carried per row). The
  * render is `to_json(struct(...))` — a codegen'd Column expression, so
  * export is a pure map stage appended to whatever plan produced the
  * rows (no shuffle of its own; pass `partitions` to size output files
  * for the downstream reader rather than inheriting upstream
  * parallelism). Field order in each JSON object is the DataFrame's
  * column order — stable across runs, so exports are byte-comparable.
  */
object TrainingSink {

  def writeJsonlGz(df: DataFrame, outDir: String, partitions: Option[Int] = None): Unit = {
    val line = df.select(to_json(struct(df.columns.map(col): _*)).as("value"))
    val sized = partitions.fold(line)(n => line.repartition(n))
    sized.write.mode("overwrite").option("compression", "gzip").text(outDir)
  }

  /** Read an export back with an explicit schema contract (never infer
    * on the 100 TB path: inference is a second full scan). */
  def readJsonl(spark: SparkSession, dir: String, ddl: String): DataFrame =
    spark.read.schema(ddl).json(dir)
}
