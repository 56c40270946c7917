package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measure-first breakdown of the KG pipeline map stage (guide §1):
  * times each prefix of scan → prefilter → gate → full parse → emit →
  * dedup on a staged corpus. Usage:
  *   runMain graft.tools.PipeBreakdown <corpusDir> [cores]
  */
object PipeBreakdown {
  def main(args: Array[String]): Unit = {
    val corpusDir = args(0)
    val cores = if (args.length > 1) args(1).toInt else 32
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", (cores * 2).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.spec.SpecCompiler
    val fmt = graft.sources.DumpFormat.Fixture
    val spec = graft.spec.SpecJson.parse(new String(
      getClass.getResourceAsStream("/specs/humans.json").readAllBytes(), "UTF-8"))
    val corpus = spark.read.parquet(corpusDir)

    val dedupOnly = args.length > 2 && args(2) == "--dedup-only"
    def timeIt(name: String)(f: => Long): Unit = {
      f // warm
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"[breakdown] $name%-28s min=${runs.map(_._1).min}%8.2f s  " +
        f"all=${runs.map(r => f"${r._1}%.1f").mkString(",")}  rows=${runs.head._2}%d")
    }

    if (!dedupOnly) {
    timeIt("scan only (count content)") {
      corpus.select(length(col("content"))).agg(sum("length(content)")).head(); corpus.count()
    }
    timeIt("+ prefilter contains") {
      corpus.filter(SpecCompiler.prefilter(spec, col("content"), fmt)).count()
    }
    timeIt("+ gate (minimal parse)") {
      corpus.filter(SpecCompiler.prefilter(spec, col("content"), fmt) &&
        fmt.gate(col("content"), d => d("type") =!= "lexeme" &&
          SpecCompiler.includePredicate(spec, d))).count()
    }
    timeIt("+ full parse (doc ids)") {
      corpus.filter(SpecCompiler.prefilter(spec, col("content"), fmt) &&
        fmt.gate(col("content"), d => d("type") =!= "lexeme" &&
          SpecCompiler.includePredicate(spec, d)))
        .select(fmt.doc(col("content")).as("doc"))
        .select(count(col("doc.id"))).head().getLong(0); 0L
    }
    timeIt("+ emit flatMap (no dedup)") {
      graft.Pipeline.triples(corpus, spec, dedup = false).count()
    }
    }
    timeIt("full (with dedup)") {
      graft.Pipeline.triples(corpus, spec).count()
    }
    // dedup variants over the same emitted stream
    timeIt("dedup B: repartition first") {
      val t = graft.Pipeline.triples(corpus, spec, dedup = false)
      t.repartition(col("subj"), col("pred"), col("obj"))
        .dropDuplicates("subj", "pred", "obj").count()
    }
    timeIt("dedup C: mapPartitions set") {
      val t = graft.Pipeline.triples(corpus, spec, dedup = false)
      import spark.implicits._
      t.repartition(col("subj"), col("pred"), col("obj"))
        .as[(String, String, String)]
        .mapPartitions { it =>
          val seen = new java.util.HashSet[(String, String, String)]()
          it.filter(seen.add)
        }.count()
    }
    timeIt("dedup D: sort + adjacent") {
      val t = graft.Pipeline.triples(corpus, spec, dedup = false)
      import spark.implicits._
      t.repartition(col("subj"), col("pred"), col("obj"))
        .sortWithinPartitions("subj", "pred", "obj")
        .as[(String, String, String)]
        .mapPartitions { it =>
          var prev: (String, String, String) = null
          it.filter { t => val keep = t != prev; prev = t; keep }
        }.count()
    }
    spark.stop()
  }
}
