package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** N-Triples reader — re-ingests the engine's own S4 output (and any
  * spec-conformant N-Triples 1.1 file, e.g. Wikidata's published
  * truthy dumps) back into the (subj, pred, obj) triple table the rest
  * of the engine operates on. The reference is write-only (rdf4j RIO
  * serializes, nothing parses back); an analytics engine needs the read
  * side: audit a finished dump, diff two dumps, join a dump against
  * fresh metadata without re-running the pipeline.
  *
  * Pure-Column parse: line splitting is `regexp_extract` (codegen'd),
  * literal unescaping is the native [[graft.functions.NtUnescape]]
  * expression — the whole parse stays in one WholeStageCodegen span
  * over a text scan, so reading N TB of gzip N-Triples is scan-bound,
  * exactly like the JSON dump path. Malformed lines get kind "err"
  * rather than failing the job (same error-channel posture as S6);
  * comments and blank lines are dropped.
  *
  * Grammar subset: IRI / blank-node subjects, IRI predicates, IRI /
  * blank-node / literal objects with optional `@lang` or `^^<dt>`.
  * Literal values may contain any escaped char; the object regex relies
  * on N-Triples' guarantee that an unescaped `"` cannot occur inside a
  * literal.
  */
object NtReader {

  /** Canonical rendered-object regex: IRI, bnode, or quoted literal
    * with optional language tag / datatype. */
  private val objRe =
    """(<[^>]*>|_:[^ \t]+|"(?:[^"\\]|\\.)*"(?:@[A-Za-z][A-Za-z0-9-]*|\^\^<[^>]*>)?)"""
  private val lineRe = "^[ \\t]*(<[^>]*>|_:[^ \\t]+)[ \\t]+(<[^>]*>)[ \\t]+" +
    objRe + "[ \\t]*\\.[ \\t]*$"

  /** Parse a column of N-Triples lines into structured terms:
    * (subj, pred, obj, objKind, objIri, lexical, lang, datatype) where
    * `subj`/`pred` are bare IRIs (engine-internal convention, see
    * [[graft.Pipeline.ntLines]]) and `obj` is the rendered object term
    * — i.e. `select(subj, pred, obj)` feeds any triple operator
    * unchanged. objKind ∈ iri | bnode | literal | err. */
  def parseLines(lines: DataFrame, line: Column): DataFrame = {
    graft.functions.GraftExtensions.register(lines.sparkSession)
    val subjRaw = regexp_extract(line, lineRe, 1)
    val predRaw = regexp_extract(line, lineRe, 2)
    val obj = regexp_extract(line, lineRe, 3)
    val kind = when(obj.startsWith("<"), "iri")
      .when(obj.startsWith("_:"), "bnode")
      .when(obj.startsWith("\""), "literal")
      .otherwise("err")
    lines
      .where(!(trim(line) === "") && !trim(line).startsWith("#"))
      .select(
        // strip <> from subj unless it's a bnode label
        when(subjRaw.startsWith("<"),
          regexp_extract(subjRaw, "^<(.*)>$", 1)).otherwise(subjRaw).as("subj"),
        regexp_extract(predRaw, "^<(.*)>$", 1).as("pred"),
        obj.as("obj"),
        kind.as("objKind"),
        when(kind === "iri", regexp_extract(obj, "^<(.*)>$", 1)).as("objIri"),
        when(kind === "literal",
          call_function("nt_unescape",
            regexp_extract(obj, "^\"((?:[^\"\\\\]|\\\\.)*)\"", 1))).as("lexical"),
        when(kind === "literal",
          nullif(regexp_extract(obj, "\"@([A-Za-z][A-Za-z0-9-]*)$", 1), lit(""))).as("lang"),
        when(kind === "literal",
          nullif(regexp_extract(obj, "\\^\\^<([^>]*)>$", 1), lit(""))).as("datatype"))
  }

  /** Read `.nt` / `.nt.gz` files (Spark's text source decompresses by
    * extension; splittable formats parallelize per-block, gzip
    * per-file — shard large dumps into many files, as S4's writer
    * already does). */
  def readNt(spark: SparkSession, path: String): DataFrame =
    parseLines(spark.read.text(path), col("value"))

  /** The engine-internal (subj, pred, obj) slice, malformed lines
    * dropped — inverse of [[graft.Pipeline.ntLines]]. */
  def triples(spark: SparkSession, path: String): DataFrame =
    readNt(spark, path).where(col("objKind") =!= "err").select("subj", "pred", "obj")

  /** Dump-to-dump diff: (subj, pred, obj, op ∈ added|removed) between
    * two N-Triples outputs — what changed between two runs/corpus
    * versions, computed from the published artifacts alone (no corpus,
    * no spec). Bag semantics via exceptAll; each side is one
    * hash-partitioned set difference on the full triple — two shuffles
    * total, no driver materialization. */
  def diff(spark: SparkSession, oldPath: String, newPath: String): DataFrame = {
    val o = triples(spark, oldPath)
    val n = triples(spark, newPath)
    n.exceptAll(o).withColumn("op", lit("added"))
      .unionAll(o.exceptAll(n).withColumn("op", lit("removed")))
  }
}
