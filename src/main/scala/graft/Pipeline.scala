package graft

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Model._
import graft.spec.{DumpSpec, SpecCompiler}
import graft.emit.TripleEmitter
import graft.sources.{DumpFormat, EntityCorpus}

/** End-to-end KG-construction pipeline: corpus → parse → spec filter →
  * triple emission → dedup → partitioned write, with lineage + metrics.
  *
  * Execution shape (SURVEY §4): ONE narrow stage from scan through
  * emission (filter and flatMap are both per-row); the only shuffles are
  * (a) the global (s,p,o) dropDuplicates the north rule requires and
  * (b) the explicit output repartition by subj-hash. Filters are Column
  * expressions (codegen + pushdown), never closures. The parse happens
  * once per scan even when N specs are multiplexed over it (reference S3
  * `DumpRunner.java:78-86`).
  *
  * Parse cost discipline: the include gate runs over a MINIMAL-schema
  * `from_json` bound once per row through a lambda (DumpFormat.gate), so
  * excluded rows pay only the pruned parse and predicate pushdown cannot
  * duplicate it; the full-schema parse happens exactly once, for
  * surviving rows only. Input dialect (synthetic fixture vs real
  * Wikidata dump JSON) is a DumpFormat parameter.
  */
object Pipeline {

  private val observeId = new java.util.concurrent.atomic.AtomicLong(0L)

  case class ErrorRow(repo: String, path: String, id: String, error: String)

  /** Defensive normalization: from_json yields nulls for absent nested
    * fields; the emitter works over empty collections instead. */
  def normalize(d: EntityDoc): EntityDoc = {
    def nz[T](s: Seq[T]): Seq[T] = Option(s).getOrElse(Nil)
    def nzm[K, V](m: Map[K, V]): Map[K, V] = Option(m).getOrElse(Map.empty)
    def nSnak(s: Snak): Snak = if (s == null) Snak(null, "novalue", None, None) else s
    d.copy(
      labels = nzm(d.labels),
      descriptions = nzm(d.descriptions),
      aliases = nzm(d.aliases).map { case (k, v) => k -> nz(v) },
      sitelinks = nz(d.sitelinks).map(sl => sl.copy(badges = nz(sl.badges))),
      statements = nz(d.statements).map(s => s.copy(
        mainSnak = nSnak(s.mainSnak),
        qualifiers = nz(s.qualifiers).map(nSnak),
        references = nz(s.references).map(nz(_).map(nSnak)),
        refHashes = nz(s.refHashes)))
    )
  }

  /** union scan pre-gate for a multiplexed pass: a row can serve SOME
    * spec only if it passes SOME spec's pre-gate; usable only when
    * EVERY spec has one (an include-all spec gates nothing). */
  private def prefilterMulti(specs: Seq[DumpSpec], format: DumpFormat): Column = {
    val all = specs.map(SpecCompiler.prefilterTokens(_, format))
    if (all.isEmpty || all.exists(_.isEmpty)) lit(true)
    else all.flatMap(_.get).distinct.map(t => col("content").contains(t)).reduce(_ || _)
  }

  /** Parsed-document view of a corpus: columns (repo, path, commit,
    * content_sha256, doc). */
  def parsed(corpus: DataFrame, format: DumpFormat = DumpFormat.Fixture): DataFrame =
    corpus.select(
      col("repo"), col("path"), col("commit"),
      sha2(col("content"), 256).as("content_sha256"),
      format.doc(col("content")).as("doc"))

  private[graft] def docColumns = Seq(
    col("doc.id").as("id"), col("doc.type").as("etype"), col("doc.datatype").as("datatype"),
    col("doc.labels").as("labels"), col("doc.descriptions").as("descriptions"),
    col("doc.aliases").as("aliases"), col("doc.sitelinks").as("sitelinks"),
    col("doc.statements").as("statements"))

  /** Included documents for one spec, as a typed Dataset — the F1 gate
    * runs as a minimal-schema Column predicate BEFORE any full parse or
    * deserialization (DumpFormat.gate: one pruned `from_json` per row);
    * the full parse runs once, for survivors only. */
  def includedDocs(corpus: DataFrame, spec: DumpSpec,
                   format: DumpFormat = DumpFormat.Fixture,
                   excludeLexemes: Boolean = false): Dataset[EntityDoc] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val lexPred: Column => Column =
      if (excludeLexemes) d => d("type") =!= "lexeme" else _ => lit(true)
    corpus
      // scan pre-gate first: And short-circuits in codegen, so rows
      // failing the cheap raw-substring test never pay the gate parse
      .filter(SpecCompiler.prefilter(spec, col("content"), format) &&
        format.gate(col("content"),
          d => lexPred(d) && SpecCompiler.includePredicate(spec, d)))
      .select(format.doc(col("content")).as("doc"))
      .select(docColumns: _*)
      .as[EntityDoc]
  }

  /** S6 error channel: rows that fail JSON parse, plus included lexeme
    * documents (reference raises NotImplementedException for lexemes and
    * skips the document, `FilteredRdfSerializer.java:89-98`). */
  def errors(corpus: DataFrame, spec: DumpSpec,
             format: DumpFormat = DumpFormat.Fixture): Dataset[ErrorRow] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val parseErrors = corpus
      .filter(!format.gate(col("content"), _ => lit(true)))
      .select(col("repo"), col("path"), lit("").as("id"), lit("malformed document JSON").as("error"))
    val lexemes = corpus
      .filter(format.gate(col("content"),
        d => d("type") === "lexeme" && SpecCompiler.includePredicate(spec, d)))
      .select(col("repo"), col("path"), format.filterDoc(col("content"))("id").as("id"),
        lit("serialization of lexemes not implemented").as("error"))
    parseErrors.union(lexemes).as[ErrorRow]
  }

  /** Triples for one spec. Deduplicated (s,p,o) per the north rule; the
    * constant prologue (S5) is unioned in. Counters (A1) ride on
    * `observe` — read them from the QueryExecutionListener or
    * `Observation` without a second pass. */
  def triples(corpus: DataFrame, spec: DumpSpec,
              sites: TripleEmitter.Sites = EntityCorpus.sites,
              dedup: Boolean = true,
              format: DumpFormat = DumpFormat.Fixture): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // lexemes → error channel, not output (gated in the cheap pre-filter)
    val docs = includedDocs(corpus, spec, format, excludeLexemes = true)
    // unique metric name per instantiation: two triples() plans may be
    // combined into one query (e.g. equivalence checks via exceptAll),
    // and Spark rejects duplicate observation names in one plan
    val observed = docs
      .observe(s"graft_counters_${Pipeline.observeId.incrementAndGet()}",
        count(lit(1)).as("includedEntities"),
        sum(SpecCompiler.includedStatementsExpr(spec,
          struct(col("statements").as("statements")))).as("includedStatements"))
    // J2: the site table rides as a broadcast variable (one copy per
    // executor, not per task — matters at 1000 executors)
    val sitesB = spark.sparkContext.broadcast(sites)
    val emitted = observed.flatMap(d => TripleEmitter.emit(spec, normalize(d), sitesB.value))
    val all = emitted.union(spark.createDataset(TripleEmitter.prologue))
    val out = all.toDF("subj", "pred", "obj")
    if (dedup) dedupTriples(out, Seq("subj", "pred", "obj")) else out
  }

  /** Exact (s,p,o)-set dedup, one hash pass. `dropDuplicates` plans a
    * partial+final hash aggregate; the map-side partial builds a large
    * UnsafeRow hash table per task for only ~1.4× row reduction on this
    * workload (near-unique keys) — measured 10.3 s → 8.7 s at 32t/8M
    * entities by shuffling the raw triples once (hash of the FULL
    * (s,p,o) row — uniform by construction, no hot key) and deduping in
    * a single per-partition set pass (guide §1.2 step 1 / §2.3:
    * partial aggregation only pays when it reduces rows).
    * Memory bound: per-task state = the partition's unique triples; the
    * repartition has no fixed partition count, so AQE sizes post-shuffle
    * partitions to `advisoryPartitionSizeInBytes` — the set is bounded
    * by the advisory size, the same knob that bounds every other
    * reduce-side task state. Output set identical (golden/oracle-tested). */
  private[graft] def dedupTriples(out: DataFrame, keys: Seq[String]): DataFrame = {
    val spark = out.sparkSession
    import spark.implicits._
    val cols = out.columns.toSeq
    require(cols == keys, s"dedupTriples: expected exactly $keys, got $cols")
    out.repartition(keys.map(col): _*)
      .as[(String, String, String)]
      .mapPartitions { it =>
        val seen = new java.util.HashSet[(String, String, String)]()
        it.filter(seen.add)
      }
      .toDF(keys: _*)
  }

  /** S3 multiplexed scan: N specs share ONE pass. Per-spec include bits
    * are computed as an array of Column predicates (so the scan filter
    * is still a pushdown-able disjunction), then each included (doc,
    * spec) pair is emitted. No caching needed — truly one scan. */
  def triplesMultiplexed(corpus: DataFrame, specs: Seq[(String, DumpSpec)],
                         sites: TripleEmitter.Sites = EntityCorpus.sites,
                         dedup: Boolean = true,
                         format: DumpFormat = DumpFormat.Fixture): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // any spec wants it → full-parse + deserialize once; the cheap gate
    // and the per-spec include bits both run over the minimal parse
    val rows = corpus
      .filter(prefilterMulti(specs.map(_._2), format) &&
        format.gate(col("content"), d => d("type") =!= "lexeme" &&
          specs.map { case (_, s) => SpecCompiler.includePredicate(s, d) }.reduce(_ || _)))
      .select(format.doc(col("content")).as("doc"),
        format.filterDoc(col("content")).as("fdoc"))
      .select(struct(docColumns: _*).as("d"),
        array(specs.map { case (_, s) => SpecCompiler.includePredicate(s, col("fdoc")) }: _*).as("inc"))
      .as[(EntityDoc, Seq[Boolean])]
    val specArr = specs.toIndexedSeq
    val sitesB = spark.sparkContext.broadcast(sites)
    val emitted = rows.flatMap { case (doc, inc) =>
      val nd = normalize(doc)
      specArr.indices.iterator.flatMap { k =>
        if (inc(k) && TripleEmitter.isSerializable(nd))
          TripleEmitter.emit(specArr(k)._2, nd, sitesB.value)
            .map(t => SpecTriple(specArr(k)._1, t.subj, t.pred, t.obj))
        else Iterator.empty
      }
    }
    val prologues = specs.flatMap { case (id, _) =>
      TripleEmitter.prologue.map(t => SpecTriple(id, t.subj, t.pred, t.obj))
    }
    val all = emitted.union(spark.createDataset(prologues)).toDF("specId", "subj", "pred", "obj")
    if (dedup) dedupTriples4(all) else all
  }

  /** 4-column variant of [[dedupTriples]] for the multiplexed stream. */
  private[graft] def dedupTriples4(all: DataFrame): DataFrame = {
    val spark = all.sparkSession
    import spark.implicits._
    val keys = Seq("specId", "subj", "pred", "obj")
    require(all.columns.toSeq == keys, s"dedupTriples4: got ${all.columns.toSeq}")
    all.repartition(keys.map(col): _*)
      .as[(String, String, String, String)]
      .mapPartitions { it =>
        val seen = new java.util.HashSet[(String, String, String, String)]()
        it.filter(seen.add)
      }
      .toDF(keys: _*)
  }

  /** Format as N-Triples lines (SC1-SC3). */
  def ntLines(triples: DataFrame): Dataset[String] = {
    val spark = triples.sparkSession
    import spark.implicits._
    triples.select(
      concat(lit("<"), col("subj"), lit("> <"), col("pred"), lit("> "), col("obj"), lit(" ."))
        .as("line")).as[String]
  }

  /** S4 gzip N-Triples sink. Canonical order (subj, pred, obj) replaces
    * the reference's scan order (SURVEY §2.7): rangepartition+sort keeps
    * the sort distributed. */
  def writeNt(triples: DataFrame, path: String, sorted: Boolean = true): Unit = {
    val t = if (sorted) triples.orderBy("subj", "pred", "obj") else triples
    ntLines(t).write.mode("overwrite").option("compression", "gzip").text(path)
  }

  /** Partitioned triple-table write (north rule): an EXPLICIT bucket
    * column `pmod(xxhash64(subj), buckets)` drives both the shuffle and
    * the physical layout (`partitionBy("bucket")` → one directory per
    * bucket), so the per-partition lineage manifest audits the files
    * 1:1 — manifest row count == bucket-directory count, per-bucket
    * triple counts == per-directory row counts (resume checks can
    * verify a directory without reading the others). Balanced output
    * regardless of subject skew. Iceberg is the deploy-time format per
    * input_hint; parquet stands in here (no Iceberg runtime in the
    * sandbox). */
  def writeTripleTable(triples: DataFrame, path: String, buckets: Int = 32): Unit = {
    val t = triples
      .withColumn("bucket", pmod(xxhash64(col("subj")), lit(buckets.toLong)))
      .repartition(buckets, col("bucket"))
    t.write.mode("overwrite").partitionBy("bucket").parquet(path)
    val manifest = t.sparkSession.read.parquet(path)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("triples"), min("subj").as("min_subj"), max("subj").as("max_subj"))
    manifest.coalesce(1).write.mode("overwrite").parquet(path + "_manifest")
  }

  /** S8: byte-ish preview — first n triples in canonical order. */
  def preview(triples: DataFrame, n: Int): DataFrame =
    triples.orderBy("subj", "pred", "obj").limit(n)

  /** P7 as a pure-Column plan (no object boundary): term triples
    * straight off the parsed struct via explode + the native nt_escape
    * expression — one whole-stage-codegen span from scan to output.
    * Demonstrates the expression-only alternative to the typed flatMap;
    * semantically identical to the emitter's term path (tested). */
  def termTriplesSql(corpus: DataFrame, spec: DumpSpec,
                     format: DumpFormat = DumpFormat.Fixture): DataFrame = {
    val spark = corpus.sparkSession
    graft.functions.GraftExtensions.register(spark)
    val p = corpus
      .filter(SpecCompiler.prefilter(spec, col("content"), format) &&
        format.gate(col("content"),
          d => d("type") =!= "lexeme" && SpecCompiler.includePredicate(spec, d)))
      .select(format.doc(col("content")).as("doc"))
    val subj = concat(lit(graft.emit.Vocab.WD), col("doc.id"))
    // nt_escape resolves through the registry (GraftExtensions.register
    // above) — public API route to a custom Expression in Spark 4
    def langTerm(text: Column, lang: Column): Column =
      concat(lit("\""), call_function("nt_escape", text), lit("\"@"), lang)

    def simpleTerms(field: String, pred: String): DataFrame =
      p.select(subj.as("subj"), explode(col(s"doc.$field")).as(Seq("lang", "text")))
        .filter(SpecCompiler.languagePredicate(spec, col("lang")))
        .select(col("subj"), lit(pred).as("pred"), langTerm(col("text"), col("lang")).as("obj"))

    val parts = Seq(
      if (spec.labels) Some(simpleTerms("labels", graft.emit.Vocab.RDFS_LABEL)) else None,
      if (spec.descriptions) Some(simpleTerms("descriptions", graft.emit.Vocab.SCHEMA_DESCRIPTION)) else None,
      if (spec.aliases) Some(
        p.select(subj.as("subj"), explode(col("doc.aliases")).as(Seq("lang", "texts")))
          .filter(SpecCompiler.languagePredicate(spec, col("lang")))
          .select(col("subj"), explode(col("texts")).as("text"), col("lang"))
          .select(col("subj"), lit(graft.emit.Vocab.SKOS_ALT_LABEL).as("pred"),
            langTerm(col("text"), col("lang")).as("obj"))) else None
    ).flatten
    parts.reduceOption(_ union _)
      .getOrElse(spark.emptyDataset(org.apache.spark.sql.Encoders.product[graft.model.Model.Triple]).toDF())
      .dropDuplicates("subj", "pred", "obj")
  }

  /** A1 counters in one aggregate pass (the observe() values, computed
    * directly): (includedEntities, includedStatements). Statements are
    * counted once even if both simple+full are emitted, and BEFORE the
    * rank gate (reference `FilteredRdfSerializer.java:328-331`). */
  def counters(corpus: DataFrame, spec: DumpSpec,
               format: DumpFormat = DumpFormat.Fixture): (Long, Long) = {
    // the minimal filter-parse carries everything A1 needs
    // (statements.property for the options when-chain)
    val r = corpus
      .filter(SpecCompiler.prefilter(spec, col("content"), format) &&
        format.gate(col("content"),
          d => d("type") =!= "lexeme" && SpecCompiler.includePredicate(spec, d)))
      .select(format.filterDoc(col("content")).as("doc"))
      .agg(
        count(lit(1)),
        coalesce(sum(SpecCompiler.includedStatementsExpr(spec, col("doc")).cast("long")), lit(0L))).head()
    (r.getLong(0), r.getLong(1))
  }

  /** A1 counters for N specs in ONE corpus pass: per-spec conditional
    * aggregates (sum(when(include_k, …))) — at 10^12 rows this replaces
    * N+1 full scans with one. Returns specId → (entities, statements). */
  def countersMultiplexed(corpus: DataFrame, specs: Seq[(String, DumpSpec)],
                          format: DumpFormat = DumpFormat.Fixture): Map[String, (Long, Long)] = {
    // rows failing every spec's pre-gate contribute zero to every
    // conditional aggregate — exclude them before any parse
    val base = corpus
      .filter(prefilterMulti(specs.map(_._2), format) &&
        format.gate(col("content"), d => d("type") =!= "lexeme"))
      .select(format.filterDoc(col("content")).as("doc"))
    val aggs = specs.flatMap { case (_, spec) =>
      val inc = SpecCompiler.includePredicate(spec, col("doc"))
      Seq(
        sum(when(inc, 1L).otherwise(0L)),
        sum(when(inc, SpecCompiler.includedStatementsExpr(spec, col("doc")).cast("long"))
          .otherwise(0L)))
    }
    val row = base.agg(aggs.head, aggs.tail: _*).head()
    specs.zipWithIndex.map { case ((name, _), k) =>
      name -> (Option(row.get(2 * k)).fold(0L)(_.asInstanceOf[Long]),
               Option(row.get(2 * k + 1)).fold(0L)(_.asInstanceOf[Long]))
    }.toMap
  }

  /** J3: property→datatype side table derived from the corpus itself in
    * a first pass (replaces the reference's mutable PropertyRegister,
    * `FilteredRdfSerializer.java:160-161` — removes scan-order
    * dependence). Small by construction → broadcast it at join sites. */
  def propertyDatatypes(corpus: DataFrame,
                        format: DumpFormat = DumpFormat.Fixture): DataFrame =
    corpus
      .filter(format.gate(col("content"), d => d("type") === "property"))
      .select(format.filterDoc(col("content")).as("d"))
      .select(col("d.id").as("property"), col("d.datatype").as("datatype"))
      .dropDuplicates("property")
}
