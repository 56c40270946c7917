package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Batched mention detection + dictionary/alias-based entity-link
  * scoring (the north star's generalization of the reference's
  * property-restriction matching, SURVEY §7.1 step 2).
  *
  * Shape: the dictionary (surface form → candidate entity + prior) is
  * built once from the KG corpus (labels + aliases), then *broadcast* to
  * the mention scan — the scan side stays a single narrow stage over the
  * text corpus, no shuffle until candidate scoring aggregates.
  *
  *  1. `buildDictionary`: (surface, entity, prior) from entity labels /
  *     aliases; prior = 1/#entities sharing the surface (ambiguity
  *     split), label surfaces outrank alias surfaces.
  *  2. `detectMentions`: token n-gram scan (n = 1..maxGram) of each
  *     document joined against the dictionary — a broadcast hash join on
  *     the surface form, so detection cost is O(tokens × maxGram).
  *  3. `scoreLinks`: per (doc, surface) candidate ranking by
  *     prior × (1 + context overlap), context overlap = count of OTHER
  *     detected surfaces in the same document that link to an entity
  *     sharing a P31 class with the candidate. Integer-exact scoring
  *     (scaled longs) keeps ranking deterministic across engines.
  */
object EntityLinking {

  /** Dictionary from the parsed entity corpus: lowercase surface forms
    * of labels (weight 2) and aliases (weight 1); prior scaled by 1000
    * and split across ambiguous entities. */
  def buildDictionary(parsedCorpus: DataFrame, lang: String = "en"): DataFrame = {
    val docs = parsedCorpus.filter(col("doc").isNotNull && col("doc.id").isNotNull)
    val labels = docs.select(col("doc.id").as("entity"),
        lower(col("doc.labels")(lang)).as("surface"), lit(2L).as("w"))
      .filter(col("surface").isNotNull)
    val aliases = docs.select(col("doc.id").as("entity"),
        explode_outer(col("doc.aliases")(lang)).as("surface"), lit(1L).as("w"))
      .filter(col("surface").isNotNull)
      .withColumn("surface", lower(col("surface")))
    val all = labels.union(aliases)
      .groupBy("surface", "entity").agg(max("w").as("w"))
    val ambiguity = all.groupBy("surface").agg(count(lit(1)).as("n_cand"))
    all.join(ambiguity, "surface")
      .select(col("surface"), col("entity"),
        (lit(1000L) * col("w") / col("n_cand")).cast("long").as("prior"))
  }

  /** Token n-grams (1..maxGram) with positions, lowercased — ONE pass
    * over the token array: all gram sizes are emitted from a single
    * nested `transform` and a single explode (one Generate in the plan,
    * asserted in EntityLinkingSpec), instead of re-exploding the array
    * maxGram times through a union. The position list is
    * `filter(0..len-1, p <= len-n)` — always-ascending, so short
    * documents need no descending-sequence guard. */
  def ngrams(docs: DataFrame, id: Column, text: Column, maxGram: Int = 3): DataFrame = {
    val toks = split(lower(text), " ")
    val len = size(col("toks"))
    docs.select(id.as("doc_id"), toks.as("toks"))
      .select(col("doc_id"), explode(
        flatten(transform(sequence(lit(1), lit(maxGram)), n =>
          transform(
            filter(sequence(lit(0), len - 1), p => p <= len - n),
            i => struct(i.as("pos"),
              concat_ws(" ", slice(col("toks"), i + 1, n)).as("surface"),
              n.as("gram")))))).as("m"))
      .filter(length(col("m.surface")) > 0)
      .select(col("doc_id"), col("m.pos").as("pos"),
        col("m.surface").as("surface"), col("m.gram").as("gram"))
  }

  /** Mention detection: n-gram scan ⋈ dictionary. The join strategy is
    * deliberately NOT forced: Spark's planner broadcasts the dictionary
    * when its size estimate fits autoBroadcastJoinThreshold, and AQE
    * re-plans from actual runtime sizes — a label/alias dictionary over
    * a 100M-entity KG exceeds any broadcast budget and must fall back to
    * a shuffle join (the round-1 unconditional broadcast() did not). */
  def detectMentions(docs: DataFrame, id: Column, text: Column,
                     dictionary: DataFrame, maxGram: Int = 3): DataFrame =
    ngrams(docs, id, text, maxGram)
      .join(dictionary, "surface")
      .select(col("doc_id"), col("surface"), col("pos"), col("gram"),
        col("entity"), col("prior"))

  /** Link scoring: candidate score = prior × (1 + #co-mentioned entities
    * sharing a P31 class). Returns the best entity per (doc, surface,
    * pos) with deterministic tie-break. */
  def scoreLinks(mentions: DataFrame, entityClasses: DataFrame): DataFrame = {
    // entityClasses: (entity, cls) — e.g. P31 values from the corpus
    val m = mentions.alias("m")
    // size-gated by the planner/AQE, same reasoning as detectMentions
    val withCls = m.join(entityClasses.alias("ec"),
      col("m.entity") === col("ec.entity"), "left_outer")
      .select(col("m.doc_id"), col("m.surface"), col("m.pos"), col("m.entity"),
        col("m.prior"), col("ec.cls"))
    // context: per doc, the set of classes of ALL candidate entities
    val docClasses = withCls.filter(col("cls").isNotNull)
      .select(col("doc_id"), col("surface"), col("cls")).distinct()
    val support = withCls.alias("a")
      .join(docClasses.alias("b"),
        col("a.doc_id") === col("b.doc_id") && col("a.cls") === col("b.cls") &&
          col("a.surface") =!= col("b.surface"), "left_outer")
      .groupBy(col("a.doc_id").as("doc_id"), col("a.surface").as("surface"),
        col("a.pos").as("pos"), col("a.entity").as("entity"), col("a.prior").as("prior"))
      .agg(count(col("b.cls")).as("context_support"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id", "surface", "pos")
      .orderBy(col("score").desc, col("entity"))
    support
      .withColumn("score", col("prior") * (lit(1L) + col("context_support")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("surface"), col("pos"), col("entity"),
        col("score"), col("context_support"))
  }

  /** Overlap resolution, longest-match-wins: a linked mention is
    * suppressed iff a STRICTLY LONGER mention's token span contains its
    * span in the same document ("alan turing" at pos 4 suppresses
    * "turing" at pos 5 and "alan" at pos 4). Containment is transitive,
    * so the rule is declarative — no sequential greedy pass needed. The
    * anti-join keys on doc_id (hash-partitionable); the span predicate
    * rides as a residual condition, bounded by mentions-per-document. */
  def resolveOverlaps(linked: DataFrame): DataFrame = {
    val withG = linked.withColumn("_g", size(split(col("surface"), " ")))
    val spans = withG
      .select(col("doc_id").as("_doc"), col("pos").as("_pos"), col("_g").as("_gb"))
      .distinct()
    withG.join(spans,
        col("doc_id") === col("_doc") && col("_gb") > col("_g") &&
          col("_pos") <= col("pos") &&
          col("_pos") + col("_gb") >= col("pos") + col("_g"),
        "left_anti")
      .drop("_g")
  }

  /** entity → P31 class table from the parsed corpus (broadcast side). */
  def entityClasses(parsedCorpus: DataFrame): DataFrame =
    parsedCorpus.filter(col("doc").isNotNull && col("doc.id").isNotNull)
      .select(col("doc.id").as("entity"), explode(col("doc.statements")).as("s"))
      .filter(col("s.property") === "P31" && col("s.rank") =!= "deprecated" &&
        col("s.mainSnak.snaktype") === "value" && col("s.mainSnak.valueType") === "entityid")
      .select(col("entity"), col("s.mainSnak.value.id").as("cls"))
      .distinct()

  /** End-to-end: corpus → dictionary + classes; documents → linked
    * mentions with longest-match overlap resolution. */
  def link(parsedCorpus: DataFrame, docs: DataFrame, id: Column, text: Column,
           lang: String = "en", maxGram: Int = 3): DataFrame = {
    val dict = buildDictionary(parsedCorpus, lang)
    val mentions = detectMentions(docs, id, text, dict, maxGram)
    resolveOverlaps(scoreLinks(mentions, entityClasses(parsedCorpus)))
  }
}
