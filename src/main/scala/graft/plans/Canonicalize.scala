package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.emit.Vocab

/** Entity canonicalization (north-rule step 4, SURVEY §7.1): derive
  * alias/sameAs edges from the corpus, compute connected components, and
  * rewrite triples so every wd: entity IRI points at its component's
  * canonical (minimum) id.
  *
  * Scale notes: the rewrite is two equi-joins keyed on entity id — subj
  * always, obj only for wd:-namespace IRIs. The mapping Dataset is
  * O(aliased entities), usually ≪ corpus, but NOT guaranteed broadcast-
  * small at 10^12 rows, so these stay shuffle joins with AQE (skew-join
  * splitting covers hub entities). */
object Canonicalize {

  /** sameAs/alias edge list from the corpus: statements with an
    * equivalence property (P460 "said to be the same as") between
    * entities. */
  def aliasEdges(parsedCorpus: DataFrame, equivalenceProps: Seq[String] = Seq("P460")): DataFrame = {
    parsedCorpus
      .filter(col("doc").isNotNull && col("doc.id").isNotNull)
      .select(col("doc.id").as("a"), explode(col("doc.statements")).as("s"))
      .filter(col("s.property").isin(equivalenceProps: _*) &&
        col("s.rank") =!= "deprecated" &&
        col("s.mainSnak.snaktype") === "value" &&
        col("s.mainSnak.valueType") === "entityid")
      .select(col("a"), col("s.mainSnak.value.id").as("b"))
      .where(col("a") =!= col("b"))
      .distinct()
  }

  /** (entity, canonical) mapping for all entities touched by alias edges. */
  def canonicalMapping(edges: DataFrame): DataFrame =
    ConnectedComponents.run(edges, selfLoopFree = true) // aliasEdges filters a =!= b
      .withColumnRenamed("node", "entity")
      .withColumnRenamed("component", "canonical")

  private val wdPrefix = Vocab.WD
  private val wdIriPrefix = "<" + Vocab.WD

  /** Rewrite triple subjects/objects through the canonical mapping.
    * Non-entity subjects/objects pass through untouched. */
  def rewriteTriples(triples: DataFrame, mapping: DataFrame): DataFrame = {
    val m = mapping.select(col("entity"), col("canonical"))

    // subject side: raw IRI string (no angle brackets)
    val subjKey = when(col("subj").startsWith(wdPrefix),
      expr(s"substring(subj, ${wdPrefix.length + 1})"))
    val t1 = triples
      .withColumn("subj_ent", subjKey)
      .join(m.withColumnRenamed("entity", "subj_ent").withColumnRenamed("canonical", "subj_canon"),
        Seq("subj_ent"), "left_outer")
      .withColumn("subj", when(col("subj_canon").isNotNull, concat(lit(wdPrefix), col("subj_canon")))
        .otherwise(col("subj")))
      .drop("subj_ent", "subj_canon")

    // object side: objects are N-Triples terms — entity objects look like <wd:...>
    val objKey = when(col("obj").startsWith(wdIriPrefix) && col("obj").endsWith(">"),
      expr(s"substring(obj, ${wdIriPrefix.length + 1}, length(obj) - ${wdIriPrefix.length + 1})"))
    t1.withColumn("obj_ent", objKey)
      .join(m.withColumnRenamed("entity", "obj_ent").withColumnRenamed("canonical", "obj_canon"),
        Seq("obj_ent"), "left_outer")
      .withColumn("obj", when(col("obj_canon").isNotNull,
        concat(lit(wdIriPrefix), col("obj_canon"), lit(">"))).otherwise(col("obj")))
      .drop("obj_ent", "obj_canon")
      .dropDuplicates("subj", "pred", "obj")
  }
}
