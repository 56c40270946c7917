package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.model.Model

/** Real Wikidata entity-dump JSON dialect (S2): the shape the reference
  * actually consumes — statements live in a `claims` object keyed by
  * property, snaks are `{snaktype, property, datavalue:{type,value}}`,
  * terms are `{lang:{language,value}}` objects, aliases an
  * object-of-arrays, sitelinks an object keyed by site (reference: wdtk's
  * Jackson document model driven from `DumpRunner.java:84`, consumed in
  * `processors/FilteredRdfSerializer.java:240-261` and
  * `spec/ValueFilter.java:42-92`; format itself is public MediaWiki
  * documentation, Wikibase/DataModel/JSON).
  *
  * Everything here is Column-level: one `from_json` with a fixed
  * hand-written schema, then higher-order-function conversion into the
  * internal `Model.entityJsonSchema` doc struct — no UDFs, no object
  * round-trip, stays inside codegen.
  *
  * The one genuinely polymorphic field, `datavalue.value` (a JSON string
  * for string values, an object otherwise), is declared `StringType`:
  * Spark's JacksonParser copies the raw JSON text of a non-string token
  * into a string column, so the per-type sub-parse can happen lazily
  * inside type-gated `when` branches — only the matching branch runs.
  */
object WikidataJson {

  // ---- real dump schema (hand-written, never inferred) -------------------

  val snakSchema: StructType = StructType(Seq(
    StructField("snaktype", StringType),
    StructField("property", StringType),
    StructField("datatype", StringType),
    StructField("datavalue", StructType(Seq(
      StructField("type", StringType),
      StructField("value", StringType)))) // raw JSON capture (see scaladoc)
  ))

  private val referenceSchema: StructType = StructType(Seq(
    StructField("hash", StringType),
    StructField("snaks", MapType(StringType, ArrayType(snakSchema))),
    StructField("snaks-order", ArrayType(StringType))))

  val statementSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("type", StringType),
    StructField("rank", StringType),
    StructField("mainsnak", snakSchema),
    StructField("qualifiers", MapType(StringType, ArrayType(snakSchema))),
    StructField("qualifiers-order", ArrayType(StringType)),
    StructField("references", ArrayType(referenceSchema))))

  private val termSchema: StructType = StructType(Seq(
    StructField("language", StringType),
    StructField("value", StringType)))

  val entitySchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("type", StringType),
    StructField("datatype", StringType),
    StructField("labels", MapType(StringType, termSchema)),
    StructField("descriptions", MapType(StringType, termSchema)),
    StructField("aliases", MapType(StringType, ArrayType(termSchema))),
    StructField("claims", MapType(StringType, ArrayType(statementSchema))),
    StructField("sitelinks", MapType(StringType, StructType(Seq(
      StructField("site", StringType),
      StructField("title", StringType),
      StructField("badges", ArrayType(StringType))))))))

  /** Minimal schema for the include-predicate pre-filter: just what
    * SpecCompiler predicates can reference (id for sampling, type, and
    * each statement's rank + main snak). Excluded rows never pay for
    * terms/qualifiers/references parsing. */
  val filterEntitySchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("type", StringType),
    StructField("datatype", StringType),
    StructField("claims", MapType(StringType, ArrayType(StructType(Seq(
      StructField("rank", StringType),
      StructField("mainsnak", snakSchema))))))))

  // ---- datavalue sub-schemas (per `datavalue.type`) ----------------------

  private val entityIdValueSchema = StructType(Seq(
    StructField("entity-type", StringType),
    StructField("numeric-id", LongType),
    StructField("id", StringType)))
  private val monoValueSchema = StructType(Seq(
    StructField("text", StringType),
    StructField("language", StringType)))
  private val quantityValueSchema = StructType(Seq(
    StructField("amount", StringType),
    StructField("unit", StringType)))
  private val timeValueSchema = StructType(Seq(
    StructField("time", StringType),
    StructField("precision", DoubleType),
    StructField("calendarmodel", StringType)))
  private val coordValueSchema = StructType(Seq(
    StructField("latitude", DoubleType),
    StructField("longitude", DoubleType),
    StructField("precision", DoubleType),
    StructField("globe", StringType)))

  /** strip an `…/entity/` IRI prefix → bare entity id; plain values
    * ("1" for dimensionless units) pass through. */
  private def entityRef(c: Column): Column = regexp_replace(c, "^.*/entity/", "")

  /** internal tagged-union Value struct (Model.valueSchema field order)
    * from a real `datavalue`. */
  private def valueColumn(dv: Column): Column = {
    val t = dv("type")
    val raw = dv("value")
    val ev = from_json(raw, entityIdValueSchema)
    val mv = from_json(raw, monoValueSchema)
    val qv = from_json(raw, quantityValueSchema)
    val tv = from_json(raw, timeValueSchema)
    val gv = from_json(raw, coordValueSchema)
    struct(
      when(t === "wikibase-entityid",
        // old dumps lack "id": reconstruct from entity-type + numeric-id
        coalesce(ev("id"), concat(
          when(ev("entity-type") === "property", lit("P"))
            .when(ev("entity-type") === "lexeme", lit("L")).otherwise(lit("Q")),
          ev("numeric-id").cast("string")))).as("id"),
      when(t === "string", raw).as("str"),
      when(t === "monolingualtext", mv("text")).as("text"),
      when(t === "monolingualtext", mv("language")).as("lang"),
      when(t === "quantity", qv("amount")).as("amount"),
      when(t === "quantity", entityRef(qv("unit"))).as("unit"),
      when(t === "time", tv("time")).as("time"),
      when(t === "time", entityRef(tv("calendarmodel"))).as("calendar"),
      when(t === "globecoordinate", gv("latitude")).as("lat"),
      when(t === "globecoordinate", gv("longitude")).as("lon"),
      when(t === "globecoordinate", entityRef(gv("globe"))).as("globe"),
      when(t === "time", tv("precision"))
        .when(t === "globecoordinate", gv("precision")).as("precision"))
  }

  /** `wikibase-entityid` → internal "entityid"; all other type tags match. */
  private def valueTypeColumn(t: Column): Column =
    when(t === "wikibase-entityid", lit("entityid")).otherwise(t)

  /** real snak → internal Snak struct (Model.snakSchema field order). */
  def snakColumn(s: Column): Column = {
    val dv = s("datavalue")
    val isValue = s("snaktype") === "value" && dv.isNotNull
    struct(
      s("property").as("property"),
      s("snaktype").as("snaktype"),
      when(isValue, valueTypeColumn(dv("type"))).as("valueType"),
      when(isValue, valueColumn(dv)).as("value"))
  }

  /** flatten a property→snaks map in `*-order` sequence (wdtk iterates
    * qualifier/reference snaks in their order arrays); falls back to map
    * iteration order when the order array is absent. */
  private def orderedSnaks(m: Column, order: Column): Column =
    coalesce(
      when(order.isNotNull,
        flatten(filter(transform(order, p => element_at(m, p)), a => a.isNotNull))),
      when(m.isNotNull, flatten(map_values(m))),
      array().cast(ArrayType(snakSchema)))

  /** real statement → internal Statement struct. */
  private def statementColumn(s: Column): Column =
    struct(
      s("id").as("id"),
      s("mainsnak")("property").as("property"),
      s("rank").as("rank"),
      snakColumn(s("mainsnak")).as("mainSnak"),
      transform(orderedSnaks(s("qualifiers"), s("qualifiers-order")),
        q => snakColumn(q)).as("qualifiers"),
      transform(
        coalesce(s("references"), array().cast(ArrayType(referenceSchema))),
        r => transform(orderedSnaks(r("snaks"), r("snaks-order")),
          q => snakColumn(q))).as("references"),
      // dump-provided reference hashes (wdref: parity — Model.Statement)
      transform(
        coalesce(s("references"), array().cast(ArrayType(referenceSchema))),
        r => coalesce(r("hash"), lit(""))).as("refHashes"))

  /** parsed real-entity struct → internal doc struct
    * (Model.entityJsonSchema shape: what SpecCompiler predicates and the
    * emitter's Dataset[EntityDoc] encoder consume). */
  def docColumn(raw: Column): Column =
    when(raw.isNotNull, struct(
      raw("id").as("id"),
      raw("type").as("type"),
      raw("datatype").as("datatype"),
      transform_values(raw("labels"), (_, v) => v("value")).as("labels"),
      transform_values(raw("descriptions"), (_, v) => v("value")).as("descriptions"),
      transform_values(raw("aliases"),
        (_, arr) => transform(arr, a => a("value"))).as("aliases"),
      map_values(raw("sitelinks")).as("sitelinks"),
      transform(flatten(map_values(raw("claims"))),
        s => statementColumn(s)).as("statements")).cast(Model.entityJsonSchema))

  /** lite snak conversion for the filter parse: only the fields
    * SpecCompiler predicates read (snaktype, valueType, value.id) — the
    * one datavalue sub-parse is the entity-id shape. */
  private def snakColumnLite(s: Column): Column = {
    val dv = s("datavalue")
    val isValue = s("snaktype") === "value" && dv.isNotNull
    val ev = from_json(dv("value"), entityIdValueSchema)
    struct(
      s("property").as("property"),
      s("snaktype").as("snaktype"),
      when(isValue, valueTypeColumn(dv("type"))).as("valueType"),
      when(isValue && dv("type") === "wikibase-entityid",
        struct(coalesce(ev("id"), concat(
          when(ev("entity-type") === "property", lit("P"))
            .when(ev("entity-type") === "lexeme", lit("L")).otherwise(lit("Q")),
          ev("numeric-id").cast("string"))).as("id"))).as("value"))
  }

  /** filter-parse variant: minimal statements (property/rank/mainSnak)
    * from the pruned claims schema. */
  def filterDocColumn(raw: Column): Column =
    when(raw.isNotNull, struct(
      raw("id").as("id"),
      raw("type").as("type"),
      raw("datatype").as("datatype"),
      transform(flatten(map_values(raw("claims"))), s => struct(
        s("mainsnak")("property").as("property"),
        s("rank").as("rank"),
        snakColumnLite(s("mainsnak")).as("mainSnak"))).as("statements")))

  // ---- fixture → real-dump re-encoder (round-trip test/bench helper) ----

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  private val WD_ENTITY = "http://www.wikidata.org/entity/"

  /** Convert one fixture-shape entity JSON document into real Wikidata
    * dump JSON — the exact inverse of the parse above, so every golden /
    * equivalence fixture can exercise the real-dump path. Pure function,
    * deterministic (field order fixed by insertion order). */
  def toDumpJson(fixtureJson: String): String = {
    import com.fasterxml.jackson.databind.JsonNode
    import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
    val src = mapper.readTree(fixtureJson).asInstanceOf[ObjectNode]
    val out = mapper.createObjectNode()
    val etype = src.path("type").asText("")
    out.put("type", etype)
    out.put("id", src.path("id").asText(""))
    if (src.hasNonNull("datatype")) out.put("datatype", src.get("datatype").asText)

    def terms(field: String, outField: String): Unit = if (src.has(field)) {
      val o = out.putObject(outField)
      src.get(field).fields().forEachRemaining { e =>
        val t = o.putObject(e.getKey)
        t.put("language", e.getKey); t.put("value", e.getValue.asText)
      }
    }
    if (etype == "lexeme") {
      // real lexemes carry lemmas/forms/senses; only id+type matter to
      // the engine (lexemes route to the error channel)
      terms("labels", "lemmas")
      return mapper.writeValueAsString(out)
    }
    terms("labels", "labels"); terms("descriptions", "descriptions")
    if (src.has("aliases")) {
      val o = out.putObject("aliases")
      src.get("aliases").fields().forEachRemaining { e =>
        val arr = o.putArray(e.getKey)
        e.getValue.forEach { v =>
          val t = arr.addObject(); t.put("language", e.getKey); t.put("value", v.asText)
        }
      }
    }

    def snak(s: JsonNode): ObjectNode = {
      val o = mapper.createObjectNode()
      val snaktype = s.path("snaktype").asText("value")
      o.put("snaktype", snaktype)
      o.put("property", s.path("property").asText)
      if (snaktype == "value") {
        val dv = o.putObject("datavalue")
        val v = s.path("value")
        s.path("valueType").asText match {
          case "entityid" =>
            dv.put("type", "wikibase-entityid")
            val vo = dv.putObject("value")
            val id = v.path("id").asText
            vo.put("entity-type",
              if (id.startsWith("P")) "property"
              else if (id.startsWith("L")) "lexeme" else "item")
            vo.put("numeric-id", id.drop(1).toLong)
            vo.put("id", id)
          case "monolingualtext" =>
            dv.put("type", "monolingualtext")
            val vo = dv.putObject("value")
            vo.put("text", v.path("text").asText); vo.put("language", v.path("lang").asText)
          case "quantity" =>
            dv.put("type", "quantity")
            val vo = dv.putObject("value")
            vo.put("amount", v.path("amount").asText)
            val u = v.path("unit").asText("1")
            vo.put("unit", if (u == "1" || u.isEmpty) "1" else WD_ENTITY + u)
          case "time" =>
            dv.put("type", "time")
            val vo = dv.putObject("value")
            vo.put("time", v.path("time").asText)
            vo.put("timezone", 0); vo.put("before", 0); vo.put("after", 0)
            vo.put("precision", v.path("precision").asInt(11))
            vo.put("calendarmodel", WD_ENTITY + v.path("calendar").asText("Q1985727"))
          case "globecoordinate" =>
            dv.put("type", "globecoordinate")
            val vo = dv.putObject("value")
            vo.put("latitude", v.path("lat").asDouble)
            vo.put("longitude", v.path("lon").asDouble)
            vo.putNull("altitude")
            vo.put("precision", v.path("precision").asDouble)
            vo.put("globe", WD_ENTITY + v.path("globe").asText("Q2"))
          case _ =>
            dv.put("type", "string"); dv.put("value", v.path("str").asText)
        }
      }
      o
    }

    // claims: statements grouped by property in first-occurrence order
    val claims = out.putObject("claims")
    if (src.has("statements")) src.get("statements").forEach { st =>
      val prop = st.path("property").asText
      val arr =
        if (claims.has(prop)) claims.get(prop).asInstanceOf[ArrayNode]
        else claims.putArray(prop)
      val o = arr.addObject()
      o.set[ObjectNode]("mainsnak", snak(st.get("mainSnak")))
      o.put("type", "statement")
      o.put("id", st.path("id").asText)
      o.put("rank", st.path("rank").asText("normal"))
      val quals = st.path("qualifiers")
      if (quals.isArray && quals.size() > 0) {
        val qo = o.putObject("qualifiers")
        val order = o.putArray("qualifiers-order")
        quals.forEach { q =>
          val p = q.path("property").asText
          if (!qo.has(p)) { order.add(p); qo.putArray(p) }
          qo.get(p).asInstanceOf[ArrayNode].add(snak(q))
        }
      }
      val refs = st.path("references")
      if (refs.isArray && refs.size() > 0) {
        val ro = o.putArray("references")
        refs.forEach { ref =>
          val r = ro.addObject()
          r.put("hash", "")
          val snaks = r.putObject("snaks")
          val order = r.putArray("snaks-order")
          ref.forEach { q =>
            val p = q.path("property").asText
            if (!snaks.has(p)) { order.add(p); snaks.putArray(p) }
            snaks.get(p).asInstanceOf[ArrayNode].add(snak(q))
          }
        }
      }
    }
    // sitelinks: array → object keyed by site. The real format cannot
    // carry two links for one site; fixture duplicates merge (badge
    // union), which preserves the emitted triple set.
    if (src.has("sitelinks")) {
      val sl = out.putObject("sitelinks")
      src.get("sitelinks").forEach { s =>
        val site = s.path("site").asText
        val o =
          if (sl.has(site)) sl.get(site).asInstanceOf[ObjectNode]
          else {
            val n = sl.putObject(site)
            n.put("site", site); n.put("title", s.path("title").asText)
            n.putArray("badges"); n
          }
        val badges = o.get("badges").asInstanceOf[ArrayNode]
        val seen = scala.collection.mutable.Set.empty[String]
        badges.forEach(b => seen += b.asText)
        s.path("badges").forEach(b => if (seen.add(b.asText)) badges.add(b.asText))
      }
    }
    mapper.writeValueAsString(out)
  }

  /** Re-encode a fixture corpus's content column as real dump JSON
    * (typed map over the corpus rows). */
  def convertCorpus(corpus: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    corpus.as[EntityCorpus.CorpusRow]
      .map(r => r.copy(lang = "wikidata-dump-json", content = toDumpJson(r.content)))
      .toDF()
  }
}
