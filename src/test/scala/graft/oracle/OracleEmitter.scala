package graft.oracle

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.spec._
import graft.emit.{NTriples, Vocab}
import scala.jdk.CollectionConverters._
import scala.collection.mutable

/** Tests-only ORACLE: an independent, single-threaded reimplementation of
  * the reference's filter+serialize semantics, interpreting the raw JSON
  * document tree directly (no Spark, no shared emitter code paths — only
  * the leaf-level N-Triples/lexical-form/hash constants are shared, since
  * those define the output alphabet).
  *
  * Mirrors `FilteredRdfSerializer` + `DumpSpec.includeDocument` from the
  * reference (see SURVEY §2); used by GoldenSpec to validate the engine
  * by set-equality on every example spec.
  */
object OracleEmitter {
  private val mapper = new ObjectMapper()

  case class Result(triples: Set[(String, String, String)], entities: Long, statements: Long)

  def sha256Hex(s: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** Spark-compatible xxhash64 over (stringCol, longCol) with seed 42:
    * hash = XXH64(bytes(id), 42) then XXH64(longValue, prevHash). */
  def sparkXxhash64(id: String, seed: Long): Long = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    import org.apache.spark.unsafe.Platform
    val bytes = id.getBytes("UTF-8")
    val h1 = XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET, bytes.length, 42L)
    XXH64.hashLong(seed, h1)
  }

  // ---- spec predicate (reference DumpSpec.includeDocument) ---------------

  def includeDocument(spec: DumpSpec, doc: JsonNode): Boolean = {
    val typeOk = spec.entities.isEmpty || spec.entities.exists(f => entityFilterMatches(f, doc))
    val pct = spec.samplingPercent
    val sampled = pct == 100 || {
      val h = sparkXxhash64(doc.get("id").asText, spec.seed)
      ((h % 100) + 100) % 100 < pct
    }
    typeOk && sampled
  }

  private def entityFilterMatches(f: EntityFilter, doc: JsonNode): Boolean = {
    val t = doc.get("type").asText
    (f.etype == "any" || f.etype == t) && f.properties.forall(r => restrictionMatches(r, doc))
  }

  private def statementsOf(doc: JsonNode): Seq[JsonNode] =
    Option(doc.get("statements")).map(_.elements.asScala.toSeq).getOrElse(Nil)

  private def restrictionMatches(r: PropertyRestriction, doc: JsonNode): Boolean = {
    var group = statementsOf(doc).filter(_.get("property").asText == r.property)
    if (group.isEmpty) return false
    if (r.rank == RankFilter.Best) {
      val best = bestRank(group)
      group = group.filter(s => best.contains(s.get("rank").asText))
      if (group.isEmpty) return false
    }
    group.exists { s =>
      val rank = s.get("rank").asText
      if (rank == "deprecated" && r.rank != RankFilter.All) false
      else {
        val snak = s.get("mainSnak")
        val st = snak.get("snaktype").asText
        r.ptype match {
          case SnakFilterType.Any       => true
          case SnakFilterType.AnyValue  => st == "value"
          case SnakFilterType.SomeValue => st == "somevalue"
          case SnakFilterType.NoValue   => st == "novalue"
          case SnakFilterType.EntityId =>
            st == "value" &&
              Option(snak.get("valueType")).exists(_.asText == "entityid") &&
              Option(snak.get("value")).flatMap(v => Option(v.get("id")))
                .exists(_.asText == r.value.get)
        }
      }
    }
  }

  def bestRank(group: Seq[JsonNode]): Option[String] = {
    val ranks = group.map(_.get("rank").asText)
    if (ranks.contains("preferred")) Some("preferred")
    else if (ranks.contains("normal")) Some("normal")
    else None
  }

  // ---- emission ----------------------------------------------------------

  def prologue: Set[(String, String, String)] =
    Vocab.knownVocabularyTypes.map { case (u, t) => (u, Vocab.RDF_TYPE, s"<$t>") }.toSet

  /** run the oracle over a corpus of raw content strings */
  def run(spec: DumpSpec, contents: Seq[String],
          sites: Map[String, (String, String)]): Result = {
    val out = mutable.Set.empty[(String, String, String)]
    out ++= prologue
    var entities = 0L
    var stmts = 0L
    contents.foreach { c =>
      val doc = mapper.readTree(c)
      if (doc != null && doc.get("id") != null && includeDocument(spec, doc)) {
        val t = doc.get("type").asText
        if (t == "lexeme") {
          // NotImplemented → document skipped (error channel)
        } else {
          entities += 1
          val (ts, sc) = emitDocument(spec, doc, sites)
          out ++= ts
          stmts += sc
        }
      }
    }
    Result(out.toSet, entities, stmts)
  }

  private def valueOf(snak: JsonNode): (String, JsonNode) =
    (Option(snak.get("valueType")).map(_.asText).getOrElse(""), snak.get("value"))

  private def snakModelValue(vt: String, v: JsonNode): graft.model.Model.Value = {
    import graft.model.Model.Value
    def s(n: String) = Option(v.get(n)).map(_.asText)
    def d(n: String) = Option(v.get(n)).map(_.asDouble)
    vt match {
      case "entityid"        => Value.empty.copy(id = s("id"))
      case "string"          => Value.empty.copy(str = s("str"))
      case "monolingualtext" => Value.empty.copy(text = s("text"), lang = s("lang"))
      case "quantity"        => Value.empty.copy(amount = s("amount"), unit = s("unit"))
      case "time"            => Value.empty.copy(time = s("time"), precision = d("precision"), calendar = s("calendar"))
      case "globecoordinate" => Value.empty.copy(lat = d("lat"), lon = d("lon"), precision = d("precision"), globe = s("globe"))
      case _                 => Value.empty
    }
  }

  def emitDocument(spec: DumpSpec, doc: JsonNode,
                   sites: Map[String, (String, String)]): (Set[(String, String, String)], Long) = {
    val out = mutable.Set.empty[(String, String, String)]
    val usedProps = mutable.LinkedHashSet.empty[(String, Boolean)]
    val noValueClasses = mutable.LinkedHashSet.empty[String]
    val seenValueNodes = mutable.HashSet.empty[String]
    val seenRefs = mutable.HashSet.empty[String]
    var stmtCount = 0L

    val id = doc.get("id").asText
    val etype = doc.get("type").asText
    val subj = Vocab.WD + id
    def add(s: String, p: String, o: String): Unit = out += ((s, p, o))

    // simple-context snak emission
    def emitSnakSimple(snak: JsonNode, s: String, ctx: String): Unit = {
      val prop = snak.get("property").asText
      snak.get("snaktype").asText match {
        case "value" =>
          val (vt, v) = valueOf(snak)
          if (v != null) {
            val (term, isObj) = graft.emit.TripleEmitter.simpleValueTerm(vt, snakModelValue(vt, v))
            add(s, ctx + prop, term)
            usedProps += ((ctx + prop, isObj))
          }
        case "somevalue" =>
          add(s, ctx + prop, "<" + NTriples.genidIri(s, prop, ctx) + ">")
          usedProps += ((ctx + prop, true))
        case "novalue" =>
          add(s, Vocab.RDF_TYPE, "<" + Vocab.WDNO + prop + ">")
          noValueClasses += (Vocab.WDNO + prop)
        case _ => ()
      }
    }
    // value-context snak emission (wdv: nodes for complex values)
    def emitSnakValue(snak: JsonNode, s: String, ctx: String): Unit = {
      if (snak.get("snaktype").asText != "value") return
      val (vt, v) = valueOf(snak)
      if (v == null) return
      if (vt == "quantity" || vt == "time" || vt == "globecoordinate") {
        val mv = snakModelValue(vt, v)
        val hash = NTriples.valueNodeHash(vt, mv)
        val node = Vocab.WDV + hash
        val prop = snak.get("property").asText
        add(s, ctx + prop, "<" + node + ">")
        usedProps += ((ctx + prop, true))
        if (seenValueNodes.add(hash)) {
          vt match {
            case "quantity" =>
              add(node, Vocab.RDF_TYPE, "<" + Vocab.WB_QUANTITY_VALUE + ">")
              add(node, Vocab.WIKIBASE + "quantityAmount",
                NTriples.typedLiteral(NTriples.decimalLexical(mv.amount.getOrElse("0")), Vocab.XSD + "decimal"))
              val u = mv.unit.getOrElse("1")
              if (u == "1" || u.isEmpty) add(node, Vocab.WIKIBASE + "quantityUnit", NTriples.literal("1"))
              else add(node, Vocab.WIKIBASE + "quantityUnit", "<" + Vocab.WD + u + ">")
            case "time" =>
              add(node, Vocab.RDF_TYPE, "<" + Vocab.WB_TIME_VALUE + ">")
              add(node, Vocab.WIKIBASE + "timeValue",
                NTriples.typedLiteral(NTriples.dateTimeLexical(mv.time.getOrElse(""),
                  mv.precision.map(_.toInt).getOrElse(11), mv.calendar.getOrElse("Q1985727")),
                  Vocab.XSD + "dateTime"))
              add(node, Vocab.WIKIBASE + "timePrecision",
                NTriples.typedLiteral(mv.precision.map(_.toInt).getOrElse(0).toString, Vocab.XSD + "integer"))
              add(node, Vocab.WIKIBASE + "timeCalendarModel", "<" + Vocab.WD + mv.calendar.getOrElse("Q1985727") + ">")
            case _ =>
              add(node, Vocab.RDF_TYPE, "<" + Vocab.WB_GLOBE_COORDINATE_VALUE + ">")
              add(node, Vocab.WIKIBASE + "geoLatitude",
                NTriples.typedLiteral(NTriples.fmtDouble(mv.lat.getOrElse(0.0)), Vocab.XSD + "double"))
              add(node, Vocab.WIKIBASE + "geoLongitude",
                NTriples.typedLiteral(NTriples.fmtDouble(mv.lon.getOrElse(0.0)), Vocab.XSD + "double"))
              add(node, Vocab.WIKIBASE + "geoPrecision",
                NTriples.typedLiteral(NTriples.fmtDouble(mv.precision.getOrElse(0.0)), Vocab.XSD + "double"))
              add(node, Vocab.WIKIBASE + "geoGlobe", "<" + Vocab.WD + mv.globe.getOrElse("Q2") + ">")
          }
        }
      }
    }

    def terms(kind: String, pred: String): Unit = {
      val m = Option(doc.get(kind)).getOrElse(mapper.createObjectNode())
      m.properties().asScala.toSeq.sortBy(_.getKey).foreach { e =>
        if (spec.includeLanguage(e.getKey)) {
          if (e.getValue.isArray)
            e.getValue.elements.asScala.foreach(a => add(subj, pred, NTriples.langLiteral(a.asText, e.getKey)))
          else add(subj, pred, NTriples.langLiteral(e.getValue.asText, e.getKey))
        }
      }
    }

    if (etype == "property") add(subj, Vocab.RDF_TYPE, "<" + Vocab.WB_PROPERTY + ">")
    else if (spec.meta) add(subj, Vocab.RDF_TYPE, "<" + Vocab.WB_ITEM + ">")

    if (spec.labels) terms("labels", Vocab.RDFS_LABEL)
    if (spec.descriptions) terms("descriptions", Vocab.SCHEMA_DESCRIPTION)
    if (spec.aliases) terms("aliases", Vocab.SKOS_ALT_LABEL)

    if (etype == "property") {
      val dt = Option(doc.get("datatype")).map(_.asText).getOrElse("string")
      add(subj, Vocab.WB_PROPERTY_TYPE,
        "<" + Vocab.propertyTypeIri.getOrElse(dt, Vocab.WIKIBASE + dt) + ">")
    }

    // statements, grouped by property in first-occurrence order
    val stmts = statementsOf(doc)
    val order = stmts.map(_.get("property").asText).distinct
    order.foreach { prop =>
      val group = stmts.filter(_.get("property").asText == prop)
      val options = spec.findOptions(prop)
      val best = bestRank(group)
      val fullNodes = mutable.ArrayBuffer.empty[(String, String)]
      group.foreach { st =>
        val rank = st.get("rank").asText
        val isBest = best.contains(rank)
        val stmtIri = Vocab.WDS + st.get("id").asText.replace('$', '-')
        if (options.isStatement || options.simple) stmtCount += 1
        if (options.simple && isBest) emitSnakSimple(st.get("mainSnak"), subj, Vocab.WDT)
        if (options.rank.matches(rank, isBest)) {
          if (options.isStatement) {
            add(subj, Vocab.P + prop, "<" + stmtIri + ">")
            usedProps += ((Vocab.P + prop, true))
            if (spec.meta) add(stmtIri, Vocab.RDF_TYPE, "<" + Vocab.WB_STATEMENT + ">")
          }
          if (options.full) {
            emitSnakValue(st.get("mainSnak"), stmtIri, Vocab.PSV)
            emitSnakSimple(st.get("mainSnak"), stmtIri, Vocab.PS)
            if (options.qualifiers) {
              val quals = Option(st.get("qualifiers")).map(_.elements.asScala.toSeq).getOrElse(Nil)
              quals.foreach(q => emitSnakValue(q, stmtIri, Vocab.PQV))
              quals.foreach(q => emitSnakSimple(q, stmtIri, Vocab.PQ))
            }
          }
          if (options.references) {
            val refs = Option(st.get("references")).map(_.elements.asScala.toSeq).getOrElse(Nil)
            refs.foreach { ref =>
              val snaks = ref.elements.asScala.toSeq
              val keys = snaks.map { sn =>
                val (vt, v) = valueOf(sn)
                val key = if (sn.get("snaktype").asText == "value" && v != null)
                  NTriples.valueKey(vt, snakModelValue(vt, v)) else ""
                s"${sn.get("property").asText}|${sn.get("snaktype").asText}|$key"
              }
              val hash = NTriples.referenceHash(keys)
              val refIri = Vocab.WDREF + hash
              add(stmtIri, Vocab.PROV_DERIVED_FROM, "<" + refIri + ">")
              if (seenRefs.add(hash)) {
                add(refIri, Vocab.RDF_TYPE, "<" + Vocab.WB_REFERENCE + ">")
                snaks.foreach(sn => emitSnakValue(sn, refIri, Vocab.PRV))
                snaks.foreach(sn => emitSnakSimple(sn, refIri, Vocab.PR))
              }
            }
          }
          if (options.full) {
            add(stmtIri, Vocab.WB_RANK, "<" + Vocab.rankIri(rank) + ">")
            fullNodes += ((stmtIri, rank))
          }
        }
      }
      if (options.isStatement) {
        val ranks = fullNodes.map(_._2)
        val bufferedBest =
          if (ranks.contains("preferred")) Some("preferred")
          else if (ranks.contains("normal")) Some("normal") else None
        fullNodes.foreach { case (n, r) =>
          if (bufferedBest.contains(r)) add(n, Vocab.RDF_TYPE, "<" + Vocab.WB_BEST_RANK + ">")
        }
      }
    }

    // sitelinks (items only in practice; property docs have none)
    if (etype != "property" && spec.sitelinks) {
      Option(doc.get("sitelinks")).foreach(_.elements.asScala.foreach { sl =>
        val site = sl.get("site").asText
        sites.get(site).foreach { case (pattern, langCode) =>
          val url = pattern.replace("$1",
            graft.emit.TripleEmitter.encodeTitle(sl.get("title").asText))
          add(url, Vocab.RDF_TYPE, "<" + Vocab.SCHEMA_ARTICLE + ">")
          add(url, Vocab.SCHEMA_ABOUT, "<" + subj + ">")
          add(url, Vocab.SCHEMA_IN_LANGUAGE, NTriples.literal(Vocab.fixLanguageCode(langCode)))
          Option(sl.get("badges")).foreach(_.elements.asScala.foreach(b =>
            add(url, Vocab.WB_BADGE, "<" + Vocab.WD + b.asText + ">")))
        }
      })
    }

    if (etype == "property")
      Vocab.interPropertyLinks.foreach { case (pred, prefix) => add(subj, pred, "<" + prefix + id + ">") }

    // OWL declarations flush
    val fullDecls = etype == "property" || spec.hasFullStatements
    usedProps.foreach { case (pred, isObj) =>
      if (pred.startsWith(Vocab.WDT) || fullDecls)
        add(pred, Vocab.RDF_TYPE,
          "<" + (if (isObj) Vocab.OWL_OBJECT_PROP else Vocab.OWL_DATATYPE_PROP) + ">")
    }
    noValueClasses.foreach(c => add(c, Vocab.RDF_TYPE, "<" + Vocab.OWL_CLASS + ">"))

    (out.toSet, stmtCount)
  }
}
