package graft.emit

import graft.model.Model._
import graft.spec.{DumpSpec, StatementOptions}
import scala.collection.mutable

/** The triple-emission generator: pure function (spec, entity doc) →
  * triples. This is the engine's one real "UDTF" (SURVEY §2.10) and is
  * executed as a typed flatMap over `Dataset[EntityDoc]` — idiomatic,
  * per-row, no state across entities, so it parallelizes to any number
  * of executors with zero shuffle.
  *
  * Semantics mirror the reference's `FilteredRdfSerializer` operator
  * family (reference `processors/FilteredRdfSerializer.java`):
  *  - P1 document toggles (`:140-149,263-278`)
  *  - P3 simple/truthy statements (`:333-335,366-371`)
  *  - P4 full statement nodes + rank + BestRank (`:342-363,298-322`)
  *  - P5 qualifiers (`:391-407`), P6 references (`:373-380`)
  *  - P7 terms (`:263-289`), P8 sitelinks (`:410-437`)
  *  - P9 property-document extras (`:156-238`)
  *  - P10 value-node expansion (wdtk SnakRdfConverter, ctor `:52-58`)
  *  - D1/D2 per-entity dedup of reference nodes / OWL declarations
  *    (`:34-36,151-153,376-379`)
  *  - A3/A4 best-rank derivation and marking (`:247-259,312-322`)
  *
  * Like the reference, all buffers are per-entity (flushed at entity
  * boundaries) — O(1) state per document.
  */
object TripleEmitter {
  import NTriples._
  import Vocab._

  /** site table row: siteKey → (urlPattern with $1 placeholder, languageCode).
    * The reference reads this from the dump's site table
    * (`DumpRunner.java:71`); we broadcast it (J2). */
  type Sites = Map[String, (String, String)]

  // property contexts (wdtk PropertyContext); simple contexts emit plain
  // values, value contexts emit wdv: nodes for complex values
  private val DIRECT = WDT
  private val STMT = P
  private val VALUE_SIMPLE = PS
  private val VALUE = PSV
  private val QUAL_SIMPLE = PQ
  private val QUAL = PQV
  private val REF_SIMPLE = PR
  private val REF = PRV

  /** Constant prologue triples written once per dump on open (reference
    * S5 `FilteredRdfSerializer.open` `:481-486`; N-Triples has no prefix
    * syntax so only the OWL type triples materialize). */
  def prologue: Seq[Triple] =
    knownVocabularyTypes.map { case (u, t) => Triple(u, RDF_TYPE, iri(t)) }

  /** Per-entity emission state (D1/D2 buffers, A4 rank buffer). */
  private final class EntityState {
    val triples = mutable.ArrayBuffer.empty[Triple]
    // value nodes already materialized for this entity (D1-like dedup;
    // node IRI is a content hash so global dropDuplicates finishes the job)
    val seenValueNodes = mutable.HashSet.empty[String]
    val seenReferences = mutable.HashSet.empty[String]
    // (predicateIri, isObjectProperty) pairs used by snak emission (D2)
    val usedProps = mutable.LinkedHashSet.empty[(String, Boolean)]
    val usedNoValueClasses = mutable.LinkedHashSet.empty[String]
    def add(s: String, p: String, o: String): Unit = triples += Triple(s, p, o)
  }

  /** Emit all triples for one included entity document. Lexeme docs are
    * not serializable (reference raises NotImplementedException,
    * `FilteredRdfSerializer.java:89-98`) — call `isSerializable` first;
    * the pipeline routes lexemes to the error channel (S6). */
  def emit(spec: DumpSpec, doc: EntityDoc, sites: Sites): Seq[Triple] = {
    require(isSerializable(doc), s"serialization of ${doc.etype} not implemented")
    val st = new EntityState
    val subject = WD + doc.id

    if (doc.etype == "property") {
      // reference writePropertyDocument `:156-181`: type triple unconditional
      st.add(subject, RDF_TYPE, iri(WB_PROPERTY))
      writeDocumentTerms(spec, doc, subject, st)
      val dt = doc.datatype.getOrElse("string")
      st.add(subject, WB_PROPERTY_TYPE, iri(propertyTypeIri.getOrElse(dt, WIKIBASE + dt)))
      writeStatements(spec, doc, subject, st)
      writeInterPropertyLinks(doc.id, subject, st)
      flushBuffers(spec, st, fullDecls = true)
    } else {
      // item path (reference writeItemDocument `:133-154`)
      if (spec.meta) st.add(subject, RDF_TYPE, iri(WB_ITEM))
      writeDocumentTerms(spec, doc, subject, st)
      writeStatements(spec, doc, subject, st)
      if (spec.sitelinks) writeSiteLinks(doc, subject, sites, st)
      flushBuffers(spec, st, fullDecls = spec.hasFullStatements)
    }
    st.triples.toSeq
  }

  def isSerializable(doc: EntityDoc): Boolean = doc.etype == "item" || doc.etype == "property"

  // ---- terms (P7) --------------------------------------------------------

  private def writeDocumentTerms(spec: DumpSpec, doc: EntityDoc, subject: String, st: EntityState): Unit = {
    def terms(m: Map[String, String], pred: String): Unit =
      m.toSeq.sortBy(_._1).foreach { case (lang, text) =>
        if (spec.includeLanguage(lang)) st.add(subject, pred, langLiteral(text, lang))
      }
    if (spec.labels) terms(doc.labels, RDFS_LABEL)
    if (spec.descriptions) terms(doc.descriptions, SCHEMA_DESCRIPTION)
    if (spec.aliases) doc.aliases.toSeq.sortBy(_._1).foreach { case (lang, as) =>
      if (spec.includeLanguage(lang)) as.foreach(a => st.add(subject, SKOS_ALT_LABEL, langLiteral(a, lang)))
    }
  }

  // ---- statements (P3-P6, A3/A4, F9) -------------------------------------

  /** Best-rank derivation (A3; wdtk StatementGroup.getBestStatements):
    * preferred if any non-deprecated preferred exists, else normal if
    * any normal exists, else no best (deprecated is never best). */
  def bestRank(group: Seq[Statement]): Option[String] =
    if (group.exists(_.rank == "preferred")) Some("preferred")
    else if (group.exists(_.rank == "normal")) Some("normal")
    else None

  private def writeStatements(spec: DumpSpec, doc: EntityDoc, subject: String, st: EntityState): Unit = {
    // statement groups in first-occurrence order of property (the wdtk
    // document model groups statements by property; our flat array
    // preserves insertion order)
    val groups = doc.statements.groupBy(_.property)
    val order = doc.statements.map(_.property).distinct
    order.foreach { prop =>
      val group = groups(prop)
      val options = spec.findOptions(prop)
      val best = bestRank(group)
      val fullNodes = mutable.ArrayBuffer.empty[(String, String)] // (stmtIri, rank) for A4
      group.foreach { s =>
        val isBest = best.contains(s.rank)
        writeStatement(spec, subject, s, options, isBest, fullNodes, st)
      }
      // A4: BestRank marking at group end (reference `:257-259,312-322`)
      if (options.isStatement) {
        val ranks = fullNodes.map(_._2)
        val bufferedBest =
          if (ranks.contains("preferred")) Some("preferred")
          else if (ranks.contains("normal")) Some("normal")
          else None
        fullNodes.foreach { case (node, rank) =>
          if (bufferedBest.contains(rank)) st.add(node, RDF_TYPE, iri(WB_BEST_RANK))
        }
      }
    }
  }

  def statementIri(statementId: String): String = WDS + statementId.replace('$', '-')

  private def writeStatement(
      spec: DumpSpec, subject: String, s: Statement, options: StatementOptions,
      best: Boolean, fullNodes: mutable.ArrayBuffer[(String, String)], st: EntityState): Unit = {
    val stmtIri = statementIri(s.id)

    // P3: simple/truthy — only best-rank statements (reference `:333-335`)
    if (options.simple && best) writeSnak(s.mainSnak, subject, DIRECT, st)

    // F9: full-statement rank gate (reference `:338-340`)
    if (!options.rank.matches(s.rank, best)) return

    if (options.isStatement) {
      st.add(subject, STMT + s.property, iri(stmtIri))
      st.usedProps += ((STMT + s.property, true))
      if (spec.meta) st.add(stmtIri, RDF_TYPE, iri(WB_STATEMENT))
    }
    if (options.full) {
      // P4: main snak in VALUE + VALUE_SIMPLE contexts (reference writeClaim `:382-390`)
      writeSnakValueNode(s.mainSnak, stmtIri, VALUE, st)
      writeSnak(s.mainSnak, stmtIri, VALUE_SIMPLE, st)
      // P5: qualifiers (reference `:391-407`)
      if (options.qualifiers) {
        s.qualifiers.foreach(q => writeSnakValueNode(q, stmtIri, QUAL, st))
        s.qualifiers.foreach(q => writeSnak(q, stmtIri, QUAL_SIMPLE, st))
      }
    }
    // P6: references (reference `:373-380`). Node id: the dump-provided
    // reference hash when the input carries one (real Wikidata dump JSON
    // does; Wikibase RDF uses the same hash in wdref: IRIs — byte parity
    // for free), else the engine's content hash (fixtures, old dumps).
    if (options.references) s.references.zipWithIndex.foreach { case (ref, i) =>
      val hash = s.refHashes.lift(i).filter(h => h != null && h.nonEmpty)
        .getOrElse(referenceHash(ref.map(snakKey)))
      val refIri = WDREF + hash
      st.add(stmtIri, PROV_DERIVED_FROM, iri(refIri))
      if (st.seenReferences.add(hash)) { // D1: content-addressed, once per entity
        st.add(refIri, RDF_TYPE, iri(WB_REFERENCE))
        ref.foreach(r => writeSnakValueNode(r, refIri, REF, st))
        ref.foreach(r => writeSnak(r, refIri, REF_SIMPLE, st))
      }
    }
    if (options.full) {
      // rank triple + A4 buffer (reference `:298-307,362`)
      st.add(stmtIri, WB_RANK, iri(rankIri(s.rank)))
      fullNodes += ((stmtIri, s.rank))
    }
  }

  private def snakKey(s: Snak): String =
    s"${s.property}|${s.snaktype}|" + (for { vt <- s.valueType; v <- s.value } yield valueKey(vt, v)).getOrElse("")

  // ---- snak conversion (P10 / SC6; wdtk SnakRdfConverter semantics) ------

  /** Simple-context emission: plain literal / IRI object. */
  private def writeSnak(s: Snak, subject: String, ctx: String, st: EntityState): Unit = {
    val pred = ctx + s.property
    s.snaktype match {
      case "value" =>
        for (vt <- s.valueType; v <- s.value) {
          val (obj, isObject) = simpleValueTerm(vt, v)
          st.add(subject, pred, obj)
          st.usedProps += ((pred, isObject))
        }
      case "somevalue" =>
        st.add(subject, pred, iri(genidIri(subject, s.property, ctx)))
        st.usedProps += ((pred, true))
      case "novalue" =>
        // class assertion (reference via wdtk: rdf:type wdno:P)
        st.add(subject, RDF_TYPE, iri(WDNO + s.property))
        st.usedNoValueClasses += (WDNO + s.property)
      case _ => ()
    }
  }

  /** Value-context emission: wdv: node for complex values only
    * (quantity/time/globecoordinate); simple values have no value node. */
  private def writeSnakValueNode(s: Snak, subject: String, ctx: String, st: EntityState): Unit = {
    if (s.snaktype != "value") return
    for (vt <- s.valueType; v <- s.value) {
      if (vt == "quantity" || vt == "time" || vt == "globecoordinate") {
        val hash = valueNodeHash(vt, v)
        val nodeIri = WDV + hash
        st.add(subject, ctx + s.property, iri(nodeIri))
        st.usedProps += ((ctx + s.property, true))
        if (st.seenValueNodes.add(hash)) writeValueNode(nodeIri, vt, v, st)
      }
    }
  }

  /** Simple value → (N-Triples term, isIriObject). */
  def simpleValueTerm(valueType: String, v: Value): (String, Boolean) = valueType match {
    case "entityid"        => (iri(WD + v.id.getOrElse("")), true)
    case "string"          => (literal(v.str.getOrElse("")), false)
    case "monolingualtext" => (langLiteral(v.text.getOrElse(""), v.lang.getOrElse("")), false)
    case "quantity"        => (typedLiteral(decimalLexical(v.amount.getOrElse("0")), XSD + "decimal"), false)
    case "time"            => (typedLiteral(dateTimeLexical(v.time.getOrElse(""),
      v.precision.map(_.toInt).getOrElse(11), v.calendar.getOrElse("Q1985727")), XSD + "dateTime"), false)
    case "globecoordinate" => (typedLiteral(
      wktLexical(v.lat.getOrElse(0.0), v.lon.getOrElse(0.0), v.globe.getOrElse("Q2")),
      "http://www.opengis.net/ont/geosparql#wktLiteral"), false)
    case other => (literal(other), false)
  }

  /** Full value-node triples (P10; wdtk AnyValueConverter). */
  private def writeValueNode(nodeIri: String, vt: String, v: Value, st: EntityState): Unit = vt match {
    case "quantity" =>
      st.add(nodeIri, RDF_TYPE, iri(WB_QUANTITY_VALUE))
      st.add(nodeIri, WIKIBASE + "quantityAmount",
        typedLiteral(decimalLexical(v.amount.getOrElse("0")), XSD + "decimal"))
      val u = v.unit.getOrElse("1")
      if (u == "1" || u.isEmpty) st.add(nodeIri, WIKIBASE + "quantityUnit", literal("1"))
      else st.add(nodeIri, WIKIBASE + "quantityUnit", iri(WD + u))
    case "time" =>
      st.add(nodeIri, RDF_TYPE, iri(WB_TIME_VALUE))
      st.add(nodeIri, WIKIBASE + "timeValue",
        typedLiteral(dateTimeLexical(v.time.getOrElse(""),
          v.precision.map(_.toInt).getOrElse(11), v.calendar.getOrElse("Q1985727")), XSD + "dateTime"))
      st.add(nodeIri, WIKIBASE + "timePrecision",
        typedLiteral(v.precision.map(_.toInt).getOrElse(0).toString, XSD + "integer"))
      st.add(nodeIri, WIKIBASE + "timeCalendarModel", iri(WD + v.calendar.getOrElse("Q1985727")))
    case "globecoordinate" =>
      st.add(nodeIri, RDF_TYPE, iri(WB_GLOBE_COORDINATE_VALUE))
      st.add(nodeIri, WIKIBASE + "geoLatitude", typedLiteral(fmtDouble(v.lat.getOrElse(0.0)), XSD + "double"))
      st.add(nodeIri, WIKIBASE + "geoLongitude", typedLiteral(fmtDouble(v.lon.getOrElse(0.0)), XSD + "double"))
      st.add(nodeIri, WIKIBASE + "geoPrecision", typedLiteral(fmtDouble(v.precision.getOrElse(0.0)), XSD + "double"))
      st.add(nodeIri, WIKIBASE + "geoGlobe", iri(WD + v.globe.getOrElse("Q2")))
    case _ => ()
  }

  // ---- sitelinks (P8/J2) --------------------------------------------------

  private def writeSiteLinks(doc: EntityDoc, subject: String, sites: Sites, st: EntityState): Unit =
    doc.sitelinks.foreach { sl =>
      sites.get(sl.site) match {
        case Some((pattern, langCode)) =>
          val url = pattern.replace("$1", encodeTitle(sl.title))
          st.add(url, RDF_TYPE, iri(SCHEMA_ARTICLE))
          st.add(url, SCHEMA_ABOUT, iri(subject))
          st.add(url, SCHEMA_IN_LANGUAGE, literal(fixLanguageCode(langCode)))
          sl.badges.foreach(b => st.add(url, WB_BADGE, iri(WD + b)))
        case None => () // unresolvable → warn & skip (reference `:428-433`)
      }
    }

  /** MediaWiki title → URL path segment (space → _, percent-encode the
    * rest like wdtk's site-link URL construction). */
  def encodeTitle(title: String): String = {
    val t = title.replace(' ', '_')
    t.flatMap {
      case c if c.isLetterOrDigit || "_-.~:/()!*';@&=+$,".contains(c) => c.toString
      case c => c.toString.getBytes("UTF-8").map("%%%02X".format(_)).mkString
    }
  }

  // ---- property docs (P9) --------------------------------------------------

  private def writeInterPropertyLinks(pid: String, subject: String, st: EntityState): Unit =
    interPropertyLinks.foreach { case (pred, ctxPrefix) =>
      st.add(subject, pred, iri(ctxPrefix + pid))
    }

  // ---- per-entity flushes (D2) ---------------------------------------------

  /** OWL property declarations for predicates used by this entity
    * (reference OwlDeclarationBuffer flush `:151-152,178-179`). wdt:
    * declarations always; statement-context declarations only when the
    * spec materializes full statements. */
  private def flushBuffers(spec: DumpSpec, st: EntityState, fullDecls: Boolean): Unit = {
    st.usedProps.foreach { case (pred, isObject) =>
      val isDirect = pred.startsWith(WDT)
      if (isDirect || fullDecls)
        st.add(pred, RDF_TYPE, iri(if (isObject) OWL_OBJECT_PROP else OWL_DATATYPE_PROP))
    }
    st.usedNoValueClasses.foreach(c => st.add(c, RDF_TYPE, iri(OWL_CLASS)))
  }
}
