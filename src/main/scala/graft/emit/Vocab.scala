package graft.emit

/** Wikidata RDF vocabulary constants (public knowledge: the Wikibase RDF
  * dump format, https://www.mediawiki.org/wiki/Wikibase/Indexing/RDF_Dump_Format;
  * used by the reference via wdtk `Vocabulary`, see
  * `processors/FilteredRdfSerializer.java:107-131,191-238`). */
object Vocab {
  val WD = "http://www.wikidata.org/entity/"
  val WDS = "http://www.wikidata.org/entity/statement/"
  val WDREF = "http://www.wikidata.org/reference/"
  val WDV = "http://www.wikidata.org/value/"
  val WDT = "http://www.wikidata.org/prop/direct/"
  val P = "http://www.wikidata.org/prop/"
  val PS = "http://www.wikidata.org/prop/statement/"
  val PSV = "http://www.wikidata.org/prop/statement/value/"
  val PQ = "http://www.wikidata.org/prop/qualifier/"
  val PQV = "http://www.wikidata.org/prop/qualifier/value/"
  val PR = "http://www.wikidata.org/prop/reference/"
  val PRV = "http://www.wikidata.org/prop/reference/value/"
  val WDNO = "http://www.wikidata.org/prop/novalue/"
  val GENID = "http://www.wikidata.org/.well-known/genid/"

  val WIKIBASE = "http://wikiba.se/ontology#"
  val RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
  val RDFS = "http://www.w3.org/2000/01/rdf-schema#"
  val OWL = "http://www.w3.org/2002/07/owl#"
  val XSD = "http://www.w3.org/2001/XMLSchema#"
  val SCHEMA = "http://schema.org/"
  val SKOS = "http://www.w3.org/2004/02/skos/core#"
  val PROV = "http://www.w3.org/ns/prov#"

  val RDF_TYPE = RDF + "type"
  val RDFS_LABEL = RDFS + "label"
  val SCHEMA_DESCRIPTION = SCHEMA + "description"
  val SCHEMA_ABOUT = SCHEMA + "about"
  val SCHEMA_ARTICLE = SCHEMA + "Article"
  val SCHEMA_IN_LANGUAGE = SCHEMA + "inLanguage"
  val SKOS_ALT_LABEL = SKOS + "altLabel"
  val PROV_DERIVED_FROM = PROV + "wasDerivedFrom"
  val OWL_CLASS = OWL + "Class"
  val OWL_OBJECT_PROP = OWL + "ObjectProperty"
  val OWL_DATATYPE_PROP = OWL + "DatatypeProperty"

  val WB_ITEM = WIKIBASE + "Item"
  val WB_PROPERTY = WIKIBASE + "Property"
  val WB_STATEMENT = WIKIBASE + "Statement"
  val WB_REFERENCE = WIKIBASE + "Reference"
  val WB_BEST_RANK = WIKIBASE + "BestRank"
  val WB_NORMAL_RANK = WIKIBASE + "NormalRank"
  val WB_PREFERRED_RANK = WIKIBASE + "PreferredRank"
  val WB_DEPRECATED_RANK = WIKIBASE + "DeprecatedRank"
  val WB_RANK = WIKIBASE + "rank"
  val WB_BADGE = WIKIBASE + "badge"
  val WB_PROPERTY_TYPE = WIKIBASE + "propertyType"
  val WB_TIME_VALUE = WIKIBASE + "TimeValue"
  val WB_QUANTITY_VALUE = WIKIBASE + "QuantityValue"
  val WB_GLOBE_COORDINATE_VALUE = WIKIBASE + "GlobecoordinateValue"

  // wikibase:propertyType IRIs, keyed by our datatype strings
  val propertyTypeIri: Map[String, String] = Map(
    "wikibase-item" -> (WIKIBASE + "WikibaseItem"),
    "wikibase-property" -> (WIKIBASE + "WikibaseProperty"),
    "string" -> (WIKIBASE + "String"),
    "monolingualtext" -> (WIKIBASE + "Monolingualtext"),
    "quantity" -> (WIKIBASE + "Quantity"),
    "time" -> (WIKIBASE + "Time"),
    "globe-coordinate" -> (WIKIBASE + "GlobeCoordinate"),
    "url" -> (WIKIBASE + "Url"),
    "external-id" -> (WIKIBASE + "ExternalId"),
    "commonsMedia" -> (WIKIBASE + "CommonsMedia")
  )

  /** Inter-property link predicates (reference
    * `FilteredRdfSerializer.writeInterPropertyLinks` `:191-238`):
    * predicate → property-context prefix of the object IRI. */
  val interPropertyLinks: Seq[(String, String)] = Seq(
    (WIKIBASE + "directClaim") -> WDT,
    (WIKIBASE + "claim") -> P,
    (WIKIBASE + "statementProperty") -> PS,
    (WIKIBASE + "statementValue") -> PSV,
    (WIKIBASE + "qualifier") -> PQ,
    (WIKIBASE + "qualifierValue") -> PQV,
    (WIKIBASE + "reference") -> PR,
    (WIKIBASE + "referenceValue") -> PRV,
    (WIKIBASE + "novalue") -> WDNO
  )

  def rankIri(rank: String): String = rank match {
    case "normal"     => WB_NORMAL_RANK
    case "preferred"  => WB_PREFERRED_RANK
    case "deprecated" => WB_DEPRECATED_RANK
    case other        => throw new IllegalArgumentException(s"invalid rank: $other")
  }

  /** OWL "basic declarations" emitted once per dump on open (reference
    * `FilteredRdfSerializer.writeBasicDeclarations` `:107-113` via wdtk
    * `Vocabulary.getKnownVocabularyTypes`): the vocabulary classes this
    * engine can emit, each typed owl:Class. */
  val knownVocabularyTypes: Seq[(String, String)] = Seq(
    WB_ITEM -> OWL_CLASS,
    WB_PROPERTY -> OWL_CLASS,
    WB_STATEMENT -> OWL_CLASS,
    WB_REFERENCE -> OWL_CLASS,
    WB_BEST_RANK -> OWL_CLASS,
    WB_TIME_VALUE -> OWL_CLASS,
    WB_QUANTITY_VALUE -> OWL_CLASS,
    WB_GLOBE_COORDINATE_VALUE -> OWL_CLASS
  )

  /** Deprecated / MediaWiki-specific language-code fixups (reference
    * `FilteredRdfSerializer.convertSiteLanguageCode` `:439-448` via wdtk
    * `WikimediaLanguageCodes`; public MediaWiki deprecated-code list +
    * the sr/zh legacy variant names that aren't BCP-47 subtags). */
  val deprecatedLanguageCodes: Map[String, String] = Map(
    "als" -> "gsw",
    "bat-smg" -> "sgs",
    "be-x-old" -> "be-tarask",
    "fiu-vro" -> "vro",
    "no" -> "nb",
    "roa-rup" -> "rup",
    "zh-classical" -> "lzh",
    "zh-min-nan" -> "nan",
    "zh-yue" -> "yue",
    "crh" -> "crh-Latn",
    "sr-ec" -> "sr-Cyrl",
    "sr-el" -> "sr-Latn",
    "simple" -> "en-simple"
  )

  /** MediaWiki code → BCP-47: explicit fixups above, then generic subtag
    * casing (script subtags Titlecase, region subtags UPPERCASE) — covers
    * zh-hans→zh-Hans, kk-cyrl→kk-Cyrl, en-gb→en-GB and the rest of the
    * script/region family mechanically. Known deviation vs wdtk: the
    * `-x-` private-use re-spellings of MediaWiki politeness variants
    * (de-formal, nl-informal) are left as-is. */
  def fixLanguageCode(code: String): String = {
    val c = deprecatedLanguageCodes.getOrElse(code, code)
    c.split('-').zipWithIndex.map {
      case (s, 0) => s.toLowerCase
      case (s, _) if s.length == 4 => s.substring(0, 1).toUpperCase + s.substring(1).toLowerCase
      case (s, _) if s.length == 2 => s.toUpperCase
      case (s, _) => s.toLowerCase
    }.mkString("-")
  }
}
