package graft.spec

/** Dump specification model — the engine's declarative query language.
  *
  * Semantics reproduce the reference's JSON spec family exactly
  * (reference: `spec/DumpSpecJson.java`, `spec/StatementFilterJson.java`,
  * `spec/PropertyRestrictionJson.java`, `spec/EntityFilterJson.java`,
  * `spec/RankFilter.java`, `spec/StatementOptions.java`):
  *
  *  - missing `rank` on a statement filter / property restriction → ALL
  *    (`StatementFilterJson.java:jsonBuild`, `PropertyRestrictionJson.java:jsonBuild`)
  *  - missing `seed` AND `samplingPercent` → 100% / seed 0
  *    (`DumpSpecJson.java:152-163`)
  *  - missing `version` → "1"
  *  - `truthy: true` rejected, `truthy: false` tolerated (legacy key)
  *    (`DumpSpecJson.java:134-141`, `PropertyRestrictionJson.java:147-153`)
  *  - frontend `id` fields ignored; unknown fields ignored
  *  - samplingPercent must be in [0, 100]
  *  - `entityid` restriction requires `value`; other types forbid it
  *    (`PropertyRestrictionJson.java:build`)
  *  - statement options resolution: default = union of property-less
  *    filters else (BEST_RANK, false×4); per-property = union of all
  *    filters listing it (`spec/DumpSpec.java:75-91`); union is
  *    most-permissive-wins on rank (BEST < NON_DEPRECATED < ALL,
  *    `RankFilter.java:23-34`) and OR on booleans
  *    (`StatementOptions.java:45-49`).
  */
sealed abstract class RankFilter(val json: String, val ord: Int) {
  /** Most-permissive-wins union (reference `RankFilter.java:23-34`). */
  def union(other: RankFilter): RankFilter = if (other.ord > ord) other else this
  /** Statement-level match (reference `RankFilter.java:11-21`). */
  def matches(rank: String, best: Boolean): Boolean = this match {
    case RankFilter.Best          => best
    case RankFilter.NonDeprecated => rank != "deprecated"
    case RankFilter.All           => true
  }
}
object RankFilter {
  case object Best extends RankFilter("best-rank", 0)
  case object NonDeprecated extends RankFilter("non-deprecated", 1)
  case object All extends RankFilter("all", 2)
  def fromJson(s: String): RankFilter = s match {
    case "best-rank"      => Best
    case "non-deprecated" => NonDeprecated
    case "all"            => All
    case other => throw new IllegalArgumentException(s"invalid rank filter: $other")
  }
}

/** Per-property statement projection options (reference `StatementOptions.java`). */
case class StatementOptions(
    rank: RankFilter,
    simple: Boolean,
    full: Boolean,
    references: Boolean,
    qualifiers: Boolean
) {
  /** True if the wds: statement node is materialized (reference
    * `StatementOptions.isStatement`). */
  def isStatement: Boolean = full || references || qualifiers
  def union(other: StatementOptions): StatementOptions = StatementOptions(
    rank.union(other.rank),
    simple || other.simple,
    full || other.full,
    references || other.references,
    qualifiers || other.qualifiers
  )
}
object StatementOptions {
  /** Fallback when no property-less statement filter exists
    * (reference `spec/DumpSpec.java:76-80`). */
  val default: StatementOptions = StatementOptions(RankFilter.Best, false, false, false, false)
}

/** properties == None ⇒ applies to all statements (the default bucket). */
case class StatementFilter(properties: Option[Set[String]], options: StatementOptions)

/** Snak-level filter type (reference `PropertyRestrictionJson.Type`). */
sealed trait SnakFilterType { def json: String }
object SnakFilterType {
  case object NoValue extends SnakFilterType { val json = "novalue" }
  case object SomeValue extends SnakFilterType { val json = "somevalue" }
  case object EntityId extends SnakFilterType { val json = "entityid" }
  case object AnyValue extends SnakFilterType { val json = "anyvalue" }
  case object Any extends SnakFilterType { val json = "any" }
  def fromJson(s: String): SnakFilterType = s match {
    case "novalue"   => NoValue
    case "somevalue" => SomeValue
    case "entityid"  => EntityId
    case "anyvalue"  => AnyValue
    case "any"       => Any
    case other => throw new IllegalArgumentException(s"invalid filter type: $other")
  }
}

/** Existential condition over the statement group of one property
  * (reference `PropertyRestrictionJson.matches`). */
case class PropertyRestriction(
    property: String,
    ptype: SnakFilterType,
    value: Option[String],
    rank: RankFilter
) {
  require(
    ptype != SnakFilterType.EntityId || value.isDefined,
    "property restriction with type entityid requires value attribute")
  require(
    ptype == SnakFilterType.EntityId || value.isEmpty,
    s"property restriction with type ${ptype.json} cannot have a value attribute")
}

/** etype ∈ {item, property, lexeme, any}; restrictions are a conjunction
  * (reference `EntityFilterJson.matches`). */
case class EntityFilter(etype: String, properties: Seq[PropertyRestriction])

case class DumpSpec(
    version: String,
    entities: Seq[EntityFilter],
    statements: Seq[StatementFilter],
    samplingPercent: Int,
    seed: Long,
    languages: Option[Set[String]],
    labels: Boolean,
    descriptions: Boolean,
    aliases: Boolean,
    meta: Boolean,
    sitelinks: Boolean
) {
  require(samplingPercent >= 0 && samplingPercent <= 100,
    s"sampling percentage ($samplingPercent) is not between 0 and 100")

  /** Default options: union over property-less filters (reference
    * `spec/DumpSpec.java:76-80`). */
  lazy val defaultOptions: StatementOptions =
    statements.filter(_.properties.isEmpty).map(_.options)
      .reduceOption(_ union _).getOrElse(StatementOptions.default)

  /** Per-property options: union over every filter listing the property
    * (reference `spec/DumpSpec.java:82-91`). */
  lazy val optionsByProperty: Map[String, StatementOptions] =
    statements.foldLeft(Map.empty[String, StatementOptions]) { (acc, f) =>
      f.properties.fold(acc) { props =>
        props.foldLeft(acc) { (m, p) =>
          m.updated(p, m.get(p).fold(f.options)(f.options.union))
        }
      }
    }

  def findOptions(property: String): StatementOptions =
    optionsByProperty.getOrElse(property, defaultOptions)

  /** reference `DumpSpec.hasFullStatements` */
  def hasFullStatements: Boolean =
    defaultOptions.isStatement || optionsByProperty.values.exists(_.isStatement)

  /** reference `DumpSpec.includeLanguage` */
  def includeLanguage(code: String): Boolean = languages.forall(_.contains(code))
}
