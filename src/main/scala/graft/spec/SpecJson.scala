package graft.spec

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import scala.jdk.CollectionConverters._

/** Spec JSON parse / migrate / validate / serialize.
  *
  * Uses Jackson's tree API (ships with Spark). Implements the same
  * migrations and validations as the reference's Jackson-annotated
  * builder family (see Spec.scala header for the file:line inventory).
  * Round-trips byte-stably through `toJson` (sorted keys), mirroring the
  * reference's serialize→parse→serialize stability test
  * (`spec/DumpLoadingIntegrationTest.java:27-62`).
  */
object SpecJson {
  private val mapper = new ObjectMapper()

  def parse(json: String): DumpSpec = {
    val root = mapper.readTree(json)
    require(root != null && root.isObject, "spec must be a JSON object")
    fromNode(root.asInstanceOf[ObjectNode])
  }

  private def optField(n: JsonNode, name: String): Option[JsonNode] =
    Option(n.get(name)).filterNot(_.isNull)

  private def boolField(n: JsonNode, name: String, default: Boolean = false): Boolean =
    optField(n, name).map(_.asBoolean).getOrElse(default)

  /** legacy `truthy` key: false tolerated, true never supported
    * (reference `DumpSpecJson.java:134-141`). */
  private def checkTruthy(n: JsonNode): Unit =
    optField(n, "truthy").foreach { t =>
      if (t.asBoolean) throw new IllegalArgumentException("truthy: true was never supported")
    }

  private def rankField(n: JsonNode): RankFilter =
    optField(n, "rank").map(r => RankFilter.fromJson(r.asText)).getOrElse(RankFilter.All)

  private def fromNode(root: ObjectNode): DumpSpec = {
    checkTruthy(root)

    val entities = optField(root, "entities") match {
      case Some(arr: ArrayNode) => arr.elements.asScala.map(parseEntityFilter).toSeq
      case Some(other) => throw new IllegalArgumentException(s"entities must be an array, got $other")
      case None => throw new IllegalArgumentException("spec requires 'entities'")
    }
    val statements = optField(root, "statements") match {
      case Some(arr: ArrayNode) => arr.elements.asScala.map(parseStatementFilter).toSeq
      case Some(other) => throw new IllegalArgumentException(s"statements must be an array, got $other")
      case None => throw new IllegalArgumentException("spec requires 'statements'")
    }

    // migration: pre-sampling specs get pct=100/seed=0 (DumpSpecJson.java:152-163)
    val seedOpt = optField(root, "seed").map(_.asLong)
    val pctOpt = optField(root, "samplingPercent").map(_.asInt)
    val (pct, seed) =
      if (seedOpt.isEmpty && pctOpt.isEmpty) (100, 0L)
      else (pctOpt.getOrElse(100), seedOpt.getOrElse(0L))

    DumpSpec(
      version = optField(root, "version").map(_.asText).getOrElse("1"),
      entities = entities,
      statements = statements,
      samplingPercent = pct,
      seed = seed,
      languages = optField(root, "languages").map(_.elements.asScala.map(_.asText).toSet),
      labels = boolField(root, "labels"),
      descriptions = boolField(root, "descriptions"),
      aliases = boolField(root, "aliases"),
      meta = boolField(root, "meta"),
      sitelinks = boolField(root, "sitelinks")
    )
  }

  private def parseEntityFilter(n: JsonNode): EntityFilter = {
    val etype = optField(n, "type").map(_.asText)
      .getOrElse(throw new IllegalArgumentException("entity filter requires 'type'"))
    require(Set("item", "property", "lexeme", "any").contains(etype), s"invalid entity type filter: $etype")
    val props = optField(n, "properties") match {
      case Some(arr: ArrayNode) => arr.elements.asScala.map(parseRestriction).toSeq
      case Some(other) => throw new IllegalArgumentException(
        s"entity filter 'properties' must be an array, got ${other.getNodeType}")
      case None => throw new IllegalArgumentException("entity filter requires 'properties'")
    }
    EntityFilter(etype, props)
  }

  private def parseRestriction(n: JsonNode): PropertyRestriction = {
    checkTruthy(n)
    PropertyRestriction(
      property = optField(n, "property").map(_.asText)
        .getOrElse(throw new IllegalArgumentException("property restriction requires 'property'")),
      ptype = SnakFilterType.fromJson(optField(n, "type").map(_.asText)
        .getOrElse(throw new IllegalArgumentException("property restriction requires 'type'"))),
      value = optField(n, "value").map(_.asText),
      rank = rankField(n)
    )
  }

  private def parseStatementFilter(n: JsonNode): StatementFilter = {
    StatementFilter(
      properties = optField(n, "properties").map(_.elements.asScala.map(_.asText).toSet),
      options = StatementOptions(
        rank = rankField(n),
        simple = boolField(n, "simple"),
        full = boolField(n, "full"),
        references = boolField(n, "references"),
        qualifiers = boolField(n, "qualifiers"))
    )
  }

  // ---- canonical serialization (round-trip stability) -------------------

  def toJson(spec: DumpSpec): String = {
    val root = mapper.createObjectNode()
    root.put("version", spec.version)
    val ents = root.putArray("entities")
    spec.entities.foreach { ef =>
      val e = ents.addObject()
      e.put("type", ef.etype)
      val ps = e.putArray("properties")
      ef.properties.foreach { r =>
        val p = ps.addObject()
        p.put("property", r.property)
        p.put("type", r.ptype.json)
        r.value.foreach(p.put("value", _))
        p.put("rank", r.rank.json)
      }
    }
    val stmts = root.putArray("statements")
    spec.statements.foreach { sf =>
      val s = stmts.addObject()
      sf.properties.foreach { props =>
        val pa = s.putArray("properties")
        props.toSeq.sorted.foreach(pa.add)
      }
      s.put("rank", sf.options.rank.json)
      s.put("simple", sf.options.simple)
      s.put("full", sf.options.full)
      s.put("references", sf.options.references)
      s.put("qualifiers", sf.options.qualifiers)
    }
    root.put("samplingPercent", spec.samplingPercent)
    root.put("seed", spec.seed)
    spec.languages.foreach { langs =>
      val la = root.putArray("languages")
      langs.toSeq.sorted.foreach(la.add)
    }
    root.put("labels", spec.labels)
    root.put("descriptions", spec.descriptions)
    root.put("aliases", spec.aliases)
    root.put("meta", spec.meta)
    root.put("sitelinks", spec.sitelinks)
    mapper.writeValueAsString(root)
  }
}
