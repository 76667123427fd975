package graft.sink

import java.nio.charset.StandardCharsets
import java.util.Base64

import org.apache.spark.sql.{DataFrame, Row}

/** O1 — Fabric definition assembly (reference:
  * `src/formats/rdf/fabric_serializer.py:32-199`): `.platform` part,
  * `definition.json`, one part per entity type (topologically sorted,
  * parents first — `fabric_serializer.py:57-58`), one per relationship;
  * each part's payload is base64 of JSON rendered exactly like Python's
  * `json.dumps(indent=2)` (SURVEY §7.5 byte-parity caveat — hence the
  * tiny printer below instead of a JSON library with different
  * formatting).
  */
object FabricParts {

  // ---- byte-stable JSON printer (Python json.dumps(indent=2) dialect) --

  sealed trait J
  final case class JStr(v: String) extends J
  final case class JNum(v: Long) extends J
  final case class JBool(v: Boolean) extends J
  case object JNull extends J
  final case class JArr(items: Seq[J]) extends J
  final case class JObj(fields: Seq[(String, J)]) extends J

  /** Matches CPython's json.dumps(obj, indent=2): item separator ",",
    * key separator ": ", newline before every element, closing bracket
    * on its own line at parent indent, empty containers inline.
    */
  def render(j: J, indent: Int = 0): String = {
    val pad = "  " * indent
    val childPad = "  " * (indent + 1)
    j match {
      case JStr(v) => "\"" + escape(v) + "\""
      case JNum(v) => v.toString
      case JBool(v) => if (v) "true" else "false"
      case JNull => "null"
      case JArr(Seq()) => "[]"
      case JArr(items) =>
        items.map(i => childPad + render(i, indent + 1))
          .mkString("[\n", ",\n", s"\n$pad]")
      case JObj(Seq()) => "{}"
      case JObj(fields) =>
        fields.map { case (k, v) =>
          childPad + "\"" + escape(k) + "\": " + render(v, indent + 1)
        }.mkString("{\n", ",\n", s"\n$pad}")
    }
  }

  private def escape(s: String): String = {
    val sb = new StringBuilder
    for (c <- s) c match {
      case '"' => sb ++= "\\\""
      case '\\' => sb ++= "\\\\"
      case '\n' => sb ++= "\\n"
      case '\r' => sb ++= "\\r"
      case '\t' => sb ++= "\\t"
      case '\b' => sb ++= "\\b"
      case '\f' => sb ++= "\\f"
      case c if c < ' ' => sb ++= f"\\u${c.toInt}%04x"
      case c if c > 127 => sb ++= f"\\u${c.toInt}%04x" // ensure_ascii escapes >0x7F only (DEL stays raw)
      case c => sb += c
    }
    sb.toString
  }

  def b64(json: String): String =
    Base64.getEncoder.encodeToString(json.getBytes(StandardCharsets.UTF_8))

  final case class Part(path: String, payload: String,
                        payloadType: String = "InlineBase64")

  /** Entity row (Extract.entityTypes schema) → Fabric EntityType JSON.
    * Field order and presence mirror `fabric_types.py:100-118` `to_dict`
    * exactly: id, namespace, name, namespaceType, visibility,
    * baseEntityTypeId (always present, JSON null when absent); then
    * entityIdParts / displayNamePropertyId / properties /
    * timeseriesProperties only when non-empty.
    */
  def entityJson(r: Row): J = {
    def propJson(p: Row): J = JObj(Seq(
      "id" -> JStr(p.getAs[String]("id")),
      "name" -> JStr(p.getAs[String]("name")),
      "valueType" -> JStr(p.getAs[String]("valueType"))))
    val props = r.getAs[scala.collection.Seq[Row]]("properties")
    val tsProps = r.getAs[scala.collection.Seq[Row]]("timeseriesProperties")
    val idParts = r.getAs[scala.collection.Seq[String]]("entityIdParts")
    JObj(Seq(
      "id" -> JStr(r.getAs[String]("id")),
      "namespace" -> JStr("usertypes"),
      "name" -> JStr(r.getAs[String]("name")),
      "namespaceType" -> JStr("Custom"),
      "visibility" -> JStr("Visible"),
      "baseEntityTypeId" -> Option(r.getAs[String]("baseEntityTypeId"))
        .map(JStr).getOrElse(JNull)) ++
      (if (idParts.nonEmpty) Seq("entityIdParts" -> JArr(idParts.map(JStr).toSeq)) else Nil) ++
      Option(r.getAs[String]("displayNamePropertyId"))
        .map(d => "displayNamePropertyId" -> JStr(d)).toSeq ++
      (if (props.nonEmpty) Seq("properties" -> JArr(props.map(propJson).toSeq)) else Nil) ++
      (if (tsProps.nonEmpty)
        Seq("timeseriesProperties" -> JArr(tsProps.map(propJson).toSeq)) else Nil))
  }

  /** Field order mirrors `fabric_types.py:167-176`: id, namespace, name,
    * namespaceType, source, target. */
  def relJson(r: Row): J = JObj(Seq(
    "id" -> JStr(r.getAs[String]("id")),
    "namespace" -> JStr("usertypes"),
    "name" -> JStr(r.getAs[String]("name")),
    "namespaceType" -> JStr("Custom"),
    "source" -> JObj(Seq("entityTypeId" -> JStr(r.getAs[String]("srcEntityTypeId")))),
    "target" -> JObj(Seq("entityTypeId" -> JStr(r.getAs[String]("dstEntityTypeId"))))))

  /** Assemble the full definition: platform + definition.json + parts,
    * entities in parents-first topological order (G4), relationships
    * after, both name-ordered within a level for determinism.
    */
  def assemble(entities: DataFrame, rels: DataFrame,
               topoRank: Map[String, Int], displayName: String): Seq[Part] = {
    // .platform carries only {metadata:{type,displayName}}
    // (fabric_serializer.py:71-85); definition.json is literally {}
    // (fabric_serializer.py:88-94).
    val platform = JObj(Seq(
      "metadata" -> JObj(Seq("type" -> JStr("Ontology"),
        "displayName" -> JStr(displayName)))))
    val definition = JObj(Nil)

    val entityRows = entities.collect()
      .sortBy(r => (topoRank.getOrElse(r.getAs[String]("uri"), Int.MaxValue),
        r.getAs[String]("name")))
    val relRows = rels.collect().sortBy(r =>
      (r.getAs[String]("name"), r.getAs[String]("id")))

    Seq(
      Part(".platform", b64(render(platform))),
      Part("definition.json", b64(render(definition)))) ++
      entityRows.map(r => Part(s"EntityTypes/${r.getAs[String]("id")}/definition.json",
        b64(render(entityJson(r))))) ++
      relRows.map(r => Part(s"RelationshipTypes/${r.getAs[String]("id")}/definition.json",
        b64(render(relJson(r)))))
  }

  /** S6 — read a definition back: decode parts, route by path prefix
    * (`fabric_to_ttl.py:89-173`). Returns (entityJsons, relJsons).
    */
  def decode(parts: Seq[Part]): (Seq[String], Seq[String]) = {
    def dec(p: Part) = new String(Base64.getDecoder.decode(p.payload),
      StandardCharsets.UTF_8)
    (parts.filter(_.path.startsWith("EntityTypes/")).map(dec),
      parts.filter(_.path.startsWith("RelationshipTypes/")).map(dec))
  }

  private type JsonNode = com.fasterxml.jackson.databind.JsonNode

  /** S6 complete — decode a heterogeneous parts array handling BOTH
    * dialects of `fabric_to_ttl.py:121-170`:
    *  - Fabric API format: `{path, payload}` with base64 JSON, routed by
    *    `EntityTypes/` / `RelationshipTypes/` path membership;
    *  - "simple format for testing": direct objects with a `type` field —
    *    `EntityType` (id, displayName|name|id, baseEntityType),
    *    `Property` (attached to the FIRST already-seen entity whose id or
    *    name equals `parentEntity`; silently dropped when no parent
    *    matches — reference line 150 comment and loop), and
    *    `Relationship` (fromEntity/toEntity endpoints).
    * Returns normalized (entityNodes, relNodes) in the API-format JSON
    * shape, so downstream conversion is dialect-agnostic.
    */
  def decodeNodes(partNodes: Seq[JsonNode]): (Seq[JsonNode], Seq[JsonNode]) = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val entities =
      scala.collection.mutable.ArrayBuffer[com.fasterxml.jackson.databind.node.ObjectNode]()
    val rels = scala.collection.mutable.ArrayBuffer[JsonNode]()
    def txt(n: JsonNode, f: String): Option[String] =
      Option(n.get(f)).filter(!_.isNull).map(_.asText)
    for (p <- partNodes) {
      if (p.has("path") && p.has("payload")) {
        val path = txt(p, "path").getOrElse("")
        val payload = txt(p, "payload").getOrElse("")
        if (payload.nonEmpty) {
          // malformed base64 / JSON / non-object payloads are SKIPPED
          // (round-3 advice: an array or scalar payload used to throw
          // ClassCastException), mirroring the reference's
          // no-structural-validation-but-no-crash handling
          val decoded: Option[JsonNode] =
            try Some(mapper.readTree(new String(
              Base64.getDecoder.decode(payload), StandardCharsets.UTF_8)))
            catch { case _: IllegalArgumentException |
                         _: com.fasterxml.jackson.core.JacksonException => None }
          decoded.filter(_.isObject).foreach { d =>
            // reference uses substring membership, not prefix (line 131-135)
            if (path.contains("EntityTypes/"))
              entities += d.asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
            else if (path.contains("RelationshipTypes/")) rels += d
          }
        }
      } else if (p.has("type")) txt(p, "type").getOrElse("") match {
        case "EntityType" =>
          val e = mapper.createObjectNode()
          val id = txt(p, "id").getOrElse("")
          e.put("id", id)
          e.put("name", txt(p, "displayName")
            .orElse(txt(p, "name")).getOrElse(id))
          txt(p, "baseEntityType") match {
            case Some(b) => e.put("baseEntityTypeId", b)
            case None => e.putNull("baseEntityTypeId")
          }
          e.set[JsonNode]("properties", mapper.createArrayNode())
          entities += e
        case "Property" =>
          val parentId = txt(p, "parentEntity").getOrElse("")
          val prop = mapper.createObjectNode()
          prop.put("id", txt(p, "id").getOrElse(""))
          prop.put("name", txt(p, "displayName")
            .orElse(txt(p, "name")).getOrElse(""))
          prop.put("valueType", txt(p, "dataType").getOrElse("String"))
          entities.find(e => e.get("id").asText == parentId ||
              e.get("name").asText == parentId)
            .foreach(_.withArray("properties").add(prop))
        case "Relationship" =>
          val r = mapper.createObjectNode()
          r.put("id", txt(p, "id").getOrElse(""))
          r.put("name", txt(p, "displayName")
            .orElse(txt(p, "name")).getOrElse(""))
          r.set[JsonNode]("source", mapper.createObjectNode()
            .put("entityTypeId", txt(p, "fromEntity").getOrElse("")))
          r.set[JsonNode]("target", mapper.createObjectNode()
            .put("entityTypeId", txt(p, "toEntity").getOrElse("")))
          rels += r
        case _ => () // unknown simple-format type: ignored, as the reference's if/elif chain does
      }
    }
    (entities.toSeq, rels.toSeq)
  }

  private def entityFromNode(n: JsonNode): graft.model.EntityType = {
    import scala.jdk.CollectionConverters._
    import graft.model.{EntityType, Prop}
    def props(field: String) =
      Option(n.get(field)).map(_.elements().asScala.toSeq).getOrElse(Nil)
        .map(p => Prop(p.get("id").asText, p.get("name").asText,
          p.get("valueType").asText, isTimeseries = field == "timeseriesProperties"))
    EntityType(
      id = n.get("id").asText, name = n.get("name").asText,
      uri = "", // not carried in the Fabric payload
      baseEntityTypeId = Option(n.get("baseEntityTypeId"))
        .filter(!_.isNull).map(_.asText),
      entityIdParts = Option(n.get("entityIdParts"))
        .map(_.elements().asScala.map(_.asText).toSeq).getOrElse(Nil),
      displayNamePropertyId = Option(n.get("displayNamePropertyId")).map(_.asText),
      properties = props("properties"),
      timeseriesProperties = props("timeseriesProperties"))
  }

  private def relFromNode(n: JsonNode): graft.model.Rel =
    graft.model.Rel(n.get("id").asText, n.get("name").asText, "",
      n.get("source").get("entityTypeId").asText,
      n.get("target").get("entityTypeId").asText, "", "")

  /** S6 continued — decoded parts → entity/rel DataFrames in the
    * `Extract.entityTypes` schema, closing the export loop
    * (definition → [[TtlExport.toTriples]] → TTL). JSON via Jackson
    * (Spark classpath).
    */
  def toDataFrames(spark: org.apache.spark.sql.SparkSession,
                   parts: Seq[Part]): (DataFrame, DataFrame) = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val (es, rs) = decode(parts)
    nodesToDataFrames(spark, es.map(mapper.readTree), rs.map(mapper.readTree))
  }

  /** Dialect-agnostic entry (API parts and/or simple-format parts mixed in
    * one array): the CLI export path reads definitions through this.
    */
  def toDataFramesMixed(spark: org.apache.spark.sql.SparkSession,
                        partNodes: Seq[JsonNode]): (DataFrame, DataFrame) = {
    val (es, rs) = decodeNodes(partNodes)
    nodesToDataFrames(spark, es, rs)
  }

  private def nodesToDataFrames(spark: org.apache.spark.sql.SparkSession,
                                es: Seq[JsonNode],
                                rs: Seq[JsonNode]): (DataFrame, DataFrame) = {
    import spark.implicits._
    (spark.createDataset(es.map(entityFromNode)).toDF(),
      spark.createDataset(rs.map(relFromNode)).toDF())
  }

  /** O3 — JSON output file with conversion ledger (reference:
    * `unified/convert.py:133-150`): `{displayName, description,
    * definition, conversionResult}`, byte-stable rendering.
    */
  def writeOutput(path: String, displayName: String, parts: Seq[Part],
                  stats: graft.model.ConversionStats): Unit = {
    val doc = JObj(Seq(
      "displayName" -> JStr(displayName),
      "description" -> JStr(s"Converted ontology: $displayName"),
      "definition" -> JObj(Seq("parts" -> JArr(parts.map(p => JObj(Seq(
        "path" -> JStr(p.path),
        "payload" -> JStr(p.payload),
        "payloadType" -> JStr(p.payloadType))))))),
      "conversionResult" -> JObj(Seq(
        "entityTypes" -> JNum(stats.entityTypes),
        "relationshipTypes" -> JNum(stats.relationshipTypes),
        "skippedItems" -> JNum(stats.skippedItems),
        "warnings" -> JNum(stats.warnings)))))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), render(doc))
  }
}
