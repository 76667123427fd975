package graft.cdm

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

import graft.model.{EntityType, Prop, Rel, Skipped}
import graft.ontology.{Ids, Names}

/** CDM (Common Data Model) pipeline: parser S5, type mapper (§1.3),
  * inheritance flattening J9, key/display trait detection K6, FK
  * relationship resolution J5 (reference: the cdm_parser / cdm_models /
  * cdm_type_mapper / cdm_converter modules under `src/formats/cdm/`).
  */
final case class CdmAttribute(
    name: String,
    dataType: Option[String],
    traits: Seq[String],
    purpose: Option[String],
    displayName: Option[String]) {

  /** K6 — `cdm_models.py:153-163`. */
  def isPrimaryKey: Boolean =
    traits.exists(t => t == "means.identity.entityId" || t == "is.identifiedBy") ||
      purpose.contains("identifiedBy")

  /** K6 — `cdm_models.py:165-175`. */
  def isDisplayName: Boolean =
    traits.exists(t => t == "means.identity.name" ||
      t == "means.identity.person.fullName") ||
      purpose.contains("namedBy")
}

final case class CdmEntity(
    name: String,
    extendsEntity: Option[String],
    attributes: Seq[CdmAttribute])

final case class CdmRelationship(
    fromEntity: String, fromAttribute: String,
    toEntity: String, toAttribute: String,
    name: Option[String], verbPhrase: Option[String]) {

  /** F10/naming — `cdm_models.py:273-307`. */
  def relationshipName: String =
    name.orElse(verbPhrase).getOrElse {
      val from = fromEntity.split("/").last.split("\\.")(0)
      val to = toEntity.split("/").last.split("\\.")(0)
      s"${from}_to_$to"
    }
  def fromEntityName: String = fromEntity.split("/").last
  def toEntityName: String = toEntity.split("/").last
}

final case class CdmManifest(entities: Seq[CdmEntity],
                             relationships: Seq[CdmRelationship])

object CdmParser {
  private val mapper = new ObjectMapper()

  /** S5 — dialect detection (`cdm_parser.py:208-250`): manifest
    * (`entities` + optional `relationships`), entity schema
    * (`definitions`), legacy model.json (`entities` with
    * `$type`/`attributes`).
    */
  def parse(content: String): CdmManifest = {
    val root = mapper.readTree(content)
    if (root.has("definitions")) parseEntitySchema(root)
    else if (root.has("entities") && isModelJson(root)) parseModelJson(root)
    else parseManifest(root)
  }

  private def isModelJson(root: JsonNode): Boolean =
    root.has("version") || root.path("entities").elements().asScala
      .exists(e => e.has("$type") || e.has("attributes"))

  private def strings(n: JsonNode, field: String): Seq[JsonNode] =
    Option(n.get(field)).map(_.elements().asScala.toSeq).getOrElse(Nil)

  private def traitRefs(n: JsonNode, field: String): Seq[String] =
    strings(n, field).map { t =>
      if (t.isTextual) t.asText
      else Option(t.get("traitReference")).map(_.asText).getOrElse("")
    }.filter(_.nonEmpty)

  private def parseAttribute(a: JsonNode): Option[CdmAttribute] = {
    // string-shorthand attributes (`cdm_parser.py` accepts both)
    if (a.isTextual) return Some(CdmAttribute(a.asText, None, Nil, None, None))
    val name = Option(a.get("name")).map(_.asText).getOrElse(return None)
    val dt = Option(a.get("dataType")).map(d =>
      if (d.isTextual) d.asText
      else Option(d.get("dataTypeReference")).map(_.asText).getOrElse(""))
      .filter(_.nonEmpty)
      .orElse(Option(a.get("dataFormat")).map(_.asText))
    Some(CdmAttribute(name, dt, traitRefs(a, "appliedTraits"),
      Option(a.get("purpose")).map(p =>
        if (p.isTextual) p.asText
        else Option(p.get("purposeReference")).map(_.asText).getOrElse("")),
      Option(a.get("displayName")).map(_.asText)))
  }

  private def parseEntityNode(e: JsonNode): Option[CdmEntity] = {
    val name = Option(e.get("entityName")).orElse(Option(e.get("name")))
      .map(_.asText).getOrElse(return None)
    val ext = Option(e.get("extendsEntity")).map(x =>
      if (x.isTextual) x.asText
      else Option(x.get("entityReference")).map(_.asText).getOrElse(""))
      .filter(_.nonEmpty)
    val attrs = strings(e, "hasAttributes").flatMap(parseAttribute) ++
      strings(e, "attributes").flatMap(parseAttribute)
    Some(CdmEntity(name, ext, attrs))
  }

  private def parseRelationship(r: JsonNode): Option[CdmRelationship] = {
    for {
      fe <- Option(r.get("fromEntity")).map(_.asText)
      fa <- Option(r.get("fromEntityAttribute")).map(_.asText)
      te <- Option(r.get("toEntity")).map(_.asText)
      ta <- Option(r.get("toEntityAttribute")).map(_.asText)
    } yield {
      val verb = strings(r, "exhibitsTraits")
        .find(t => Option(t.get("traitReference")).exists(_.asText ==
          "means.relationship.verbPhrase"))
        .flatMap(t => strings(t, "arguments").headOption
          .flatMap(a => Option(a.get("value")).map(_.asText)))
      CdmRelationship(fe, fa, te, ta, Option(r.get("name")).map(_.asText), verb)
    }
  }

  def parseManifest(root: JsonNode): CdmManifest = CdmManifest(
    strings(root, "entities").flatMap(parseEntityNode),
    strings(root, "relationships").flatMap(parseRelationship))

  def parseEntitySchema(root: JsonNode): CdmManifest = CdmManifest(
    strings(root, "definitions").flatMap(parseEntityNode), Nil)

  def parseModelJson(root: JsonNode): CdmManifest = CdmManifest(
    strings(root, "entities").flatMap(parseEntityNode),
    strings(root, "relationships").flatMap { r =>
      // model.json relationship dialect: $type SingleKeyRelationship with
      // fromAttribute/toAttribute {entityName, attributeName}
      (for {
        f <- Option(r.get("fromAttribute"))
        t <- Option(r.get("toAttribute"))
        fe <- Option(f.get("entityName")).map(_.asText)
        te <- Option(t.get("entityName")).map(_.asText)
      } yield CdmRelationship(fe,
        Option(f.get("attributeName")).map(_.asText).getOrElse(""),
        te, Option(t.get("attributeName")).map(_.asText).getOrElse(""),
        Option(r.get("name")).map(_.asText), None)).toSeq
    })
}

object CdmTypeMapper {
  /** Primitive table (`cdm_type_mapper.py:50-102`). */
  val primitives: Map[String, String] = Map(
    "string" -> "String", "char" -> "String", "text" -> "String",
    "integer" -> "BigInt", "int" -> "BigInt", "int64" -> "BigInt",
    "int32" -> "BigInt", "int16" -> "BigInt", "smallInteger" -> "BigInt",
    "bigInteger" -> "BigInt", "byte" -> "BigInt", "tinyInteger" -> "BigInt",
    "float" -> "Double", "double" -> "Double", "real" -> "Double",
    "decimal" -> "Decimal", "numeric" -> "Decimal", "money" -> "Decimal",
    "smallMoney" -> "Decimal",
    "boolean" -> "Boolean", "bool" -> "Boolean",
    "date" -> "DateTime", "dateTime" -> "DateTime",
    "dateTimeOffset" -> "DateTime", "time" -> "DateTime",
    "timestamp" -> "DateTime",
    "GUID" -> "String", "guid" -> "String", "uuid" -> "String",
    "uniqueidentifier" -> "String",
    "binary" -> "String", "varbinary" -> "String", "image" -> "String",
    "JSON" -> "String", "json" -> "String", "object" -> "String",
    "variant" -> "String")

  /** Representative slice of the ~80-entry semantic table
    * (`cdm_type_mapper.py:112-210`).
    */
  val semantics: Map[String, String] = Map(
    "email" -> "String", "phone" -> "String", "url" -> "String",
    "name" -> "String", "firstName" -> "String", "lastName" -> "String",
    "fullName" -> "String", "addressLine" -> "String", "city" -> "String",
    "country" -> "String", "postalCode" -> "String",
    "latitude" -> "Double", "longitude" -> "Double",
    "currency" -> "Decimal", "baseCurrency" -> "Decimal",
    "age" -> "BigInt", "year" -> "BigInt", "day" -> "BigInt",
    "birthDate" -> "DateTime", "createdOn" -> "DateTime",
    "modifiedOn" -> "DateTime")

  /** Trait inference (`cdm_type_mapper.py:371-395`). */
  val traitTypes: Map[String, String] = Map(
    "is.dataFormat.integer" -> "BigInt", "is.dataFormat.big" -> "BigInt",
    "is.dataFormat.small" -> "BigInt",
    "is.dataFormat.floatingPoint" -> "Double",
    "is.dataFormat.numeric.shaped" -> "Decimal",
    "is.dataFormat.boolean" -> "Boolean",
    "is.dataFormat.date" -> "DateTime", "is.dataFormat.time" -> "DateTime",
    "is.dataFormat.timeOffset" -> "DateTime",
    "is.dataFormat.character" -> "String", "is.dataFormat.array" -> "String",
    "is.dataFormat.guid" -> "String", "is.dataFormat.byte" -> "BigInt")

  /** P7 — entity references become relationships, not scalars
    * (`cdm_type_mapper.py:223-227`).
    */
  val entityReferenceTypes: Set[String] = Set("entity", "entityId", "entityName")

  def isEntityReference(dataType: Option[String]): Boolean =
    dataType.exists(d => entityReferenceTypes.contains(d))

  def fabricType(attr: CdmAttribute): String =
    attr.dataType.flatMap(d => primitives.get(d).orElse(semantics.get(d)))
      .orElse(attr.traits.collectFirst {
        case t if traitTypes.contains(t) => traitTypes(t)
      })
      .getOrElse("String")
}

object CdmConverter {

  final case class Result(entities: Seq[EntityType], rels: Seq[Rel],
                          skipped: Seq[Skipped])

  def entityId(name: String): String = Ids.entityId("cdm:" + name)

  /** J9 — inheritance flattening (`cdm_converter.py:246-280`): merge base
    * attributes recursively; child attributes override by name.
    */
  def flattenAttributes(entity: CdmEntity,
                        byName: Map[String, CdmEntity],
                        seen: Set[String] = Set.empty): Seq[CdmAttribute] = {
    val base = entity.extendsEntity
      .filterNot(seen)
      .flatMap(byName.get)
      .map(b => flattenAttributes(b, byName, seen + entity.name))
      .getOrElse(Nil)
    val childNames = entity.attributes.map(_.name).toSet
    base.filterNot(a => childNames(a.name)) ++ entity.attributes
  }

  def convert(manifest: CdmManifest): Result = {
    val byName = manifest.entities.map(e => e.name -> e).toMap
    val skipped = scala.collection.mutable.ArrayBuffer[Skipped]()

    val entities = manifest.entities.map { e =>
      val eid = entityId(e.name)
      val flat = flattenAttributes(e, byName)
      // P7: drop entity-reference attributes (become relationships)
      val (refs, scalars) = flat.partition(a =>
        CdmTypeMapper.isEntityReference(a.dataType))
      refs.foreach(a => skipped += Skipped("attribute", a.name,
        "entity reference modeled as relationship", e.name))
      val props = scalars.map { a =>
        Prop(Ids.propertyId(eid, a.name), Names.sanitizeName(a.name),
          CdmTypeMapper.fabricType(a) match {
            case "Decimal" => "Double" // Fabric core types; Decimal only in CDM path
            case t => t
          })
      }
      // K6: trait-driven key/display, falling back to K4-style inference
      val pk = scalars.zip(props).collectFirst {
        case (a, p) if a.isPrimaryKey => p.id }
      val display = scalars.zip(props).collectFirst {
        case (a, p) if a.isDisplayName => p.id }
      val validKey = props.find(p => Set("String", "BigInt")(p.valueType))
      EntityType(
        id = eid, name = Names.sanitizeName(e.name), uri = "cdm:" + e.name,
        baseEntityTypeId = e.extendsEntity.filter(byName.contains).map(entityId),
        entityIdParts = pk.orElse(validKey.map(_.id)).toSeq,
        displayNamePropertyId =
          display.orElse(pk).orElse(validKey.map(_.id)),
        properties = props)
    }

    // J5: FK quads → relationships; unknown endpoints get placeholder ids
    // (deterministic hash of the name — a stable forward reference)
    val rels = manifest.relationships.map { r =>
      Rel(
        id = Ids.propertyId(entityId(r.fromEntityName), "rel_" + r.relationshipName),
        name = Names.sanitizeName(r.relationshipName),
        uri = s"cdm:rel:${r.fromEntityName}:${r.toEntityName}",
        srcEntityTypeId = entityId(r.fromEntityName),
        dstEntityTypeId = entityId(r.toEntityName),
        srcUri = "cdm:" + r.fromEntityName,
        dstUri = "cdm:" + r.toEntityName)
    }

    Result(entities, rels, skipped.toSeq)
  }
}
