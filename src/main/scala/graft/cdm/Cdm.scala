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
    displayName: Option[String],
    maximumLength: Option[Long] = None) {

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
    attributes: Seq[CdmAttribute],
    sourcePath: Option[String] = None) // corpus path of a referenced entity

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
                             relationships: Seq[CdmRelationship],
                             name: String = "unknown",
                             schemaVersion: String = "1.0.0",
                             subManifests: Seq[String] = Nil)

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
      Option(a.get("displayName")).map(_.asText),
      Option(a.get("maximumLength")).map(_.asLong)))
  }

  private def parseEntityNode(e: JsonNode): Option[CdmEntity] = {
    // manifest entity *declarations* may be reference-only: a corpus-path
    // string or {type: LocalEntity, entityPath, entityName}
    // (`cdm_parser.py:634-686`) — produce a placeholder carrying the path
    // for [[CdmFolder]] to resolve against the folder
    if (e.isTextual) {
      val path = e.asText
      val name = path.split("/").last
      return Some(CdmEntity(name, None, Nil, Some(path)))
    }
    val entityPath = Option(e.get("entityPath"))
      .orElse(Option(e.get("entityDeclaration"))).map(_.asText)
    val name = Option(e.get("entityName")).orElse(Option(e.get("name")))
      .map(_.asText)
      .orElse(entityPath.map(_.split("/").last))
      .getOrElse(return None)
    val ext = Option(e.get("extendsEntity")).map(x =>
      if (x.isTextual) x.asText
      else Option(x.get("entityReference")).map(_.asText).getOrElse(""))
      .filter(_.nonEmpty)
    val attrs = strings(e, "hasAttributes").flatMap(parseAttribute) ++
      strings(e, "attributes").flatMap(parseAttribute)
    Some(CdmEntity(name, ext, attrs, entityPath))
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
    strings(root, "relationships").flatMap(parseRelationship),
    name = Option(root.get("manifestName")).orElse(Option(root.get("folderName")))
      .map(_.asText).getOrElse("unknown"),
    schemaVersion = Option(root.get("jsonSchemaSemanticVersion"))
      .map(_.asText).getOrElse("1.0.0"),
    subManifests = strings(root, "subManifests").map { sub =>
      if (sub.isTextual) sub.asText
      else Option(sub.get("manifestPath"))
        .orElse(Option(sub.get("definition"))).map(_.asText).getOrElse("")
    }.filter(_.nonEmpty))

  def parseEntitySchema(root: JsonNode): CdmManifest = CdmManifest(
    strings(root, "definitions").flatMap(parseEntityNode), Nil)

  def parseModelJson(root: JsonNode): CdmManifest = CdmManifest(
    strings(root, "entities").flatMap(parseEntityNode),
    // attributeReference-style inline FKs (`cdm_parser.py:327-341`)
    strings(root, "entities").flatMap { e =>
      val en = Option(e.get("name")).map(_.asText).getOrElse("")
      strings(e, "attributes").flatMap { a =>
        Option(a.get("attributeReference")).filter(_.isObject).map { ref =>
          CdmRelationship(en,
            Option(a.get("name")).map(_.asText).getOrElse(""),
            Option(ref.get("entityName")).map(_.asText).getOrElse(""),
            Option(ref.get("attributeName")).map(_.asText).getOrElse(""),
            None, None)
        }
      }
    } ++ strings(root, "relationships").flatMap { r =>
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
    },
    name = Option(root.get("name")).map(_.asText).getOrElse("model"),
    schemaVersion = Option(root.get("version")).map(_.asText).getOrElse("1.0"))
}

object CdmTypeMapper {
  /** Primitive table — every entry of `cdm_type_mapper.py:50-105`. */
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

  /** Semantic table — every entry of `cdm_type_mapper.py:112-210`
    * (round-1 shipped a 21-entry slice; this is the full ~97-entry set,
    * golden-tested entry-by-entry in CdmSpec).
    */
  val semantics: Map[String, String] = Map(
    // identity
    "name" -> "String", "fullName" -> "String", "firstName" -> "String",
    "lastName" -> "String", "middleName" -> "String",
    // contact
    "email" -> "String", "phone" -> "String", "phoneNumber" -> "String",
    "fax" -> "String",
    // internet
    "url" -> "String", "uri" -> "String", "webAddress" -> "String",
    "ipAddress" -> "String", "ipV4Address" -> "String",
    "ipV6Address" -> "String",
    // address
    "address" -> "String", "city" -> "String", "stateOrProvince" -> "String",
    "country" -> "String", "postalCode" -> "String", "county" -> "String",
    "latitude" -> "Double", "longitude" -> "Double",
    // localization
    "languageTag" -> "String", "locale" -> "String", "cultureTag" -> "String",
    "timezone" -> "String",
    // date components
    "year" -> "BigInt", "month" -> "BigInt", "day" -> "BigInt",
    "week" -> "BigInt", "quarter" -> "BigInt", "fiscalYear" -> "BigInt",
    "fiscalMonth" -> "BigInt", "fiscalQuarter" -> "BigInt",
    // measurements
    "age" -> "BigInt", "duration" -> "BigInt", "distance" -> "Double",
    "weight" -> "Double", "height" -> "Double", "area" -> "Double",
    "volume" -> "Double", "temperature" -> "Double",
    "percentage" -> "Double", "probability" -> "Double",
    // financial
    "currency" -> "Decimal", "currencyCode" -> "String",
    "baseCurrency" -> "Decimal", "exchangeRate" -> "Decimal",
    "amount" -> "Decimal", "price" -> "Decimal", "tax" -> "Decimal",
    "discount" -> "Decimal",
    // counts
    "count" -> "BigInt", "quantity" -> "BigInt", "sequence" -> "BigInt",
    "ordinal" -> "BigInt",
    // status
    "statusCode" -> "BigInt", "stateCode" -> "BigInt",
    "versionNumber" -> "BigInt",
    // color
    "colorName" -> "String", "colorValue" -> "String",
    // file
    "fileName" -> "String", "filePath" -> "String", "mimeType" -> "String",
    "fileSize" -> "BigInt",
    // codes
    "code" -> "String", "tickerSymbol" -> "String", "accountCode" -> "String",
    "productCode" -> "String", "transactionCode" -> "String",
    "referenceCode" -> "String")

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

  // the reference matches types case-INSENSITIVELY (`map_type` lowers
  // both sides, cdm_type_mapper.py:329-346)
  private val primitivesLower = primitives.map { case (k, v) => k.toLowerCase -> v }
  private val semanticsLower = semantics.map { case (k, v) => k.toLowerCase -> v }

  /** P7 skip set as the CONVERTER applies it (`cdm_converter.py:296`):
    * lowercase {entity, entityreference}. (The type mapper's
    * CDM_ENTITY_REFERENCE_TYPES nominally adds entityId/entityName, but
    * its mixed-case set never matches the lowered input — dead entries we
    * don't replicate.)
    */
  val entityReferenceTypes: Set[String] = Set("entity", "entityreference")

  def isEntityReference(dataType: Option[String]): Boolean =
    dataType.exists(d => entityReferenceTypes.contains(d.toLowerCase))

  def isSupportedType(dataType: String): Boolean = {
    val d = dataType.toLowerCase
    primitivesLower.contains(d) || semanticsLower.contains(d)
  }

  /** `map_type` order: primitives, semantics (both case-insensitive),
    * then first matching trait, then String default.
    */
  def fabricType(attr: CdmAttribute): String =
    attr.dataType.map(_.toLowerCase)
      .flatMap(d => primitivesLower.get(d).orElse(semanticsLower.get(d)))
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
      // Decimal is a first-class FabricValueType in the CDM path
      // (cdm_type_mapper.py:31-43) — no Double collapse
      val props = scalars.map { a =>
        Prop(Ids.propertyId(eid, a.name), Names.sanitizeName(a.name),
          CdmTypeMapper.fabricType(a))
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
