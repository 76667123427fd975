package graft.dtdl

import graft.model.{EntityType, Prop, Rel, Skipped}
import graft.ontology.{Ids, Names}

/** DTDL → entity/relationship conversion (reference:
  * `src/formats/dtdl/dtdl_converter.py:308-1247`). The interface graph is
  * schema-scale (Fabric caps at 500 entity types), so conversion is a
  * pure function of the parsed interface set — deterministic, testable,
  * and broadcastable; the surrounding Spark job parses files in
  * mapPartitions (S3) and applies this per ontology document.
  *
  * Parity notes:
  *  - ids are the reference's deterministic hash scheme (K2);
  *  - J8 ancestor property conflicts rename to `name_{type}` exactly
  *    (`dtdl_converter.py:232-306`); the global sibling registry is
  *    processed in sorted-dtmi order (the reference's order is file-list
  *    order — nondeterministic across runs; documented divergence per
  *    SURVEY §7.1);
  *  - component modes FLATTEN/SEPARATE/SKIP (G6, `744-832`, `1007-1042`),
  *    command modes SKIP/PROPERTY/ENTITY (`834-929`), scaledDecimal modes
  *    JSON_STRING/STRUCTURED/CALCULATED (G7, `114-160`, `597-612`);
  *  - K5 display-name fallback: first String property (`571-573`);
  *  - K4 entityIdParts auto inference (`fabric_limits.py:407-560`).
  */
object DtdlConverter {

  object ComponentMode extends Enumeration { val Flatten, Separate, Skip = Value }
  object CommandMode extends Enumeration { val Skip, Property, Entity = Value }
  object ScaledDecimalMode extends Enumeration { val JsonString, Structured, Calculated = Value }

  /** `dtdl_converter.py:65-97` (~27 entries). */
  val dtdlToFabric: Map[String, String] = Map(
    "boolean" -> "Boolean",
    "byte" -> "BigInt", "short" -> "BigInt", "integer" -> "BigInt",
    "long" -> "BigInt", "unsignedByte" -> "BigInt", "unsignedShort" -> "BigInt",
    "unsignedInteger" -> "BigInt", "unsignedLong" -> "BigInt",
    "float" -> "Double", "double" -> "Double", "decimal" -> "Double",
    "string" -> "String", "uuid" -> "String", "bytes" -> "String",
    "date" -> "DateTime", "dateTime" -> "DateTime",
    "time" -> "String", "duration" -> "String",
    "point" -> "String", "lineString" -> "String", "polygon" -> "String",
    "multiPoint" -> "String", "multiLineString" -> "String",
    "multiPolygon" -> "String",
    "scaledDecimal" -> "String")

  final case class Result(entities: Seq[EntityType], rels: Seq[Rel],
                          skipped: Seq[Skipped])

  /** Entity id from DTMI (K2, `dtdl_converter.py:502-511`). */
  def fabricId(dtmi: String): String =
    Ids.entityId(dtmi.replace("dtmi:", "").split(";")(0))

  def sanitize(name: String): String = Names.sanitizeNameDtdl(name)

  def schemaToFabricType(schema: Option[DtdlSchema],
                         sdMode: ScaledDecimalMode.Value): String = {
    import DtdlSchema._
    schema match {
      case Some(Prim("scaledDecimal")) if sdMode == ScaledDecimalMode.Calculated => "Double"
      case Some(Prim(p)) => dtdlToFabric.getOrElse(p, "String")
      case Some(Enum(vs, _)) => dtdlToFabric.getOrElse(vs, "String")
      case Some(_: Obj) | Some(_: Arr) | Some(_: MapS) => "String"
      case Some(_: ScaledDecimal) =>
        if (sdMode == ScaledDecimalMode.Calculated) "Double" else "String"
      case None => "String"
    }
  }

  /** G7 CALCULATED arithmetic: `value * 10^scale`, NaN on failure
    * (`dtdl_converter.py:136-151`).
    */
  def scaledDecimalValue(scale: Int, value: String): Double =
    try value.toDouble * math.pow(10, scale)
    catch { case _: NumberFormatException => Double.NaN }

  private def isScaledDecimal(s: Option[DtdlSchema]): Boolean = s match {
    case Some(DtdlSchema.Prim("scaledDecimal")) => true
    case Some(_: DtdlSchema.ScaledDecimal) => true
    case _ => false
  }

  def convert(interfaces: Seq[DtdlInterface],
              componentMode: ComponentMode.Value = ComponentMode.Separate,
              commandMode: CommandMode.Value = CommandMode.Entity,
              sdMode: ScaledDecimalMode.Value = ScaledDecimalMode.JsonString,
              idParts: graft.shape.EntityIdParts.Inferrer =
                graft.shape.EntityIdParts.Inferrer())
    : Result = {

    val byDtmi = interfaces.map(i => i.dtmi -> i).toMap

    // J8: ancestor property name → fabric type, recursively up `extends`
    def ancestorProps(i: DtdlInterface,
                      seen: Set[String] = Set.empty): Map[String, String] = {
      i.extendsList.foldLeft(Map.empty[String, String]) { (acc, parentDtmi) =>
        if (seen(parentDtmi)) acc
        else byDtmi.get(parentDtmi) match {
          case Some(parent) =>
            val direct = parent.properties.map(p =>
              p.name -> schemaToFabricType(p.schema, sdMode)).toMap
            acc ++ direct ++ ancestorProps(parent, seen + parentDtmi)
          case None => acc
        }
      }
    }

    // global sibling registry, deterministic order (sorted dtmi)
    val registry = scala.collection.mutable.Map[String, String]()

    def resolveName(propName: String, fabricType: String,
                    iface: DtdlInterface): String = {
      val anc = ancestorProps(iface)
      anc.get(propName) match {
        case Some(t) if t != fabricType => s"${propName}_${fabricType.toLowerCase}"
        case _ =>
          registry.get(propName) match {
            case Some(t) if t != fabricType => s"${propName}_${fabricType.toLowerCase}"
            case Some(_) => propName
            case None => registry(propName) = fabricType; propName
          }
      }
    }

    val entities = scala.collection.mutable.ArrayBuffer[EntityType]()
    val rels = scala.collection.mutable.ArrayBuffer[Rel]()
    val skipped = scala.collection.mutable.ArrayBuffer[Skipped]()

    for (iface <- interfaces.sortBy(_.dtmi)) {
      val eid = fabricId(iface.dtmi)

      // parent: first extends entry, only if locally defined (530-558)
      val baseId = iface.extendsList.headOption
        .filter(byDtmi.contains).map(fabricId)

      var props = Vector.empty[Prop]
      var displayNameId: Option[String] = None
      for (p <- iface.properties) {
        val t = schemaToFabricType(p.schema, sdMode)
        val resolved = resolveName(p.name, t, iface)
        val prop = Prop(Ids.propertyId(eid, resolved), sanitize(resolved), t)
        props :+= prop
        if (displayNameId.isEmpty && t == "String") displayNameId = Some(prop.id)
      }
      val tsProps = iface.telemetries.map { tm =>
        val t = schemaToFabricType(tm.schema, sdMode)
        val resolved = resolveName(tm.name, t, iface)
        Prop(Ids.propertyId(eid, s"ts_$resolved"), sanitize(resolved), t,
          isTimeseries = true)
      }

      // commands as string properties (PROPERTY mode)
      if (commandMode == CommandMode.Property)
        for (cmd <- iface.commands)
          props :+= Prop(Ids.propertyId(eid, s"cmd_${cmd.name}"),
            s"command_${cmd.name}", "String")

      // G6 FLATTEN: component's interface properties prefixed {component}_
      if (componentMode == ComponentMode.Flatten)
        for (comp <- iface.components;
             compIface <- comp.componentSchema.flatMap(byDtmi.get).toSeq;
             p <- compIface.properties) {
          val t = schemaToFabricType(p.schema, sdMode)
          props :+= Prop(Ids.propertyId(eid, s"${comp.name}_${p.name}"),
            sanitize(s"${comp.name}_${p.name}"), t)
        }

      // G7 STRUCTURED: {p}_scale BigInt + {p}_value String (597-612)
      if (sdMode == ScaledDecimalMode.Structured)
        for (p <- iface.properties if isScaledDecimal(p.schema)) {
          props :+= Prop(Ids.propertyId(eid, s"${p.name}_scale"),
            sanitize(s"${p.name}_scale"), "BigInt")
          props :+= Prop(Ids.propertyId(eid, s"${p.name}_value"),
            sanitize(s"${p.name}_value"), "String")
        }

      entities += EntityType(
        id = eid,
        name = sanitize(iface.resolvedDisplayName),
        uri = iface.dtmi,
        baseEntityTypeId = baseId,
        // K4: strategy object covers auto|first_valid|explicit|none
        entityIdParts = idParts.inferFromProps(sanitize(iface.resolvedDisplayName), props),
        displayNamePropertyId = displayNameId,
        properties = props,
        timeseriesProperties = tsProps)

      // J5: relationships — target DTMI → id (placeholder id when target
      // unknown: the hash is computed the same way, so the reference's
      // "create placeholder" becomes a stable forward reference)
      for (rel <- iface.relationships) {
        rel.target match {
          case Some(target) =>
            rels += Rel(
              id = Ids.propertyId(eid, s"rel_${rel.name}"),
              name = sanitize(rel.name), uri = iface.dtmi + "#" + rel.name,
              srcEntityTypeId = eid, dstEntityTypeId = fabricId(target),
              srcUri = iface.dtmi, dstUri = target)
          case None =>
            skipped += Skipped("relationship", rel.name,
              "relationship has no target", iface.dtmi)
        }
      }

      // G6 SEPARATE: component → relationship (+ stub entity if external)
      if (componentMode == ComponentMode.Separate)
        for (comp <- iface.components; schemaDtmi <- comp.componentSchema) {
          val targetId = fabricId(schemaDtmi)
          if (!byDtmi.contains(schemaDtmi)) {
            val stubPropId = Ids.propertyId(targetId, "componentId")
            val schemaName = schemaDtmi.replace("dtmi:", "")
              .split(";")(0).split(":").last
            entities += EntityType(
              id = targetId,
              name = sanitize(s"${comp.name}_$schemaName"),
              uri = schemaDtmi,
              entityIdParts = Seq(stubPropId),
              properties = Seq(Prop(stubPropId, "componentId", "String")))
          }
          rels += Rel(
            id = Ids.propertyId(eid, s"comp_${comp.name}"),
            name = sanitize(s"has_${comp.name}"),
            uri = iface.dtmi + "#" + comp.name,
            srcEntityTypeId = eid, dstEntityTypeId = targetId,
            srcUri = iface.dtmi, dstUri = schemaDtmi)
        }

      // command → Command_{name} entity + supports_{name} rel (834-929)
      if (commandMode == CommandMode.Entity)
        for (cmd <- iface.commands) {
          val cmdDtmi = s"${iface.dtmi}:cmd:${cmd.name}"
          val cmdId = fabricId(cmdDtmi)
          val nameProp = Prop(Ids.propertyId(cmdId, "commandName"),
            "commandName", "String")
          var cmdProps = Vector(nameProp)
          if (cmd.requestSchema.isDefined)
            cmdProps :+= Prop(Ids.propertyId(cmdId, "requestSchema"),
              "requestSchema", "String")
          if (cmd.responseSchema.isDefined)
            cmdProps :+= Prop(Ids.propertyId(cmdId, "responseSchema"),
              "responseSchema", "String")
          entities += EntityType(
            id = cmdId, name = sanitize(s"Command_${cmd.name}"), uri = cmdDtmi,
            entityIdParts = Seq(nameProp.id),
            displayNamePropertyId = Some(nameProp.id),
            properties = cmdProps)
          rels += Rel(
            id = Ids.propertyId(eid, s"cmd_rel_${cmd.name}"),
            name = sanitize(s"supports_${cmd.name}"),
            uri = cmdDtmi, srcEntityTypeId = eid, dstEntityTypeId = cmdId,
            srcUri = iface.dtmi, dstUri = cmdDtmi)
        }
    }

    Result(entities.toSeq, rels.toSeq, skipped.toSeq)
  }

  import org.apache.spark.sql.{DataFrame, SparkSession}

  /** Distributed front end: one DTDL document (file content) per row →
    * parse + convert per partition, union'd entity/rel tables.
    */
  def convertDocuments(spark: SparkSession, docs: DataFrame,
                       contentCol: String = "content")
    : (DataFrame, DataFrame) = {
    import spark.implicits._
    val parsed = docs.select(contentCol).as[String]
      .mapPartitions(_.map(c => DtdlParser.parse(c)))
    val entities = parsed.flatMap(ifaces => convert(ifaces).entities)
    val rels = parsed.flatMap(ifaces => convert(ifaces).rels)
    (entities.toDF(), rels.toDF())
  }
}
