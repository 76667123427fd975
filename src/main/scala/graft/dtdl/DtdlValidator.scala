package graft.dtdl

import scala.collection.mutable

/** V-DTDL — structural validation of parsed DTDL interfaces (reference:
  * `src/formats/dtdl/dtdl_validator.py:120-619`), round-2 priority #1.
  *
  * Check families, mirrored 1:1 (reference line refs):
  *  - empty input / >500 interfaces warnings (195-207)
  *  - duplicate DTMI (212-218)
  *  - DTMI shape: empty, length ≤128 interface / ≤2048 other, format
  *    regex, reserved `dtmi:dtdl:`/`dtmi:standard:` prefixes (311-348)
  *  - unsupported DTDL context version (253-260)
  *  - extends: parent DTMI shape, self-extension, unresolved parent
  *    (262-279)
  *  - contents: duplicate names, NAME_PATTERN, name length ≤512,
  *    content-level @id shape (358-394)
  *  - Property/Telemetry/Command schemas: unknown primitive warning
  *    (397-401, 447-462, 464-483)
  *  - Relationship: target DTMI, maxMultiplicity ≥1, duplicate nested
  *    property names (403-434)
  *  - Component: schema DTMI, unresolved schema (436-445)
  *  - reusable `schemas` entries must carry @id (485-502)
  *  - inheritance graph: cycle detection + extends depth ≤12 DFS (504-555)
  *  - orphaned relationship targets / missing component schemas when
  *    external references are disallowed (557-619)
  *
  * Note: the reference declares MAX_EXTENDS_HIERARCHY=1024,
  * MAX_CONTENTS_COUNT=100000 and MAX_COMPLEX_SCHEMA_DEPTH=8 but never
  * enforces them (constants are unused outside their definition); we
  * deliberately match the enforced behavior, not the dead constants.
  *
  * Pure `Seq[DtdlInterface] => Seq[DtdlIssue]` over a schema-scale model
  * set, so at corpus scale it runs per model-folder inside mapGroups —
  * the same executor-side placement as the parser.
  */
object DtdlValidator {

  final case class DtdlIssue(
      level: String, // error | warning | info
      category: String, // stable machine key per check family
      message: String,
      dtmi: Option[String] = None,
      field: Option[String] = None)

  val MaxInterfaceDtmiLength = 128
  val MaxDtmiLength = 2048
  val MaxNameLength = 512
  val MaxDescriptionLength = 512
  val MaxExtendsDepth = 12

  /** `dtdl_validator.py:151` NAME_PATTERN. */
  private val NamePattern = "^[A-Za-z][A-Za-z0-9_]*[A-Za-z0-9]?$".r

  /** `dtdl_models.py:20-49` DTDLPrimitiveSchema values. */
  val PrimitiveSchemas: Set[String] = Set(
    "boolean", "byte", "bytes", "date", "dateTime", "decimal", "double",
    "duration", "float", "integer", "long", "short", "string", "time",
    "unsignedByte", "unsignedInteger", "unsignedLong", "unsignedShort",
    "uuid", "point", "lineString", "polygon", "multiPoint",
    "multiLineString", "multiPolygon", "scaledDecimal")

  def validate(interfaces: Seq[DtdlInterface],
               allowExternalReferences: Boolean = true,
               strictMode: Boolean = false): Seq[DtdlIssue] = {
    val out = mutable.ArrayBuffer[DtdlIssue]()
    def add(level: String, category: String, message: String,
            dtmi: Option[String] = None, field: Option[String] = None): Unit =
      out += DtdlIssue(level, category, message, dtmi, field)

    if (interfaces.isEmpty) {
      add("warning", "empty_input", "No interfaces provided for validation")
      return finish(out.toSeq, strictMode)
    }
    if (interfaces.size > 500)
      add("warning", "large_ontology",
        s"Large ontology with ${interfaces.size} interfaces may take longer to process")

    // duplicate DTMIs (dtdl_validator.py:210-218): last one wins the lookup
    val byDtmi = mutable.Map[String, DtdlInterface]()
    for (i <- interfaces) {
      if (byDtmi.contains(i.dtmi))
        add("error", "duplicate_dtmi", s"Duplicate DTMI: ${i.dtmi}", Some(i.dtmi))
      byDtmi(i.dtmi) = i
    }

    def validateDtmi(dtmi: String, isInterface: Boolean = false): Unit = {
      if (dtmi == null || dtmi.isEmpty) {
        add("error", "dtmi_empty", "DTMI is empty or None")
        return
      }
      val maxLen = if (isInterface) MaxInterfaceDtmiLength else MaxDtmiLength
      if (dtmi.length > maxLen)
        add("error", "dtmi_too_long",
          s"DTMI exceeds maximum length (${dtmi.length} > $maxLen)", Some(dtmi))
      if (!DtdlInterface.DtmiRegex.matches(dtmi))
        add("error", "dtmi_format", s"Invalid DTMI format: $dtmi", Some(dtmi))
      if (dtmi.startsWith("dtmi:dtdl:") || dtmi.startsWith("dtmi:standard:"))
        add("warning", "dtmi_reserved_prefix",
          s"DTMI uses reserved prefix: $dtmi", Some(dtmi))
    }

    def validateSchema(schema: Option[DtdlSchema], dtmi: String,
                       field: String): Unit = schema match {
      case Some(DtdlSchema.Prim(p))
          if !PrimitiveSchemas.contains(p) && !p.startsWith("dtmi:") =>
        add("warning", "unknown_schema", s"Unknown schema type: $p",
          Some(dtmi), Some(field))
      case _ => () // complex schema objects and ScaledDecimal: no extra checks
    }

    for (iface <- interfaces) {
      validateDtmi(iface.dtmi, isInterface = true)

      if (!Seq(2, 3, 4).contains(iface.contextVersion))
        add("error", "unsupported_version",
          s"Unsupported DTDL version: ${iface.contextVersion}",
          Some(iface.dtmi), Some("@context"))

      for (parent <- iface.extendsList) {
        validateDtmi(parent)
        if (parent == iface.dtmi)
          add("error", "self_extends", "Interface cannot extend itself",
            Some(iface.dtmi), Some("extends"))
        else if (!byDtmi.contains(parent))
          add(if (allowExternalReferences) "warning" else "error",
            "parent_not_found",
            s"Referenced parent interface not found: $parent",
            Some(iface.dtmi), Some("extends"))
      }

      val usedNames = mutable.Set[String]()
      for (c <- iface.contents) {
        if (c.name.nonEmpty) {
          if (usedNames.contains(c.name))
            add("error", "duplicate_content_name",
              s"Duplicate content name: ${c.name}", Some(iface.dtmi),
              Some("contents"))
          usedNames += c.name
          if (!NamePattern.matches(c.name))
            add("error", "content_name_format",
              s"Invalid content name format: ${c.name}", Some(iface.dtmi),
              Some(s"contents[${c.name}]"))
          if (c.name.length > MaxNameLength)
            add("error", "content_name_too_long",
              s"Content name exceeds $MaxNameLength characters: ${c.name}",
              Some(iface.dtmi), Some(s"contents[${c.name}]"))
        }
        c.dtmi.foreach(d => validateDtmi(d))

        c.kind match {
          case "Property" =>
            validateSchema(c.schema, iface.dtmi, s"Property[${c.name}].schema")
          case "Telemetry" =>
            validateSchema(c.schema, iface.dtmi, s"Telemetry[${c.name}].schema")
          case "Relationship" =>
            c.target.foreach { t =>
              validateDtmi(t)
              if (!allowExternalReferences && !byDtmi.contains(t))
                add("warning", "rel_target_not_found",
                  s"Relationship target not found: $t", Some(iface.dtmi),
                  Some(s"Relationship[${c.name}].target"))
            }
            if (c.maxMultiplicity.exists(_ < 1))
              add("error", "max_multiplicity",
                "maxMultiplicity must be >= 1", Some(iface.dtmi),
                Some(s"Relationship[${c.name}].maxMultiplicity"))
            val relPropNames = mutable.Set[String]()
            for (pn <- c.relProps) {
              if (relPropNames.contains(pn))
                add("error", "duplicate_rel_property",
                  s"Duplicate property name in relationship: $pn",
                  Some(iface.dtmi), Some(s"Relationship[${c.name}].properties"))
              relPropNames += pn
            }
          case "Component" =>
            c.componentSchema.foreach { s =>
              validateDtmi(s)
              if (!allowExternalReferences && !byDtmi.contains(s))
                add("error", "component_schema_not_found",
                  s"Component schema not found: $s", Some(iface.dtmi),
                  Some(s"Component[${c.name}].schema"))
            }
          case "Command" =>
            if (c.requestSchema.isDefined)
              validateSchema(c.requestSchema, iface.dtmi,
                s"Command[${c.name}].request.schema")
            if (c.responseSchema.isDefined)
              validateSchema(c.responseSchema, iface.dtmi,
                s"Command[${c.name}].response.schema")
          case _ => ()
        }
      }

      for (sid <- iface.schemaDefIds) sid match {
        case None =>
          add("error", "schema_missing_id",
            "Schema in Interface.schemas must have @id", Some(iface.dtmi),
            Some("schemas"))
        case Some(d) => validateDtmi(d)
      }

      iface.displayName.foreach { dn =>
        if (dn.length > MaxNameLength)
          add("error", "display_name_too_long",
            s"displayName exceeds $MaxNameLength characters",
            Some(iface.dtmi), Some("displayName"))
      }
      iface.description.foreach { d =>
        if (d.length > MaxDescriptionLength)
          add("warning", "description_too_long",
            s"description exceeds $MaxDescriptionLength characters",
            Some(iface.dtmi), Some("description"))
      }
    }

    // inheritance graph: cycles + depth, one DFS per interface
    // (dtdl_validator.py:504-555) — first violation per root wins, exactly
    // like the reference's short-circuiting check_cycle
    for (iface <- interfaces) {
      val visited = mutable.Set[String]()
      val path = mutable.ArrayBuffer[String]()
      def checkCycle(dtmi: String, depth: Int): Boolean = {
        if (path.contains(dtmi)) {
          val cycle = path.drop(path.indexOf(dtmi)) :+ dtmi
          add("error", "inheritance_cycle",
            s"Inheritance cycle detected: ${cycle.mkString(" -> ")}",
            Some(iface.dtmi), Some("extends"))
          return true
        }
        if (depth > MaxExtendsDepth) {
          add("error", "extends_depth",
            s"Inheritance depth exceeds maximum ($MaxExtendsDepth)",
            Some(iface.dtmi), Some("extends"))
          return true
        }
        if (visited.contains(dtmi)) return false
        visited += dtmi
        path += dtmi
        for (parent <- byDtmi.get(dtmi).map(_.extendsList).getOrElse(Nil))
          if (checkCycle(parent, depth + 1)) return true
        path.remove(path.length - 1)
        false
      }
      checkCycle(iface.dtmi, 0)
    }

    // orphaned relationship targets (557-586) and missing component
    // schemas (588-619): aggregated warnings, gated on !allowExternal
    if (!allowExternalReferences) {
      val externalTargets = mutable.LinkedHashMap[String, mutable.ArrayBuffer[String]]()
      for (i <- interfaces; r <- i.relationships; t <- r.target
           if !byDtmi.contains(t))
        externalTargets.getOrElseUpdate(t, mutable.ArrayBuffer()) += i.dtmi
      for ((target, sources) <- externalTargets) {
        val more = if (sources.size > 3) s" and ${sources.size - 3} more" else ""
        add("warning", "orphaned_rel_target",
          s"Relationship target '$target' not found in ontology. " +
            s"Referenced by: ${sources.take(3).mkString(", ")}$more",
          Some(target))
      }
      val missingSchemas = mutable.LinkedHashMap[String, mutable.ArrayBuffer[String]]()
      for (i <- interfaces; comp <- i.components; s <- comp.componentSchema
           if !byDtmi.contains(s))
        missingSchemas.getOrElseUpdate(s, mutable.ArrayBuffer()) +=
          s"${i.nameFromDtmi}.${comp.name}"
      for ((schema, comps) <- missingSchemas) {
        val more = if (comps.size > 3) s" and ${comps.size - 3} more" else ""
        add("warning", "missing_component_schema",
          s"Component schema '$schema' not found in ontology. " +
            s"Used by: ${comps.take(3).mkString(", ")}$more",
          Some(schema))
      }
    }

    finish(out.toSeq, strictMode)
  }

  /** strict mode promotes every warning to error (dtdl_validator.py:233-238). */
  private def finish(issues: Seq[DtdlIssue], strict: Boolean): Seq[DtdlIssue] =
    if (!strict) issues
    else issues.map(i => if (i.level == "warning") i.copy(level = "error") else i)

  def isValid(issues: Seq[DtdlIssue]): Boolean = !issues.exists(_.level == "error")
}
