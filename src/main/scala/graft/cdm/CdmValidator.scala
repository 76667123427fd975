package graft.cdm

import scala.collection.mutable

/** V-CDM — manifest validation for Fabric compatibility (reference:
  * `src/formats/cdm/cdm_validator.py:72-548`), round-2 priority #3.
  *
  * Check families mirrored 1:1 (reference line refs):
  *  - empty manifest name → warning; unknown schema version → info;
  *    no entities → warning (194-239)
  *  - entity: missing name error (early return), duplicate name error,
  *    Fabric name rules, self-inheritance error + extends info,
  *    attribute-less info, missing-primary-key info (241-302)
  *  - attribute: missing name error, duplicate name error, name rules,
  *    data-type support (entity-ref info / unknown-type warning /
  *    missing-type warning), maximumLength bounds (304-406)
  *  - relationship: missing from/to errors, unresolved endpoint infos,
  *    name rules (408-461)
  *  - name rules: length ≤100 error, first char letter/underscore
  *    warning, spaces warning, reserved-name info (496-548)
  *
  * Pure function over the schema-scale manifest — at corpus scale it runs
  * per model folder inside mapGroups, next to the parser.
  */
object CdmValidator {

  final case class CdmIssue(
      severity: String, // error | warning | info
      category: String,
      message: String,
      location: Option[String] = None)

  val FabricMaxNameLength = 100

  /** `cdm_validator.py:60-63`. */
  val ReservedNames: Set[String] = Set(
    "id", "type", "namespace", "version", "created", "modified",
    "entity", "relationship", "property", "system", "internal")

  /** `cdm_validator.py:66`. */
  val SupportedCdmVersions: Set[String] =
    Set("1.0.0", "1.1.0", "1.2.0", "1.3.0", "1.4.0", "1.5.0")

  def validate(manifest: CdmManifest): Seq[CdmIssue] = {
    val out = mutable.ArrayBuffer[CdmIssue]()
    def add(severity: String, category: String, message: String,
            location: Option[String] = None): Unit =
      out += CdmIssue(severity, category, message, location)

    def validateName(name: String, itemType: String, location: String): Unit = {
      if (name.length > FabricMaxNameLength)
        add("error", "name_too_long",
          s"$itemType name exceeds maximum length (${name.length} > $FabricMaxNameLength)",
          Some(location))
      if (!name.charAt(0).isLetter && name.charAt(0) != '_')
        add("warning", "invalid_character",
          s"$itemType name '$name' should start with letter or underscore",
          Some(location))
      if (name.contains(' '))
        add("warning", "invalid_character",
          s"$itemType name '$name' contains spaces", Some(location))
      if (ReservedNames.contains(name.toLowerCase))
        add("info", "name_conflict",
          s"$itemType name '$name' may conflict with reserved names",
          Some(location))
    }

    if (manifest.name.isEmpty)
      add("warning", "missing_required", "Manifest name is empty")
    if (manifest.schemaVersion.nonEmpty &&
        !SupportedCdmVersions.contains(manifest.schemaVersion))
      add("info", "unsupported_construct",
        s"Unknown CDM schema version: ${manifest.schemaVersion}")

    val entityNames = mutable.Set[String]()
    for (entity <- manifest.entities) {
      val location = s"Entity: ${entity.name}"
      if (entity.name.isEmpty) {
        add("error", "missing_required",
          "Entity missing required 'name' field", Some(location))
      } else {
        if (entityNames.contains(entity.name))
          add("error", "name_conflict",
            s"Duplicate entity name: '${entity.name}'", Some(location))
        entityNames += entity.name
        validateName(entity.name, "Entity", location)

        entity.extendsEntity.foreach { base =>
          if (base == entity.name)
            add("error", "circular_reference",
              s"Entity '${entity.name}' cannot extend itself", Some(location))
          else
            add("info", "external_dependency",
              s"Entity '${entity.name}' extends '$base'", Some(location))
        }

        val attrNames = mutable.Set[String]()
        for (attr <- entity.attributes) {
          val aloc = s"Entity: ${entity.name}, Attribute: ${attr.name}"
          if (attr.name.isEmpty) {
            add("error", "missing_required",
              "Attribute missing required 'name' field", Some(location))
          } else {
            if (attrNames.contains(attr.name))
              add("error", "name_conflict",
                s"Duplicate attribute name: '${attr.name}'", Some(aloc))
            attrNames += attr.name
            validateName(attr.name, "Attribute", aloc)

            attr.dataType match {
              case None | Some("") =>
                add("warning", "missing_required",
                  "Attribute missing data type, will default to String",
                  Some(aloc))
              case Some(dt) if !CdmTypeMapper.isSupportedType(dt) =>
                // validator's entity-ref set (cdm_validator.py:392):
                // lowercase {entity, entityid, entityreference}
                if (Set("entity", "entityid", "entityreference")(dt.toLowerCase))
                  add("info", "conversion_limitation",
                    s"Entity reference type '$dt' will be converted to String",
                    Some(aloc))
                else
                  add("warning", "unsupported_construct",
                    s"Unknown data type '$dt' will default to String",
                    Some(aloc))
              case _ => ()
            }

            attr.maximumLength.foreach { ml =>
              if (ml <= 0)
                add("warning", "constraint_violation",
                  s"Invalid maximum length: $ml", Some(aloc))
              else if (ml > 1073741824L)
                add("warning", "constraint_violation",
                  s"Very large maximum length: $ml", Some(aloc))
            }
          }
        }

        if (entity.attributes.isEmpty)
          add("info", "missing_required",
            s"Entity '${entity.name}' has no attributes", Some(location))
        if (entity.attributes.nonEmpty && !entity.attributes.exists(_.isPrimaryKey))
          add("info", "missing_required",
            s"Entity '${entity.name}' has no primary key attribute",
            Some(location))
      }
    }

    for (rel <- manifest.relationships) {
      val location = s"Relationship: ${rel.relationshipName}"
      if (rel.fromEntity.isEmpty)
        add("error", "missing_required",
          "Relationship missing 'fromEntity'", Some(location))
      if (rel.toEntity.isEmpty)
        add("error", "missing_required",
          "Relationship missing 'toEntity'", Some(location))
      // endpoint resolution (cdm_validator.py:436-456): entity-set check
      // against the short name (path tail)
      val fromName = rel.fromEntityName
      val toName = rel.toEntityName
      if (fromName.nonEmpty && !entityNames.contains(fromName))
        add("info", "invalid_reference",
          s"Relationship references unknown source entity: '$fromName'",
          Some(location))
      if (toName.nonEmpty && !entityNames.contains(toName))
        add("info", "invalid_reference",
          s"Relationship references unknown target entity: '$toName'",
          Some(location))
      val rn = rel.relationshipName
      if (rn.nonEmpty) validateName(rn, "Relationship", location)
    }

    if (manifest.entities.isEmpty)
      add("warning", "missing_required", "Manifest contains no entities")

    out.toSeq
  }

  def isValid(issues: Seq[CdmIssue]): Boolean =
    !issues.exists(_.severity == "error")
}

/** S5 completion — recursive CDM folder loading (reference:
  * `cdm_parser.py:287-303` subManifests + `634-720` entity-reference
  * resolution): a root `*.manifest.cdm.json` is parsed, its referenced
  * entity files loaded relative to the folder, and each subManifest
  * recursed with a visited-set cycle guard; results merge with the D3
  * union semantics (entities ++, relationships ++).
  */
object CdmFolder {
  import java.nio.file.{Files, Path, Paths}

  def parse(manifestPath: String): CdmManifest =
    parseRec(Paths.get(manifestPath).toAbsolutePath.normalize(), Set.empty)._1

  /** Returns the merged manifest AND the visited set grown by this whole
    * subtree — threading it through the sibling fold means a manifest
    * reachable via two siblings (diamond) is parsed exactly once, so its
    * entities are not duplicated into the union (which would then trip
    * spurious duplicate-name errors in [[CdmValidator]]).
    */
  private def parseRec(path: Path, visited: Set[Path]): (CdmManifest, Set[Path]) = {
    if (visited(path) || !Files.exists(path))
      return (CdmManifest(Nil, Nil), visited)
    val seen = visited + path
    val base = path.getParent
    val m = CdmParser.parse(Files.readString(path))

    // resolve reference-only entity declarations against the folder:
    // corpus path "Folder/Entity.cdm.json/EntityName" → file + pick
    val entities = m.entities.map { e =>
      if (e.attributes.nonEmpty) e
      else e.sourcePath.flatMap(p => loadEntity(base, p, e.name)).getOrElse(e)
    }

    val (subs, seenAfter) =
      m.subManifests.foldLeft((Vector.empty[CdmManifest], seen)) {
        case ((acc, vis), sp) =>
          val (sub, vis2) = parseRec(base.resolve(sp).normalize(), vis)
          (acc :+ sub, vis2)
      }
    (CdmManifest(
      entities ++ subs.flatMap(_.entities),
      m.relationships ++ subs.flatMap(_.relationships),
      m.name, m.schemaVersion, Nil), seenAfter)
  }

  /** `cdm_parser.py:688-720`: split the corpus path at the `.cdm.json`
    * segment, load that file, select the named entity (or all).
    */
  private def loadEntity(base: Path, corpusPath: String,
                         name: String): Option[CdmEntity] = {
    val parts = corpusPath.split("/").toSeq
    val fileIdx = parts.indexWhere(_.endsWith(".cdm.json"))
    if (fileIdx < 0) return None
    val file = base.resolve(parts.take(fileIdx + 1).mkString("/")).normalize()
    if (!Files.exists(file)) return None
    val parsed = CdmParser.parse(Files.readString(file))
    parsed.entities.find(_.name == name).orElse(parsed.entities.headOption)
  }
}
