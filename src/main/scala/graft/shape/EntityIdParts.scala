package graft.shape

import graft.model.{EntityType, Prop}

/** K4 — EntityIdPartsInferrer with all four strategies (reference:
  * `src/core/validators/fabric_limits.py:407-560`): `auto`,
  * `first_valid`, `explicit`, `none`. Round-1 shipped only `auto`
  * (inlined in DtdlConverter); this is the full policy object.
  *
  * Semantics mirrored exactly:
  *  - an explicit mapping for the entity name wins REGARDLESS of
  *    strategy (`infer_entity_id_parts`: mapping checked first);
  *  - `none` and unmapped `explicit` yield no parts;
  *  - `first_valid` takes the first String/BigInt property;
  *  - `auto` scans properties in order and picks the first valid-typed
  *    one whose lowercased name equals or contains a primary-key
  *    pattern, falling back to first-valid;
  *  - explicit names resolve case-insensitively to property ids and
  *    unknown names are dropped with a warning (here: silently dropped —
  *    the reference only logs).
  */
object EntityIdParts {

  /** `constants.py` EntityIdPartsConfig defaults. */
  val PrimaryKeyPatterns: Seq[String] =
    Seq("id", "identifier", "pk", "key", "uuid", "guid")
  val ValidTypes: Set[String] = Set("String", "BigInt")

  final case class Inferrer(
      strategy: String = "auto",
      explicitMappings: Map[String, Seq[String]] = Map.empty,
      customPatterns: Seq[String] = Nil) {

    private val patterns = PrimaryKeyPatterns ++ customPatterns
    private val patternsLower = patterns.map(_.toLowerCase)

    def infer(entity: EntityType): Seq[String] =
      inferFromProps(entity.name, entity.properties)

    def inferFromProps(entityName: String, properties: Seq[Prop]): Seq[String] = {
      explicitMappings.get(entityName) match {
        case Some(names) => resolvePropertyIds(properties, names)
        case None =>
          strategy match {
            case "none" | "explicit" => Nil
            case "first_valid" => firstValid(properties)
            case _ => autoInfer(properties)
          }
      }
    }

    /** `fabric_limits.py:500-537`: first property (in order) with a valid
      * type matching a pattern exactly or by containment; else first valid.
      */
    private def autoInfer(properties: Seq[Prop]): Seq[String] = {
      properties.collectFirst {
        case p if ValidTypes(p.valueType) && {
          val n = p.name.toLowerCase
          patternsLower.contains(n) || patternsLower.exists(n.contains)
        } => Seq(p.id)
      }.getOrElse(firstValid(properties))
    }

    private def firstValid(properties: Seq[Prop]): Seq[String] =
      properties.find(p => ValidTypes(p.valueType)).map(p => Seq(p.id))
        .getOrElse(Nil)

    /** `fabric_limits.py:539-560`: name → id, case-insensitive, unknown
      * names dropped (reference logs a warning, identity preserved).
      */
    private def resolvePropertyIds(properties: Seq[Prop],
                                   names: Seq[String]): Seq[String] = {
      val byName = properties.map(p => p.name.toLowerCase -> p.id).toMap
      names.flatMap(n => byName.get(n.toLowerCase))
    }
  }
}
