package graft.plugins

import scala.collection.mutable

/** X1 completion — per-format type-mapping + value-converter registry
  * (reference: `src/shared/utilities/type_registry.py:41-445`), the one
  * extension-surface piece round 1 lacked. Plugins register
  * (format, sourceType) → fabricType mappings with optional value
  * converters, precision-loss flags and per-format aliases; lookups
  * fall back to the default type.
  *
  * Placement: this is driver-side configuration. At execution time a
  * registered converter is a plain `Any => Any` closure — serializable
  * functions usable from Column-level UDFs if a format genuinely needs
  * per-value rewriting; the built-in formats keep value logic in
  * codegen'd Column expressions and only register *type* mappings,
  * matching the reference's default registrations.
  */
object TypeRegistry {

  val FabricTypes: Set[String] =
    Set("String", "Boolean", "DateTime", "BigInt", "Double", "Decimal")

  final case class TypeMapping(
      sourceType: String,
      fabricType: String,
      converter: Option[Any => Any] = None,
      notes: String = "",
      precisionLoss: Boolean = false) {
    require(FabricTypes.contains(fabricType),
      s"Invalid Fabric type '$fabricType'")
  }

  /** All access goes through `synchronized` — the extraction stages run on
    * Futures and the shared `global` singleton would otherwise race plugin
    * registration against lookups and corrupt the open-addressing maps.
    * Registration is driver-side, rare, and tiny, so a monitor (not a
    * concurrent map) is the right cost/complexity point.
    */
  final class Registry(private var defaultType0: String = "String") {
    private val mappings =
      mutable.Map[String, mutable.Map[String, TypeMapping]]()
    private val aliases = mutable.Map[String, mutable.Map[String, String]]()

    def defaultType: String = synchronized(defaultType0)
    def defaultType_=(v: String): Unit = synchronized {
      require(FabricTypes.contains(v), s"Invalid default type: $v")
      defaultType0 = v
    }

    def registerFormat(formatName: String): Unit = synchronized {
      val key = formatName.toLowerCase
      mappings.getOrElseUpdate(key, mutable.Map())
      aliases.getOrElseUpdate(key, mutable.Map())
      ()
    }

    def registerMapping(formatName: String, sourceType: String,
                        fabricType: String,
                        converter: Option[Any => Any] = None,
                        notes: String = "",
                        precisionLoss: Boolean = false): Unit = synchronized {
      registerFormat(formatName)
      mappings(formatName.toLowerCase)(sourceType) =
        TypeMapping(sourceType, fabricType, converter, notes, precisionLoss)
    }

    def registerMappings(formatName: String,
                         entries: Map[String, String]): Unit = synchronized {
      entries.foreach { case (s, f) => registerMapping(formatName, s, f) }
    }

    /** alias → canonical source type within a format
      * (`type_registry.py:167-183`). */
    def registerAlias(formatName: String, alias: String,
                      canonical: String): Unit = synchronized {
      registerFormat(formatName)
      aliases(formatName.toLowerCase)(alias) = canonical
    }

    private def resolve(formatName: String,
                        sourceType: String): Option[TypeMapping] = {
      val key = formatName.toLowerCase
      val canonical = aliases.getOrElse(key, mutable.Map())
        .getOrElse(sourceType, sourceType)
      mappings.getOrElse(key, mutable.Map()).get(canonical)
    }

    def getFabricType(formatName: String, sourceType: String,
                      default: Option[String] = None): String = synchronized {
      resolve(formatName, sourceType).map(_.fabricType)
        .orElse(default).getOrElse(defaultType0)
    }

    def getMapping(formatName: String,
                   sourceType: String): Option[TypeMapping] =
      synchronized(resolve(formatName, sourceType))

    /** `type_registry.py:237-260` — run the registered converter, or
      * return the value unchanged. */
    def convertValue(formatName: String, sourceType: String, value: Any): Any =
      synchronized(resolve(formatName, sourceType).flatMap(_.converter)) match {
        case Some(f) => f(value)
        case None => value
      }

    def listMappings(formatName: String): Map[String, String] = synchronized {
      mappings.getOrElse(formatName.toLowerCase, mutable.Map())
        .map { case (s, m) => s -> m.fabricType }.toMap
    }

    def listFormats: Seq[String] = synchronized(mappings.keys.toSeq.sorted)

    def precisionLossTypes(formatName: String): Seq[String] = synchronized {
      mappings.getOrElse(formatName.toLowerCase, mutable.Map())
        .collect { case (s, m) if m.precisionLoss => s }.toSeq.sorted
    }
  }

  /** Global singleton, pre-seeded like `_initialize_default_mappings`
    * (`type_registry.py:330-403`): the RDF/XSD table and the DTDL table.
    * The CDM plugin registers its tables too (the reference leaves CDM in
    * its own mapper; registering here gives the registry the full
    * cross-format view the plugin surface advertises).
    */
  lazy val global: Registry = {
    val r = new Registry()
    val xsd = "http://www.w3.org/2001/XMLSchema#"
    r.registerMappings("rdf", Map(
      s"${xsd}string" -> "String", s"${xsd}anyURI" -> "String",
      s"${xsd}normalizedString" -> "String", s"${xsd}token" -> "String",
      s"${xsd}language" -> "String", s"${xsd}Name" -> "String",
      s"${xsd}NCName" -> "String", s"${xsd}NMTOKEN" -> "String",
      s"${xsd}boolean" -> "Boolean",
      s"${xsd}dateTime" -> "DateTime", s"${xsd}date" -> "DateTime",
      s"${xsd}dateTimeStamp" -> "DateTime",
      s"${xsd}time" -> "String", s"${xsd}duration" -> "String",
      s"${xsd}integer" -> "BigInt", s"${xsd}int" -> "BigInt",
      s"${xsd}long" -> "BigInt", s"${xsd}short" -> "BigInt",
      s"${xsd}byte" -> "BigInt", s"${xsd}nonNegativeInteger" -> "BigInt",
      s"${xsd}positiveInteger" -> "BigInt", s"${xsd}unsignedInt" -> "BigInt",
      s"${xsd}unsignedLong" -> "BigInt",
      s"${xsd}double" -> "Double", s"${xsd}float" -> "Double",
      s"${xsd}decimal" -> "Double"))
    r.registerMappings("dtdl", graft.dtdl.DtdlConverter.dtdlToFabric)
    r.registerMappings("cdm",
      graft.cdm.CdmTypeMapper.primitives ++ graft.cdm.CdmTypeMapper.semantics)
    r
  }

  /** `resolve_union_type` + TYPE_HIERARCHY (`type_registry.py:410-445`):
    * least-common-denominator resolution of a union of type names.
    */
  val TypeHierarchy: Seq[(Set[String], String)] = Seq(
    (Set("Boolean", "boolean"), "Boolean"),
    (Set("BigInt", "integer", "int", "long", "short", "byte"), "BigInt"),
    (Set("Double", "float", "double", "decimal"), "Double"),
    (Set("DateTime", "date", "dateTime"), "DateTime"),
    (Set("String"), "String"))

  def resolveUnionType(types: Seq[String]): String = {
    if (types.isEmpty) return "String"
    if (types.size == 1) return types.head
    val set = types.toSet
    TypeHierarchy.collectFirst {
      case (group, result) if set.subsetOf(group) => result
    }.getOrElse("String")
  }
}
