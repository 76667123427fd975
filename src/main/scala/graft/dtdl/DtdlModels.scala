package graft.dtdl

/** DTDL v2/v3/v4 AST (reference: `src/formats/dtdl/dtdl_models.py`).
  * Schemas are modeled as a small ADT; complex schemas keep their raw JSON
  * for the "stored as JSON string" mapping (`dtdl_converter.py:1066-1068`).
  */
sealed trait DtdlSchema
object DtdlSchema {
  /** primitive name or a DTMI reference */
  final case class Prim(name: String) extends DtdlSchema
  final case class Enum(valueSchema: String, raw: String) extends DtdlSchema
  final case class Obj(raw: String) extends DtdlSchema
  final case class Arr(raw: String) extends DtdlSchema
  final case class MapS(raw: String) extends DtdlSchema
  final case class ScaledDecimal(raw: String) extends DtdlSchema
}

/** One `contents` element. `kind` ∈ Property | Telemetry | Relationship |
  * Component | Command; `semanticTypes` = @type entries beyond the kind
  * (`dtdl_parser.py:403-412`).
  */
final case class DtdlContent(
    kind: String,
    name: String,
    schema: Option[DtdlSchema],
    target: Option[String] = None,          // Relationship
    componentSchema: Option[String] = None, // Component (DTMI)
    requestSchema: Option[DtdlSchema] = None,  // Command
    responseSchema: Option[DtdlSchema] = None, // Command
    semanticTypes: Seq[String] = Nil,
    unit: Option[String] = None,
    minMultiplicity: Option[Int] = None,
    maxMultiplicity: Option[Int] = None,
    dtmi: Option[String] = None,            // content-level @id
    relProps: Seq[String] = Nil)            // Relationship nested property names

final case class DtdlInterface(
    dtmi: String,
    displayName: Option[String],
    extendsList: Seq[String],
    contents: Seq[DtdlContent],
    contextVersion: Int,
    description: Option[String] = None,
    schemaDefIds: Seq[Option[String]] = Nil) { // @id of each Interface.schemas entry

  def properties: Seq[DtdlContent] = contents.filter(_.kind == "Property")
  def telemetries: Seq[DtdlContent] = contents.filter(_.kind == "Telemetry")
  def relationships: Seq[DtdlContent] = contents.filter(_.kind == "Relationship")
  def components: Seq[DtdlContent] = contents.filter(_.kind == "Component")
  def commands: Seq[DtdlContent] = contents.filter(_.kind == "Command")

  /** F9 — DTMI → name: strip `dtmi:`, strip `;version`, last `:` segment
    * (`dtdl_models.py:726-739`).
    */
  def nameFromDtmi: String = DtdlInterface.dtmiToName(dtmi)

  def resolvedDisplayName: String = displayName.getOrElse(nameFromDtmi)
}

object DtdlInterface {
  def dtmiToName(dtmi: String): String = {
    val noPrefix = dtmi.stripPrefix("dtmi:")
    val noVersion = noPrefix.split(";")(0)
    noVersion.split(":").last
  }

  /** F7 — DTMI format (`dtdl_validator.py:143-148`, DTMI_PATTERN): first
    * segment starts with a letter; further segments may start with `_`;
    * version is `;major` (1-9 digits) with optional `.minor` (1-6 digits).
    */
  val DtmiRegex =
    "^dtmi:[A-Za-z][A-Za-z0-9_]*(?::[A-Za-z_][A-Za-z0-9_]*)*(?:;[1-9][0-9]{0,8}(?:\\.[1-9][0-9]{0,5})?)?$".r
  def isValidDtmi(dtmi: String): Boolean =
    dtmi != null && dtmi.length <= 2048 && DtmiRegex.matches(dtmi)
}
