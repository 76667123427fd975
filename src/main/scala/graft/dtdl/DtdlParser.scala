package graft.dtdl

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** S3/S4 — DTDL JSON → interface AST (reference:
  * `src/formats/dtdl/dtdl_parser.py:125-323`): accepts a single interface
  * object, a JSON array of interfaces, or a JSON-LD document with
  * `@graph`. Pure `String => Seq[DtdlInterface]`, so directory-scale
  * parsing runs in `mapPartitions` over whole files (same shape as the
  * Turtle source). Uses Jackson from the Spark classpath — no extra
  * dependency.
  */
object DtdlParser {

  private val mapper = new ObjectMapper()

  def parse(content: String): Seq[DtdlInterface] = {
    val root = mapper.readTree(content)
    val nodes: Seq[JsonNode] =
      if (root.isArray) root.elements().asScala.toSeq
      else if (root.has("@graph")) root.get("@graph").elements().asScala.toSeq
      else Seq(root)
    nodes.flatMap(parseInterface)
  }

  /** `@type` may be a string or array; the interface kind must include
    * "Interface".
    */
  private def typeList(n: JsonNode): Seq[String] = {
    val t = n.get("@type")
    if (t == null) Nil
    else if (t.isArray) t.elements().asScala.map(_.asText).toSeq
    else Seq(t.asText)
  }

  def parseInterface(n: JsonNode): Option[DtdlInterface] = {
    if (!typeList(n).contains("Interface")) return None
    val dtmi = Option(n.get("@id")).map(_.asText).getOrElse(return None)
    val context = Option(n.get("@context")).map { c =>
      val s = if (c.isArray) c.elements().asScala.map(_.asText)
        .find(_.startsWith("dtmi:dtdl:context")).getOrElse("") else c.asText
      // dtmi:dtdl:context;3 → 3
      s.split(";").lift(1).flatMap(_.toIntOption).getOrElse(2)
    }.getOrElse(2)
    val extendsList = Option(n.get("extends")).map { e =>
      if (e.isArray) e.elements().asScala.map(_.asText).toSeq else Seq(e.asText)
    }.getOrElse(Nil)
    val displayName = Option(n.get("displayName")).map { d =>
      if (d.isObject) Option(d.get("en")).map(_.asText)
        .getOrElse(d.elements().asScala.toSeq.headOption.map(_.asText).getOrElse(""))
      else d.asText
    }.filter(_.nonEmpty)
    val contents = Option(n.get("contents")).map { c =>
      c.elements().asScala.flatMap(parseContent).toSeq
    }.getOrElse(Nil)
    val description = Option(n.get("description")).map { d =>
      if (d.isObject) Option(d.get("en")).map(_.asText)
        .getOrElse(d.elements().asScala.toSeq.headOption.map(_.asText).getOrElse(""))
      else d.asText
    }.filter(_.nonEmpty)
    // reusable schema definitions: only their @id presence/shape is
    // validated (dtdl_validator.py:485-502)
    val schemaDefIds = Option(n.get("schemas")).map { ss =>
      ss.elements().asScala.map(sd => Option(sd.get("@id")).map(_.asText)).toSeq
    }.getOrElse(Nil)
    Some(DtdlInterface(dtmi, displayName, extendsList, contents, context,
      description, schemaDefIds))
  }

  private val ContentKinds =
    Set("Property", "Telemetry", "Relationship", "Component", "Command")

  def parseContent(n: JsonNode): Option[DtdlContent] = {
    val types = typeList(n)
    // the element kind is the recognized entry; remaining entries are
    // semantic types (dtdl_parser.py:403-412)
    val kind = types.find(ContentKinds).getOrElse(return None)
    val semantics = types.filterNot(_ == kind)
    val name = Option(n.get("name")).map(_.asText).getOrElse(return None)
    val schema = Option(n.get("schema")).flatMap(parseSchema)
    Some(DtdlContent(
      kind = kind,
      name = name,
      schema = schema,
      target = Option(n.get("target")).map(_.asText),
      componentSchema =
        if (kind == "Component") Option(n.get("schema")).map(s =>
          if (s.isTextual) s.asText else "") else None,
      requestSchema = Option(n.get("request"))
        .flatMap(r => Option(r.get("schema"))).flatMap(parseSchema),
      responseSchema = Option(n.get("response"))
        .flatMap(r => Option(r.get("schema"))).flatMap(parseSchema),
      semanticTypes = semantics,
      unit = Option(n.get("unit")).map(_.asText),
      minMultiplicity = Option(n.get("minMultiplicity")).map(_.asInt),
      maxMultiplicity = Option(n.get("maxMultiplicity")).map(_.asInt),
      dtmi = Option(n.get("@id")).map(_.asText),
      relProps = Option(n.get("properties")).map(_.elements().asScala
        .flatMap(p => Option(p.get("name")).map(_.asText)).toSeq).getOrElse(Nil)))
  }

  def parseSchema(s: JsonNode): Option[DtdlSchema] = {
    import DtdlSchema._
    if (s.isTextual) Some(Prim(s.asText))
    else if (s.isObject) {
      val t = typeList(s).headOption.getOrElse("")
      t match {
        case "Enum" =>
          val vs = Option(s.get("valueSchema")).map(_.asText).getOrElse("string")
          Some(Enum(vs, s.toString))
        case "Object" => Some(Obj(s.toString))
        case "Array" => Some(Arr(s.toString))
        case "Map" => Some(MapS(s.toString))
        case "ScaledDecimal" | "scaledDecimal" => Some(ScaledDecimal(s.toString))
        case _ => Some(Obj(s.toString))
      }
    } else None
  }
}
