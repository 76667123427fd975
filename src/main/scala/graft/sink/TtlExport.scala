package graft.sink

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.rdf.Vocab._
import graft.ontology.Names

/** O2 — ontology → Turtle/RDF export (reference:
  * `src/formats/rdf/fabric_to_ttl.py:175-339`): entity types become
  * `owl:Class` + `rdfs:label` (+ `rdfs:subClassOf`), their properties
  * `owl:DatatypeProperty` with domain + reverse-mapped XSD range,
  * relationships `owl:ObjectProperty` with domain/range. Triple rows are
  * generated relationally (selects + unions); serialization happens on
  * the (small) collected schema, or distributed as N-Triples lines.
  */
object TtlExport {

  /** Reverse type map (`fabric_to_ttl.py:24-34`, 9 entries). */
  val fabricToXsd: Map[String, String] = Map(
    "String" -> (XSD + "string"), "Boolean" -> (XSD + "boolean"),
    "DateTime" -> (XSD + "dateTime"), "BigInt" -> (XSD + "integer"),
    "Double" -> (XSD + "double"), "Int" -> (XSD + "integer"),
    "Long" -> (XSD + "long"), "Float" -> (XSD + "float"),
    "Decimal" -> (XSD + "decimal"))

  val DefaultNs = "http://example.org/ontology#"

  /** entities/rels (Extract.entityTypes shape) → triple rows
    * (s, p, o, oKind).
    */
  def toTriples(entities: DataFrame, rels: DataFrame,
                ns: String = DefaultNs): DataFrame = {
    val classUri = concat(lit(ns), Names.sanitizeNameCol(col("name"), prefix = "C_"))

    val classDecl = entities.select(classUri.as("s"), lit(RdfType).as("p"),
      lit(OwlClass).as("o"), lit("uri").as("oKind"))
    val classLabel = entities.select(classUri.as("s"), lit(RdfsLabel).as("p"),
      col("name").as("o"), lit("literal").as("oKind"))

    // subClassOf via id → name self-join (entity_id_to_uri map)
    val idToName = entities.select(col("id").as("baseEntityTypeId"),
      Names.sanitizeNameCol(col("name"), prefix = "C_").as("parentName"))
    val subClass = entities.filter(col("baseEntityTypeId").isNotNull)
      .join(broadcast(idToName), Seq("baseEntityTypeId"))
      .select(classUri.as("s"), lit(RdfsSubClassOf).as("p"),
        concat(lit(ns), col("parentName")).as("o"), lit("uri").as("oKind"))

    // data properties (regular + timeseries)
    val props = entities.select(classUri.as("domainUri"),
      explode(concat_ws_array(col("properties"), col("timeseriesProperties"))).as("prop"))
    val propUri = concat(lit(ns), Names.sanitizeNameCol(col("prop.name"), prefix = "C_"))
    val xsdMap = typedLit(fabricToXsd)
    val propTriples = props.select(propUri.as("s"), lit(RdfType).as("p"),
        lit(OwlDatatypeProperty).as("o"), lit("uri").as("oKind"))
      .union(props.select(propUri.as("s"), lit(RdfsLabel).as("p"),
        col("prop.name").as("o"), lit("literal").as("oKind")))
      .union(props.select(propUri.as("s"), lit(RdfsDomain).as("p"),
        col("domainUri").as("o"), lit("uri").as("oKind")))
      .union(props.select(propUri.as("s"), lit(RdfsRange).as("p"),
        coalesce(element_at(xsdMap, col("prop.valueType")),
          lit(XSD + "string")).as("o"), lit("uri").as("oKind")))

    // relationships: src/dst ids → class uris
    val idToUri = entities.select(col("id"),
      concat(lit(ns), Names.sanitizeNameCol(col("name"), prefix = "C_")).as("clsUri"))
    val relUri = concat(lit(ns), Names.sanitizeNameCol(col("name"), prefix = "C_"))
    val relJoined = rels
      .join(broadcast(idToUri.withColumnRenamed("id", "srcEntityTypeId")
        .withColumnRenamed("clsUri", "srcClsUri")), Seq("srcEntityTypeId"))
      .join(broadcast(idToUri.withColumnRenamed("id", "dstEntityTypeId")
        .withColumnRenamed("clsUri", "dstClsUri")), Seq("dstEntityTypeId"))
    val relTriples = relJoined.select(relUri.as("s"), lit(RdfType).as("p"),
        lit(OwlObjectProperty).as("o"), lit("uri").as("oKind"))
      .union(relJoined.select(relUri.as("s"), lit(RdfsLabel).as("p"),
        col("name").as("o"), lit("literal").as("oKind")))
      .union(relJoined.select(relUri.as("s"), lit(RdfsDomain).as("p"),
        col("srcClsUri").as("o"), lit("uri").as("oKind")))
      .union(relJoined.select(relUri.as("s"), lit(RdfsRange).as("p"),
        col("dstClsUri").as("o"), lit("uri").as("oKind")))

    classDecl.union(classLabel).union(subClass).union(propTriples)
      .union(relTriples).distinct()
  }

  private def concat_ws_array(a: org.apache.spark.sql.Column,
                              b: org.apache.spark.sql.Column) =
    org.apache.spark.sql.functions.concat(a, b)

  /** Serialize triple rows to deterministic N-Triples text (one string;
    * schema-scale). Literal-escaping per the N-Triples grammar.
    */
  def toNTriples(triples: DataFrame): String = {
    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t")
    triples.select("s", "p", "o", "oKind").collect()
      .map { r =>
        val o = r.getString(2)
        val oStr = r.getString(3) match {
          case "literal" => "\"" + esc(o) + "\""
          case "bnode" => o
          case _ => s"<$o>"
        }
        s"<${r.getString(0)}> <${r.getString(1)}> $oStr ."
      }
      .sorted
      .mkString("", "\n", "\n")
  }
}
