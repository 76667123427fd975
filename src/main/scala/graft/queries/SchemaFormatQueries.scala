package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dtdl._
import graft.cdm._

/** DTDL/CDM format pipelines (S3-S5, J5, J8, J9, K5, K6, G6, G7) as
  * driver-checkable queries. The fixture documents are embedded once;
  * oracles re-derive results with DuckDB's JSON functions over the same
  * strings.
  */
object SchemaFormatQueries {

  /** DTDL fixture: inheritance (J8 conflict), telemetry, component,
    * relationship, semantic types.
    */
  val dtdlFixture: String = """[
    {"@id": "dtmi:ex:Base;1", "@type": "Interface",
     "@context": "dtmi:dtdl:context;3",
     "contents": [
       {"@type": "Property", "name": "code", "schema": "string"},
       {"@type": "Property", "name": "serialNumber", "schema": "string"}
     ]},
    {"@id": "dtmi:ex:Sensor;1", "@type": "Interface",
     "@context": "dtmi:dtdl:context;3",
     "extends": ["dtmi:ex:Base;1"],
     "displayName": "Sensor",
     "contents": [
       {"@type": "Property", "name": "sensorId", "schema": "long"},
       {"@type": ["Telemetry", "Temperature"], "name": "temperature",
        "schema": "double", "unit": "degreeCelsius"},
       {"@type": "Relationship", "name": "attachedTo", "target": "dtmi:ex:Base;1"},
       {"@type": "Property", "name": "active", "schema": "boolean"},
       {"@type": "Property", "name": "lastSeen", "schema": "dateTime"}
     ]},
    {"@id": "dtmi:ex:Gateway;1", "@type": "Interface",
     "@context": "dtmi:dtdl:context;2",
     "contents": [
       {"@type": "Property", "name": "gatewayKey", "schema": "string"},
       {"@type": "Component", "name": "radio", "schema": "dtmi:ex:Sensor;1"}
     ]}
  ]"""

  val cdmFixture: String = """{
    "manifestName": "retail",
    "entities": [
      {"entityName": "Account", "hasAttributes": [
        {"name": "accountId", "dataType": "integer",
         "appliedTraits": ["means.identity.entityId"]},
        {"name": "accountName", "dataType": "string",
         "appliedTraits": ["means.identity.name"]},
        {"name": "balance", "dataType": "money"},
        {"name": "openedOn", "dataType": "date"},
        {"name": "owner", "dataType": "entity"}
      ]},
      {"entityName": "SavingsAccount", "extendsEntity": "Account",
       "hasAttributes": [
        {"name": "rate", "dataType": "double"},
        {"name": "balance", "dataType": "decimal"}
      ]},
      {"entityName": "Transaction", "hasAttributes": [
        {"name": "txId", "dataType": "int64"},
        {"name": "amount", "dataType": "float"},
        {"name": "happened", "appliedTraits": ["is.dataFormat.time"]}
      ]}
    ],
    "relationships": [
      {"fromEntity": "Tx/Transaction.cdm.json/Transaction",
       "fromEntityAttribute": "accountId",
       "toEntity": "Acc/Account.cdm.json/Account",
       "toEntityAttribute": "accountId",
       "exhibitsTraits": [{"traitReference": "means.relationship.verbPhrase",
         "arguments": [{"value": "postedTo"}]}]}
    ]
  }"""

  private def interfaces = DtdlParser.parse(dtdlFixture)
  private def manifest = CdmParser.parse(cdmFixture)

  /** S3 parse-level inventory per interface. */
  def dtdlEntities(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    interfaces.map { i =>
      (i.dtmi, i.resolvedDisplayName, i.contextVersion.toLong,
        i.properties.size.toLong, i.telemetries.size.toLong,
        i.relationships.size.toLong, i.components.size.toLong,
        i.extendsList.nonEmpty)
    }.toDF("dtmi", "name", "context_version", "n_props", "n_telemetry",
      "n_rels", "n_components", "has_parent")
      .orderBy("dtmi")
  }

  /** Conversion-level types incl. J8 rename (Sensor has no conflicts here;
    * rename behavior is ScalaTest-covered — the oracle maps raw schemas).
    */
  def dtdlTypes(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val res = DtdlConverter.convert(interfaces,
      componentMode = DtdlConverter.ComponentMode.Skip,
      commandMode = DtdlConverter.CommandMode.Skip)
    res.entities.flatMap(e =>
      (e.properties ++ e.timeseriesProperties).map(p =>
        (e.uri, p.name, p.valueType, p.isTimeseries)))
      .toDF("dtmi", "prop_name", "value_type", "is_timeseries")
      .orderBy("dtmi", "prop_name")
  }

  /** CDM parse-level + K6 key/display selection. */
  def cdmEntities(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    manifest.entities.map { e =>
      (e.name, e.extendsEntity.getOrElse(""),
        e.attributes.size.toLong,
        e.attributes.find(_.isPrimaryKey).map(_.name).getOrElse(""),
        e.attributes.find(_.isDisplayName).map(_.name).getOrElse(""))
    }.toDF("entity", "extends_entity", "n_attrs", "pk_attr", "display_attr")
      .orderBy("entity")
  }

  /** Conversion-level flattened attribute types (J9 + type lattice + P7
    * entity-ref drop).
    */
  def cdmFlat(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val res = CdmConverter.convert(manifest)
    res.entities.flatMap(e => e.properties.map(p =>
      (e.name, p.name, p.valueType)))
      .toDF("entity", "attr", "value_type")
      .orderBy("entity", "attr")
  }

  /** CDM relationships (J5 + verb-phrase naming). */
  def cdmRels(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    CdmConverter.convert(manifest).rels
      .map(r => (r.name, r.srcUri, r.dstUri))
      .toDF("name", "src", "dst").orderBy("name")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dtdl_entities" -> dtdlEntities,
    "dtdl_types" -> dtdlTypes,
    "cdm_entities" -> cdmEntities,
    "cdm_flat" -> cdmFlat,
    "cdm_rels" -> cdmRels
  )

  private def sqlStr(s: String) = "'" + s.replace("'", "''") + "'"

  /** CASE expression over the DTDL type table, generated from the same map. */
  private val dtdlTypeCase: String =
    "CASE schema " + DtdlConverter.dtdlToFabric.toSeq.sortBy(_._1)
      .map { case (k, v) => s"WHEN '$k' THEN '$v'" }.mkString(" ") +
      " ELSE 'String' END"

  private val dtdlCtes =
    s"""WITH docs(j) AS (VALUES (${sqlStr(dtdlFixture)}::JSON)),
       |idx AS (SELECT unnest(generate_series(0,
       |  CAST(json_array_length(j) AS INTEGER) - 1)) AS i, j FROM docs),
       |iface AS (SELECT
       |  json_extract_string(j, '$$[' || i || '].@id') AS dtmi,
       |  json_extract(j, '$$[' || i || ']') AS node FROM idx),
       |cont AS (
       |  SELECT dtmi, json_extract(node, '$$.contents[' || k || ']') AS c
       |  FROM iface, unnest(generate_series(0,
       |    CAST(json_array_length(node, '$$.contents') AS INTEGER) - 1)) AS t(k)),
       |kinds AS (
       |  SELECT dtmi,
       |    COALESCE(json_extract_string(c, '$$."@type"[0]'),
       |             json_extract_string(c, '$$."@type"')) AS kind,
       |    json_extract_string(c, '$$.name') AS name,
       |    json_extract_string(c, '$$.schema') AS schema
       |  FROM cont)""".stripMargin

  private val cdmCtes =
    s"""WITH m(j) AS (VALUES (${sqlStr(cdmFixture)}::JSON)),
       |ent AS (SELECT
       |  json_extract_string(j, '$$.entities[' || i || '].entityName') AS entity,
       |  COALESCE(json_extract_string(j, '$$.entities[' || i || '].extendsEntity'), '') AS extends_entity,
       |  json_extract(j, '$$.entities[' || i || ']') AS node
       |  FROM m, unnest(generate_series(0,
       |    CAST(json_array_length(j, '$$.entities') AS INTEGER) - 1)) AS t(i)),
       |attr AS (
       |  SELECT entity, extends_entity,
       |    json_extract_string(node, '$$.hasAttributes[' || k || '].name') AS attr,
       |    json_extract_string(node, '$$.hasAttributes[' || k || '].dataType') AS data_type,
       |    COALESCE(json_extract_string(node,
       |      '$$.hasAttributes[' || k || '].appliedTraits[0]'), '') AS trait0,
       |    k AS pos
       |  FROM ent, unnest(generate_series(0,
       |    CAST(json_array_length(node, '$$.hasAttributes') AS INTEGER) - 1)) AS t(k))""".stripMargin

  /** CASE over the CDM primitive table (+Decimal→Double collapse). */
  private val cdmTypeCase: String = {
    val entries = CdmTypeMapper.primitives.toSeq.sortBy(_._1).map {
      case (k, v) =>
        val core = if (v == "Decimal") "Double" else v
        s"WHEN '$k' THEN '$core'"
    }.mkString(" ")
    val traits = CdmTypeMapper.traitTypes.toSeq.sortBy(_._1).map {
      case (k, v) =>
        val core = if (v == "Decimal") "Double" else v
        s"WHEN '$k' THEN '$core'"
    }.mkString(" ")
    s"COALESCE(CASE data_type $entries END, CASE trait0 $traits END, 'String')"
  }

  val oracles: Map[String, String] = Map(
    "dtdl_entities" ->
      s"""$dtdlCtes
         |SELECT i.dtmi,
         |  COALESCE(json_extract_string(i.node, '$$.displayName'),
         |    regexp_extract(regexp_replace(i.dtmi, ';[0-9]+$$', ''), '([^:]+)$$', 1)) AS name,
         |  CAST(COALESCE(regexp_extract(
         |    json_extract_string(i.node, '$$."@context"'), ';([0-9]+)$$', 1), '2') AS BIGINT)
         |    AS context_version,
         |  (SELECT COUNT(*) FROM kinds kk WHERE kk.dtmi = i.dtmi AND kk.kind = 'Property') AS n_props,
         |  (SELECT COUNT(*) FROM kinds kk WHERE kk.dtmi = i.dtmi AND kk.kind = 'Telemetry') AS n_telemetry,
         |  (SELECT COUNT(*) FROM kinds kk WHERE kk.dtmi = i.dtmi AND kk.kind = 'Relationship') AS n_rels,
         |  (SELECT COUNT(*) FROM kinds kk WHERE kk.dtmi = i.dtmi AND kk.kind = 'Component') AS n_components,
         |  COALESCE(json_array_length(i.node, '$$.extends') > 0
         |    OR json_type(i.node, '$$.extends') = 'VARCHAR', FALSE) AS has_parent
         |FROM iface i ORDER BY dtmi""".stripMargin,
    "dtdl_types" ->
      s"""$dtdlCtes
         |SELECT dtmi, name AS prop_name, $dtdlTypeCase AS value_type,
         |  (kind = 'Telemetry') AS is_timeseries
         |FROM kinds WHERE kind IN ('Property', 'Telemetry')
         |ORDER BY dtmi, prop_name""".stripMargin,
    "cdm_entities" ->
      s"""$cdmCtes
         |SELECT e.entity, e.extends_entity,
         |  (SELECT COUNT(*) FROM attr a WHERE a.entity = e.entity) AS n_attrs,
         |  COALESCE((SELECT a.attr FROM attr a WHERE a.entity = e.entity
         |    AND a.trait0 IN ('means.identity.entityId', 'is.identifiedBy')
         |    ORDER BY a.pos LIMIT 1), '') AS pk_attr,
         |  COALESCE((SELECT a.attr FROM attr a WHERE a.entity = e.entity
         |    AND a.trait0 IN ('means.identity.name', 'means.identity.person.fullName')
         |    ORDER BY a.pos LIMIT 1), '') AS display_attr
         |FROM ent e ORDER BY entity""".stripMargin,
    "cdm_flat" ->
      s"""$cdmCtes,
         |flat AS (
         |  -- own attributes
         |  SELECT entity, attr, data_type, trait0 FROM attr
         |  UNION ALL
         |  -- single-level inheritance: parent attrs not overridden (J9)
         |  SELECT e.entity, pa.attr, pa.data_type, pa.trait0
         |  FROM ent e JOIN attr pa ON pa.entity = e.extends_entity
         |  WHERE e.extends_entity <> ''
         |    AND pa.attr NOT IN (SELECT a2.attr FROM attr a2 WHERE a2.entity = e.entity))
         |SELECT entity, attr, $cdmTypeCase AS value_type
         |FROM flat WHERE COALESCE(data_type, '') NOT IN ('entity', 'entityId', 'entityName')
         |ORDER BY entity, attr""".stripMargin,
    "cdm_rels" ->
      s"""WITH m(j) AS (VALUES (${sqlStr(cdmFixture)}::JSON)),
         |rel AS (SELECT json_extract(j, '$$.relationships[' || i || ']') AS r
         |  FROM m, unnest(generate_series(0,
         |    CAST(json_array_length(j, '$$.relationships') AS INTEGER) - 1)) AS t(i))
         |SELECT
         |  COALESCE(json_extract_string(r, '$$.name'),
         |    json_extract_string(r, '$$.exhibitsTraits[0].arguments[0].value'),
         |    regexp_extract(json_extract_string(r, '$$.fromEntity'), '([^/]+)$$', 1)
         |      || '_to_' ||
         |    regexp_extract(json_extract_string(r, '$$.toEntity'), '([^/]+)$$', 1)) AS name,
         |  'cdm:' || regexp_extract(json_extract_string(r, '$$.fromEntity'), '([^/]+)$$', 1) AS src,
         |  'cdm:' || regexp_extract(json_extract_string(r, '$$.toEntity'), '([^/]+)$$', 1) AS dst
         |FROM rel ORDER BY name""".stripMargin
  )
}
