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

  /** V-DTDL fixture: one planted violation per validator check family
    * (`dtdl_validator.py:120-619`). Strings above limits are generated so
    * the Spark fixture and the DuckDB oracle share the exact bytes.
    */
  val dtdlValidationFixture: String = {
    val longSeg = "a" * 130 // interface DTMI limit is 128
    val longName = "d" * 513 // displayName/description limit is 512
    val depthChain = (0 until 14).map { k =>
      val ext = if (k < 13) s""", "extends": ["dtmi:ex:D${k + 1};1"]""" else ""
      s"""{"@id": "dtmi:ex:D$k;1", "@type": "Interface",
         | "@context": "dtmi:dtdl:context;3"$ext}""".stripMargin
    }.mkString(",\n")
    s"""[
    {"@id": "dtmi:ex:Dup;1", "@type": "Interface",
     "@context": "dtmi:dtdl:context;3"},
    {"@id": "dtmi:ex:Dup;1", "@type": "Interface",
     "@context": "dtmi:dtdl:context;3"},
    {"@id": "dtmi:1bad;1", "@type": "Interface",
     "@context": "dtmi:dtdl:context;3"},
    {"@id": "dtmi:$longSeg;1", "@type": "Interface",
     "@context": "dtmi:dtdl:context;3"},
    {"@id": "dtmi:standard:Thing;1", "@type": "Interface",
     "@context": "dtmi:dtdl:context;3"},
    {"@id": "dtmi:ex:OldVer;1", "@type": "Interface",
     "@context": "dtmi:dtdl:context;5"},
    {"@id": "dtmi:ex:SelfLoop;1", "@type": "Interface",
     "@context": "dtmi:dtdl:context;3", "extends": ["dtmi:ex:SelfLoop;1"]},
    {"@id": "dtmi:ex:Orphan;1", "@type": "Interface",
     "@context": "dtmi:dtdl:context;3", "extends": ["dtmi:ex:MissingParent;1"]},
    {"@id": "dtmi:ex:CycA;1", "@type": "Interface",
     "@context": "dtmi:dtdl:context;3", "extends": ["dtmi:ex:CycB;1"]},
    {"@id": "dtmi:ex:CycB;1", "@type": "Interface",
     "@context": "dtmi:dtdl:context;3", "extends": ["dtmi:ex:CycA;1"]},
    $depthChain,
    {"@id": "dtmi:ex:Contents;1", "@type": "Interface",
     "@context": "dtmi:dtdl:context;3",
     "displayName": "$longName",
     "description": "$longName",
     "schemas": [{"@type": "Enum", "valueSchema": "string"}],
     "contents": [
       {"@type": "Property", "name": "x", "schema": "string"},
       {"@type": "Property", "name": "x", "schema": "integer"},
       {"@type": "Property", "name": "9bad", "schema": "string"},
       {"@type": "Property", "name": "weird", "schema": "floatish"},
       {"@type": "Property", "name": "hasEmptyId", "schema": "string", "@id": ""},
       {"@type": "Property", "name": "n$longName", "schema": "string"},
       {"@type": "Relationship", "name": "relBad", "target": "dtmi:ex:NoSuch;1",
        "maxMultiplicity": 0,
        "properties": [{"name": "p", "schema": "string"},
                       {"name": "p", "schema": "string"}]},
       {"@type": "Component", "name": "comp", "schema": "dtmi:ex:NoComp;1"}
     ]}
  ]"""
  }

  /** V-CDM fixture: one planted violation per validator check family
    * (`cdm_validator.py:194-548`).
    */
  val cdmValidationFixture: String = {
    val longName = "E" + "e" * 100 // Fabric name limit is 100
    s"""{
    "manifestName": "",
    "jsonSchemaSemanticVersion": "9.9.9",
    "entities": [
      {"entityName": "Account", "hasAttributes": [
        {"name": "accountId", "dataType": "integer",
         "appliedTraits": ["means.identity.entityId"]}
      ]},
      {"entityName": "Account", "hasAttributes": [
        {"name": "accountId", "dataType": "integer",
         "appliedTraits": ["means.identity.entityId"]}
      ]},
      {"entityName": "9 Bad Name", "hasAttributes": [
        {"name": "bid", "dataType": "int",
         "appliedTraits": ["means.identity.entityId"]}
      ]},
      {"entityName": "$longName"},
      {"entityName": "SelfExt", "extendsEntity": "SelfExt", "hasAttributes": [
        {"name": "x", "dataType": "string"}
      ]},
      {"entityName": "Child", "extendsEntity": "Account", "hasAttributes": [
        {"name": "y", "dataType": "string"}
      ]},
      {"entityName": "Type", "hasAttributes": [
        {"name": "id", "dataType": "string", "appliedTraits": ["is.identifiedBy"]}
      ]},
      {"entityName": "Attrs", "hasAttributes": [
        {"name": "dup", "dataType": "string"},
        {"name": "dup", "dataType": "string"},
        {"name": "noType"},
        {"name": "weirdType", "dataType": "blob"},
        {"name": "entRef", "dataType": "entityId"},
        {"name": "negLen", "dataType": "string", "maximumLength": -5},
        {"name": "hugeLen", "dataType": "string", "maximumLength": 2000000000}
      ]}
    ],
    "relationships": [
      {"fromEntity": "Tx/Missing.cdm.json/Missing", "fromEntityAttribute": "x",
       "toEntity": "Acc/Account.cdm.json/Account", "toEntityAttribute": "accountId"},
      {"fromEntity": "", "fromEntityAttribute": "x",
       "toEntity": "", "toEntityAttribute": "y"}
    ]
  }"""
  }

  private def interfaces = DtdlParser.parse(dtdlFixture)
  private def manifest = CdmParser.parse(cdmFixture)

  /** V-CDM — validator histogram over the planted-violation manifest. */
  def cdmValidate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val issues = CdmValidator.validate(CdmParser.parse(cdmValidationFixture))
    issues.map(i => (i.category, i.severity)).toDF("category", "severity")
      .groupBy("category", "severity").agg(count(lit(1)).as("n"))
      .orderBy("category", "severity")
  }

  /** V-DTDL — validator histogram over the planted-violation fixture,
    * run with external references DISALLOWED so every reference-integrity
    * family fires (`allow_external_references=False` paths).
    */
  def dtdlValidate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val issues = DtdlValidator.validate(
      DtdlParser.parse(dtdlValidationFixture), allowExternalReferences = false)
    issues.map(i => (i.category, i.level)).toDF("category", "severity")
      .groupBy("category", "severity").agg(count(lit(1)).as("n"))
      .orderBy("category", "severity")
  }

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
    "dtdl_validate" -> dtdlValidate,
    "cdm_validate" -> cdmValidate,
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

  /** CASE over the full CDM type tables (primitives + semantics matched
    * case-insensitively, then traits — `cdm_type_mapper.py:289-369`;
    * Decimal is first-class).
    */
  private val cdmTypeCase: String = {
    val entries = (CdmTypeMapper.primitives ++ CdmTypeMapper.semantics)
      .map { case (k, v) => k.toLowerCase -> v }
      .toSeq.sortBy(_._1)
      .map { case (k, v) => s"WHEN '$k' THEN '$v'" }.mkString(" ")
    val traits = CdmTypeMapper.traitTypes.toSeq.sortBy(_._1).map {
      case (k, v) => s"WHEN '$k' THEN '$v'"
    }.mkString(" ")
    s"COALESCE(CASE lower(data_type) $entries END, CASE trait0 $traits END, 'String')"
  }

  /** DTMI + name regexes shared with the validator (DuckDB dialect). */
  private val dtmiPatternSql =
    "dtmi:[A-Za-z][A-Za-z0-9_]*(:[A-Za-z_][A-Za-z0-9_]*)*(;[1-9][0-9]{0,8}(\\.[1-9][0-9]{0,5})?)?"
  private val namePatternSql = "[A-Za-z][A-Za-z0-9_]*[A-Za-z0-9]?"
  private val primitivesSql =
    DtdlValidator.PrimitiveSchemas.toSeq.sorted.map(p => s"'$p'").mkString(", ")

  /** Independent re-derivation of every validator check family from the
    * raw fixture JSON: DTMI-occurrence table for shape checks, recursive
    * CTE walking `extends` with a path array for cycle + depth.
    */
  private val dtdlValidateOracle: String =
    s"""WITH RECURSIVE docs(j) AS (VALUES (${sqlStr(dtdlValidationFixture)}::JSON)),
       |idx AS (SELECT unnest(generate_series(0,
       |  CAST(json_array_length(j) AS INTEGER) - 1)) AS i, j FROM docs),
       |iface AS (SELECT i,
       |  json_extract_string(j, '$$[' || i || '].@id') AS dtmi,
       |  json_extract(j, '$$[' || i || ']') AS node FROM idx),
       |ext AS (SELECT f.dtmi AS child,
       |    json_extract_string(f.node, '$$.extends[' || e || ']') AS parent
       |  FROM iface f, unnest(generate_series(0, CAST(COALESCE(
       |    json_array_length(f.node, '$$.extends'), 0) AS INTEGER) - 1)) AS t(e)),
       |cont AS (SELECT f.dtmi, json_extract(f.node, '$$.contents[' || k || ']') AS c
       |  FROM iface f, unnest(generate_series(0, CAST(COALESCE(
       |    json_array_length(f.node, '$$.contents'), 0) AS INTEGER) - 1)) AS t(k)),
       |kinds AS (SELECT dtmi,
       |    COALESCE(json_extract_string(c, '$$."@type"[0]'),
       |             json_extract_string(c, '$$."@type"')) AS kind,
       |    json_extract_string(c, '$$.name') AS name,
       |    json_extract_string(c, '$$.schema') AS schema,
       |    json_extract_string(c, '$$.target') AS target,
       |    json_extract_string(c, '$$."@id"') AS cid,
       |    TRY_CAST(json_extract_string(c, '$$.maxMultiplicity') AS INTEGER) AS maxmult,
       |    c
       |  FROM cont),
       |relprops AS (SELECT k.dtmi, k.name AS relname,
       |    json_extract_string(k.c, '$$.properties[' || q || '].name') AS pname
       |  FROM kinds k, unnest(generate_series(0, CAST(COALESCE(
       |    json_array_length(k.c, '$$.properties'), 0) AS INTEGER) - 1)) AS t(q)
       |  WHERE k.kind = 'Relationship'),
       |schemadefs AS (SELECT f.dtmi,
       |    json_extract_string(f.node, '$$.schemas[' || q || '].@id') AS sid
       |  FROM iface f, unnest(generate_series(0, CAST(COALESCE(
       |    json_array_length(f.node, '$$.schemas'), 0) AS INTEGER) - 1)) AS t(q)),
       |dtmis(d, is_iface) AS (
       |  SELECT dtmi, true FROM iface
       |  UNION ALL SELECT parent, false FROM ext
       |  UNION ALL SELECT cid, false FROM kinds WHERE cid IS NOT NULL
       |  UNION ALL SELECT target, false FROM kinds
       |    WHERE kind = 'Relationship' AND target IS NOT NULL
       |  UNION ALL SELECT schema, false FROM kinds
       |    WHERE kind = 'Component' AND schema IS NOT NULL
       |  UNION ALL SELECT sid, false FROM schemadefs WHERE sid IS NOT NULL),
       |walk(root, node, path, depth) AS (
       |  SELECT dtmi, dtmi, [dtmi], 0 FROM iface
       |  UNION ALL
       |  SELECT w.root, e.parent, list_append(w.path, e.parent), w.depth + 1
       |  FROM walk w JOIN ext e ON e.child = w.node
       |  WHERE NOT list_contains(w.path, e.parent) AND w.depth < 15),
       |cyc AS (SELECT DISTINCT w.root FROM walk w
       |  JOIN ext e ON e.child = w.node WHERE list_contains(w.path, e.parent)),
       |deep AS (SELECT DISTINCT root FROM walk
       |  WHERE depth > 12 AND root NOT IN (SELECT root FROM cyc)),
       |issues(category, severity, n) AS (
       |  SELECT 'duplicate_dtmi', 'error',
       |    (SELECT COUNT(*) - COUNT(DISTINCT dtmi) FROM iface)
       |  UNION ALL SELECT 'dtmi_format', 'error', (SELECT COUNT(*) FROM dtmis
       |    WHERE d <> '' AND NOT regexp_full_match(d, '$dtmiPatternSql'))
       |  UNION ALL SELECT 'dtmi_too_long', 'error', (SELECT COUNT(*) FROM dtmis
       |    WHERE d <> '' AND ((is_iface AND length(d) > 128)
       |      OR (NOT is_iface AND length(d) > 2048)))
       |  UNION ALL SELECT 'dtmi_empty', 'error',
       |    (SELECT COUNT(*) FROM dtmis WHERE d = '')
       |  UNION ALL SELECT 'dtmi_reserved_prefix', 'warning',
       |    (SELECT COUNT(*) FROM dtmis WHERE d <> '' AND
       |      (d LIKE 'dtmi:dtdl:%' OR d LIKE 'dtmi:standard:%'))
       |  UNION ALL SELECT 'unsupported_version', 'error',
       |    (SELECT COUNT(*) FROM iface WHERE TRY_CAST(regexp_extract(
       |       json_extract_string(node, '$$."@context"'), ';([0-9]+)$$', 1)
       |       AS INTEGER) NOT IN (2, 3, 4))
       |  UNION ALL SELECT 'self_extends', 'error',
       |    (SELECT COUNT(*) FROM ext WHERE parent = child)
       |  UNION ALL SELECT 'parent_not_found', 'error',
       |    (SELECT COUNT(*) FROM ext WHERE parent <> child
       |       AND parent NOT IN (SELECT dtmi FROM iface))
       |  UNION ALL SELECT 'inheritance_cycle', 'error', (SELECT COUNT(*) FROM cyc)
       |  UNION ALL SELECT 'extends_depth', 'error', (SELECT COUNT(*) FROM deep)
       |  UNION ALL SELECT 'duplicate_content_name', 'error',
       |    (SELECT COALESCE(SUM(cc), 0) FROM (SELECT COUNT(*) - COUNT(DISTINCT name) AS cc
       |       FROM kinds WHERE name IS NOT NULL GROUP BY dtmi) x)
       |  UNION ALL SELECT 'content_name_format', 'error',
       |    (SELECT COUNT(*) FROM kinds WHERE name IS NOT NULL
       |       AND NOT regexp_full_match(name, '$namePatternSql'))
       |  UNION ALL SELECT 'content_name_too_long', 'error',
       |    (SELECT COUNT(*) FROM kinds WHERE length(name) > 512)
       |  UNION ALL SELECT 'unknown_schema', 'warning',
       |    (SELECT COUNT(*) FROM kinds WHERE kind IN ('Property', 'Telemetry')
       |       AND schema IS NOT NULL AND schema NOT LIKE 'dtmi:%'
       |       AND schema NOT IN ($primitivesSql))
       |  UNION ALL SELECT 'rel_target_not_found', 'warning',
       |    (SELECT COUNT(*) FROM kinds WHERE kind = 'Relationship'
       |       AND target IS NOT NULL AND target NOT IN (SELECT dtmi FROM iface))
       |  UNION ALL SELECT 'max_multiplicity', 'error',
       |    (SELECT COUNT(*) FROM kinds WHERE kind = 'Relationship' AND maxmult < 1)
       |  UNION ALL SELECT 'duplicate_rel_property', 'error',
       |    (SELECT COALESCE(SUM(cc), 0) FROM (SELECT COUNT(*) - COUNT(DISTINCT pname) AS cc
       |       FROM relprops GROUP BY dtmi, relname) x)
       |  UNION ALL SELECT 'component_schema_not_found', 'error',
       |    (SELECT COUNT(*) FROM kinds WHERE kind = 'Component'
       |       AND schema IS NOT NULL AND schema NOT IN (SELECT dtmi FROM iface))
       |  UNION ALL SELECT 'schema_missing_id', 'error',
       |    (SELECT COUNT(*) FROM schemadefs WHERE sid IS NULL)
       |  UNION ALL SELECT 'display_name_too_long', 'error',
       |    (SELECT COUNT(*) FROM iface
       |       WHERE length(json_extract_string(node, '$$.displayName')) > 512)
       |  UNION ALL SELECT 'description_too_long', 'warning',
       |    (SELECT COUNT(*) FROM iface
       |       WHERE length(json_extract_string(node, '$$.description')) > 512)
       |  UNION ALL SELECT 'orphaned_rel_target', 'warning',
       |    (SELECT COUNT(DISTINCT target) FROM kinds WHERE kind = 'Relationship'
       |       AND target IS NOT NULL AND target NOT IN (SELECT dtmi FROM iface))
       |  UNION ALL SELECT 'missing_component_schema', 'warning',
       |    (SELECT COUNT(DISTINCT schema) FROM kinds WHERE kind = 'Component'
       |       AND schema NOT IN (SELECT dtmi FROM iface)))
       |SELECT category, severity, CAST(n AS BIGINT) AS n FROM issues
       |WHERE n > 0 ORDER BY category, severity""".stripMargin

  private val cdmSupportedTypesSql: String =
    (CdmTypeMapper.primitives.keySet ++ CdmTypeMapper.semantics.keySet)
      .map(_.toLowerCase).toSeq.sorted.map(t => s"'$t'").mkString(", ")
  private val cdmReservedSql: String =
    CdmValidator.ReservedNames.toSeq.sorted.map(n => s"'$n'").mkString(", ")
  private val cdmVersionsSql: String =
    CdmValidator.SupportedCdmVersions.toSeq.sorted.map(v => s"'$v'").mkString(", ")
  private val cdmPkTraitsSql = "'means.identity.entityId', 'is.identifiedBy'"

  /** Independent re-derivation of every CDM validator family from the raw
    * manifest JSON.
    */
  private val cdmValidateOracle: String =
    s"""WITH m(j) AS (VALUES (${sqlStr(cdmValidationFixture)}::JSON)),
       |ent AS (SELECT i,
       |    json_extract_string(j, '$$.entities[' || i || '].entityName') AS entity,
       |    COALESCE(json_extract_string(j,
       |      '$$.entities[' || i || '].extendsEntity'), '') AS ext,
       |    json_extract(j, '$$.entities[' || i || ']') AS node
       |  FROM m, unnest(generate_series(0, CAST(json_array_length(j,
       |    '$$.entities') AS INTEGER) - 1)) AS t(i)),
       |attr AS (SELECT e.i AS ei, e.entity,
       |    json_extract_string(e.node, '$$.hasAttributes[' || k || '].name') AS attr,
       |    json_extract_string(e.node, '$$.hasAttributes[' || k || '].dataType') AS data_type,
       |    COALESCE(json_extract_string(e.node,
       |      '$$.hasAttributes[' || k || '].appliedTraits[0]'), '') AS trait0,
       |    TRY_CAST(json_extract_string(e.node,
       |      '$$.hasAttributes[' || k || '].maximumLength') AS BIGINT) AS maxlen
       |  FROM ent e, unnest(generate_series(0, CAST(COALESCE(json_array_length(
       |    e.node, '$$.hasAttributes'), 0) AS INTEGER) - 1)) AS t(k)),
       |relx AS (SELECT
       |    COALESCE(json_extract_string(j, '$$.relationships[' || i || '].fromEntity'), '') AS fe,
       |    COALESCE(json_extract_string(j, '$$.relationships[' || i || '].toEntity'), '') AS te,
       |    json_extract_string(j, '$$.relationships[' || i || '].name') AS rname
       |  FROM m, unnest(generate_series(0, CAST(COALESCE(json_array_length(j,
       |    '$$.relationships'), 0) AS INTEGER) - 1)) AS t(i)),
       |relnames AS (SELECT COALESCE(rname,
       |    regexp_extract(regexp_extract(fe, '([^/]*)$$', 1), '^([^.]*)', 1)
       |      || '_to_' ||
       |    regexp_extract(regexp_extract(te, '([^/]*)$$', 1), '^([^.]*)', 1)) AS rn
       |  FROM relx),
       |names(nm) AS (
       |  SELECT entity FROM ent
       |  UNION ALL SELECT attr FROM attr WHERE attr IS NOT NULL AND attr <> ''
       |  UNION ALL SELECT rn FROM relnames WHERE rn <> ''),
       |issues(category, severity, n) AS (
       |  SELECT 'missing_required', 'warning',
       |    (SELECT CASE WHEN COALESCE(json_extract_string(j, '$$.manifestName'), '') = ''
       |       THEN 1 ELSE 0 END FROM m)
       |    + (SELECT COUNT(*) FROM attr WHERE data_type IS NULL OR data_type = '')
       |  UNION ALL SELECT 'unsupported_construct', 'info',
       |    (SELECT CASE WHEN COALESCE(json_extract_string(j,
       |       '$$.jsonSchemaSemanticVersion'), '1.0.0')
       |       NOT IN ($cdmVersionsSql) THEN 1 ELSE 0 END FROM m)
       |  UNION ALL SELECT 'unsupported_construct', 'warning',
       |    (SELECT COUNT(*) FROM attr WHERE data_type IS NOT NULL AND data_type <> ''
       |       AND lower(data_type) NOT IN ($cdmSupportedTypesSql)
       |       AND lower(data_type) NOT IN ('entity', 'entityid', 'entityreference'))
       |  UNION ALL SELECT 'conversion_limitation', 'info',
       |    (SELECT COUNT(*) FROM attr
       |       WHERE lower(COALESCE(data_type, '')) IN ('entity', 'entityid', 'entityreference')
       |         AND lower(data_type) NOT IN ($cdmSupportedTypesSql))
       |  UNION ALL SELECT 'name_conflict', 'error',
       |    (SELECT COUNT(*) - COUNT(DISTINCT entity) FROM ent)
       |    + (SELECT COALESCE(SUM(c), 0) FROM
       |        (SELECT COUNT(*) - COUNT(DISTINCT attr) AS c FROM attr GROUP BY ei) x)
       |  UNION ALL SELECT 'name_conflict', 'info',
       |    (SELECT COUNT(*) FROM names WHERE lower(nm) IN ($cdmReservedSql))
       |  UNION ALL SELECT 'name_too_long', 'error',
       |    (SELECT COUNT(*) FROM names WHERE length(nm) > 100)
       |  UNION ALL SELECT 'invalid_character', 'warning',
       |    (SELECT COUNT(*) FROM names
       |       WHERE NOT regexp_matches(substr(nm, 1, 1), '[A-Za-z_]'))
       |    + (SELECT COUNT(*) FROM names WHERE nm LIKE '% %')
       |  UNION ALL SELECT 'circular_reference', 'error',
       |    (SELECT COUNT(*) FROM ent WHERE ext <> '' AND ext = entity)
       |  UNION ALL SELECT 'external_dependency', 'info',
       |    (SELECT COUNT(*) FROM ent WHERE ext <> '' AND ext <> entity)
       |  UNION ALL SELECT 'constraint_violation', 'warning',
       |    (SELECT COUNT(*) FROM attr WHERE maxlen IS NOT NULL
       |       AND (maxlen <= 0 OR maxlen > 1073741824))
       |  UNION ALL SELECT 'missing_required', 'info',
       |    (SELECT COUNT(*) FROM ent e2
       |       WHERE NOT EXISTS (SELECT 1 FROM attr a WHERE a.ei = e2.i))
       |    + (SELECT COUNT(*) FROM ent e2
       |       WHERE EXISTS (SELECT 1 FROM attr a WHERE a.ei = e2.i)
       |         AND NOT EXISTS (SELECT 1 FROM attr a WHERE a.ei = e2.i
       |           AND a.trait0 IN ($cdmPkTraitsSql)))
       |  UNION ALL SELECT 'missing_required', 'error',
       |    (SELECT COUNT(*) FROM relx WHERE fe = '')
       |    + (SELECT COUNT(*) FROM relx WHERE te = '')
       |  UNION ALL SELECT 'invalid_reference', 'info',
       |    (SELECT COUNT(*) FROM relx WHERE fe <> ''
       |       AND regexp_extract(fe, '([^/]*)$$', 1) NOT IN (SELECT entity FROM ent))
       |    + (SELECT COUNT(*) FROM relx WHERE te <> ''
       |       AND regexp_extract(te, '([^/]*)$$', 1) NOT IN (SELECT entity FROM ent)))
       |SELECT category, severity, CAST(n AS BIGINT) AS n FROM issues
       |WHERE n > 0 ORDER BY category, severity""".stripMargin

  val oracles: Map[String, String] = Map(
    "dtdl_validate" -> dtdlValidateOracle,
    "cdm_validate" -> cdmValidateOracle,
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
         |FROM flat
         |WHERE lower(COALESCE(data_type, '')) NOT IN ('entity', 'entityreference')
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
