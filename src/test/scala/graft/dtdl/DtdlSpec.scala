package graft.dtdl

import org.scalatest.funsuite.AnyFunSuite
import DtdlConverter._

class DtdlSpec extends AnyFunSuite {

  private val thermostat = """{
    "@id": "dtmi:com:example:Thermostat;1",
    "@type": "Interface",
    "@context": "dtmi:dtdl:context;3",
    "displayName": "Thermostat",
    "contents": [
      {"@type": "Property", "name": "deviceId", "schema": "string"},
      {"@type": ["Property", "Temperature"], "name": "targetTemp",
       "schema": "double", "unit": "degreeCelsius"},
      {"@type": "Telemetry", "name": "temperature", "schema": "double"},
      {"@type": "Relationship", "name": "controls",
       "target": "dtmi:com:example:Room;1"},
      {"@type": "Command", "name": "reboot",
       "request": {"name": "delay", "schema": "integer"}}
    ]
  }"""

  private val room = """{
    "@id": "dtmi:com:example:Room;1",
    "@type": "Interface",
    "@context": "dtmi:dtdl:context;2",
    "contents": [
      {"@type": "Property", "name": "roomName", "schema": "string"}
    ]
  }"""

  test("S3: parse single interface, array, and @graph forms") {
    assert(DtdlParser.parse(thermostat).size == 1)
    assert(DtdlParser.parse(s"[$thermostat, $room]").size == 2)
    assert(DtdlParser.parse(s"""{"@graph": [$thermostat, $room]}""").size == 2)
  }

  test("S4: semantic type capture — kind vs annotations (dtdl_parser.py:403-412)") {
    val i = DtdlParser.parse(thermostat).head
    val target = i.properties.find(_.name == "targetTemp").get
    assert(target.kind == "Property")
    assert(target.semanticTypes == Seq("Temperature"))
    assert(target.unit.contains("degreeCelsius"))
  }

  test("F7/F9: DTMI validation and name extraction") {
    assert(DtdlInterface.isValidDtmi("dtmi:com:example:Thermostat;1"))
    assert(!DtdlInterface.isValidDtmi("com:example:NoScheme"))
    assert(!DtdlInterface.isValidDtmi("dtmi:bad..segment;1"))
    assert(DtdlInterface.dtmiToName("dtmi:com:example:Thermostat;1") == "Thermostat")
  }

  test("conversion: properties, telemetry→timeseries, K5 display, K4 id parts") {
    val ifaces = DtdlParser.parse(s"[$thermostat, $room]")
    val res = convert(ifaces, commandMode = CommandMode.Skip)
    val t = res.entities.find(_.name == "Thermostat").get
    assert(t.id == graft.ontology.Ids.entityId("com:example:Thermostat"))
    assert(t.properties.map(_.name).toSet == Set("deviceId", "targetTemp"))
    assert(t.timeseriesProperties.map(_.name) == Seq("temperature"))
    // K4: deviceId matches the 'id' pattern with a valid type
    val deviceId = t.properties.find(_.name == "deviceId").get
    assert(t.entityIdParts == Seq(deviceId.id))
    // K5: first String property is display name
    assert(t.displayNamePropertyId.contains(deviceId.id))
    // J5: relationship resolves target id
    val rel = res.rels.find(_.name == "controls").get
    assert(rel.dstEntityTypeId == graft.ontology.Ids.entityId("com:example:Room"))
  }

  test("J8: ancestor property type conflict renames to name_{type}") {
    val parent = """{"@id": "dtmi:ex:Base;1", "@type": "Interface",
      "contents": [{"@type": "Property", "name": "code", "schema": "string"}]}"""
    val child = """{"@id": "dtmi:ex:Child;1", "@type": "Interface",
      "extends": ["dtmi:ex:Base;1"],
      "contents": [{"@type": "Property", "name": "code", "schema": "integer"}]}"""
    val res = convert(DtdlParser.parse(s"[$parent, $child]"))
    val c = res.entities.find(_.uri == "dtmi:ex:Child;1").get
    assert(c.properties.map(_.name) == Seq("code_bigint"))
    assert(c.baseEntityTypeId.contains(fabricId("dtmi:ex:Base;1")))
  }

  test("G6 SEPARATE: component to known interface = relationship only; external = stub") {
    val withComp = """{"@id": "dtmi:ex:Device;1", "@type": "Interface",
      "contents": [
        {"@type": "Component", "name": "screen", "schema": "dtmi:com:example:Room;1"},
        {"@type": "Component", "name": "gps", "schema": "dtmi:external:Gps;1"}
      ]}"""
    val res = convert(DtdlParser.parse(s"[$withComp, $room]"),
      componentMode = ComponentMode.Separate)
    assert(res.rels.map(_.name).toSet == Set("has_screen", "has_gps"))
    // stub created only for the external schema
    val stub = res.entities.find(_.uri == "dtmi:external:Gps;1")
    assert(stub.isDefined)
    assert(stub.get.name == "gps_Gps")
    assert(stub.get.properties.map(_.name) == Seq("componentId"))
    assert(!res.entities.exists(e => e.uri == "dtmi:com:example:Room;1" &&
      e.properties.map(_.name) == Seq("componentId")))
  }

  test("G6 FLATTEN: component properties prefixed into parent") {
    val withComp = """{"@id": "dtmi:ex:Device;1", "@type": "Interface",
      "contents": [
        {"@type": "Component", "name": "screen", "schema": "dtmi:com:example:Room;1"}
      ]}"""
    val res = convert(DtdlParser.parse(s"[$withComp, $room]"),
      componentMode = ComponentMode.Flatten)
    val d = res.entities.find(_.uri == "dtmi:ex:Device;1").get
    assert(d.properties.map(_.name) == Seq("screen_roomName"))
    assert(res.rels.isEmpty)
  }

  test("command modes: PROPERTY adds string prop; ENTITY creates Command_ entity + rel") {
    val ifaces = DtdlParser.parse(thermostat)
    val asProp = convert(ifaces, commandMode = CommandMode.Property)
    assert(asProp.entities.head.properties.exists(_.name == "command_reboot"))
    val asEntity = convert(ifaces, commandMode = CommandMode.Entity)
    val cmd = asEntity.entities.find(_.name == "Command_reboot").get
    assert(cmd.properties.map(_.name).contains("commandName"))
    assert(cmd.properties.map(_.name).contains("requestSchema"))
    assert(asEntity.rels.exists(_.name == "supports_reboot"))
  }

  test("G7 scaledDecimal modes (dtdl_converter.py:114-160, 597-612)") {
    val v4 = """{"@id": "dtmi:ex:Meter;1", "@type": "Interface",
      "@context": "dtmi:dtdl:context;4",
      "contents": [{"@type": "Property", "name": "energy", "schema": "scaledDecimal"}]}"""
    val ifaces = DtdlParser.parse(v4)
    assert(convert(ifaces, sdMode = ScaledDecimalMode.JsonString)
      .entities.head.properties.map(p => (p.name, p.valueType)) ==
      Seq(("energy", "String")))
    assert(convert(ifaces, sdMode = ScaledDecimalMode.Calculated)
      .entities.head.properties.head.valueType == "Double")
    val structured = convert(ifaces, sdMode = ScaledDecimalMode.Structured)
      .entities.head.properties.map(p => (p.name, p.valueType))
    assert(structured == Seq(("energy", "String"),
      ("energy_scale", "BigInt"), ("energy_value", "String")))
    // F11 arithmetic
    assert(scaledDecimalValue(7, "1234.56") == 1234.56 * 1e7)
    assert(scaledDecimalValue(2, "oops").isNaN)
  }

  test("external extends becomes root entity (dtdl_converter.py:541-552)") {
    val orphan = """{"@id": "dtmi:ex:Orphan;1", "@type": "Interface",
      "extends": ["dtmi:not:here;1"], "contents": []}"""
    val res = convert(DtdlParser.parse(orphan))
    assert(res.entities.head.baseEntityTypeId.isEmpty)
  }
}

class CdmSpec extends AnyFunSuite {
  import graft.cdm._

  private val manifest = """{
    "manifestName": "sales",
    "entities": [
      {"entityName": "Customer", "hasAttributes": [
        {"name": "customerId", "dataType": "integer",
         "appliedTraits": ["means.identity.entityId"]},
        {"name": "fullName", "dataType": "string",
         "appliedTraits": ["means.identity.name"]},
        {"name": "balance", "dataType": "money"},
        {"name": "parentAccount", "dataType": "entity"}
      ]},
      {"entityName": "PremiumCustomer", "extendsEntity": "Customer",
       "hasAttributes": [
        {"name": "tier", "dataType": "string"},
        {"name": "balance", "dataType": "decimal"}
      ]},
      {"entityName": "Order", "hasAttributes": [
        {"name": "orderId", "dataType": "integer"},
        {"name": "placedOn", "appliedTraits": ["is.dataFormat.date"]}
      ]}
    ],
    "relationships": [
      {"fromEntity": "Orders/Order.cdm.json/Order", "fromEntityAttribute": "customerId",
       "toEntity": "Customers/Customer.cdm.json/Customer", "toEntityAttribute": "customerId",
       "exhibitsTraits": [{"traitReference": "means.relationship.verbPhrase",
         "arguments": [{"value": "placedBy"}]}]}
    ]
  }"""

  test("S5: manifest parse — entities, traits, FK relationship with verb phrase") {
    val m = CdmParser.parse(manifest)
    assert(m.entities.map(_.name) == Seq("Customer", "PremiumCustomer", "Order"))
    assert(m.relationships.head.relationshipName == "placedBy")
    assert(m.relationships.head.fromEntityName == "Order")
  }

  test("K6: trait-driven primary key and display name") {
    val m = CdmParser.parse(manifest)
    val res = CdmConverter.convert(m)
    val c = res.entities.find(_.name == "Customer").get
    val byName = c.properties.map(p => p.name -> p.id).toMap
    assert(c.entityIdParts == Seq(byName("customerId")))
    assert(c.displayNamePropertyId.contains(byName("fullName")))
  }

  test("P7: entity-reference attributes dropped as scalars, recorded as skipped") {
    val res = CdmConverter.convert(CdmParser.parse(manifest))
    val c = res.entities.find(_.name == "Customer").get
    assert(!c.properties.exists(_.name == "parentAccount"))
    assert(res.skipped.exists(s => s.name == "parentAccount" &&
      s.itemType == "attribute"))
  }

  test("J9: inheritance flattening with child override") {
    val res = CdmConverter.convert(CdmParser.parse(manifest))
    val p = res.entities.find(_.name == "PremiumCustomer").get
    val types = p.properties.map(x => x.name -> x.valueType).toMap
    // inherited: customerId, fullName; own: tier; override: balance
    assert(types.keySet == Set("customerId", "fullName", "tier", "balance"))
    // Decimal is first-class in the CDM path (FabricValueType.DECIMAL,
    // cdm_type_mapper.py:43) — round-1's Double collapse was a divergence
    assert(types("balance") == "Decimal")
    assert(p.baseEntityTypeId.contains(CdmConverter.entityId("Customer")))
  }

  test("type mapping: primitives, semantic fallback to traits (cdm_type_mapper.py)") {
    val res = CdmConverter.convert(CdmParser.parse(manifest))
    val o = res.entities.find(_.name == "Order").get
    val types = o.properties.map(x => x.name -> x.valueType).toMap
    assert(types("orderId") == "BigInt")
    assert(types("placedOn") == "DateTime") // inferred from is.dataFormat.date
  }

  test("J5: FK relationship endpoints resolve to hash ids") {
    val res = CdmConverter.convert(CdmParser.parse(manifest))
    val r = res.rels.head
    assert(r.name == "placedBy")
    assert(r.srcEntityTypeId == CdmConverter.entityId("Order"))
    assert(r.dstEntityTypeId == CdmConverter.entityId("Customer"))
  }

  test("S5: legacy model.json dialect") {
    val modelJson = """{
      "name": "OrdersProducts", "version": "1.0",
      "entities": [
        {"$type": "LocalEntity", "name": "Product", "attributes": [
          {"name": "productId", "dataType": "int64"},
          {"name": "title", "dataType": "string"}
        ]}
      ],
      "relationships": [
        {"$type": "SingleKeyRelationship",
         "fromAttribute": {"entityName": "Order", "attributeName": "productId"},
         "toAttribute": {"entityName": "Product", "attributeName": "productId"}}
      ]
    }"""
    val m = CdmParser.parse(modelJson)
    assert(m.entities.map(_.name) == Seq("Product"))
    assert(m.relationships.head.relationshipName == "Order_to_Product")
  }
}
