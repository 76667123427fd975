package graft.cdm

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** V-CDM validator (`cdm_validator.py:72-548`), full type table golden
  * test (`cdm_type_mapper.py:50-210, 371-395`), and S5 sub-manifest
  * recursion (`cdm_parser.py:287-303, 634-720`).
  */
class CdmValidatorSpec extends AnyFunSuite {

  test("clean manifest: only the inheritance info fires") {
    val m = CdmParser.parse("""{
      "manifestName": "clean", "jsonSchemaSemanticVersion": "1.1.0",
      "entities": [
        {"entityName": "Base", "hasAttributes": [
          {"name": "baseId", "dataType": "integer",
           "appliedTraits": ["means.identity.entityId"]}]},
        {"entityName": "Derived", "extendsEntity": "Base", "hasAttributes": [
          {"name": "extra", "dataType": "string",
           "appliedTraits": ["is.identifiedBy"]}]}
      ]
    }""")
    val issues = CdmValidator.validate(m)
    assert(issues.map(_.category) == Seq("external_dependency"))
    assert(CdmValidator.isValid(issues))
  }

  test("self-extension is an error; unknown version an info") {
    val m = CdmParser.parse("""{
      "manifestName": "x", "jsonSchemaSemanticVersion": "0.1.0",
      "entities": [{"entityName": "Loop", "extendsEntity": "Loop",
        "hasAttributes": [{"name": "a", "dataType": "string"}]}]
    }""")
    val issues = CdmValidator.validate(m)
    assert(issues.exists(i =>
      i.category == "circular_reference" && i.severity == "error"))
    assert(issues.exists(i =>
      i.category == "unsupported_construct" && i.severity == "info"))
    assert(!CdmValidator.isValid(issues))
  }

  test("full semantic type table matches the reference entry-by-entry") {
    // golden: every entry of CDM_SEMANTIC_TYPE_MAPPINGS
    // (cdm_type_mapper.py:112-210) — 70 entries
    val bigint = Seq("year", "month", "day", "week", "quarter", "fiscalYear",
      "fiscalMonth", "fiscalQuarter", "age", "duration", "count", "quantity",
      "sequence", "ordinal", "statusCode", "stateCode", "versionNumber",
      "fileSize")
    val double = Seq("latitude", "longitude", "distance", "weight", "height",
      "area", "volume", "temperature", "percentage", "probability")
    val decimal = Seq("currency", "baseCurrency", "exchangeRate", "amount",
      "price", "tax", "discount")
    val string = Seq("name", "fullName", "firstName", "lastName", "middleName",
      "email", "phone", "phoneNumber", "fax", "url", "uri", "webAddress",
      "ipAddress", "ipV4Address", "ipV6Address", "address", "city",
      "stateOrProvince", "country", "postalCode", "county", "languageTag",
      "locale", "cultureTag", "timezone", "currencyCode", "colorName",
      "colorValue", "fileName", "filePath", "mimeType", "code",
      "tickerSymbol", "accountCode", "productCode", "transactionCode",
      "referenceCode")
    for (t <- bigint) assert(CdmTypeMapper.semantics(t) == "BigInt", t)
    for (t <- double) assert(CdmTypeMapper.semantics(t) == "Double", t)
    for (t <- decimal) assert(CdmTypeMapper.semantics(t) == "Decimal", t)
    for (t <- string) assert(CdmTypeMapper.semantics(t) == "String", t)
    assert(CdmTypeMapper.semantics.size ==
      bigint.size + double.size + decimal.size + string.size)
    // 36-entry primitive table + 13-entry trait table sizes
    assert(CdmTypeMapper.primitives.size == 37)
    assert(CdmTypeMapper.traitTypes.size == 13)
    // case-insensitive matching (map_type lowers both sides)
    def ft(dt: String) = CdmTypeMapper.fabricType(
      CdmAttribute("a", Some(dt), Nil, None, None))
    assert(ft("STRING") == "String")
    assert(ft("DateTime") == "DateTime")
    assert(ft("FISCALYEAR") == "BigInt")
    assert(ft("Money") == "Decimal")
    assert(ft("nonsense") == "String") // default
  }

  test("P7 skip set matches the converter: {entity, entityreference} only") {
    assert(CdmTypeMapper.isEntityReference(Some("entity")))
    assert(CdmTypeMapper.isEntityReference(Some("Entity")))
    assert(CdmTypeMapper.isEntityReference(Some("entityReference")))
    // entityId/entityName are NOT skipped by the converter
    // (cdm_converter.py:296 checks only entity|entityreference)
    assert(!CdmTypeMapper.isEntityReference(Some("entityId")))
    assert(!CdmTypeMapper.isEntityReference(Some("entityName")))
  }

  test("S5: sub-manifest recursion merges nested folders with cycle guard") {
    val dir = Files.createTempDirectory("cdmfolder")
    val sub = Files.createDirectory(dir.resolve("Sales"))
    // entity file referenced from the root manifest via corpus path
    Files.writeString(dir.resolve("Customer.cdm.json"), """{
      "definitions": [{"entityName": "Customer", "hasAttributes": [
        {"name": "customerId", "dataType": "integer",
         "appliedTraits": ["means.identity.entityId"]},
        {"name": "fullName", "dataType": "string"}
      ]}]
    }""")
    Files.writeString(sub.resolve("Order.cdm.json"), """{
      "definitions": [{"entityName": "Order", "hasAttributes": [
        {"name": "orderId", "dataType": "int64"}
      ]}]
    }""")
    // nested manifest points BACK at the root (cycle) plus its own entity
    Files.writeString(sub.resolve("sales.manifest.cdm.json"), """{
      "manifestName": "sales",
      "entities": [
        {"type": "LocalEntity", "entityName": "Order",
         "entityPath": "Order.cdm.json/Order"}
      ],
      "relationships": [
        {"fromEntity": "Order.cdm.json/Order", "fromEntityAttribute": "customerId",
         "toEntity": "../Customer.cdm.json/Customer", "toEntityAttribute": "customerId"}
      ],
      "subManifests": ["../root.manifest.cdm.json"]
    }""")
    Files.writeString(dir.resolve("root.manifest.cdm.json"), """{
      "manifestName": "root",
      "entities": [
        {"type": "LocalEntity", "entityName": "Customer",
         "entityPath": "Customer.cdm.json/Customer"}
      ],
      "subManifests": [{"manifestPath": "Sales/sales.manifest.cdm.json"}]
    }""")

    val merged = CdmFolder.parse(dir.resolve("root.manifest.cdm.json").toString)
    assert(merged.name == "root")
    // both entities present, each resolved from its file (attrs loaded)
    assert(merged.entities.map(_.name).sorted == Seq("Customer", "Order"))
    assert(merged.entities.forall(_.attributes.nonEmpty))
    assert(merged.relationships.size == 1)
    // cycle guard: the sub-manifest's pointer back at root adds nothing
    assert(merged.entities.size == 2)
    // and the merged manifest converts end-to-end
    val res = CdmConverter.convert(merged)
    assert(res.entities.size == 2 && res.rels.size == 1)
  }

  test("S5: diamond sub-manifests parse the shared manifest once") {
    // root → {a, b} → shared: before threading the visited set through the
    // sibling fold, `shared` was parsed under both a and b, duplicating
    // Customer and tripping a spurious duplicate-entity-name error
    val dir = Files.createTempDirectory("cdmdiamond")
    Files.writeString(dir.resolve("Customer.cdm.json"), """{
      "definitions": [{"entityName": "Customer", "hasAttributes": [
        {"name": "customerId", "dataType": "integer"}
      ]}]
    }""")
    Files.writeString(dir.resolve("shared.manifest.cdm.json"), """{
      "manifestName": "shared",
      "entities": [
        {"type": "LocalEntity", "entityName": "Customer",
         "entityPath": "Customer.cdm.json/Customer"}
      ]
    }""")
    Files.writeString(dir.resolve("a.manifest.cdm.json"), """{
      "manifestName": "a", "entities": [],
      "subManifests": ["shared.manifest.cdm.json"]
    }""")
    Files.writeString(dir.resolve("b.manifest.cdm.json"), """{
      "manifestName": "b", "entities": [],
      "subManifests": ["shared.manifest.cdm.json"]
    }""")
    Files.writeString(dir.resolve("root.manifest.cdm.json"), """{
      "manifestName": "root", "entities": [],
      "subManifests": ["a.manifest.cdm.json", "b.manifest.cdm.json"]
    }""")
    val merged = CdmFolder.parse(dir.resolve("root.manifest.cdm.json").toString)
    assert(merged.entities.map(_.name) == Seq("Customer"))
    // no duplicate-entity-name error from the validator on the merged result
    val issues = CdmValidator.validate(merged)
    assert(!issues.exists(i =>
      i.category == "name_conflict" && i.severity == "error"))
  }
}
