package graft.plugins

import graft.SparkSpec
import graft.ontology.Fixtures

class PluginSpec extends SparkSpec {
  test("extension routing: longest suffix wins (manager.py extension map)") {
    val r = PluginRegistry.default
    assert(r.byExtension("/x/onto.ttl").map(_.formatName).contains("rdf"))
    assert(r.byExtension("/x/model.dtdl").map(_.formatName).contains("dtdl"))
    assert(r.byExtension("/x/thing.json").map(_.formatName).contains("dtdl"))
    assert(r.byExtension("/x/sales.manifest.cdm.json").map(_.formatName).contains("cdm"))
    assert(r.byExtension("/x/e.cdm.json").map(_.formatName).contains("cdm"))
    assert(r.byExtension("/x/readme.md").isEmpty)
  }

  test("plugins convert through the shared output contract") {
    val rdf = PluginRegistry.default.byFormat("rdf").get
    val (e, r, s) = rdf.convert(spark, Fixtures.SimpleTtl, "ttl")
    assert(e.count() == 2 && r.count() == 1 && s.count() == 0)

    val dtdl = PluginRegistry.default.byFormat("dtdl").get
    val (e2, _, _) = dtdl.convert(spark,
      """{"@id": "dtmi:ex:T;1", "@type": "Interface",
        |"contents": [{"@type": "Property", "name": "id", "schema": "string"}]}""".stripMargin,
      "json")
    assert(e2.count() == 1)

    val cdm = PluginRegistry.default.byFormat("cdm").get
    val (e3, _, _) = cdm.convert(spark,
      """{"entities": [{"entityName": "A", "hasAttributes": [
        |{"name": "aId", "dataType": "integer"}]}], "relationships": []}""".stripMargin,
      "cdm.json")
    assert(e3.count() == 1)
  }

  test("registry extension is immutable (no singleton mutation)") {
    val custom = new FormatPlugin {
      val formatName = "custom"
      val fileExtensions = Set(".cst")
      def convert(spark: org.apache.spark.sql.SparkSession, c: String, f: String) =
        throw new UnsupportedOperationException
    }
    val extended = PluginRegistry.default.withPlugin(custom)
    assert(extended.byFormat("custom").isDefined)
    assert(PluginRegistry.default.byFormat("custom").isEmpty)
  }
}

/** X1 — per-type value-converter registry (type_registry.py:41-445). */
class TypeRegistrySpec extends org.scalatest.funsuite.AnyFunSuite {
  import TypeRegistry._

  test("global registry pre-seeds rdf/dtdl/cdm tables") {
    val xsd = "http://www.w3.org/2001/XMLSchema#"
    assert(global.getFabricType("rdf", xsd + "integer") == "BigInt")
    assert(global.getFabricType("RDF", xsd + "decimal") == "Double") // case-insens format
    assert(global.getFabricType("dtdl", "scaledDecimal") == "String")
    assert(global.getFabricType("cdm", "money") == "Decimal")
    assert(global.getFabricType("rdf", "unknown:type") == "String") // default
    assert(global.getFabricType("rdf", "unknown:type", Some("Double")) == "Double")
    assert(global.listFormats == Seq("cdm", "dtdl", "rdf"))
  }

  test("value converters, aliases, precision-loss (type_registry.py:237-260)") {
    val r = new Registry()
    r.registerMapping("custom", "epochMillis", "DateTime",
      converter = Some(v => new java.sql.Timestamp(v.asInstanceOf[Long])),
      precisionLoss = false)
    r.registerMapping("custom", "float16", "Double",
      notes = "half precision widens", precisionLoss = true)
    r.registerAlias("custom", "ts", "epochMillis")
    // converter runs on lookup, alias resolves to canonical
    assert(r.convertValue("custom", "ts", 1000L) ==
      new java.sql.Timestamp(1000L))
    assert(r.getFabricType("custom", "ts") == "DateTime")
    // unregistered types pass values through unchanged
    assert(r.convertValue("custom", "other", "x") == "x")
    assert(r.precisionLossTypes("custom") == Seq("float16"))
    assert(r.listMappings("custom").keySet == Set("epochMillis", "float16"))
    // invalid fabric type rejected
    intercept[IllegalArgumentException] {
      r.registerMapping("custom", "bad", "Float128")
    }
  }

  test("resolve_union_type hierarchy (type_registry.py:410-445)") {
    assert(resolveUnionType(Nil) == "String")
    assert(resolveUnionType(Seq("BigInt")) == "BigInt")
    assert(resolveUnionType(Seq("int", "long")) == "BigInt")
    assert(resolveUnionType(Seq("float", "double", "decimal")) == "Double")
    assert(resolveUnionType(Seq("BigInt", "Double")) == "String") // mixed
  }
}
