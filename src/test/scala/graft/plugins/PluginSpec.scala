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
