package graft.cli

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** CLI validate routing: DTDL / CDM / RDF by extension (reference
  * `src/main.py` command map + per-format validators).
  */
class CliValidateSpec extends AnyFunSuite {

  private def captureOut(body: => Unit): String = {
    val bos = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(bos))(body)
    bos.toString("UTF-8")
  }

  test("validate routes .dtdl to DtdlValidator") {
    val f = Files.createTempFile("model", ".dtdl")
    Files.writeString(f, """{"@id": "dtmi:ex:Loop;1", "@type": "Interface",
      "@context": "dtmi:dtdl:context;3", "extends": ["dtmi:ex:Loop;1"]}""")
    val out = captureOut(Main.main(Array("validate", f.toString)))
    assert(out.contains("self_extends"))
    assert(out.contains("valid: no"))
  }

  test("validate routes .manifest.cdm.json through CdmFolder to CdmValidator") {
    val dir = Files.createTempDirectory("cdmcli")
    val f = dir.resolve("root.manifest.cdm.json")
    Files.writeString(f, """{"manifestName": "m", "entities": [
      {"entityName": "Self", "extendsEntity": "Self",
       "hasAttributes": [{"name": "a", "dataType": "string"}]}]}""")
    val out = captureOut(Main.main(Array("validate", f.toString)))
    assert(out.contains("circular_reference"))
    assert(out.contains("valid: no"))
  }
}

/** S6 simple-format dialect through the CLI export path. */
class CliSimpleFormatSpec extends graft.SparkSpec {
  test("export converts a simple-format definition; output matches the API twin") {
    spark // force shared session so Main reuses it
    val dir = Files.createTempDirectory("simplefmt")
    val simpleIn = dir.resolve("simple.json")
    Files.writeString(simpleIn, """{"definition": {"parts": [
      {"type": "EntityType", "id": "e1", "displayName": "Customer"},
      {"type": "EntityType", "id": "e2", "name": "Supplier",
       "baseEntityType": "e1"},
      {"type": "Property", "id": "p1", "parentEntity": "e1",
       "displayName": "custId", "dataType": "BigInt"},
      {"type": "Relationship", "id": "r1", "displayName": "suppliedBy",
       "fromEntity": "e1", "toEntity": "e2"}
    ]}}""")
    val simpleOut = dir.resolve("simple.nt")
    Main.main(Array("export", simpleIn.toString, simpleOut.toString))
    val nt = Files.readString(simpleOut)
    assert(nt.nonEmpty, "simple-format export must not be empty")

    // API-format twin of the same definition exports identically
    import graft.sink.FabricParts._
    val twinParts = Seq(
      Part("EntityTypes/e1/definition.json", b64(render(JObj(Seq(
        "id" -> JStr("e1"), "name" -> JStr("Customer"),
        "baseEntityTypeId" -> JNull,
        "properties" -> JArr(Seq(JObj(Seq("id" -> JStr("p1"),
          "name" -> JStr("custId"), "valueType" -> JStr("BigInt")))))))))),
      Part("EntityTypes/e2/definition.json", b64(render(JObj(Seq(
        "id" -> JStr("e2"), "name" -> JStr("Supplier"),
        "baseEntityTypeId" -> JStr("e1")))))),
      Part("RelationshipTypes/r1/definition.json", b64(render(JObj(Seq(
        "id" -> JStr("r1"), "name" -> JStr("suppliedBy"),
        "source" -> JObj(Seq("entityTypeId" -> JStr("e1"))),
        "target" -> JObj(Seq("entityTypeId" -> JStr("e2")))))))))
    val twinIn = dir.resolve("twin.json")
    Files.writeString(twinIn, render(JObj(Seq("parts" -> JArr(twinParts.map(p =>
      JObj(Seq("path" -> JStr(p.path), "payload" -> JStr(p.payload),
        "payloadType" -> JStr(p.payloadType)))))))))
    val twinOut = dir.resolve("twin.nt")
    Main.main(Array("export", twinIn.toString, twinOut.toString))
    assert(nt == Files.readString(twinOut),
      "simple-format and API-format exports must be byte-identical")
  }
}

/** D2 round-trip `test` command end-to-end. */
class CliRoundTripSpec extends graft.SparkSpec {
  test("test command: reference supply-chain sample round-trips PASS") {
    val sample = "/root/reference/samples/rdf/sample_supply_chain_ontology.ttl"
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(sample)))
    val bos = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(bos))(
      Main.main(Array("test", sample)))
    val out = bos.toString("UTF-8")
    assert(out.contains("round-trip: PASS"), out)
    assert(out.contains("precision=1.0000 recall=1.0000"), out)
  }
}
