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
