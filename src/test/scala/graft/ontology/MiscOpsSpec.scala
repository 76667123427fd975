package graft.ontology

import graft.SparkSpec
import graft.rdf.TurtleParser
import java.nio.file.{Files, Paths}

class MiscOpsSpec extends SparkSpec {
  import spark.implicits._

  test("P6: ontology name from owl:Ontology label with O_ prefix and cap") {
    val ttl = """
@prefix owl: <http://www.w3.org/2002/07/owl#> .
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
<http://e.org/onto> a owl:Ontology ; rdfs:label "9 Supply-Chain Ontology!" .
"""
    val df = spark.createDataset(TurtleParser.parseTurtle(ttl)).toDF()
    // reference replaces non-alnum with '_' (rdf_converter.py:725)
    assert(OntologyName.extract(df) == "O_9_Supply_Chain_Ontology_")
  }

  test("P6: no label / no ontology subject -> ImportedOntology (rdf_converter.py:719)") {
    val noLabel = spark.createDataset(TurtleParser.parseTurtle(
      """@prefix owl: <http://www.w3.org/2002/07/owl#> .
        |<http://e.org/MyOnto> a owl:Ontology .""".stripMargin)).toDF()
    assert(OntologyName.extract(noLabel) == "ImportedOntology")
    val empty = spark.createDataset(Seq.empty[graft.model.Triple]).toDF()
    assert(OntologyName.extract(empty) == "ImportedOntology")
  }

  test("input validation: traversal, extension, id prefix (input.py)") {
    import InputValidation._
    assert(validatePath("/data/x.ttl", TtlExtensions).isRight)
    assert(validatePath("/data/../etc/passwd.ttl", TtlExtensions).isLeft)
    assert(validatePath("/data/x.exe", TtlExtensions).isLeft)
    assert(validatePath("/data/x.TTL", TtlExtensions).isRight) // case-folded
    assert(validateIdPrefix(1000000000000L).isRight)
    assert(validateIdPrefix(42L).isLeft)
  }

  test("D3: directory batch conversion unions results and merges stats") {
    val dir = Files.createTempDirectory("batch")
    Files.writeString(dir.resolve("a.ttl"), Fixtures.SimpleTtl)
    Files.writeString(dir.resolve("b.ttl"), Fixtures.InheritanceTtl)
    Files.writeString(dir.resolve("ignored.txt"), "junk")
    val res = BatchConvert.convertDirectory(spark, dir.toString)
    // a: Person+Organization, b: Animal+Mammal+Dog
    assert(res.stats.entityTypes == 5)
    assert(res.stats.relationshipTypes == 1) // worksFor
    assert(res.stats.successRate == 1.0)
  }
}
