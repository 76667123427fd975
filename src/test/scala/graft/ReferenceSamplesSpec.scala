package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import graft.rdf.TurtleParser
import graft.ontology.Extract

/** North-rule parity evidence: run the engine over the reference's own
  * sample ontologies (read-only at /root/reference/samples/rdf) and assert
  * the reference test suite's expectations
  * (`tests/rdf/test_converter.py:376-518`). The reference itself cannot
  * execute in this sandbox (no rdflib), so its committed assertions are
  * the oracle.
  */
class ReferenceSamplesSpec extends SparkSpec {

  private val samplesDir = "/root/reference/samples/rdf"

  private def parse(name: String): DataFrame = {
    val content = Files.readString(Paths.get(samplesDir, name))
    import spark.implicits._
    spark.createDataset(TurtleParser.parseTurtle(content)).toDF()
      .localCheckpoint()
  }

  test("supply chain: 11 declared classes extract as entity types") {
    val (entities, _, _) = Extract.entityTypes(parse("sample_supply_chain_ontology.ttl"))
    val names = entities.collect().map(_.getAs[String]("name")).toSet
    assert(names.size >= 3) // reference asserts >= 3 entity parts
    assert(Set("Supplier", "Facility", "Warehouse", "Product").subsetOf(names),
      names.toString)
    // every entity row is well-formed (id, name, namespace contract)
    entities.collect().foreach { r =>
      assert(r.getAs[String]("id").nonEmpty && r.getAs[String]("name").nonEmpty)
    }
  }

  test("foaf: >=5 entity types; Person inherits from Agent") {
    val (entities, _, _) = Extract.entityTypes(parse("sample_foaf_ontology.ttl"))
    val rows = entities.collect()
    assert(rows.length >= 5)
    val person = rows.find(_.getAs[String]("name") == "Person")
    assert(person.isDefined)
    assert(person.get.getAs[String]("baseEntityTypeId") != null,
      "Person should inherit (subClassOf Agent)")
  }

  test("iot: Device entity with >=3 properties incl. deviceId/status") {
    val (entities, _, _) = Extract.entityTypes(parse("sample_iot_ontology.ttl"))
    val device = entities.collect().find(_.getAs[String]("name") == "Device")
    assert(device.isDefined, "Device entity type not found")
    val props = device.get
      .getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("properties")
      .map(_.getAs[String]("name"))
    assert(props.size >= 3, props.toString)
    assert(props.contains("deviceId") || props.contains("status"))
  }

  test("all sample .ttl files parse and extract without failure") {
    val ttls = Files.list(Paths.get(samplesDir)).iterator().asScala
      .map(_.getFileName.toString).filter(_.endsWith(".ttl")).toSeq.sorted
    assert(ttls.nonEmpty)
    val results = ttls.map { f =>
      try {
        val t = parse(f)
        val (entities, rels, _) = Extract.entityTypes(t)
        (f, "SUCCESS", entities.count() + rels.count())
      } catch {
        case e: Exception => (f, "FAILED", -1L)
      }
    }
    val failures = results.filter(_._2 == "FAILED")
    assert(failures.isEmpty, s"failed: ${failures.map(_._1)} of $results")
  }

  test("iot multi-serialization: 7 formats parse to extractable graphs (S1/S2)") {
    // note: the reference's per-format iot samples are sibling ontologies,
    // not byte-equal re-serializations (the .nt adds an Actuator class) —
    // so this checks structural extraction per format, not set equality
    for (f <- Seq("sample_iot_ontology.ttl", "sample_iot_ontology.nt",
      "sample_iot_ontology.n3", "sample_iot_ontology.nq",
      "sample_iot_ontology.trig", "sample_iot_ontology.jsonld",
      "sample_iot_ontology.rdf")) {
      val content = Files.readString(Paths.get(samplesDir, f))
      val fmt = f.substring(f.lastIndexOf('.') + 1)
      val triples = TurtleParser.parse(content, fmt)
      assert(triples.nonEmpty, f)
      import spark.implicits._
      val df = spark.createDataset(triples).toDF().localCheckpoint()
      val (entities, _, _) = Extract.entityTypes(df)
      val names = entities.collect().map(_.getAs[String]("name")).toSet
      assert(names.contains("Device"), s"$f: $names")
    }
  }

  test("named graphs: TriG blocks and N-Quads 4th term carry the graph column") {
    val trig = TurtleParser.parse(Files.readString(
      Paths.get(samplesDir, "sample_iot_ontology.trig")), "trig")
    assert(trig.exists(_.graph.isDefined), "TriG triples should be graph-tagged")
    val nq = TurtleParser.parse(Files.readString(
      Paths.get(samplesDir, "sample_iot_ontology.nq")), "nq")
    assert(nq.exists(_.graph.isDefined), "N-Quads triples should carry graphs")
  }

  test("S1: TriX dataset parses — uri/id/plain/typed terms, named graphs") {
    val trix = """<?xml version="1.0"?>
<TriX xmlns="http://www.w3.org/2004/03/trix/trix-1/">
  <graph>
    <uri>http://e.org/g1</uri>
    <triple>
      <uri>http://e.org/Device</uri>
      <uri>http://www.w3.org/1999/02/22-rdf-syntax-ns#type</uri>
      <uri>http://www.w3.org/2002/07/owl#Class</uri>
    </triple>
    <triple>
      <uri>http://e.org/Device</uri>
      <uri>http://www.w3.org/2000/01/rdf-schema#label</uri>
      <plainLiteral xml:lang="en">Device</plainLiteral>
    </triple>
  </graph>
  <graph>
    <triple>
      <id>b0</id>
      <uri>http://e.org/count</uri>
      <typedLiteral datatype="http://www.w3.org/2001/XMLSchema#integer">5</typedLiteral>
    </triple>
  </graph>
</TriX>"""
    val ts = TurtleParser.parse(trix, "trix")
    assert(ts.size == 3)
    assert(ts.head.graph.contains("http://e.org/g1"))
    val label = ts.find(_.p.endsWith("label")).get
    assert(label.lang.contains("en") && label.oKind == "literal")
    val cnt = ts.find(_.p.endsWith("count")).get
    assert(cnt.s == "_:b0" && cnt.oDatatype.exists(_.endsWith("integer")))
    assert(cnt.graph.isEmpty) // unnamed graph block = default graph
  }

  test("S1: HexTuples ND-JSON parses — globalId/localId/literal datatypes") {
    val hext =
      """["http://e.org/Device", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type", "http://www.w3.org/2002/07/owl#Class", "globalId", "", ""]
        |["http://e.org/Device", "http://www.w3.org/2000/01/rdf-schema#label", "Device", "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString", "en", "http://e.org/g1"]
        |["_:b1", "http://e.org/count", "5", "http://www.w3.org/2001/XMLSchema#integer", "", ""]
        |["http://e.org/x", "http://e.org/linked", "_:b1", "localId", "", ""]""".stripMargin
    val ts = TurtleParser.parse(hext, "hextuples")
    assert(ts.size == 4)
    assert(ts(0).oKind == "uri")
    assert(ts(1).lang.contains("en") && ts(1).graph.contains("http://e.org/g1"))
    assert(ts(2).oDatatype.exists(_.endsWith("integer")))
    assert(ts(3).oKind == "bnode" && ts(3).o == "_:b1")
    // the parsed dataset extracts like any other serialization
    import spark.implicits._
    val df = spark.createDataset(ts).toDF()
    assert(Extract.classes(df).count() == 1)
  }

  test("S1: RDFa-lite XHTML parses — vocab/prefix/typeof/property/resource") {
    val html = """<html xmlns="http://www.w3.org/1999/xhtml">
<body vocab="http://schema.org/" prefix="ex: http://e.org/">
  <div about="http://e.org/dev1" typeof="ex:Device">
    <span property="name">Thermostat</span>
    <span property="ex:status" content="active">shown text ignored</span>
    <a property="manufacturer" href="http://e.org/acme">Acme</a>
    <p property="description" lang="de">Ein Ger&#228;t</p>
    <div property="location" typeof="Place">
      <span property="name">Lab</span>
    </div>
  </div>
</body></html>"""
    val ts = TurtleParser.parse(html, "rdfa")
    val byP = ts.groupBy(_.p)
    assert(ts.exists(t => t.s == "http://e.org/dev1" &&
      t.p == graft.rdf.Vocab.RdfType && t.o == "http://e.org/Device"))
    assert(byP("http://schema.org/name").exists(t =>
      t.s == "http://e.org/dev1" && t.o == "Thermostat"))
    assert(byP("http://e.org/status").head.o == "active") // content attr wins
    assert(byP("http://schema.org/manufacturer").head.o == "http://e.org/acme"
      && byP("http://schema.org/manufacturer").head.oKind == "uri")
    assert(byP("http://schema.org/description").head.lang.contains("de"))
    // nested typed object: bnode linked via location, typed Place, named Lab
    val loc = byP("http://schema.org/location").head
    assert(loc.oKind == "bnode")
    assert(ts.exists(t => t.s == loc.o && t.p == graft.rdf.Vocab.RdfType &&
      t.o == "http://schema.org/Place"))
    assert(ts.exists(t => t.s == loc.o &&
      t.p == "http://schema.org/name" && t.o == "Lab"))
  }

  test("S1: RDFa chaining — property+resource+typeof types the object; " +
       "bare resource re-roots; nested chains walk") {
    // the common schema.org pattern the round-2 advisor flagged: an element
    // carrying property + resource + typeof must (a) link subject→resource,
    // (b) type the RESOURCE node, (c) re-root children at the resource
    val html = """<html xmlns="http://www.w3.org/1999/xhtml">
<body vocab="http://schema.org/">
  <div about="http://e.org/book1" typeof="Book">
    <div property="author" resource="http://e.org/alice" typeof="Person">
      <span property="name">Alice</span>
      <div property="worksFor" typeof="Organization">
        <span property="name">Acme Press</span>
      </div>
    </div>
    <div resource="http://e.org/ch1">
      <span property="headline">Chapter One</span>
    </div>
  </div>
</body></html>"""
    val ts = TurtleParser.parse(html, "rdfa")
    val S = "http://schema.org/"
    val ty = graft.rdf.Vocab.RdfType
    // (a) link
    assert(ts.exists(t => t.s == "http://e.org/book1" && t.p == S + "author" &&
      t.o == "http://e.org/alice" && t.oKind == "uri"))
    // (b) typed resource — this triple was dropped before the fix
    assert(ts.exists(t => t.s == "http://e.org/alice" && t.p == ty &&
      t.o == S + "Person"))
    // (c) chaining: the name literal hangs off the resource, not book1
    assert(ts.exists(t => t.s == "http://e.org/alice" && t.p == S + "name" &&
      t.o == "Alice"))
    // deep chain: alice → bnode org, typed + named
    val work = ts.find(t => t.s == "http://e.org/alice" &&
      t.p == S + "worksFor").get
    assert(work.oKind == "bnode")
    assert(ts.exists(t => t.s == work.o && t.p == ty && t.o == S + "Organization"))
    assert(ts.exists(t => t.s == work.o && t.p == S + "name" &&
      t.o == "Acme Press"))
    // bare @resource re-roots: headline belongs to ch1, and no
    // book1→ch1 edge is invented (no predicate present)
    assert(ts.exists(t => t.s == "http://e.org/ch1" && t.p == S + "headline" &&
      t.o == "Chapter One"))
    assert(!ts.exists(t => t.s == "http://e.org/book1" &&
      t.o == "http://e.org/ch1"))
  }

  test("S1: microdata XHTML parses — itemscope/itemtype/itemprop/itemid") {
    val html = """<html xmlns="http://www.w3.org/1999/xhtml"><body>
  <div itemscope="" itemtype="http://schema.org/Product"
       itemid="http://e.org/p1">
    <span itemprop="name">Widget</span>
    <meta itemprop="sku" content="W-1"/>
    <a itemprop="url" href="http://e.org/w">link</a>
    <div itemprop="brand" itemscope="" itemtype="http://schema.org/Brand">
      <span itemprop="name">Acme</span>
    </div>
  </div>
</body></html>"""
    val ts = TurtleParser.parse(html, "microdata")
    assert(ts.exists(t => t.s == "http://e.org/p1" &&
      t.p == graft.rdf.Vocab.RdfType && t.o == "http://schema.org/Product"))
    // itemprop expands against the itemtype vocabulary
    assert(ts.exists(t => t.s == "http://e.org/p1" &&
      t.p == "http://schema.org/name" && t.o == "Widget"))
    assert(ts.exists(t => t.p == "http://schema.org/sku" && t.o == "W-1"))
    assert(ts.exists(t => t.p == "http://schema.org/url" &&
      t.o == "http://e.org/w" && t.oKind == "uri"))
    val brand = ts.find(t => t.p == "http://schema.org/brand").get
    assert(brand.oKind == "bnode")
    assert(ts.exists(t => t.s == brand.o && t.o == "http://schema.org/Brand"))
    assert(ts.exists(t => t.s == brand.o &&
      t.p == "http://schema.org/name" && t.o == "Acme"))
  }

  test("TriG: statement ending '; }' parses (ADVICE r1 terminator fix)") {
    val trig = """@prefix : <http://e.org/> .
:g { :a :p :b ; :q :c ; }
"""
    val ts = TurtleParser.parse(trig, "trig")
    assert(ts.map(t => (t.p, t.o)).toSet ==
      Set(("http://e.org/p", "http://e.org/b"), ("http://e.org/q", "http://e.org/c")))
    assert(ts.forall(_.graph.contains("http://e.org/g")))
  }
}
