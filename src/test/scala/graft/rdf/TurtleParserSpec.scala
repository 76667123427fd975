package graft.rdf

import org.scalatest.funsuite.AnyFunSuite
import graft.ontology.Fixtures
import Vocab._

class TurtleParserSpec extends AnyFunSuite {
  test("S1: simple fixture parses with expected pattern counts") {
    val ts = TurtleParser.parseTurtle(Fixtures.SimpleTtl)
    assert(ts.count(t => t.p == RdfType && t.o == OwlClass) == 2)
    assert(ts.count(t => t.p == RdfType && t.o == OwlDatatypeProperty) == 2)
    assert(ts.count(t => t.p == RdfType && t.o == OwlObjectProperty) == 1)
    assert(ts.count(_.p == RdfsDomain) == 3)
    assert(ts.count(_.p == RdfsRange) == 3)
    val name = ts.filter(t => t.s == "http://example.org/name" && t.p == RdfsRange)
    assert(name.head.o == XSD + "string" && name.head.oKind == "uri")
    val label = ts.filter(t => t.p == RdfsLabel && t.s == "http://example.org/Person")
    assert(label.head.o == "Person" && label.head.oKind == "literal")
  }

  test("S1: union domain produces bnode + rdf list cells") {
    val ts = TurtleParser.parseTurtle(Fixtures.UnionDomainTtl)
    val dom = ts.filter(t => t.p == RdfsDomain).head
    assert(dom.oKind == "bnode")
    assert(ts.count(_.p == RdfFirst) == 2)
    assert(ts.count(_.p == RdfRest) == 2)
    assert(ts.exists(t => t.p == RdfRest && t.o == RdfNil))
    assert(ts.exists(t => t.s == dom.o && t.p == OwlUnionOf))
  }

  test("S1: N-Triples line format round-trips") {
    val nt =
      """<http://e.org/s> <http://e.org/p> <http://e.org/o> .
        |<http://e.org/s> <http://e.org/q> "lit"^^<http://www.w3.org/2001/XMLSchema#integer> .
        |# comment
        |_:b0 <http://e.org/p> "plain" .""".stripMargin
    val ts = TurtleParser.parseNTriples(nt)
    assert(ts.size == 3)
    assert(ts(0) == graft.model.Triple("http://e.org/s", "http://e.org/p", "http://e.org/o", "uri", None, None))
    assert(ts(1).oDatatype.contains(XSD + "integer"))
    assert(ts(2).s == "_:b0" && ts(2).oKind == "literal")
  }

  test("S2: format alias normalization (rdf_parser.py:208-278)") {
    assert(TurtleParser.normalizeFormat("ttl") == "turtle")
    assert(TurtleParser.normalizeFormat(".nt") == "nt")
    assert(TurtleParser.normalizeFormat("N-Triples") == "nt")
    assert(TurtleParser.normalizeFormat("nq") == "nquads")
  }

  test("S1: literals with language tags, booleans, numbers") {
    val ttl = """
@prefix : <http://e.org/> .
:x :label "hallo"@de .
:x :flag true .
:x :n 42 .
:x :d 3.14 .
:x :e 1.0e3 .
"""
    val ts = TurtleParser.parseTurtle(ttl)
    assert(ts.find(_.p == "http://e.org/label").get.oDatatype.contains(RDF + "langString"))
    // the tag itself is carried (ADVICE r1: was dropped)
    assert(ts.find(_.p == "http://e.org/label").get.lang.contains("de"))
    assert(ts.find(_.p == "http://e.org/flag").get.oDatatype.contains(XSD + "boolean"))
    assert(ts.find(_.p == "http://e.org/n").get.oDatatype.contains(XSD + "integer"))
    assert(ts.find(_.p == "http://e.org/d").get.oDatatype.contains(XSD + "decimal"))
    assert(ts.find(_.p == "http://e.org/e").get.oDatatype.contains(XSD + "double"))
  }

  test("S1: large generated ontology parses at expected scale") {
    val ts = TurtleParser.parseTurtle(Fixtures.largeTtl(50, 3, 2))
    assert(ts.count(t => t.p == RdfType && t.o == OwlClass) == 50)
    assert(ts.count(t => t.p == RdfType && t.o == OwlDatatypeProperty) == 150)
    assert(ts.count(t => t.p == RdfType && t.o == OwlObjectProperty) == 100)
  }
}
