package graft.ontology

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Arbitrary, Prop, Test => SCTest}
import graft.rdf.Vocab

/** Unit + property tests for the pure kernels (reference parity per
  * SURVEY §7.1): name pipeline F1-F7, type lattice §1.3, hash ids K2.
  * ScalaCheck is driven directly (no scalatestplus bridge in the build).
  */
trait PropertyChecking { self: AnyFunSuite =>
  def checkProp(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }
  def forAll(f: String => Boolean): Unit =
    checkProp(Prop.forAll { (s: String) => f(s) })
}

class NamesSpec extends AnyFunSuite with PropertyChecking {
  test("F1 uri_to_name: fragment wins over path (uri_utils.py:33-69)") {
    assert(Names.uriToName("http://example.org/onto#Person") == "Person")
    assert(Names.uriToName("http://example.org/onto/Person") == "Person")
    assert(Names.uriToName("urn-no-separators") == "urn_no_separators")
    assert(Names.uriToName(null, 7) == "Unknown_7")
    assert(Names.uriToName("  ", 3) == "Unknown_3")
    assert(Names.uriToName("http://example.org/", 5) == "Entity_5")
  }

  test("F2 sanitize: invalid chars → _, E_ prefix, truncate 128 (uri_utils.py:71-103)") {
    assert(Names.sanitizeName("my-name.v2") == "my_name_v2")
    assert(Names.sanitizeName("2ndClass") == "E_2ndClass")
    assert(Names.sanitizeName("_under") == "E__under")
    assert(Names.sanitizeName("a" * 300).length == 128)
    assert(Names.sanitizeName("", 4) == "Entity_4")
  }

  test("F3/F4/F5 variants: 90-char DTDL, C_ exporter, O_ ontology") {
    assert(Names.sanitizeNameDtdl("a" * 300).length == 90)
    assert(Names.sanitizeNameExport("3M") == "C_3M")
    assert(Names.sanitizeNameExport("") == "UnnamedClass")
    assert(Names.sanitizeOntologyName("My Ontology!") == "My_Ontology_")
    // truncate-to-100 happens BEFORE the O_ prefix (rdf_converter.py:726-728)
    assert(Names.sanitizeOntologyName("9" * 150) == "O_" + "9" * 100)
    assert(Names.sanitizeOntologyName("9lives") == "O_9lives")
  }

  test("F6 validity predicate holds on sanitized output (uri_utils.py:125-142)") {
    forAll { s =>
      s.isEmpty || {
        val cleaned = Names.sanitizeName(s)
        Names.isValidFabricName(cleaned) || cleaned.startsWith("Entity_")
      }
    }
  }

  test("sanitize is idempotent") {
    forAll { s =>
      s.isEmpty || {
        val once = Names.sanitizeName(s)
        Names.sanitizeName(once) == once
      }
    }
  }
}

class TypeLatticeSpec extends AnyFunSuite with PropertyChecking {
  import TypeLattice._
  private val xsd = Vocab.XSD

  test("XSD → Fabric table entries (type_mapper.py:20-72)") {
    assert(fabricType(xsd + "string") == "String")
    assert(fabricType(xsd + "boolean") == "Boolean")
    assert(fabricType(xsd + "integer") == "BigInt")
    assert(fabricType(xsd + "unsignedByte") == "BigInt")
    assert(fabricType(xsd + "double") == "Double")
    assert(fabricType(xsd + "decimal") == "Double") // documented precision loss
    assert(fabricType(xsd + "dateTime") == "DateTime")
    assert(fabricType(xsd + "time") == "String")    // time-only → String
    assert(fabricType(xsd + "duration") == "String")
    assert(fabricType(xsd + "base64Binary") == "String")
    assert(fabricType("http://unknown/type") == "String")
    assert(fabricType(null) == "String")
    assert(xsdToFabric.size == 36) // 8 string + 1 bool + 3 dt + 4 time/dur + 13 int + 3 float + 2 bin + 2 other
  }

  test("union resolution order Boolean>BigInt>Double>DateTime>String (type_mapper.py:75-87)") {
    assert(resolveUnion(Set(xsd + "string", xsd + "integer")) == "BigInt")
    assert(resolveUnion(Set(xsd + "double", xsd + "boolean")) == "Boolean")
    assert(resolveUnion(Set(xsd + "int", xsd + "double")) == "BigInt")
    assert(resolveUnion(Set(xsd + "dateTime", xsd + "string")) == "DateTime")
    assert(resolveUnion(Set(xsd + "anyURI")) == "String")
    assert(resolveUnion(Set.empty) == "String")
    assert(resolveUnion(Set("http://other/ns#thing")) == "String")
  }

  test("every mapped type resolves to its own tier as singleton union") {
    for ((t, fabric) <- xsdToFabric) {
      // singleton union must never resolve to a *more* restrictive type
      val resolved = resolveUnion(Set(t))
      assert(resolved == fabric, s"$t: $resolved != $fabric")
    }
  }
}

class IdsSpec extends AnyFunSuite {
  test("K2 entity id matches reference sha256 scheme (dtdl_converter.py:486-511)") {
    // golden values computed with Python hashlib (reference implementation)
    assert(Ids.entityId("http://example.org/Person") == "1690103310624")
    assert(Ids.entityId("com:example:Thermostat") == "1901228522381")
  }

  test("K2 property id matches reference md5 scheme (dtdl_converter.py:514-527)") {
    assert(Ids.propertyId("1690103310624", "name") == "16901033106243420")
    assert(Ids.propertyId("1000000000042", "temperature") == "10000000000422775")
  }

  test("ids are 13-digit strings in the reference prefix range") {
    for (k <- Seq("a", "b", "x" * 100, "ünïcode", "")) {
      val id = Ids.entityId(k)
      assert(id.length == 13 && id.startsWith("1"))
    }
  }
}
