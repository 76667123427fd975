package graft.dtdl

import org.scalatest.funsuite.AnyFunSuite
import graft.shape.EntityIdParts
import graft.model.Prop

/** V-DTDL structural validator (`dtdl_validator.py:120-619`) + K4
  * strategy coverage (`fabric_limits.py:407-560`). Pure-JVM, no Spark.
  */
class DtdlValidatorSpec extends AnyFunSuite {
  import DtdlValidator._

  private def iface(dtmi: String, ext: Seq[String] = Nil,
                    contents: Seq[DtdlContent] = Nil): DtdlInterface =
    DtdlInterface(dtmi, None, ext, contents, 3)

  test("clean model set validates with zero issues") {
    val issues = validate(Seq(
      iface("dtmi:ex:Base;1"),
      iface("dtmi:ex:Child;1", Seq("dtmi:ex:Base;1"), Seq(
        DtdlContent("Property", "serial", Some(DtdlSchema.Prim("string")))))))
    assert(issues.isEmpty)
    assert(isValid(issues))
  }

  test("default mode: unresolved parent is a WARNING; strict-refs an ERROR") {
    val m = Seq(iface("dtmi:ex:A;1", Seq("dtmi:ex:Missing;1")))
    val lenient = validate(m)
    assert(lenient.exists(i =>
      i.category == "parent_not_found" && i.level == "warning"))
    // lenient mode never emits the aggregated orphan/missing families
    assert(!lenient.exists(_.category == "orphaned_rel_target"))
    val strictRefs = validate(m, allowExternalReferences = false)
    assert(strictRefs.exists(i =>
      i.category == "parent_not_found" && i.level == "error"))
  }

  test("strict mode promotes warnings to errors (dtdl_validator.py:233-238)") {
    val m = Seq(iface("dtmi:standard:Reserved;1"))
    assert(validate(m).exists(i =>
      i.category == "dtmi_reserved_prefix" && i.level == "warning"))
    assert(validate(m, strictMode = true).exists(i =>
      i.category == "dtmi_reserved_prefix" && i.level == "error"))
  }

  test("inheritance cycle: one error per root in the cycle; DFS terminates") {
    val m = Seq(
      iface("dtmi:ex:A;1", Seq("dtmi:ex:B;1")),
      iface("dtmi:ex:B;1", Seq("dtmi:ex:A;1")),
      iface("dtmi:ex:C;1", Seq("dtmi:ex:A;1"))) // C enters the cycle too
    val cycles = validate(m).filter(_.category == "inheritance_cycle")
    assert(cycles.size == 3)
  }

  test("extends depth >12 flags only roots whose chain exceeds the bound") {
    val chain = (0 until 15).map(k =>
      iface(s"dtmi:ex:D$k;1",
        if (k < 14) Seq(s"dtmi:ex:D${k + 1};1") else Nil))
    val deep = validate(chain).filter(_.category == "extends_depth")
    // D0 (depth 14) and D1 (depth 13) exceed; D2's chain tops out at 12
    assert(deep.size == 2)
  }

  test("DTMI format mirrors the reference DTMI_PATTERN incl. dot versions") {
    assert(DtdlInterface.isValidDtmi("dtmi:com:example:Thing;1"))
    assert(DtdlInterface.isValidDtmi("dtmi:com:example:Thing;1.2")) // minor version
    assert(DtdlInterface.isValidDtmi("dtmi:com:_private:Thing;1")) // later seg may start with _
    assert(DtdlInterface.isValidDtmi("dtmi:trailing_;1")) // trailing _ allowed
    assert(!DtdlInterface.isValidDtmi("dtmi:_first;1")) // first seg must start with letter
    assert(!DtdlInterface.isValidDtmi("dtmi:x;0")) // version must start 1-9
    assert(!DtdlInterface.isValidDtmi("dtmi:x;1.0")) // minor must start 1-9
  }

  test("DtdlConverter terminates and converts on a cyclic extends graph") {
    val cyc = DtdlParser.parse("""[
      {"@id": "dtmi:ex:A;1", "@type": "Interface",
       "@context": "dtmi:dtdl:context;3", "extends": ["dtmi:ex:B;1"],
       "contents": [{"@type": "Property", "name": "pa", "schema": "string"}]},
      {"@id": "dtmi:ex:B;1", "@type": "Interface",
       "@context": "dtmi:dtdl:context;3", "extends": ["dtmi:ex:A;1"],
       "contents": [{"@type": "Property", "name": "pb", "schema": "long"}]}
    ]""")
    // ancestorProps' seen-set must break the A<->B loop; both entities emit
    val res = DtdlConverter.convert(cyc)
    assert(res.entities.map(_.uri).toSet == Set("dtmi:ex:A;1", "dtmi:ex:B;1"))
    assert(res.entities.forall(_.properties.nonEmpty))
  }

  test("K4 strategies: auto / first_valid / explicit / none") {
    val props = Seq(
      Prop("p1", "reading", "Double"),
      Prop("p2", "label", "String"),
      Prop("p3", "deviceKey", "String"))
    // auto: first valid prop whose name matches a pattern (key ⊂ deviceKey)
    assert(EntityIdParts.Inferrer("auto").inferFromProps("E", props) == Seq("p3"))
    // first_valid: first String/BigInt regardless of name
    assert(EntityIdParts.Inferrer("first_valid").inferFromProps("E", props) == Seq("p2"))
    // none: empty
    assert(EntityIdParts.Inferrer("none").inferFromProps("E", props).isEmpty)
    // explicit without mapping: empty; with mapping: resolves names→ids
    assert(EntityIdParts.Inferrer("explicit").inferFromProps("E", props).isEmpty)
    val mapped = EntityIdParts.Inferrer("explicit",
      explicitMappings = Map("E" -> Seq("LABEL", "missing", "deviceKey")))
    assert(mapped.inferFromProps("E", props) == Seq("p2", "p3"))
    // explicit mapping wins over ANY strategy (fabric_limits.py:489-492)
    val autoMapped = EntityIdParts.Inferrer("auto",
      explicitMappings = Map("E" -> Seq("label")))
    assert(autoMapped.inferFromProps("E", props) == Seq("p2"))
    // auto falls back to first valid when no pattern matches
    val noPk = Seq(Prop("q1", "color", "String"))
    assert(EntityIdParts.Inferrer("auto").inferFromProps("E", noPk) == Seq("q1"))
    // custom patterns extend the pk table
    val custom = EntityIdParts.Inferrer("auto", customPatterns = Seq("color"))
    assert(custom.inferFromProps("E", Seq(
      Prop("r1", "shade", "String"), Prop("r2", "colorCode", "String")))
      == Seq("r2"))
  }
}
