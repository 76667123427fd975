package graft.sink

import graft.SparkSpec
import graft.ontology.{Extract, FixtureOntology, Topo}
import graft.rdf.TurtleParser
import org.apache.spark.sql.functions._

class FabricPartsSpec extends SparkSpec {
  import FabricParts._

  test("JSON printer is byte-identical to Python json.dumps(indent=2)") {
    val obj = JObj(Seq(
      "id" -> JStr("123"), "name" -> JStr("Person"),
      "namespace" -> JStr("usertypes"),
      "entityIdParts" -> JArr(Seq(JStr("p1"))),
      "properties" -> JArr(Seq(JObj(Seq(
        "id" -> JStr("p1"), "name" -> JStr("nä me"),
        "valueType" -> JStr("String"))))),
      "timeseriesProperties" -> JArr(Nil)))
    // golden string produced by CPython json.dumps(obj, indent=2)
    val expected = "{\n  \"id\": \"123\",\n  \"name\": \"Person\",\n  \"namespace\": \"usertypes\",\n  \"entityIdParts\": [\n    \"p1\"\n  ],\n  \"properties\": [\n    {\n      \"id\": \"p1\",\n      \"name\": \"n\\u00e4 me\",\n      \"valueType\": \"String\"\n    }\n  ],\n  \"timeseriesProperties\": []\n}"
    assert(render(obj) == expected)
    assert(b64(render(obj)) == "ewogICJpZCI6ICIxMjMiLAogICJuYW1lIjogIlBlcnNvbiIsCiAgIm5hbWVzcGFjZSI6ICJ1c2VydHlwZXMiLAogICJlbnRpdHlJZFBhcnRzIjogWwogICAgInAxIgogIF0sCiAgInByb3BlcnRpZXMiOiBbCiAgICB7CiAgICAgICJpZCI6ICJwMSIsCiAgICAgICJuYW1lIjogIm5cdTAwZTQgbWUiLAogICAgICAidmFsdWVUeXBlIjogIlN0cmluZyIKICAgIH0KICBdLAogICJ0aW1lc2VyaWVzUHJvcGVydGllcyI6IFtdCn0=")
  }

  test("escape matches CPython on control/edge chars (\\b \\f, DEL raw)") {
    // golden from CPython: json.dumps('a\b\f\x1b\x7f\xe9')
    // == '"a\\b\\f\\u001b<DEL>\\u00e9"' -- 0x7F is NOT escaped
    assert(render(JStr("a\b\f\u001b\u007f\u00e9")) ==
      "\"a\\b\\f\\u001b\u007f\\u00e9\"")
  }

  test("O1 assembly: topo order parents-first, parts route by prefix (S6)") {
    val t = FixtureOntology.df(spark)
    val (entities, rels, _) = Extract.entityTypes(t)
    val cls = Extract.classesWithIds(t)
    val rank = Topo.ordered(cls, Extract.parentResolution(t, cls))
      .collect().map(r => r.getAs[String]("classUri") -> r.getAs[Int]("rank")).toMap
    val parts = assemble(entities, rels, rank, "TestOntology")
    assert(parts.head.path == ".platform")
    assert(parts(1).path == "definition.json")
    // reference path convention: EntityTypes/{id}/definition.json
    // (fabric_serializer.py:101) — id-keyed, not name-keyed
    val entityParts = parts.filter(_.path.startsWith("EntityTypes/"))
    assert(entityParts.forall(p =>
      p.path.matches("EntityTypes/\\d+/definition\\.json")))
    // LegalEntity (level 0) must precede Customer/Supplier (level 1)
    def nameOf(p: FabricParts.Part): String = {
      val j = new String(java.util.Base64.getDecoder.decode(p.payload), "UTF-8")
      "\"name\": \"([^\"]+)\"".r.findFirstMatchIn(j).get.group(1)
    }
    val entityNames = entityParts.map(nameOf)
    assert(entityNames.indexOf("LegalEntity") < entityNames.indexOf("Customer"))
    // definition.json is literally {} (fabric_serializer.py:92)
    assert(new String(java.util.Base64.getDecoder.decode(parts(1).payload), "UTF-8") == "{}")
    // .platform carries only the metadata envelope (fabric_serializer.py:73-78)
    assert(new String(java.util.Base64.getDecoder.decode(parts.head.payload), "UTF-8") ==
      "{\n  \"metadata\": {\n    \"type\": \"Ontology\",\n    \"displayName\": \"TestOntology\"\n  }\n}")
    val (es, rs) = decode(parts)
    // fixture-only input: inNation has no usage data → skipped, 4 rels
    assert(es.size == 7 && rs.size == 4)
    assert(es.exists(_.contains("\"name\": \"Customer\"")))
  }

  test("S6: decoded parts round-trip to DataFrames (export lifecycle §3.3)") {
    val t = FixtureOntology.df(spark)
    val (entities, rels, _) = Extract.entityTypes(t)
    val e0 = entities.localCheckpoint(); val r0 = rels.localCheckpoint()
    val parts = assemble(e0, r0, Map.empty, "X")
    val (e2, r2) = toDataFrames(spark, parts)
    assert(e2.count() == e0.count() && r2.count() == r0.count())
    val names = e2.collect().map(_.getAs[String]("name")).toSet
    assert(names == e0.collect().map(_.getAs[String]("name")).toSet)
    // property fidelity through the base64 JSON payloads
    val person = e2.collect().find(_.getAs[String]("name") == "Customer").get
    val props = person.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("properties")
      .map(_.getAs[String]("name")).toSet
    assert(props == Set("acctBal", "custId", "mktSegment"))
  }

  test("S6: malformed part payloads are skipped, not crashed on " +
       "(array/scalar JSON, bad base64)") {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    def part(path: String, payloadB64: String) =
      mapper.createObjectNode().put("path", path).put("payload", payloadB64)
    def b64of(s: String) =
      java.util.Base64.getEncoder.encodeToString(s.getBytes("UTF-8"))
    val good = part("EntityTypes/e1/definition.json",
      b64of("""{"id":"e1","name":"A","baseEntityTypeId":null,"properties":[]}"""))
    val arrayPayload = part("EntityTypes/e2/definition.json", b64of("[1,2]"))
    val scalarPayload = part("EntityTypes/e3/definition.json", b64of("42"))
    val badJson = part("EntityTypes/e4/definition.json", b64of("{nope"))
    val badB64 = part("EntityTypes/e5/definition.json", "!!!not-base64!!!")
    val (es, rs) = graft.sink.FabricParts.decodeNodes(
      Seq(good, arrayPayload, scalarPayload, badJson, badB64))
    assert(es.map(_.get("id").asText) == Seq("e1"))
    assert(rs.isEmpty)
  }

  test("S6: simple-format dialect converts to the same DataFrames as its " +
       "API-format twin (fabric_to_ttl.py:136-170)") {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    // simple format: direct objects with `type`, property attachment via
    // parentEntity (by id for e1, by NAME for Supplier), endpoint refs via
    // fromEntity/toEntity; one orphan property that must be silently dropped
    val simple = mapper.readTree("""{"parts": [
      {"type": "EntityType", "id": "e1", "displayName": "Customer"},
      {"type": "EntityType", "id": "e2", "name": "Supplier",
       "baseEntityType": "e1"},
      {"type": "Property", "id": "p1", "parentEntity": "e1",
       "displayName": "custId", "dataType": "BigInt"},
      {"type": "Property", "id": "p2", "parentEntity": "Supplier",
       "name": "acctBal"},
      {"type": "Property", "id": "p9", "parentEntity": "nosuch",
       "name": "orphan"},
      {"type": "Relationship", "id": "r1", "displayName": "suppliedBy",
       "fromEntity": "e1", "toEntity": "e2"}
    ]}""")
    import scala.jdk.CollectionConverters._
    val (e, r) = toDataFrames2(spark, simple.get("parts").elements().asScala.toSeq)

    // API-format twin of the same definition
    val twin = Seq(
      Part("EntityTypes/e1/definition.json", b64(render(JObj(Seq(
        "id" -> JStr("e1"), "name" -> JStr("Customer"),
        "baseEntityTypeId" -> JNull,
        "properties" -> JArr(Seq(JObj(Seq("id" -> JStr("p1"),
          "name" -> JStr("custId"), "valueType" -> JStr("BigInt")))))))))),
      Part("EntityTypes/e2/definition.json", b64(render(JObj(Seq(
        "id" -> JStr("e2"), "name" -> JStr("Supplier"),
        "baseEntityTypeId" -> JStr("e1"),
        "properties" -> JArr(Seq(JObj(Seq("id" -> JStr("p2"),
          "name" -> JStr("acctBal"), "valueType" -> JStr("String")))))))))),
      Part("RelationshipTypes/r1/definition.json", b64(render(JObj(Seq(
        "id" -> JStr("r1"), "name" -> JStr("suppliedBy"),
        "source" -> JObj(Seq("entityTypeId" -> JStr("e1"))),
        "target" -> JObj(Seq("entityTypeId" -> JStr("e2")))))))))
    val (eT, rT) = toDataFrames(spark, twin)
    assert(e.collect().toSet == eT.collect().toSet)
    assert(r.collect().toSet == rT.collect().toSet)
    // orphan property really is dropped, not attached anywhere
    val allProps = e.collect().flatMap(
      _.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("properties"))
      .map(_.getAs[String]("name"))
    assert(!allProps.contains("orphan") && allProps.toSet == Set("custId", "acctBal"))
  }

  private def toDataFrames2(spark: org.apache.spark.sql.SparkSession,
      nodes: Seq[com.fasterxml.jackson.databind.JsonNode]) =
    FabricParts.toDataFramesMixed(spark, nodes)
}

class TtlExportSpec extends SparkSpec {
  test("O2 + D2: export to triples, re-extract, semantic diff matches (round_trip_test)") {
    val t = FixtureOntology.df(spark)
    val cls = Extract.classesWithIds(t)
    val assignment = Extract.propertyAssignment(t, cls)
    val (rels, _) = Extract.relationships(t, cls)
    val (entities, relsDf, _) = Extract.entityTypes(t)

    // materialize: downstream re-extraction must not recompute (and
    // re-optimize) the deep export plan per action
    val exported = TtlExport.toTriples(entities, relsDf).localCheckpoint()
    // re-extract from the exported triples
    val cls2 = Extract.classesWithIds(exported)
    val assignment2 = Extract.propertyAssignment(exported, cls2)
    val (rels2, _) = Extract.relationships(exported, cls2)

    def names(df: org.apache.spark.sql.DataFrame, c: String) =
      df.select(c).distinct().collect().map(_.getString(0)).toSet
    assert(names(cls2, "name") == names(cls, "name"))
    assert(names(rels2, "name") == names(rels, "name"))
    // data property names survive (types reverse-map: BigInt→integer→BigInt etc.)
    assert(names(assignment2, "name") == names(assignment, "name"))
    val types2 = assignment2.select("name", "valueType").distinct().collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(types2("custId") == "BigInt")
    assert(types2("acctBal") == "Double")
  }

  test("N-Triples serialization parses back to the same triple set (S1 inverse)") {
    val t = FixtureOntology.df(spark)
    val (entities, relsDf, _) = Extract.entityTypes(t)
    val exported = TtlExport.toTriples(entities, relsDf).localCheckpoint()
    val nt = TtlExport.toNTriples(exported)
    val parsed = TurtleParser.parseNTriples(nt)
    assert(parsed.size == exported.count())
    val reparsed = parsed.map(x => (x.s, x.p, x.o)).toSet
    val orig = exported.collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(reparsed == orig)
  }
}

class DiffSpec extends SparkSpec {
  import spark.implicits._

  test("D1 compare: only_in sets and match flags") {
    val a = Seq(("class", "A"), ("class", "B"), ("prop", "x")).toDF("kind", "name")
    val b = Seq(("class", "A"), ("class", "C"), ("prop", "x")).toDF("kind", "name")
    val d = Diff.compare(a, b).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
      .toMap
    assert(d("class") == ((1L, 1L, 1L, false)))
    assert(d("prop") == ((1L, 0L, 0L, true)))
  }

  test("north-rule P/R metric on triple sets") {
    val golden = Seq(("s1", "p", "o1"), ("s2", "p", "o2"), ("s3", "p", "o3"))
      .toDF("s", "p", "o")
    val candidate = Seq(("s1", "p", "o1"), ("s2", "p", "o2"), ("s4", "p", "o4"))
      .toDF("s", "p", "o")
    val (precision, recall) = Diff.precisionRecall(candidate, golden)
    assert(math.abs(precision - 2.0 / 3) < 1e-12)
    assert(math.abs(recall - 2.0 / 3) < 1e-12)
  }
}

class PreflightSpec extends SparkSpec {
  import graft.shape.Preflight

  test("2.11: fixture ontology issue histogram matches reference categories") {
    val issues = Preflight.validate(FixtureOntology.df(spark))
    val hist = issues.groupBy("category", "severity").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(hist(("external_import", "warning")) == 1)
    assert(hist(("property_restriction", "warning")) == 1)
    assert(hist(("property_characteristic", "info")) == 1)
    assert(hist(("missing_signature", "warning")) == 2) // inNation, orphanRel
    assert(hist(("unsupported_datatype", "info")) == 2) // gYear + datatype union
    assert(!hist.keySet.exists(_._1 == "complex_class_expression")) // unionOf not flagged
    assert(!Preflight.isSeamless(issues))
  }

  test("seamless ⇔ no warnings/errors (preflight_validator.py:650-656)") {
    import spark.implicits._
    val clean = Seq(
      graft.model.Triple("http://x/A", graft.rdf.Vocab.RdfType,
        graft.rdf.Vocab.OwlClass, "uri")).toDF()
    assert(Preflight.isSeamless(Preflight.validate(clean)))
  }
}
