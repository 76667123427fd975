package graft.ontology

import graft.SparkSpec
import graft.rdf.TurtleParser
import org.apache.spark.sql.DataFrame

/** Ports of the reference converter tests (`tests/rdf/test_converter.py`)
  * against the DataFrame extraction operators.
  */
class ExtractSpec extends SparkSpec {
  import spark.implicits._

  private def triples(ttl: String): DataFrame =
    spark.createDataset(TurtleParser.parseTurtle(ttl)).toDF()

  private val ex = "http://example.org/"

  test("P1: simple fixture → 2 entity types (test_converter.py simple case)") {
    val cls = Extract.classes(triples(Fixtures.SimpleTtl)).collect().map(_.getString(0)).sorted
    assert(cls.toSeq == Seq(ex + "Organization", ex + "Person"))
  }

  test("P1: subClassOf subjects are classes even without owl:Class") {
    val ttl = s"""
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
<${ex}Undeclared> rdfs:subClassOf <${ex}Also> .
"""
    val cls = Extract.classes(triples(ttl)).collect().map(_.getString(0))
    assert(cls.toSet == Set(ex + "Undeclared"))
  }

  test("J1: inheritance chain resolves parents (INHERITANCE fixture)") {
    val t = triples(Fixtures.InheritanceTtl)
    val cls = Extract.classesWithIds(t)
    val parents = Extract.parentResolution(t, cls)
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(parents(ex + "Mammal") == ex + "Animal")
    assert(parents(ex + "Dog") == ex + "Mammal")
    assert(!parents.contains(ex + "Animal"))
  }

  test("J1/J6: cyclic parents skipped, non-cyclic kept (CyclicTtl)") {
    val t = triples(Fixtures.CyclicTtl)
    val cls = Extract.classesWithIds(t)
    val parents = Extract.parentResolution(t, cls)
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    // A→B and B→A are both cyclic; C→B survives
    assert(!parents.contains(ex + "A"))
    assert(!parents.contains(ex + "B"))
    assert(parents(ex + "C") == ex + "B")
  }

  test("P2: data properties discovered incl. rdf:Property with XSD range") {
    val ttl = s"""
@prefix : <$ex> .
@prefix owl: <http://www.w3.org/2002/07/owl#> .
@prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
:a a owl:DatatypeProperty .
:b a rdf:Property ; rdfs:range xsd:integer .
:c a rdf:Property ; rdfs:range :SomeClass .
"""
    val props = Extract.dataProperties(triples(ttl)).collect().map(_.getString(0)).toSet
    assert(props == Set(ex + "a", ex + "b"))
  }

  test("J2: multi-domain replicates the property (MULTIPLE_DOMAINS fixture)") {
    val t = triples(Fixtures.MultipleDomainsTtl)
    val cls = Extract.classesWithIds(t)
    val assignment = Extract.propertyAssignment(t, cls).collect()
    assert(assignment.length == 2)
    val byClass = assignment.map(r => r.getAs[String]("classUri") -> r.getAs[String]("name")).toMap
    assert(byClass == Map(ex + "Person" -> "name", ex + "Organization" -> "name"))
  }

  test("G1/G2: union domain resolves through bnode list (UNION_DOMAIN fixture)") {
    val t = triples(Fixtures.UnionDomainTtl)
    val cls = Extract.classesWithIds(t)
    val assignment = Extract.propertyAssignment(t, cls).collect()
    assert(assignment.map(_.getAs[String]("classUri")).toSet ==
      Set(ex + "Person", ex + "Organization"))
  }

  test("G3: datatype union range resolves via lattice (int|double → BigInt)") {
    val t = triples(Fixtures.DatatypeUnionTtl)
    val dataProps = Extract.dataProperties(t)
    val types = Extract.dataPropertyTypes(t, dataProps).collect()
    assert(types.head.getAs[String]("valueType") == "BigInt")
  }

  test("P5: timeseries comment routes property (TimeseriesTtl)") {
    val t = triples(Fixtures.TimeseriesTtl)
    val cls = Extract.classesWithIds(t)
    val assignment = Extract.propertyAssignment(t, cls).collect()
    val flags = assignment.map(r => r.getAs[String]("name") -> r.getAs[Boolean]("isTimeseries")).toMap
    assert(flags == Map("temperature" -> true, "serial" -> false))
  }

  test("J4: simple fixture → 1 relationship Person→Organization") {
    val t = triples(Fixtures.SimpleTtl)
    val cls = Extract.classesWithIds(t)
    val (rels, skipped) = Extract.relationships(t, cls)
    val r = rels.collect()
    assert(r.length == 1)
    assert(r.head.getAs[String]("name") == "worksFor")
    assert(r.head.getAs[String]("srcUri") == ex + "Person")
    assert(r.head.getAs[String]("dstUri") == ex + "Organization")
    assert(skipped.collect().isEmpty)
  }

  test("J3: usage inference fills missing domain/range (UsageInferenceTtl)") {
    val t = triples(Fixtures.UsageInferenceTtl)
    val cls = Extract.classesWithIds(t)
    val (rels, skipped) = Extract.relationships(t, cls)
    val r = rels.collect()
    assert(r.length == 1)
    assert(r.head.getAs[String]("name") == "employs")
    assert(r.head.getAs[String]("srcUri") == ex + "Organization")
    assert(r.head.getAs[String]("dstUri") == ex + "Person")
    assert(skipped.collect().isEmpty)
  }

  test("skip taxonomy: orphan object property → 'missing both domain and range'") {
    val t = triples(Fixtures.SkippedRelTtl)
    val cls = Extract.classesWithIds(t)
    val (rels, skipped) = Extract.relationships(t, cls)
    assert(rels.collect().isEmpty)
    val s = skipped.collect()
    assert(s.length == 1)
    assert(s.head.getAs[String]("name") == "orphanRel")
    assert(s.head.getAs[String]("reason") == "missing both domain and range")
  }

  test("J4: m×n expansion — 2 domains × 2 ranges = 4 relationships") {
    val ttl = s"""
@prefix : <$ex> .
@prefix owl: <http://www.w3.org/2002/07/owl#> .
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
:A a owl:Class . :B a owl:Class . :C a owl:Class . :D a owl:Class .
:rel a owl:ObjectProperty ;
  rdfs:domain [ owl:unionOf ( :A :B ) ] ;
  rdfs:range [ owl:unionOf ( :C :D ) ] .
"""
    val t = triples(ttl)
    val cls = Extract.classesWithIds(t)
    val (rels, _) = Extract.relationships(t, cls)
    val pairs = rels.collect().map(r =>
      (r.getAs[String]("srcUri"), r.getAs[String]("dstUri"))).toSet
    assert(pairs == Set(
      (ex + "A", ex + "C"), (ex + "A", ex + "D"),
      (ex + "B", ex + "C"), (ex + "B", ex + "D")))
  }

  test("K3: identifier selection prefers id-named String/BigInt props") {
    val ttl = s"""
@prefix : <$ex> .
@prefix owl: <http://www.w3.org/2002/07/owl#> .
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
:Device a owl:Class .
:deviceId a owl:DatatypeProperty ; rdfs:domain :Device ; rdfs:range xsd:string .
:deviceName a owl:DatatypeProperty ; rdfs:domain :Device ; rdfs:range xsd:string .
:reading a owl:DatatypeProperty ; rdfs:domain :Device ; rdfs:range xsd:double .
"""
    val t = triples(ttl)
    val cls = Extract.classesWithIds(t)
    val assignment = Extract.propertyAssignment(t, cls)
    val ids = Extract.identifiers(assignment).collect()
    assert(ids.length == 1)
    val byName = assignment.collect().map(r =>
      r.getAs[String]("name") -> r.getAs[String]("propId")).toMap
    assert(ids.head.getAs[String]("entityIdPart") == byName("deviceId"))
    assert(ids.head.getAs[String]("displayNamePropertyId") == byName("deviceName"))
  }

  test("end-to-end entityTypes: SIMPLE fixture assembles nested rows") {
    val t = triples(Fixtures.SimpleTtl)
    val (entities, rels, skipped) = Extract.entityTypes(t)
    val e = entities.collect().map(r => r.getAs[String]("name") -> r).toMap
    assert(e.keySet == Set("Person", "Organization"))
    val person = e("Person")
    val props = person.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("properties")
    assert(props.map(_.getAs[String]("name")).sorted == Seq("age", "name"))
    assert(props.find(_.getAs[String]("name") == "age").get.getAs[String]("valueType") == "BigInt")
    assert(rels.count() == 1)
    assert(skipped.count() == 0)
    // deterministic ids: entity id = sha256 hash of uri (K2 golden value)
    assert(person.getAs[String]("id") == Ids.entityId(ex + "Person"))
  }

  test("large generated ontology: counts scale (50 classes, 150 props, 100 rels)") {
    val t = triples(Fixtures.largeTtl(50, 3, 2))
    val cls = Extract.classesWithIds(t)
    assert(cls.count() == 50)
    val assignment = Extract.propertyAssignment(t, cls)
    assert(assignment.count() == 150)
    val (rels, skipped) = Extract.relationships(t, cls)
    assert(rels.count() == 100)
    assert(skipped.count() == 0)
  }
  test("G1 bounded collect: 1M data-level bnodes never reach the driver") {
    import org.apache.spark.sql.functions._
    import graft.rdf.Vocab._
    import spark.implicits._
    val ex = "http://e.org/"
    // schema: one property whose domain is a 2-element owl:unionOf list
    val schema = Seq(
      graft.model.Triple(ex + "prop", RdfsDomain, "_:u1", "bnode"),
      graft.model.Triple("_:u1", OwlUnionOf, "_:l1", "bnode"),
      graft.model.Triple("_:l1", RdfFirst, ex + "A", "uri"),
      graft.model.Triple("_:l1", RdfRest, "_:l2", "bnode"),
      graft.model.Triple("_:l2", RdfFirst, ex + "B", "uri"),
      graft.model.Triple("_:l2", RdfRest, RdfNil, "uri"))
    val schemaDf = spark.createDataset(schema).toDF()
    // 1.2M data-level bnode list cells: they survive the predicate prune
    // (rdf:first) but are UNREACHABLE from any rdfs:domain/range root, so
    // the closure must exclude them all
    val dataDf = spark.range(1200000).select(
      concat(lit("_:d"), col("id")).as("s"),
      lit(RdfFirst).as("p"),
      concat(lit("_:x"), col("id")).as("o"),
      lit("bnode").as("oKind"),
      lit(null).cast("string").as("oDatatype"),
      lit(null).cast("string").as("graph"),
      lit(null).cast("string").as("lang"))
    val t = schemaDf.unionByName(dataDf)
    val r = ClassExprResolver.collect(t)
    assert(r.indexSize <= schema.size,
      s"closure leaked data bnodes: index has ${r.indexSize} groups")
    // and the schema expression still resolves exactly
    assert(r.resolveClassTargets("_:u1", "bnode").toSet == Set(ex + "A", ex + "B"))
  }

}
