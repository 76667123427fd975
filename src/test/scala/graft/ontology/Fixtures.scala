package graft.ontology

/** Port of the reference fixture corpus (`tests/fixtures/ttl_fixtures.py`)
  * — same ontologies, same expected counts as
  * `tests/rdf/test_converter.py:69-166`.
  */
object Fixtures {
  val SimpleTtl: String = """
@prefix : <http://example.org/> .
@prefix owl: <http://www.w3.org/2002/07/owl#> .
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .

:Person a owl:Class ;
    rdfs:label "Person" ;
    rdfs:comment "A human being" .

:Organization a owl:Class ;
    rdfs:label "Organization" .

:name a owl:DatatypeProperty ;
    rdfs:domain :Person ;
    rdfs:range xsd:string .

:age a owl:DatatypeProperty ;
    rdfs:domain :Person ;
    rdfs:range xsd:integer .

:worksFor a owl:ObjectProperty ;
    rdfs:domain :Person ;
    rdfs:range :Organization .
"""

  val InheritanceTtl: String = """
@prefix : <http://example.org/> .
@prefix owl: <http://www.w3.org/2002/07/owl#> .
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .

:Animal a owl:Class .
:Mammal a owl:Class ;
    rdfs:subClassOf :Animal .
:Dog a owl:Class ;
    rdfs:subClassOf :Mammal .
"""

  val MultipleDomainsTtl: String = """
@prefix : <http://example.org/> .
@prefix owl: <http://www.w3.org/2002/07/owl#> .
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .

:Person a owl:Class .
:Organization a owl:Class .

:name a owl:DatatypeProperty ;
    rdfs:domain :Person ;
    rdfs:domain :Organization ;
    rdfs:range xsd:string .
"""

  val UnionDomainTtl: String = """
@prefix : <http://example.org/> .
@prefix owl: <http://www.w3.org/2002/07/owl#> .
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .

:Person a owl:Class .
:Organization a owl:Class .

:name a owl:DatatypeProperty ;
    rdfs:domain [
        a owl:Class ;
        owl:unionOf ( :Person :Organization )
    ] ;
    rdfs:range xsd:string .
"""

  val MissingDomainTtl: String = """
@prefix owl: <http://www.w3.org/2002/07/owl#> .
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
@prefix ex: <http://example.org/> .

ex:Person a owl:Class .

ex:name a owl:DatatypeProperty ;
    rdfs:range xsd:string .
"""

  /** Object property with no declared domain/range but with instance usage
    * — exercises the J3 inference fallback
    * (`property_extractor.py:322-372`).
    */
  val UsageInferenceTtl: String = """
@prefix : <http://example.org/> .
@prefix owl: <http://www.w3.org/2002/07/owl#> .
@prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .

:Person a owl:Class .
:Organization a owl:Class .
:employs a owl:ObjectProperty .

:alice rdf:type :Person .
:acme rdf:type :Organization .
:acme :employs :alice .
"""

  /** No domain, no range, no usage → skipped with reason
    * "missing both domain and range" (`property_extractor.py:374-387`).
    */
  val SkippedRelTtl: String = """
@prefix : <http://example.org/> .
@prefix owl: <http://www.w3.org/2002/07/owl#> .

:orphanRel a owl:ObjectProperty .
"""

  /** Timeseries comment marker (`property_extractor.py:224-230`). */
  val TimeseriesTtl: String = """
@prefix : <http://example.org/> .
@prefix owl: <http://www.w3.org/2002/07/owl#> .
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .

:Sensor a owl:Class .
:temperature a owl:DatatypeProperty ;
    rdfs:domain :Sensor ;
    rdfs:range xsd:double ;
    rdfs:comment "Reading (timeseries)" .
:serial a owl:DatatypeProperty ;
    rdfs:domain :Sensor ;
    rdfs:range xsd:string .
"""

  /** Datatype union range → lattice resolution G3
    * (`type_mapper.py:168-212`).
    */
  val DatatypeUnionTtl: String = """
@prefix : <http://example.org/> .
@prefix owl: <http://www.w3.org/2002/07/owl#> .
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .

:Thing a owl:Class .
:mixed a owl:DatatypeProperty ;
    rdfs:domain :Thing ;
    rdfs:range [ owl:unionOf ( xsd:int xsd:double ) ] .
"""

  /** Inheritance cycle A→B→A: parents skipped with warning (J6). */
  val CyclicTtl: String = """
@prefix : <http://example.org/> .
@prefix owl: <http://www.w3.org/2002/07/owl#> .
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .

:A a owl:Class ; rdfs:subClassOf :B .
:B a owl:Class ; rdfs:subClassOf :A .
:C a owl:Class ; rdfs:subClassOf :B .
"""

  /** `generate_large_ttl` port (`ttl_fixtures.py:191-236`): n classes,
    * p string props each, r ring relationships each.
    */
  def largeTtl(numClasses: Int = 100, propsPerClass: Int = 5,
               relsPerClass: Int = 2): String = {
    val sb = new StringBuilder
    sb ++= "@prefix : <http://example.org/large/> .\n"
    sb ++= "@prefix owl: <http://www.w3.org/2002/07/owl#> .\n"
    sb ++= "@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .\n"
    sb ++= "@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .\n"
    for (i <- 0 until numClasses) {
      val cls = f"Class$i%04d"
      sb ++= s":$cls a owl:Class .\n"
      for (j <- 0 until propsPerClass)
        sb ++= s":${cls}_prop$j a owl:DatatypeProperty ; rdfs:domain :$cls ; rdfs:range xsd:string .\n"
      for (k <- 0 until relsPerClass) {
        val target = f"Class${(i + k + 1) % numClasses}%04d"
        sb ++= s":${cls}_rel$k a owl:ObjectProperty ; rdfs:domain :$cls ; rdfs:range :$target .\n"
      }
    }
    sb.toString
  }
}
