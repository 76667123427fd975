package graft.rdf

/** RDF / RDFS / OWL / XSD vocabulary constants (public W3C namespaces). */
object Vocab {
  val RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
  val RDFS = "http://www.w3.org/2000/01/rdf-schema#"
  val OWL = "http://www.w3.org/2002/07/owl#"
  val XSD = "http://www.w3.org/2001/XMLSchema#"

  val RdfType = RDF + "type"
  val RdfProperty = RDF + "Property"
  val RdfFirst = RDF + "first"
  val RdfRest = RDF + "rest"
  val RdfNil = RDF + "nil"

  val RdfsClass = RDFS + "Class"
  val RdfsSubClassOf = RDFS + "subClassOf"
  val RdfsDomain = RDFS + "domain"
  val RdfsRange = RDFS + "range"
  val RdfsComment = RDFS + "comment"
  val RdfsLabel = RDFS + "label"

  val OwlClass = OWL + "Class"
  val OwlOntology = OWL + "Ontology"
  val OwlDatatypeProperty = OWL + "DatatypeProperty"
  val OwlObjectProperty = OWL + "ObjectProperty"
  val OwlUnionOf = OWL + "unionOf"
  val OwlIntersectionOf = OWL + "intersectionOf"
  val OwlComplementOf = OWL + "complementOf"
  val OwlOneOf = OWL + "oneOf"
  val OwlImports = OWL + "imports"
  val OwlRestriction = OWL + "Restriction"
  val OwlFunctionalProperty = OWL + "FunctionalProperty"
}
