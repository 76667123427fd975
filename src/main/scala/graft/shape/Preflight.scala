package graft.shape

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.rdf.Vocab._
import graft.ontology.Names

/** Preflight validation (SURVEY §2.11; reference:
  * `src/formats/rdf/preflight_validator.py:276-638`). Every check is a
  * filter + projection over the triple table producing issue rows
  * `(category, severity, message, uri)`; the union of all checks is one
  * scan-heavy but shuffle-free plan (Catalyst merges the scans; severities
  * roll up with a single hash-agg).
  *
  * Categories and severities mirror the reference's `IssueCategory` /
  * `IssueSeverity` enums (`preflight_validator.py:24-45`) exactly; the
  * supported-XSD set is `preflight_validator.py:49-54` (13 types — a
  * deliberate subset of the 36-entry conversion table).
  */
object Preflight {

  val SupportedXsd: Set[String] = Set(
    "string", "boolean", "dateTime", "date", "dateTimeStamp", "integer",
    "int", "long", "double", "float", "decimal", "anyURI", "time")
    .map(XSD + _)

  private val Characteristics = Seq(
    "FunctionalProperty", "InverseFunctionalProperty", "SymmetricProperty",
    "AsymmetricProperty", "TransitiveProperty", "ReflexiveProperty",
    "IrreflexiveProperty").map(c => (OWL + c, c))

  private def issue(category: String, severity: String, message: org.apache.spark.sql.Column,
                    uri: org.apache.spark.sql.Column): Seq[org.apache.spark.sql.Column] =
    Seq(lit(category).as("category"), lit(severity).as("severity"),
      message.as("message"), uri.as("uri"))

  /** All checks union'd into one issues DataFrame. */
  def validate(triples: DataFrame): DataFrame = {
    val name = Names.uriToNameCol(col("s"))

    // external_import / WARNING (preflight_validator.py:300-310)
    val imports = triples.filter(col("p") === OwlImports)
      .select(issue("external_import", "warning",
        concat(lit("External import detected: "), col("o")), col("o")): _*)

    // complex_class_expression / WARNING — intersectionOf, complementOf,
    // oneOf; unionOf deliberately NOT flagged (line 347)
    val complexExpr = triples
      .filter(col("p").isin(OwlIntersectionOf, OwlComplementOf, OwlOneOf))
      .select(issue("complex_class_expression", "warning",
        concat(lit("owl:"), regexp_extract(col("p"), "([^#]+)$", 1),
          lit(" class expression")),
        when(!col("s").startsWith("_:"), col("s"))): _*)

    // property_restriction / WARNING (349-386)
    val restrictions = triples
      .filter(col("p") === RdfType && col("o") === OwlRestriction)
      .join(triples.filter(col("p") === OWL + "onProperty")
          .select(col("s"), col("o").as("onProp")), Seq("s"), "left")
      .select(issue("property_restriction", "warning",
        concat(lit("OWL restriction on property '"),
          coalesce(Names.uriToNameCol(col("onProp")), lit("unknown")), lit("'")),
        col("onProp")): _*)

    // property_characteristic / INFO (388-410)
    val chars = triples
      .filter(col("p") === RdfType &&
        col("o").isin(Characteristics.map(_._1): _*) && !col("s").startsWith("_:"))
      .select(issue("property_characteristic", "info",
        concat(lit("Property characteristic '"),
          regexp_extract(col("o"), "([^#]+)$", 1), lit("' on '"), name, lit("'")),
        col("s")): _*)

    // property_chain: chain axiom WARN; equivalentProperty/inverseOf INFO (412-444)
    val chains = triples.filter(col("p") === OWL + "propertyChainAxiom")
      .select(issue("property_chain", "warning",
        concat(lit("Property chain axiom on '"), name, lit("'")),
        when(!col("s").startsWith("_:"), col("s"))): _*)
    val equivProps = triples.filter(col("p") === OWL + "equivalentProperty")
      .select(issue("property_chain", "info",
        concat(lit("Equivalent property: '"), name, lit("' = '"),
          Names.uriToNameCol(col("o")), lit("'")),
        when(!col("s").startsWith("_:"), col("s"))): _*)
    val inverses = triples.filter(col("p") === OWL + "inverseOf")
      .select(issue("property_chain", "info",
        concat(lit("Inverse property: '"), name, lit("' inverse of '"),
          Names.uriToNameCol(col("o")), lit("'")),
        when(!col("s").startsWith("_:"), col("s"))): _*)

    // class_axiom / INFO (446-477)
    val classAxioms = triples
      .filter(col("p").isin(OWL + "equivalentClass", OWL + "disjointWith") &&
        !col("s").startsWith("_:"))
      .select(issue("class_axiom", "info",
        concat(lit("Class axiom "), regexp_extract(col("p"), "([^#]+)$", 1),
          lit(" on '"), name, lit("'")), col("s")): _*)
    val allDisjoint = triples
      .filter(col("p") === RdfType && col("o") === OWL + "AllDisjointClasses")
      .select(issue("class_axiom", "info",
        lit("AllDisjointClasses declaration"), lit(null).cast("string")): _*)

    // missing_signature / WARNING (479-534): declared property without
    // any rdfs:domain / rdfs:range
    val declaredProps = triples
      .filter(col("p") === RdfType &&
        col("o").isin(OwlDatatypeProperty, OwlObjectProperty, RdfProperty) &&
        !col("s").startsWith("_:"))
      .select(col("s").as("prop")).distinct()
    val withDomain = triples.filter(col("p") === RdfsDomain).select(col("s").as("prop")).distinct()
    val withRange = triples.filter(col("p") === RdfsRange).select(col("s").as("prop")).distinct()
    val missing = declaredProps
      .join(withDomain.withColumn("hasD", lit(true)), Seq("prop"), "left")
      .join(withRange.withColumn("hasR", lit(true)), Seq("prop"), "left")
      .filter(col("hasD").isNull || col("hasR").isNull)
      .select(issue("missing_signature", "warning",
        concat(lit("Property '"), Names.uriToNameCol(col("prop")), lit("' missing "),
          when(col("hasD").isNull && col("hasR").isNull, "domain and range")
            .when(col("hasD").isNull, "domain").otherwise("range")),
        col("prop")): _*)

    // missing_signature variants (preflight_validator.py:505-534): declared
    // domain / non-XSD range classes that are not declared locally
    val declaredClasses = triples
      .filter((col("p") === RdfType && col("o").isin(OwlClass, RdfsClass)) ||
        col("p") === RdfsSubClassOf)
      .filter(!col("s").startsWith("_:"))
      .select(col("s").as("cls")).distinct()
    val undeclaredDomain = triples
      .filter(col("p") === RdfsDomain && col("oKind") === "uri")
      .join(declaredProps.withColumnRenamed("prop", "s"), Seq("s"), "left_semi")
      .join(declaredClasses.withColumnRenamed("cls", "o"), Seq("o"), "left_anti")
      .select(issue("missing_signature", "warning",
        concat(lit("Property '"), name, lit("' domain '"),
          Names.uriToNameCol(col("o")), lit("' not declared locally")),
        col("s")): _*)
    val undeclaredRange = triples
      .filter(col("p") === RdfsRange && col("oKind") === "uri" &&
        !col("o").startsWith(XSD) &&
        !col("o").isin(SupportedXsd.toSeq: _*))
      .join(declaredProps.withColumnRenamed("prop", "s"), Seq("s"), "left_semi")
      .join(declaredClasses.withColumnRenamed("cls", "o"), Seq("o"), "left_anti")
      .select(issue("missing_signature", "warning",
        concat(lit("Property '"), name, lit("' range '"),
          Names.uriToNameCol(col("o")), lit("' not declared locally")),
        col("s")): _*)

    // unsupported_datatype / INFO (536-563): DatatypeProperty range in the
    // xsd namespace but outside the supported set; datatype unions
    val dtProps = triples
      .filter(col("p") === RdfType && col("o") === OwlDatatypeProperty)
      .select(col("s").as("prop")).distinct()
    val ranges = triples.filter(col("p") === RdfsRange)
      .select(col("s").as("prop"), col("o").as("range"), col("oKind"))
    val unsupported = dtProps.join(ranges, Seq("prop"))
      .filter(col("oKind") === "uri" && col("range").startsWith(XSD) &&
        !col("range").isin(SupportedXsd.toSeq: _*))
      .select(issue("unsupported_datatype", "info",
        concat(lit("Unsupported XSD datatype on '"),
          Names.uriToNameCol(col("prop")), lit("': "),
          Names.uriToNameCol(col("range"))), col("prop")): _*)
    val unionRanges = dtProps.join(ranges, Seq("prop"))
      .filter(col("oKind") === "bnode")
      .join(triples.filter(col("p") === OwlUnionOf)
        .select(col("s").as("range")), Seq("range"), "left_semi")
      .select(issue("unsupported_datatype", "info",
        concat(lit("Datatype union on '"), Names.uriToNameCol(col("prop")),
          lit("'")), col("prop")): _*)

    // individual / INFO (565-607)
    val individuals = triples
      .filter(col("p") === RdfType && col("o") === OWL + "NamedIndividual" &&
        !col("s").startsWith("_:"))
      .select(issue("individual", "info",
        concat(lit("Named individual '"), name, lit("'")), col("s")): _*)
    val sameAs = triples.filter(col("p").isin(OWL + "sameAs", OWL + "differentFrom"))
      .select(issue("individual", "info",
        concat(lit("owl:"), regexp_extract(col("p"), "([^#]+)$", 1),
          lit(" statement")), when(!col("s").startsWith("_:"), col("s"))): _*)

    // annotation / INFO (609-623)
    val annotations = triples
      .filter(col("p") === RdfType && col("o") === OWL + "AnnotationProperty" &&
        !col("s").startsWith("_:"))
      .select(issue("annotation", "info",
        concat(lit("Custom annotation property '"), name, lit("'")), col("s")): _*)

    // reification / WARNING (625-638)
    val reified = triples
      .filter(col("p") === RdfType && col("o") === RDF + "Statement")
      .select(issue("reification", "warning",
        lit("Reified statement"), when(!col("s").startsWith("_:"), col("s"))): _*)

    Seq(imports, complexExpr, restrictions, chars, chains, equivProps,
      inverses, classAxioms, allDisjoint, missing, undeclaredDomain,
      undeclaredRange, unsupported, unionRanges,
      individuals, sameAs, annotations, reified)
      .reduce(_ union _)
  }

  /** Severity rollup + seamless flag (`preflight_validator.py:650-663`):
    * seamless ⇔ zero errors and zero warnings.
    */
  def summary(issues: DataFrame): DataFrame =
    issues.groupBy("severity").agg(count(lit(1)).as("n"))

  def isSeamless(issues: DataFrame): Boolean =
    issues.filter(col("severity").isin("warning", "error")).limit(1).count() == 0
}
