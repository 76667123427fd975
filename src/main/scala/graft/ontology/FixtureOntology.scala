package graft.ontology

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Triple
import graft.rdf.Vocab._

/** The supply-chain-style fixture ontology used by the driver-checked
  * ontology queries (mirrors the reference's
  * `samples/rdf/sample_supply_chain_ontology.ttl` shape and the fixture
  * corpus of `tests/fixtures/ttl_fixtures.py`). One definition feeds both
  * sides of the oracle: the Spark DataFrame and the generated DuckDB
  * `VALUES` CTE, so the SQL oracle re-derives results from identical
  * input with independent logic.
  *
  * Instance triples come from the customer/supplier/nation/region parquet
  * tables — the schema stays tiny while usage inference (J3) runs over
  * table-scale data, exactly the web-scale shape.
  */
object FixtureOntology {
  val Ns = "http://graft.example/onto#"
  def cls(n: String): String = Ns + n
  def dp(n: String): String = Ns + n
  def op(n: String): String = Ns + n

  private def t(s: String, p: String, o: String, k: String = "uri") =
    Triple(s, p, o, k)

  val triples: Seq[Triple] = Seq(
    // classes (owl:Class, one rdfs:Class, inheritance via subClassOf)
    t(cls("LegalEntity"), RdfType, OwlClass),
    t(cls("Customer"), RdfType, OwlClass),
    t(cls("Customer"), RdfsSubClassOf, cls("LegalEntity")),
    t(cls("Supplier"), RdfType, OwlClass),
    t(cls("Supplier"), RdfsSubClassOf, cls("LegalEntity")),
    t(cls("Nation"), RdfType, OwlClass),
    t(cls("Region"), RdfType, RdfsClass),
    t(cls("Part"), RdfType, OwlClass),
    t(cls("Order"), RdfType, OwlClass),
    // data properties
    t(dp("entityName"), RdfType, OwlDatatypeProperty),
    t(dp("entityName"), RdfsDomain, cls("LegalEntity")),
    t(dp("entityName"), RdfsRange, XSD + "string"),
    t(dp("acctBal"), RdfType, OwlDatatypeProperty),
    t(dp("acctBal"), RdfsDomain, "_:u1", "bnode"),
    t(dp("acctBal"), RdfsRange, XSD + "decimal"),
    t("_:u1", OwlUnionOf, "_:l1", "bnode"),
    t("_:l1", RdfFirst, cls("Customer")),
    t("_:l1", RdfRest, "_:l2", "bnode"),
    t("_:l2", RdfFirst, cls("Supplier")),
    t("_:l2", RdfRest, RdfNil),
    t(dp("custId"), RdfType, OwlDatatypeProperty),
    t(dp("custId"), RdfsDomain, cls("Customer")),
    t(dp("custId"), RdfsRange, XSD + "long"),
    t(dp("mktSegment"), RdfType, OwlDatatypeProperty),
    t(dp("mktSegment"), RdfsDomain, cls("Customer")),
    t(dp("mktSegment"), RdfsRange, XSD + "string"),
    t(dp("reading"), RdfType, OwlDatatypeProperty),
    t(dp("reading"), RdfsDomain, cls("Part")),
    t(dp("reading"), RdfsRange, "_:u2", "bnode"),
    t("_:u2", OwlUnionOf, "_:l3", "bnode"),
    t("_:l3", RdfFirst, XSD + "int"),
    t("_:l3", RdfRest, "_:l4", "bnode"),
    t("_:l4", RdfFirst, XSD + "double"),
    t("_:l4", RdfRest, RdfNil),
    t(dp("updatedAt"), RdfType, OwlDatatypeProperty),
    t(dp("updatedAt"), RdfsDomain, cls("Order")),
    t(dp("updatedAt"), RdfsRange, XSD + "dateTime"),
    Triple(dp("updatedAt"), RdfsComment, "Last update (timeseries)", "literal"),
    t(dp("partSize"), RdfType, RdfProperty), // rdf:Property + XSD range = data property (P2)
    t(dp("partSize"), RdfsDomain, cls("Part")),
    t(dp("partSize"), RdfsRange, XSD + "int"),
    t(dp("weird"), RdfType, OwlDatatypeProperty), // unsupported datatype → String
    t(dp("weird"), RdfsDomain, cls("Part")),
    t(dp("weird"), RdfsRange, XSD + "gYear"),
    // object properties
    t(op("inRegion"), RdfType, OwlObjectProperty),
    t(op("inRegion"), RdfsDomain, cls("Nation")),
    t(op("inRegion"), RdfsRange, cls("Region")),
    t(op("inRegion"), RdfType, OWL + "FunctionalProperty"),
    t(op("inNation"), RdfType, OwlObjectProperty), // no signature → J3 inference
    t(op("supplies"), RdfType, OwlObjectProperty),
    t(op("supplies"), RdfsDomain, "_:u1", "bnode"), // union(Customer, Supplier)
    t(op("supplies"), RdfsRange, cls("Part")),
    t(op("orphanRel"), RdfType, OwlObjectProperty), // no signature, no usage → skip
    t(op("refOrder"), RdfType, RdfProperty), // rdf:Property + entity range = object property (P3)
    t(op("refOrder"), RdfsDomain, cls("Order")),
    t(op("refOrder"), RdfsRange, cls("Part")),
    // preflight material
    t(Ns + "ontology", RdfType, OwlOntology),
    t(Ns + "ontology", OwlImports, "http://xmlns.com/foaf/0.1/"),
    t("_:r1", RdfType, OwlRestriction),
    t("_:r1", OWL + "onProperty", dp("entityName")),
    Triple("_:r1", OWL + "minCardinality", "1", "literal", Some(XSD + "integer"))
  )

  def df(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.createDataset(triples).toDF()
      .select("s", "p", "o", "oKind")
  }

  /** DuckDB VALUES CTE named `fixture(s, p, o, okind)` — generated from
    * the same Seq so both oracle sides share one source of truth.
    */
  def valuesSql: String = {
    def q(s: String) = "'" + s.replace("'", "''") + "'"
    val rows = triples.map(tr =>
      s"(${q(tr.s)}, ${q(tr.p)}, ${q(tr.o)}, ${q(tr.oKind)})").mkString(", ")
    s"fixture(s, p, o, okind) AS (SELECT * FROM (VALUES $rows) v(s, p, o, okind))"
  }

  /** Instance triples derived from the TPC-H-ish dims: typed nodes for
    * customer/supplier/nation/region plus `inNation` / `inRegion` usage
    * edges. (s, p, o, oKind) with oKind=uri throughout.
    */
  def instanceTriples(spark: SparkSession, dir: String): DataFrame = {
    def read(n: String) = spark.read.parquet(s"$dir/$n.parquet")
    val c = read("customer")
    val s = read("supplier")
    val n = read("nation")
    val r = read("region")
    val rows = Seq(
      c.select(concat(lit("urn:c:"), col("c_custkey")).as("s"),
        lit(RdfType).as("p"), lit(cls("Customer")).as("o")),
      c.select(concat(lit("urn:c:"), col("c_custkey")).as("s"),
        lit(op("inNation")).as("p"),
        concat(lit("urn:n:"), col("c_nationkey")).as("o")),
      s.select(concat(lit("urn:s:"), col("s_suppkey")).as("s"),
        lit(RdfType).as("p"), lit(cls("Supplier")).as("o")),
      s.select(concat(lit("urn:s:"), col("s_suppkey")).as("s"),
        lit(op("inNation")).as("p"),
        concat(lit("urn:n:"), col("s_nationkey")).as("o")),
      n.select(concat(lit("urn:n:"), col("n_nationkey")).as("s"),
        lit(RdfType).as("p"), lit(cls("Nation")).as("o")),
      n.select(concat(lit("urn:n:"), col("n_nationkey")).as("s"),
        lit(op("inRegion")).as("p"),
        concat(lit("urn:r:"), col("n_regionkey")).as("o")),
      r.select(concat(lit("urn:r:"), col("r_regionkey")).as("s"),
        lit(RdfType).as("p"), lit(cls("Region")).as("o")))
    rows.reduce(_ union _).withColumn("oKind", lit("uri"))
  }

  /** Same instance triples as a DuckDB CTE `inst(s, p, o)`. */
  def instanceSql: String =
    s"""inst(s, p, o) AS (
       |  SELECT 'urn:c:' || c_custkey, '${RdfType}', '${cls("Customer")}' FROM customer
       |  UNION ALL SELECT 'urn:c:' || c_custkey, '${op("inNation")}', 'urn:n:' || c_nationkey FROM customer
       |  UNION ALL SELECT 'urn:s:' || s_suppkey, '${RdfType}', '${cls("Supplier")}' FROM supplier
       |  UNION ALL SELECT 'urn:s:' || s_suppkey, '${op("inNation")}', 'urn:n:' || s_nationkey FROM supplier
       |  UNION ALL SELECT 'urn:n:' || n_nationkey, '${RdfType}', '${cls("Nation")}' FROM nation
       |  UNION ALL SELECT 'urn:n:' || n_nationkey, '${op("inRegion")}', 'urn:r:' || n_regionkey FROM nation
       |  UNION ALL SELECT 'urn:r:' || r_regionkey, '${RdfType}', '${cls("Region")}' FROM region)""".stripMargin

  /** Combined schema + instance triple table for the queries. */
  def combined(spark: SparkSession, dir: String): DataFrame =
    df(spark).union(instanceTriples(spark, dir))
}
