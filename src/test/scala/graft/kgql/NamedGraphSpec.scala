package graft.kgql

import graft.SparkSpec
import org.apache.spark.sql.Row

/** SPARQL named graphs (`GRAPH` blocks over quad datasets): the
  * same-graph join constraint, constant-graph pushdown, graph-variable
  * binding, cross-block joins, aggregation per graph, the repeated-var
  * case, and the union default graph for patterns outside GRAPH.
  */
class NamedGraphSpec extends SparkSpec {
  import spark.implicits._

  // g1 holds a 2-step chain; g2 holds the SECOND step of another chain
  // whose first step lives in g1 — the cross-graph chain must NOT match
  // inside one GRAPH ?g block, but MUST match in the union default graph.
  private lazy val quads = Seq(
    ("g1", "a", "p", "b"),
    ("g1", "b", "q", "c"),
    ("g1", "s1", "p", "x"),
    ("g2", "x", "q", "y"),
    ("g2", "a2", "p", "b2"),
    ("g3", "g3", "p", "self")
  ).toDF("g", "s", "p", "o")

  test("same-graph constraint: cross-graph chains don't match in GRAPH ?g") {
    val rows = Sparql.queryQuads(quads,
      """SELECT ?g ?s ?y WHERE {
        |  GRAPH ?g { ?s <p> ?x . ?x <q> ?y }
        |}""".stripMargin).collect()
    // only the g1-internal chain a-p-b-q-c; the s1→x→y chain crosses
    // g1/g2 and must be absent
    assert(rows.toSeq == Seq(Row("g1", "a", "c")))
  }

  test("union default graph: the same chain WITHOUT GRAPH sees all quads") {
    val rows = Sparql.queryQuads(quads,
      """SELECT ?s ?y WHERE { ?s <p> ?x . ?x <q> ?y }""")
      .orderBy("s").collect()
    assert(rows.toSeq == Seq(Row("a", "c"), Row("s1", "y")))
  }

  test("constant graph term scopes the block to that graph") {
    val rows = Sparql.queryQuads(quads,
      """SELECT ?s ?o WHERE { GRAPH <g2> { ?s ?p ?o } }""")
      .orderBy("s").collect()
    assert(rows.toSeq == Seq(Row("a2", "b2"), Row("x", "y")))
  }

  test("graph variable binds and aggregates per graph") {
    val rows = Sparql.queryQuads(quads,
      """SELECT ?g (COUNT(*) AS ?n) WHERE {
        |  GRAPH ?g { ?s ?p ?o }
        |} GROUP BY ?g ORDER BY ?g""".stripMargin).collect()
    assert(rows.toSeq ==
      Seq(Row("g1", 3L), Row("g2", 2L), Row("g3", 1L)))
  }

  test("two GRAPH blocks join on a shared variable across graphs") {
    val rows = Sparql.queryQuads(quads,
      """SELECT ?g1 ?s ?y WHERE {
        |  GRAPH ?g1 { ?s <p> ?x }
        |  GRAPH <g2> { ?x <q> ?y }
        |}""".stripMargin).collect()
    assert(rows.toSeq == Seq(Row("g1", "s1", "y")))
  }

  test("graph var repeated in a pattern position becomes an equality") {
    val rows = Sparql.queryQuads(quads,
      """SELECT ?x ?o WHERE { GRAPH ?x { ?x <p> ?o } }""").collect()
    assert(rows.toSeq == Seq(Row("g3", "self")))
  }

  test("GRAPH mixes with default-graph patterns and FILTER") {
    val rows = Sparql.queryQuads(quads,
      """SELECT ?g ?s WHERE {
        |  ?s <p> ?x .
        |  GRAPH ?g { ?x <q> ?y }
        |  FILTER ( ?g != "g1" )
        |}""".stripMargin).collect()
    assert(rows.toSeq == Seq(Row("g2", "s1")))
  }

  test("ASK over a GRAPH-only block") {
    assert(Sparql.queryQuads(quads,
      """ASK { GRAPH <g3> { ?s ?p ?o } }""").collect().head.getBoolean(0))
    assert(!Sparql.queryQuads(quads,
      """ASK { GRAPH <g4> { ?s ?p ?o } }""").collect().head.getBoolean(0))
  }

  test("GRAPH via the triple-store entry point is rejected") {
    val triples = quads.select("s", "p", "o")
    val e = intercept[IllegalArgumentException] {
      Sparql.query(triples,
        """SELECT ?s WHERE { GRAPH ?g { ?s <p> ?o } }""").collect()
    }
    assert(e.getMessage.contains("quad dataset"))
  }
}
