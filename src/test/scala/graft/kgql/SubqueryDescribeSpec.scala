package graft.kgql

import graft.SparkSpec

/** Subqueries (derived tables), the SAMPLE aggregate, and the DESCRIBE
  * query form. Load-bearing semantics: a subquery evaluates bottom-up
  * against the whole graph and joins into the enclosing group on its
  * projected shared variables (NOT correlated per outer row); SAMPLE is
  * pinned to the group MIN (deterministic, partitioning-invariant);
  * DESCRIBE returns the symmetric concise description — every triple
  * whose subject OR object is a described resource — as a distinct set.
  */
class SubqueryDescribeSpec extends SparkSpec {
  import spark.implicits._

  // d1 -m-> a, d1 -m-> b, d2 -m-> a, d3 -m-> b ; a -k-> b
  private lazy val triples = Seq(
    ("d1", "m", "a"), ("d1", "m", "b"), ("d2", "m", "a"),
    ("d3", "m", "b"), ("a", "k", "b")
  ).toDF("s", "p", "o")

  private def rows(q: String): Seq[Seq[String]] =
    Sparql.query(triples, q)
      .collect().toSeq.map(_.toSeq.map(String.valueOf))
      .sortBy(_.mkString("|"))

  test("subquery joins into the outer group on the shared variable") {
    // inner: per-entity mention counts {a→2, b→2}; outer restricts to
    // subjects of a k-edge ({a}) — one row, count from the FULL graph
    val out = rows(
      """SELECT ?e ?n WHERE {
        |  ?e <k> ?x .
        |  { SELECT ?e (COUNT(?d) AS ?n) WHERE { ?d <m> ?e } GROUP BY ?e }
        |}""".stripMargin)
    assert(out == Seq(Seq("a", "2")))
  }

  test("subquery is uncorrelated: evaluated once against the graph") {
    // outer bag has two rows for ?e=a (d1, d2); the joined count stays
    // the global per-entity count, multiplied by outer multiplicity
    val out = rows(
      """SELECT ?d ?e ?n WHERE {
        |  ?d <m> ?e .
        |  { SELECT ?e (COUNT(?d2) AS ?n) WHERE { ?d2 <m> ?e } GROUP BY ?e }
        |}""".stripMargin)
    assert(out == Seq(Seq("d1", "a", "2"), Seq("d1", "b", "2"),
      Seq("d2", "a", "2"), Seq("d3", "b", "2")))
  }

  test("subquery-only WHERE block is a valid group") {
    val out = rows(
      """SELECT ?e ?n WHERE {
        |  { SELECT ?e (COUNT(*) AS ?n) WHERE { ?d <m> ?e } GROUP BY ?e }
        |} ORDER BY ?e""".stripMargin)
    assert(out == Seq(Seq("a", "2"), Seq("b", "2")))
  }

  test("SAMPLE is pinned to the group minimum") {
    val out = rows(
      """SELECT ?e ?d0 WHERE {
        |  { SELECT ?e (SAMPLE(?d) AS ?d0) WHERE { ?d <m> ?e } GROUP BY ?e }
        |}""".stripMargin)
    assert(out == Seq(Seq("a", "d1"), Seq("b", "d1")))
  }

  test("BIND may read a subquery-projected variable") {
    val out = rows(
      """SELECT ?lbl WHERE {
        |  { SELECT ?e (COUNT(*) AS ?n) WHERE { ?d <m> ?e } GROUP BY ?e }
        |  BIND ( CONCAT ( ?e "!" ) AS ?lbl )
        |}""".stripMargin)
    assert(out == Seq(Seq("a!"), Seq("b!")))
  }

  test("aggregate over a subquery's output") {
    // count entities having a global mention count (= 2 entities)
    val out = rows(
      """SELECT (COUNT(?e) AS ?k) WHERE {
        |  { SELECT ?e (COUNT(*) AS ?n) WHERE { ?d <m> ?e } GROUP BY ?e }
        |}""".stripMargin)
    assert(out == Seq(Seq("2")))
  }

  test("ASK accepts a subquery-only block, like the other forms") {
    assert(rows("ASK { { SELECT ?e WHERE { ?d <m> ?e } } }") ==
      Seq(Seq("true")))
    assert(rows(
      "ASK { { SELECT ?e WHERE { ?d <nope> ?e } } }") ==
      Seq(Seq("false")))
  }

  test("DESCRIBE <iri>: subject- and object-side triples, distinct") {
    val out = rows("DESCRIBE <a>")
    assert(out == Seq(Seq("a", "k", "b"), Seq("d1", "m", "a"),
      Seq("d2", "m", "a")))
  }

  test("DESCRIBE several IRIs unions their descriptions") {
    val out = rows("DESCRIBE <a> <d3>")
    assert(out == Seq(Seq("a", "k", "b"), Seq("d1", "m", "a"),
      Seq("d2", "m", "a"), Seq("d3", "m", "b")))
  }

  test("DESCRIBE of an unknown IRI is the empty graph") {
    assert(rows("DESCRIBE <nope>").isEmpty)
  }

  test("DESCRIBE ?var WHERE: described set from the pattern bindings") {
    // ?e objects of d1's mentions = {a, b}; description = all their
    // subject/object triples (the whole toy graph here)
    val out = rows("DESCRIBE ?e WHERE { <d1> <m> ?e }")
    assert(out == Seq(Seq("a", "k", "b"), Seq("d1", "m", "a"),
      Seq("d1", "m", "b"), Seq("d2", "m", "a"), Seq("d3", "m", "b")))
  }

  test("parse rejects a DESCRIBE var unbound in WHERE") {
    val e = intercept[IllegalArgumentException] {
      Sparql.parse("DESCRIBE ?z WHERE { ?d <m> ?e }")
    }
    assert(e.getMessage.contains("not bound"))
  }

  test("parse rejects an unknown aggregate but accepts SAMPLE") {
    Sparql.parse(
      "SELECT ?e (SAMPLE(?d) AS ?s) WHERE { ?d <m> ?e } GROUP BY ?e")
    val e = intercept[IllegalArgumentException] {
      Sparql.parse(
        "SELECT ?e (MEDIAN(?d) AS ?s) WHERE { ?d <m> ?e } GROUP BY ?e")
    }
    assert(e.getMessage.contains("bad aggregate fn"))
  }

  test("subquery inside FILTER EXISTS / UNION branches stays rejected") {
    val e = intercept[IllegalArgumentException] {
      Sparql.parse(
        """SELECT ?d WHERE {
          |  ?d <m> ?e .
          |  FILTER EXISTS { { SELECT ?e WHERE { ?x <k> ?e } } }
          |}""".stripMargin)
    }
    assert(e.getMessage.contains("nested"))
  }
}
