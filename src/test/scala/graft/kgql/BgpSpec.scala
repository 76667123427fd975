package graft.kgql

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** BGP compiler semantics on a hand-built triple table: unification,
  * join ordering, OPTIONAL/FILTER, bag-vs-set semantics, parser, and the
  * plan-shape contract (constant-bound patterns broadcast; connected
  * join order never inserts a cartesian).
  */
class BgpSpec extends SparkSpec {
  import spark.implicits._
  import Bgp._

  private lazy val triples = Seq(
    ("d1", "mentions", "alice"),
    ("d1", "mentions", "bob"),
    ("d2", "mentions", "alice"),
    ("d2", "mentions", "carol"),
    ("d3", "mentions", "bob"),
    ("alice", "knows", "bob"),
    ("alice", "knows", "carol"),
    ("bob", "knows", "carol"),
    ("alice", "likes", "alice")
  ).toDF("s", "p", "o")

  test("single pattern with constant: pushed filter + rename") {
    val out = Bgp.select(triples,
      Seq(TriplePattern(V("d"), C("mentions"), C("alice"))), Seq("d"))
      .as[String].collect().sorted
    assert(out.toSeq == Seq("d1", "d2"))
  }

  test("two-pattern join on shared variable") {
    val out = Bgp.select(triples,
      Seq(TriplePattern(V("d"), C("mentions"), V("x")),
        TriplePattern(V("x"), C("knows"), V("y"))),
      Seq("d", "x", "y"))
      .as[(String, String, String)].collect().sorted
    // d mentions x, x knows y
    assert(out.toSeq == Seq(
      ("d1", "alice", "bob"), ("d1", "alice", "carol"),
      ("d1", "bob", "carol"),
      ("d2", "alice", "bob"), ("d2", "alice", "carol"),
      ("d3", "bob", "carol")))
  }

  test("repeated variable inside one pattern unifies (s = o)") {
    val out = Bgp.select(triples,
      Seq(TriplePattern(V("x"), C("likes"), V("x"))), Seq("x"))
      .as[String].collect()
    assert(out.toSeq == Seq("alice"))
  }

  test("bag semantics by default; DISTINCT collapses") {
    val pats = Seq(
      TriplePattern(V("d"), C("mentions"), V("x")),
      TriplePattern(V("x"), C("knows"), C("carol")))
    val bag = Bgp.select(triples, pats, Seq("x"))
    val set = Bgp.select(triples, pats, Seq("x"), distinct = true)
    assert(bag.count() == 4) // alice×2 docs, bob×2 docs
    assert(set.as[String].collect().sorted.toSeq == Seq("alice", "bob"))
  }

  test("OPTIONAL produces nulls; FILTER on optional var drops them") {
    val pats = Seq(TriplePattern(V("x"), C("knows"), C("carol")))
    val opt = Seq(OptionalBlock(Seq(
      TriplePattern(V("d"), C("mentions"), V("x")),
      TriplePattern(V("d"), C("mentions"), C("bob")))))
    val rows = Bgp.select(triples, pats, Seq("x", "d"), opt)
      .collect().map(r => (r.getString(0), Option(r.getString(1)))).sorted
    // alice knows carol; d1 mentions alice+bob. bob knows carol; d1&d3
    // mention bob (d3 mentions bob and bob — same triple, still a match)
    assert(rows.toSeq == Seq(
      ("alice", Some("d1")), ("bob", Some("d1")), ("bob", Some("d3"))))
    // no unmatched side here; force one via a filter inside the block
    val opt2 = Seq(OptionalBlock(Seq(
      TriplePattern(V("d"), C("mentions"), V("x"))),
      Seq(col("d") === "d3")))
    val rows2 = Bgp.select(triples, pats, Seq("x", "d"), opt2)
      .collect().map(r => (r.getString(0), Option(r.getString(1)))).sorted
    assert(rows2.toSeq == Seq(("alice", None), ("bob", Some("d3"))))
    // top-level FILTER referencing the optional var eliminates null rows
    // (SPARQL error→false)
    val rows3 = Bgp.select(triples, pats, Seq("x", "d"), opt2,
      filters = Seq(col("d") =!= "zzz"))
    assert(rows3.count() == 1)
  }

  test("join order: most-bound pattern seeds; connected patterns follow") {
    val pats = Seq(
      TriplePattern(V("x"), C("knows"), V("y")),
      TriplePattern(V("d"), C("mentions"), V("x")),
      TriplePattern(V("d"), C("mentions"), C("alice")))
    val ordered = Bgp.joinOrder(pats)
    assert(ordered.head == pats(2)) // 2 bound constants
    assert(ordered(1) == pats(1)) // shares ?d
    assert(ordered(2) == pats(0)) // shares ?x
  }

  test("disconnected patterns fall back to an explicit cartesian") {
    val out = Bgp.select(triples,
      Seq(TriplePattern(V("a"), C("likes"), V("b")),
        TriplePattern(V("c"), C("knows"), C("carol"))),
      Seq("a", "c"))
    assert(out.count() == 2) // 1 likes-row × 2 knows-carol rows
  }

  test("plan shape: 2-bound pattern is broadcast") {
    val df = Bgp.select(triples,
      Seq(TriplePattern(V("d"), C("mentions"), C("alice")),
        TriplePattern(V("d"), C("mentions"), V("e"))),
      Seq("d", "e"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("parser: full query with OPTIONAL, FILTER, DISTINCT") {
    val q = Sparql.parse(
      """SELECT DISTINCT ?x ?d WHERE {
        |  ?x <knows> <carol> .
        |  OPTIONAL { ?d <mentions> ?x . FILTER ( ?d != "d1" ) }
        |  FILTER ( ?x < "zz" )
        |}""".stripMargin)
    assert(q.distinct)
    assert(q.projection == Seq("x", "d"))
    assert(q.patterns == Seq(TriplePattern(V("x"), C("knows"), C("carol"))))
    assert(q.optionals.size == 1 && q.optionals.head.filters.size == 1)
    assert(q.filters.size == 1)
    val rows = Sparql.query(triples,
      """SELECT ?x WHERE { ?d <mentions> ?x . FILTER ( ?x != "bob" ) }""")
      .as[String].collect().sorted
    assert(rows.toSeq == Seq("alice", "alice", "carol"))
  }

  test("property path <p>+ : constant source, var-var, and BGP join") {
    val fromAlice = Sparql.query(triples,
      "SELECT ?x WHERE { <alice> <knows>+ ?x }")
      .as[String].collect().sorted
    assert(fromAlice.toSeq == Seq("bob", "carol"))
    val pairs = Sparql.query(triples,
      "SELECT ?a ?b WHERE { ?a <knows>+ ?b }")
      .as[(String, String)].collect().sorted
    assert(pairs.toSeq == Seq(("alice", "bob"), ("alice", "carol"),
      ("bob", "carol")))
    // path joined with a triple pattern on the shared variable
    val joinRows = Sparql.query(triples,
      "SELECT ?d ?x WHERE { <alice> <knows>+ ?x . ?d <mentions> ?x }")
      .as[(String, String)].collect().sorted
    assert(joinRows.toSeq == Seq(("d1", "bob"), ("d2", "carol"),
      ("d3", "bob")))
    // hop bound respected: maxHops = 1 sees only direct edges
    val oneHop = Sparql.query(triples,
      "SELECT ?x WHERE { <bob> <knows>+ ?x }", pathMaxHops = 1)
      .as[String].collect().sorted
    assert(oneHop.toSeq == Seq("carol"))
  }

  test("path predicate must be an IRI") {
    intercept[IllegalArgumentException](Sparql.parse(
      "SELECT ?x WHERE { <alice> ?p + ?x }"))
  }

  test("parser rejects malformed input") {
    intercept[IllegalArgumentException](Sparql.parse("SELECT WHERE { }"))
    intercept[IllegalArgumentException](
      Sparql.parse("SELECT ?x WHERE { ?x <p> }"))
    intercept[IllegalArgumentException](
      Sparql.parse("SELECT ?x WHERE { OPTIONAL { OPTIONAL { ?x <p> ?y } } }"))
  }

  test("tokenizer keeps IRIs atomic but splits comparison operators") {
    val t = Sparql.tokenize("""?a <urn:x:1> "lit" . FILTER(?a <= ?b)""")
    assert(t == Seq("?a", "<urn:x:1>", "\"lit\"", ".", "FILTER", "(",
      "?a", "<=", "?b", ")"))
  }

  test("FILTER EXISTS keeps exactly the matching solutions, once each") {
    // docs that mention alice — d3 (bob only) must drop; d1 survives
    // ONCE though it has two mentions matching the outer pattern
    val out = Sparql.query(triples,
      """SELECT ?d ?x WHERE {
        |  ?d <mentions> ?x .
        |  FILTER EXISTS { ?d <mentions> <alice> }
        |}""".stripMargin)
      .as[(String, String)].collect().sorted
    assert(out.toSeq == Seq(("d1", "alice"), ("d1", "bob"),
      ("d2", "alice"), ("d2", "carol")))
  }

  test("FILTER EXISTS with disjoint domain: all-or-nothing") {
    val some = Sparql.query(triples,
      """SELECT ?d WHERE { ?d <mentions> <bob> .
        |  FILTER EXISTS { ?x <knows> <carol> } }""".stripMargin)
      .as[String].collect().sorted
    assert(some.toSeq == Seq("d1", "d3"))
    val none = Sparql.query(triples,
      """SELECT ?d WHERE { ?d <mentions> <bob> .
        |  FILTER EXISTS { ?x <knows> <nobody> } }""".stripMargin)
      .count()
    assert(none == 0)
  }

  test("BIND computes CONCAT/STRLEN columns; FILTER sees them") {
    val out = Sparql.query(triples,
      """SELECT ?edge ?n WHERE {
        |  ?d <mentions> ?x .
        |  BIND ( CONCAT ( ?d "->" ?x ) AS ?edge )
        |  BIND ( STRLEN ( ?x ) AS ?n )
        |  FILTER ( STRENDS ( ?edge "ob" ) )
        |}""".stripMargin)
      .as[(String, Long)].collect().sorted
    assert(out.toSeq == Seq(("d1->bob", 3L), ("d3->bob", 3L)))
  }

  test("BIND scope rules: unbound reads and rebinding rejected") {
    intercept[IllegalArgumentException](Sparql.parse(
      "SELECT ?y WHERE { ?d <mentions> ?x . BIND ( ?z AS ?y ) }"))
    intercept[IllegalArgumentException](Sparql.parse(
      "SELECT ?x WHERE { ?d <mentions> ?x . BIND ( ?d AS ?x ) }"))
  }

  test("GROUP_CONCAT pins ascending element order; DISTINCT dedups") {
    val out = Sparql.query(triples,
      """SELECT ?d (GROUP_CONCAT(?x) AS ?xs) WHERE {
        |  ?d <mentions> ?x . } GROUP BY ?d""".stripMargin)
      .as[(String, String)].collect().sorted
    assert(out.toSeq == Seq(("d1", "alice,bob"), ("d2", "alice,carol"),
      ("d3", "bob")))
    // duplicate rows via UNION of the same branch pattern twice would
    // need asymmetric branches; instead check DISTINCT over the
    // likes/knows bag where alice→alice appears once per predicate
    val dup = Seq(("a", "p", "x"), ("a", "q", "x"), ("a", "p", "y"))
      .toDF("s", "p", "o")
    val d = Sparql.query(dup,
      """SELECT ?s (GROUP_CONCAT(DISTINCT ?o) AS ?os) WHERE {
        |  ?s ?p ?o . } GROUP BY ?s""".stripMargin)
      .as[(String, String)].collect()
    assert(d.toSeq == Seq(("a", "x,y")))
  }
}
