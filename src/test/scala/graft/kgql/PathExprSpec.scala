package graft.kgql

import graft.SparkSpec

/** SPARQL 1.1 path-expression + aggregate semantics on a hand-built
  * triple table. The load-bearing checks: `^` `/` `|` keep BAG
  * semantics (the spec's path translation rewrites them to triple
  * patterns/joins/unions — multiplicities are observable via COUNT),
  * `+` is set-semantic; `^` applies to the modified primary
  * (`^<p>+` = inverse of the closure); a constant source is pushed into
  * the leftmost step (plan: no full-relation scan on the first factor).
  */
class PathExprSpec extends SparkSpec {
  import spark.implicits._
  import Bgp._

  // d1 -m-> a, d1 -m-> b, d2 -m-> a ; a -k-> b ; b -k-> c ; a -k-> c
  private lazy val triples = Seq(
    ("d1", "m", "a"), ("d1", "m", "b"), ("d2", "m", "a"),
    ("a", "k", "b"), ("b", "k", "c"), ("a", "k", "c")
  ).toDF("s", "p", "o")

  private def rows(q: String): Seq[Seq[String]] =
    Sparql.query(triples, q, pathMaxHops = 8)
      .collect().toSeq.map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|"))

  test("inverse: ^m is mentioned-by") {
    assert(rows("SELECT ?d WHERE { <a> ^<m> ?d }") ==
      Seq(Seq("d1"), Seq("d2")))
  }

  test("sequence keeps bag multiplicity: one row per intermediate") {
    // d1 -m-> {a,b} -k-> c twice (a-k->c, b-k->c): two rows for (d1, c)
    val out = rows("SELECT ?d ?y WHERE { ?d <m>/<k> ?y }")
    assert(out == Seq(Seq("d1", "b"), Seq("d1", "c"), Seq("d1", "c"),
      Seq("d2", "b"), Seq("d2", "c")))
  }

  test("alternation is bag union; parenthesized group") {
    // a: k-successors {b, c} ∪ ^k-predecessors {} = 2 rows
    // b: {c} ∪ {a} ; c: {} ∪ {b, a}
    val out = rows("SELECT ?x ?y WHERE { ?x ( <k> | ^<k> ) ?y }")
    assert(out == Seq(Seq("a", "b"), Seq("a", "c"), Seq("b", "a"),
      Seq("b", "c"), Seq("c", "a"), Seq("c", "b")))
  }

  test("closure + is set-semantic: a reaches c once despite two paths") {
    val out = rows("SELECT ?y WHERE { <a> <k>+ ?y }")
    assert(out == Seq(Seq("b"), Seq("c")))
  }

  test("inverse of a closure: ^<k>+ from c reaches a and b once each") {
    val out = rows("SELECT ?y WHERE { <c> ^<k>+ ?y }")
    assert(out == Seq(Seq("a"), Seq("b")))
  }

  test("plus on a group: (m|^m)+ spans the undirected bipartite graph") {
    // from d2: d2—a, then a—d1, then d1—b (hop 3)
    val out = rows("SELECT ?y WHERE { <d2> ( <m> | ^<m> )+ ?y }")
    assert(out == Seq(Seq("a"), Seq("b"), Seq("d1")))
  }

  test("repeated endpoint variable: ?x <k>/^<k> ?x is satisfiable") {
    // x -k-> mid <-k- x : a via b, a via c, b via c (and each x with
    // itself through each of its successors)
    val out = rows(
      "SELECT ?x (COUNT(*) AS ?n) WHERE { ?x <k>/^<k> ?x } GROUP BY ?x")
    assert(out == Seq(Seq("a", "2"), Seq("b", "1")))
  }

  test("aggregates: COUNT bag paths, COUNT DISTINCT, MIN/MAX") {
    val out = rows(
      """SELECT ?d (COUNT(?y) AS ?paths) (COUNT(DISTINCT ?y) AS ?uniq)
        |(MIN(?y) AS ?lo) (MAX(?y) AS ?hi)
        |WHERE { ?d <m>/<k> ?y } GROUP BY ?d""".stripMargin)
    assert(out == Seq(Seq("d1", "3", "2", "b", "c"),
      Seq("d2", "2", "2", "b", "c")))
  }

  test("global aggregate (no GROUP BY) and COUNT(*)") {
    val out = rows("SELECT (COUNT(*) AS ?n) WHERE { ?d <m>/<k> ?y }")
    assert(out == Seq(Seq("5")))
  }

  test("COUNT(?v) skips unbound optionals, COUNT(*) does not") {
    val out = rows(
      """SELECT ?x (COUNT(?d) AS ?nd) (COUNT(*) AS ?all) WHERE {
        |  ?x <k> ?y .
        |  OPTIONAL { ?d <m> ?x FILTER ( ?d != <d1> ) }
        |} GROUP BY ?x""".stripMargin)
    // a: 2 k-edges × 1 surviving doc (d2) = 2 bound; b: doc d1 filtered
    // out in-block → unbound d, 1 row via the left join
    assert(out == Seq(Seq("a", "2", "2"), Seq("b", "0", "1")))
  }

  test("projected non-aggregate var must be grouped") {
    intercept[IllegalArgumentException] {
      Sparql.parse("SELECT ?x (COUNT(*) AS ?n) WHERE { ?x <k> ?y }")
    }
  }

  test("GROUP BY without aggregate rejected; var path step rejected") {
    intercept[IllegalArgumentException] {
      Sparql.parse("SELECT ?x WHERE { ?x <k> ?y } GROUP BY ?x")
    }
    intercept[IllegalArgumentException] {
      Sparql.parse("SELECT ?x WHERE { ?x <k>/?p ?y }")
    }
  }

  test("precedence: / binds tighter than |") {
    // <m>|<m>/<k> = <m> | (<m>/<k>) — from d2: {a} ∪ {b, c} = 3 rows;
    // the other grouping ((m|m)/k) would give {b, c, b, c}
    val out = rows("SELECT ?y WHERE { <d2> <m> | <m>/<k> ?y }")
    assert(out == Seq(Seq("a"), Seq("b"), Seq("c")))
  }

  test("CONSTRUCT: template instantiation, graph-set dedup") {
    // two docs mention a → one mentionedIn edge per doc, ONE type triple
    val out = rows(
      """CONSTRUCT {
        |  ?x <mentionedIn> ?d .
        |  ?x <type> <Entity> .
        |} WHERE { ?d <m> ?x }""".stripMargin)
    assert(out == Seq(
      Seq("a", "mentionedIn", "d1"), Seq("a", "mentionedIn", "d2"),
      Seq("a", "type", "Entity"), Seq("b", "mentionedIn", "d1"),
      Seq("b", "type", "Entity")))
  }

  test("CONSTRUCT skips templates with unbound optional vars") {
    val out = rows(
      """CONSTRUCT { ?x <seenIn> ?d } WHERE {
        |  ?x <k> ?y .
        |  OPTIONAL { ?d <m> ?x FILTER ( ?d != <d1> ) }
        |}""".stripMargin)
    // only a is mentioned by a doc other than d1 (d2); b's binding is
    // filtered inside the block → null → no triple emitted
    assert(out == Seq(Seq("a", "seenIn", "d2")))
  }

  test("CONSTRUCT rejects template vars unbound in WHERE") {
    intercept[IllegalArgumentException] {
      Sparql.parse("CONSTRUCT { ?z <p> ?x } WHERE { ?x <k> ?y }")
    }
  }

  test("FILTER NOT EXISTS: anti-join on shared vars") {
    // docs with a mention not shared with d1's mentions… simpler: docs
    // that do NOT mention b
    val out = rows(
      """SELECT DISTINCT ?d WHERE {
        |  ?d <m> ?x .
        |  FILTER NOT EXISTS { ?d <m> <b> }
        |}""".stripMargin)
    assert(out == Seq(Seq("d2")))
  }

  test("MINUS: anti-join on shared vars; inner filters stay inner") {
    val out = rows(
      """SELECT DISTINCT ?x WHERE {
        |  ?x <k> ?y .
        |  MINUS { ?d <m> ?x FILTER ( ?d != <d1> ) }
        |}""".stripMargin)
    // subjects of k: a, b; docs-other-than-d1 mention only a → a removed
    assert(out == Seq(Seq("b")))
  }

  test("disjoint domains: NOT EXISTS removes all, MINUS removes none") {
    val ne = rows(
      """SELECT ?x WHERE {
        |  ?x <k> ?y .
        |  FILTER NOT EXISTS { ?p <m> <a> }
        |}""".stripMargin)
    assert(ne.isEmpty) // the inner pattern matches somewhere → all drop
    val mi = rows(
      """SELECT DISTINCT ?x WHERE {
        |  ?x <k> ?y .
        |  MINUS { ?p <m> <a> }
        |}""".stripMargin)
    assert(mi == Seq(Seq("a"), Seq("b"))) // spec: disjoint MINUS no-op
  }

  test("NOT EXISTS with a never-matching inner keeps everything") {
    val out = rows(
      """SELECT DISTINCT ?x WHERE {
        |  ?x <k> ?y .
        |  FILTER NOT EXISTS { ?x <m> <zzz> }
        |}""".stripMargin)
    assert(out == Seq(Seq("a"), Seq("b")))
  }

  test("negation composes with aggregates and CONSTRUCT") {
    val agg = rows(
      """SELECT ?d (COUNT(?x) AS ?n) WHERE {
        |  ?d <m> ?x .
        |  FILTER NOT EXISTS { ?d <m> <b> }
        |} GROUP BY ?d""".stripMargin)
    assert(agg == Seq(Seq("d2", "1")))
    val g = rows(
      """CONSTRUCT { ?d <clean> <yes> } WHERE {
        |  ?d <m> ?x .
        |  MINUS { ?d <m> <b> }
        |}""".stripMargin)
    assert(g == Seq(Seq("d2", "clean", "yes")))
  }

  test("VALUES single-var: inline bindings join the pattern") {
    val out = rows(
      """SELECT ?d ?x WHERE {
        |  VALUES ?x { <a> <zzz> }
        |  ?d <m> ?x .
        |}""".stripMargin)
    assert(out == Seq(Seq("d1", "a"), Seq("d2", "a")))
  }

  test("VALUES multi-var row form; unshared var extends solutions") {
    val out = rows(
      """SELECT ?x ?tag WHERE {
        |  VALUES ( ?x ?tag ) { ( <a> "ent" ) ( <d1> "doc" ) }
        |  ?x <m> ?y .
        |}""".stripMargin)
    assert(out == Seq(Seq("d1", "doc"), Seq("d1", "doc"))) // d1 m a, d1 m b
    val cross = rows(
      """SELECT DISTINCT ?d ?tag WHERE {
        |  VALUES ?tag { "t1" "t2" }
        |  ?d <m> <a> .
        |}""".stripMargin)
    assert(cross == Seq(Seq("d1", "t1"), Seq("d1", "t2"),
      Seq("d2", "t1"), Seq("d2", "t2")))
  }

  test("negated property set: !<m> and !( <m> | <k> )") {
    val out = rows("SELECT ?s ?o WHERE { ?s !<m> ?o }")
    assert(out == Seq(Seq("a", "b"), Seq("a", "c"), Seq("b", "c")))
    assert(rows("SELECT ?s ?o WHERE { ?s !( <m> | <k> ) ?o }").isEmpty)
    // composes with sequence: doc -m-> x -(not m)-> y ≡ m/k here
    val comp = rows("SELECT DISTINCT ?y WHERE { <d2> <m>/!<m> ?y }")
    assert(comp == Seq(Seq("b"), Seq("c")))
  }

  test("ORDER BY + LIMIT: deterministic top-k, TakeOrdered plan") {
    val out = rows(
      """SELECT ?x (COUNT(*) AS ?n) WHERE { ?d <m> ?x }
        |GROUP BY ?x ORDER BY DESC ( ?n ) ?x LIMIT 1""".stripMargin)
    assert(out == Seq(Seq("a", "2")))
    val df = Sparql.query(triples,
      "SELECT ?d ?x WHERE { ?d <m> ?x } ORDER BY ?d ?x LIMIT 2")
    assert(df.collect().map(_.toSeq.map(String.valueOf)).toSeq ==
      Seq(Seq("d1", "a"), Seq("d1", "b")))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"ordered limit did not plan as top-k:\n$plan")
  }

  test("ORDER BY var must be projected; VALUES vars must be constants") {
    intercept[IllegalArgumentException] {
      Sparql.parse("SELECT ?x WHERE { ?x <k> ?y } ORDER BY ?y")
    }
    intercept[IllegalArgumentException] {
      Sparql.parse("SELECT ?x WHERE { VALUES ?v { ?bad } ?x <k> ?y }")
    }
  }

  test("star: zero-length self plus closure") {
    assert(rows("SELECT ?y WHERE { <a> <k>* ?y }") ==
      Seq(Seq("a"), Seq("b"), Seq("c")))
    // star on a group over the undirected bipartite graph
    assert(rows("SELECT ?y WHERE { <d2> ( <m> | ^<m> )* ?y }") ==
      Seq(Seq("a"), Seq("b"), Seq("d1"), Seq("d2")))
  }

  test("zero-or-one: self plus one step; terminal node matches itself") {
    assert(rows("SELECT ?y WHERE { <d1> <m>? ?y }") ==
      Seq(Seq("a"), Seq("b"), Seq("d1")))
    assert(rows("SELECT ?y WHERE { <c> <k>? ?y }") == Seq(Seq("c")))
  }

  test("var-var zero-length matches every graph term to itself") {
    val out = rows("SELECT ?x WHERE { ?x <k>? ?x }")
    assert(out == Seq(Seq("a"), Seq("b"), Seq("c"), Seq("d1"), Seq("d2")))
  }

  test("UNION: bag union of branches, joined with enclosing patterns") {
    // standalone union: docs mentioning a UNION docs mentioning b,
    // bag semantics → d1 appears twice (mentions both)
    val out = rows(
      """SELECT ?d (COUNT(*) AS ?n) WHERE {
        |  { ?d <m> <a> } UNION { ?d <m> <b> }
        |} GROUP BY ?d""".stripMargin)
    assert(out == Seq(Seq("d1", "2"), Seq("d2", "1")))
    // union joined with an enclosing pattern on the shared var
    val joined = rows(
      """SELECT ?x ?y WHERE {
        |  ?x <k> ?y .
        |  { ?x <k> <b> } UNION { ?x <k> <c> }
        |}""".stripMargin)
    // a k→{b,c}: union binds x=a twice (via b, via c) → each joins both
    // k-edges of a; b k→{c}: once → 1 row per edge
    assert(joined == Seq(Seq("a", "b"), Seq("a", "b"), Seq("a", "c"),
      Seq("a", "c"), Seq("b", "c")))
  }

  test("three-branch UNION; asymmetric branches rejected") {
    val out = rows(
      """SELECT DISTINCT ?d WHERE {
        |  { ?d <m> <a> } UNION { ?d <m> <b> } UNION { ?d <k> <c> }
        |}""".stripMargin)
    // d1, d2 mention; a, b have k-edges to c
    assert(out == Seq(Seq("a"), Seq("b"), Seq("d1"), Seq("d2")))
    intercept[IllegalArgumentException] {
      Sparql.parse("SELECT ?d WHERE { { ?d <m> <a> } UNION { ?d <m> ?e } }")
    }
  }

  test("string FILTER predicates: STRSTARTS/STRENDS/CONTAINS/REGEX") {
    assert(rows(
      """SELECT ?s WHERE { ?s <m> <a> FILTER ( STRSTARTS ( ?s "d1" ) ) }"""
    ) == Seq(Seq("d1")))
    assert(rows(
      """SELECT ?s ?o WHERE { ?s <k> ?o FILTER ( STRENDS ( ?o "c" ) ) }"""
    ) == Seq(Seq("a", "c"), Seq("b", "c")))
    assert(rows(
      """SELECT DISTINCT ?s WHERE { ?s <m> ?o FILTER ( CONTAINS ( ?s "2" ) ) }"""
    ) == Seq(Seq("d2")))
    assert(rows(
      """SELECT ?s WHERE { ?s <m> <a> FILTER ( REGEX ( ?s "^d[0-9]$" ) ) }"""
    ) == Seq(Seq("d1"), Seq("d2")))
    intercept[IllegalArgumentException] {
      Sparql.parse("""SELECT ?s WHERE { ?s <m> ?o FILTER ( CONTAINS ( "x" ?o ) ) }""")
    }
  }

  test("SUM/AVG over numeric literals; non-numeric bindings skipped") {
    val t = Seq(
      ("d1", "n", "10"), ("d1", "n", "4"), ("d2", "n", "7"),
      ("d2", "n", "oops") // non-numeric literal: unbound under SUM/AVG
    ).toDF("s", "p", "o")
    val out = Sparql.query(t,
      """SELECT ?s (SUM(?v) AS ?total) (AVG(?v) AS ?mean) WHERE {
        |  ?s <n> ?v .
        |} GROUP BY ?s ORDER BY ?s""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq(("d1", 14L, 7.0), ("d2", 7L, 7.0)))
  }

  test("HAVING filters aggregated rows; parse guards") {
    val out = rows(
      """SELECT ?o (COUNT(?d) AS ?n) WHERE { ?d <m> ?o }
        |GROUP BY ?o HAVING ( ?n >= 2 ) ORDER BY ?o""".stripMargin)
    assert(out == Seq(Seq("a", "2")))
    // HAVING without GROUP BY, non-alias var, non-integer bound
    intercept[IllegalArgumentException] {
      Sparql.parse("SELECT ?d WHERE { ?d <m> ?o } HAVING ( ?d > 1 )")
    }
    intercept[IllegalArgumentException] {
      Sparql.parse(
        """SELECT ?o (COUNT(?d) AS ?n) WHERE { ?d <m> ?o }
          |GROUP BY ?o HAVING ( ?o >= 2 )""".stripMargin)
    }
  }

  test("ASK: true on a matching pattern, false on an impossible one") {
    val yes = Sparql.query(triples,
      "ASK WHERE { ?d <m> <a> . ?d <m> <b> }").collect()
    assert(yes.map(_.getBoolean(0)).toSeq == Seq(true))
    val no = Sparql.query(triples,
      "ASK { ?d <m> <c> }").collect() // WHERE is optional
    assert(no.map(_.getBoolean(0)).toSeq == Seq(false))
    intercept[IllegalArgumentException] {
      Sparql.parse("ASK WHERE { }")
    }
  }

  test("OFFSET pages ordered solutions; applies before LIMIT") {
    val all = rows("SELECT ?s ?o WHERE { ?s <k> ?o } ORDER BY ?s ?o")
    val page = Sparql.query(triples,
      "SELECT ?s ?o WHERE { ?s <k> ?o } ORDER BY ?s ?o LIMIT 2 OFFSET 1")
      .collect().toSeq.map(_.toSeq.map(String.valueOf))
    assert(page == all.slice(1, 3))
    // OFFSET-first clause order means the same thing
    val page2 = Sparql.query(triples,
      "SELECT ?s ?o WHERE { ?s <k> ?o } ORDER BY ?s ?o OFFSET 1 LIMIT 2")
      .collect().toSeq.map(_.toSeq.map(String.valueOf))
    assert(page2 == page)
    intercept[IllegalArgumentException] {
      Sparql.parse("SELECT ?s WHERE { ?s <k> ?o } OFFSET 1 OFFSET 2")
    }
  }

  test("constant source pushes a semi-join into the leftmost step") {
    val df = Sparql.query(triples,
      "SELECT ?y WHERE { <d1> <m>/<k> ?y }")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi") || plan.contains("left_semi"),
      s"expected a pushed semi-join in:\n$plan")
  }
}
