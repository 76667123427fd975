package graft.kgql

import graft.SparkSpec

/** FILTER semantics added in round 5: numeric comparison for bare
  * integer operands (SPARQL's xsd:integer ordering, with the lenient
  * type-error→false rule for non-numeric bindings) and BOUND/!BOUND
  * over OPTIONAL bindings.
  */
class FilterSemanticsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val triples = Seq(
    ("a", "n", "9"), ("b", "n", "10"), ("c", "n", "100"),
    ("d", "n", "oops"),
    ("a", "m", "x"), ("b", "m", "y")
  ).toDF("s", "p", "o")

  private def rows(q: String): Seq[Seq[String]] =
    Sparql.query(triples, q)
      .collect().toSeq.map(_.toSeq.map(String.valueOf))
      .sortBy(_.mkString("|"))

  test("bare integer operand compares numerically, not lexically") {
    // string order would put "100" < "9"; numeric keeps 10 and 100
    assert(rows("SELECT ?s WHERE { ?s <n> ?v . FILTER ( ?v > 9 ) }") ==
      Seq(Seq("b"), Seq("c")))
    assert(rows("SELECT ?s WHERE { ?s <n> ?v . FILTER ( ?v <= 10 ) }") ==
      Seq(Seq("a"), Seq("b")))
  }

  test("non-numeric binding under a numeric comparison is dropped") {
    // "oops" try_casts to null → type error → false, row eliminated
    assert(rows("SELECT ?s WHERE { ?s <n> ?v . FILTER ( ?v >= 0 ) }") ==
      Seq(Seq("a"), Seq("b"), Seq("c")))
  }

  test("negative integer literals keep their sign") {
    // regression: the tokenizer used to DROP unmatched '-' silently,
    // which would have turned '> -5' into '> 5'
    val t = Seq(("a", "n", "-3"), ("b", "n", "2"), ("c", "n", "-10"))
      .toDF("s", "p", "o")
    val out = Sparql.query(t,
      "SELECT ?s WHERE { ?s <n> ?v . FILTER ( ?v > -5 ) }")
      .collect().map(_.getString(0)).sorted.toSeq
    assert(out == Seq("a", "b"))
    val eq = Sparql.query(t,
      "SELECT ?s WHERE { ?s <n> ?v . FILTER ( ?v = -10 ) }")
      .collect().map(_.getString(0)).toSeq
    assert(eq == Seq("c"))
  }

  test("quoted literals keep string ordering") {
    // lexical: "10" < "9" is TRUE as strings
    assert(rows(
      """SELECT ?s WHERE { ?s <n> ?v . FILTER ( ?v < "9" ) }""") ==
      Seq(Seq("b"), Seq("c")))
  }

  test("BOUND keeps optionally-matched rows; !BOUND keeps the rest") {
    val q = """SELECT ?s WHERE {
              |  ?s <n> ?v .
              |  OPTIONAL { ?s <m> ?w }
              |  FILTER ( BOUND ( ?w ) )
              |}""".stripMargin
    assert(rows(q) == Seq(Seq("a"), Seq("b")))
    val nq = """SELECT ?s WHERE {
               |  ?s <n> ?v .
               |  OPTIONAL { ?s <m> ?w }
               |  FILTER ( ! BOUND ( ?w ) )
               |}""".stripMargin
    assert(rows(nq) == Seq(Seq("c"), Seq("d")))
  }

  test("!BOUND without whitespace tokenizes correctly") {
    assert(rows(
      """SELECT ?s WHERE {
        |  ?s <n> ?v . OPTIONAL { ?s <m> ?w } FILTER ( !BOUND ( ?w ) )
        |}""".stripMargin) == Seq(Seq("c"), Seq("d")))
  }

  test("BOUND arg must be a variable") {
    val e = intercept[IllegalArgumentException] {
      Sparql.parse("""SELECT ?s WHERE { ?s <n> ?v FILTER ( BOUND ( <x> ) ) }""")
    }
    assert(e.getMessage.contains("BOUND needs a ?var"))
  }

  test("BIND IF: numeric condition selects per-row branches") {
    val out = rows(
      """SELECT ?s ?sz WHERE {
        |  ?s <n> ?v .
        |  BIND ( IF ( ?v > 9 "big" "small" ) AS ?sz )
        |}""".stripMargin)
    // "oops" try_casts to null → condition error → else branch (spec's
    // EBV-of-error handling under when/otherwise)
    assert(out == Seq(Seq("a", "small"), Seq("b", "big"),
      Seq("c", "big"), Seq("d", "small")))
  }

  test("BIND COALESCE defaults an unbound OPTIONAL var") {
    val out = rows(
      """SELECT ?s ?w2 WHERE {
        |  ?s <n> ?v .
        |  OPTIONAL { ?s <m> ?w }
        |  BIND ( COALESCE ( ?w "none" ) AS ?w2 )
        |}""".stripMargin)
    assert(out == Seq(Seq("a", "x"), Seq("b", "y"),
      Seq("c", "none"), Seq("d", "none")))
  }

  test("IF condition with BOUND composes") {
    val out = rows(
      """SELECT ?s ?tag WHERE {
        |  ?s <n> ?v .
        |  OPTIONAL { ?s <m> ?w }
        |  BIND ( IF ( BOUND ( ?w ) ?w "missing" ) AS ?tag )
        |}""".stripMargin)
    assert(out == Seq(Seq("a", "x"), Seq("b", "y"),
      Seq("c", "missing"), Seq("d", "missing")))
  }

  test("BIND in-scope check still applies through IF conditions") {
    val e = intercept[IllegalArgumentException] {
      Sparql.parse(
        """SELECT ?s WHERE {
          |  ?s <n> ?v . BIND ( IF ( ?zz > 1 "a" "b" ) AS ?t )
          |}""".stripMargin)
    }
    assert(e.getMessage.contains("unbound"))
  }
}
