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
}
