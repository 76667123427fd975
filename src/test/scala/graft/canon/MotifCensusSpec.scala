package graft.canon

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** GraphAlgs.motifCensus vs direct subgraph enumeration on random
  * graphs (every motif counted by brute force over vertex subsets, no
  * shared formulas), plus the K4 closed form where every count is known
  * by hand.
  */
class MotifCensusSpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop, n: Int = 10): Unit = {
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(n).withWorkers(1), p)
    assert(res.passed, res.status.toString)
  }

  private val genEdges: Gen[Seq[(String, String)]] = for {
    n <- Gen.choose(2, 9)
    m <- Gen.choose(1, 20)
    es <- Gen.listOfN(m, for {
      a <- Gen.choose(0, n - 1); b <- Gen.choose(0, n - 1)
    } yield (s"v$a", s"v$b"))
  } yield es.filter(e => e._1 != e._2)

  /** Brute census by direct enumeration — no ESCAPE formulas. */
  private def brute(raw: Seq[(String, String)]): Seq[Long] = {
    val e = raw.map { case (a, b) => if (a < b) (a, b) else (b, a) }.toSet
    val vs = e.flatMap(p => Seq(p._1, p._2)).toSeq.sorted
    def adj(a: String, b: String) = e(if (a < b) (a, b) else (b, a))
    val nbr = vs.map(v => v -> vs.filter(u => u != v && adj(u, v))).toMap
    val wedges = vs.map { v =>
      val d = nbr(v).size.toLong; d * (d - 1) / 2
    }.sum
    val tris = vs.combinations(3).count { case Seq(a, b, c) =>
      adj(a, b) && adj(b, c) && adj(a, c)
    }.toLong
    // ordered 4-tuples forming a path, each unordered path seen twice
    val p3 = (for {
      a <- vs; b <- vs; c <- vs; d <- vs
      if Set(a, b, c, d).size == 4 && adj(a, b) && adj(b, c) && adj(c, d)
    } yield 1).size.toLong / 2
    val tailed = (for {
      t <- vs.combinations(3)
      if adj(t(0), t(1)) && adj(t(1), t(2)) && adj(t(0), t(2))
      v <- t; x <- nbr(v) if !t.contains(x)
    } yield 1).size.toLong
    val triList = vs.combinations(3).filter { case Seq(a, b, c) =>
      adj(a, b) && adj(b, c) && adj(a, c)
    }.map(_.toSet).toList
    val diamonds = triList.combinations(2).count { case List(t1, t2) =>
      (t1 intersect t2).size == 2
    }.toLong
    val c4 = vs.combinations(4).map { case Seq(a, b, c, d) =>
      Seq((a, b, c, d), (a, b, d, c), (a, c, b, d)).count {
        case (p, q, r, s) =>
          adj(p, q) && adj(q, r) && adj(r, s) && adj(s, p)
      }
    }.sum.toLong
    val k4 = vs.combinations(4).count(_.combinations(2)
      .forall { case Seq(a, b) => adj(a, b) }).toLong
    Seq(vs.size.toLong, e.size.toLong, wedges, tris, p3, tailed,
      diamonds, c4, k4)
  }

  private def run(raw: Seq[(String, String)]): Seq[Long] = {
    val r = GraphAlgs.motifCensus(raw.toDF("a", "b")).head()
    (0 until 9).map(r.getLong)
  }

  test("census equals direct subgraph enumeration (ScalaCheck)") {
    check(Prop.forAll(genEdges) { es =>
      es.isEmpty || run(es) == brute(es)
    }, n = 12)
  }

  test("K4 closed form: every count known by hand") {
    val k4 = Seq(("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"),
      ("b", "d"), ("c", "d"))
    assert(run(k4) === Seq(4L, 6L, 12L, 4L, 12L, 12L, 6L, 3L, 1L))
  }

  test("orientation-agnostic: reversed/duplicated input edges census " +
      "identically") {
    val es = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"))
    val messy = es ++ es.map(_.swap) ++ es
    assert(run(messy) === run(es))
  }
}
