package graft.canon

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** GraphAlgs.kTruss vs a naive iterative peel truth, the closed-form
  * clique/strip cases, and the k-truss ⊆ (k−1)-core containment law.
  */
class TrussSpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop, n: Int = 6): Unit = {
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(n).withWorkers(1), p)
    assert(res.passed, res.status.toString)
  }

  /** Naive truth: iterate support-count + threshold on an in-memory
    * canonical edge set until `rounds` passes, then recount. */
  private def naiveTruss(es0: Seq[(String, String)], k: Int,
      rounds: Int): Map[(String, String), Long] = {
    def supports(es: Set[(String, String)]): Map[(String, String), Long] = {
      val s = scala.collection.mutable.Map[(String, String), Long]()
      for {
        (a, b) <- es; (b2, c) <- es if b2 == b
        if es.contains((a, c))
      } {
        s((a, b)) = s.getOrElse((a, b), 0L) + 1
        s((b, c)) = s.getOrElse((b, c), 0L) + 1
        s((a, c)) = s.getOrElse((a, c), 0L) + 1
      }
      s.toMap
    }
    var es = es0.toSet
    for (_ <- 1 to rounds) {
      val sup = supports(es)
      es = es.filter(e => sup.getOrElse(e, 0L) >= k - 2)
    }
    val fin = supports(es)
    es.map(e => e -> fin.getOrElse(e, 0L)).toMap
  }

  private def run(es: Seq[(String, String)], k: Int,
      rounds: Int = 3): Map[(String, String), Long] =
    GraphAlgs.kTruss(es.toDF("a", "b"), k, rounds)
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap

  test("K5 is its own 5-truss: every edge in exactly 3 triangles") {
    val vs = Seq("a", "b", "c", "d", "e")
    val es = for (x <- vs; y <- vs if x < y) yield (x, y)
    val got = run(es, k = 5)
    assert(got.size == 10 && got.values.forall(_ == 3L), got.toString)
  }

  test("pendant edges peel, the triangle core survives at k=3") {
    val es = Seq(("a", "b"), ("a", "c"), ("b", "c"), ("c", "d"))
    assert(run(es, k = 3) ==
      Map(("a", "b") -> 1L, ("a", "c") -> 1L, ("b", "c") -> 1L))
  }

  test("triangle strip cascades to empty at k=4 in two rounds") {
    // vertices n1..n6, edges (i,i+1) + (i,i+2): interior (i,i+1) edges
    // have support 2, (i,i+2) edges support 1 → round 1 peels the
    // chords, round 2 finds the leftover path triangle-free
    val es = (1 to 5).map(i => (f"n$i", f"n${i + 1}")) ++
      (1 to 4).map(i => (f"n$i", f"n${i + 2}"))
    assert(run(es, k = 4).isEmpty)
    // and the same strip at k=3 keeps everything (every edge has ≥1 tri)
    assert(run(es, k = 3).size == 9)
  }

  test("kTruss ≡ naive iterative peel truth on random graphs") {
    val gen: Gen[List[(Int, Int)]] = Gen.listOfN(35, for {
      a <- Gen.choose(0, 9); b <- Gen.choose(0, 9)
    } yield (a, b)).map(_.collect {
      case (a, b) if a < b => (a, b) }.distinct)
    check(Prop.forAll(gen, Gen.choose(3, 5)) { (es0, k) =>
      es0.isEmpty || {
        val es = es0.map { case (a, b) => (s"n$a", s"n$b") }
        run(es, k) == naiveTruss(es, k, rounds = 3)
      }
    }, n = 8)
  }

  test("5-truss nodes sit inside the 4-core (converged peels)") {
    val gen: Gen[List[(Int, Int)]] = Gen.listOfN(40, for {
      a <- Gen.choose(0, 8); b <- Gen.choose(0, 8)
    } yield (a, b)).map(_.collect {
      case (a, b) if a < b => (a, b) }.distinct)
    check(Prop.forAll(gen) { es0 =>
      es0.isEmpty || {
        val es = es0.map { case (a, b) => (s"n$a", s"n$b") }
        val trussNodes = run(es, k = 5, rounds = 8).keySet
          .flatMap(e => Set(e._1, e._2))
        val sym = es ++ es.map(_.swap)
        val coreNodes = GraphAlgs.kCore(sym.toDF("src", "dst"),
            k = 4, rounds = 8)
          .select("node").as[String].collect().toSet
        trussNodes.subsetOf(coreNodes)
      }
    }, n = 6)
  }
}
