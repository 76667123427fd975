package graft.canon

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** GraphAlgs.maximalMatching vs a naive synchronous replay, the
  * validity/maximality laws, and the documented monotone-chain
  * worst case (one pair per round).
  */
class MatchingSpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop, n: Int = 6): Unit = {
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(n).withWorkers(1), p)
    assert(res.passed, res.status.toString)
  }

  /** Naive truth: min-proposal + mutuality + removal, per round. */
  private def naive(sym: Seq[(String, String)],
      rounds: Int): Set[(String, String)] = {
    var es = sym.toSet
    val out = scala.collection.mutable.Set[(String, String)]()
    for (_ <- 1 to rounds) {
      val prop = es.groupBy(_._1).map { case (s, e) => s -> e.map(_._2).min }
      val mutual = prop.collect {
        case (i, j) if i < j && prop.get(j).contains(i) => (i, j) }.toSet
      out ++= mutual
      val matched = mutual.flatMap(p => Set(p._1, p._2))
      es = es.filter(e => !matched(e._1) && !matched(e._2))
    }
    out.toSet
  }

  private def run(es: Seq[(String, String)],
      rounds: Int = 3): Set[(String, String)] = {
    val sym = (es ++ es.map(_.swap)).distinct
    GraphAlgs.maximalMatching(sym.toDF("src", "dst"), rounds)
      .as[(String, String)].collect().toSet
  }

  test("monotone chain: the documented worst case matches exactly one" +
      " pair per round, lowest pair first") {
    val path = (1 to 5).map(i => (s"n$i", s"n${i + 1}"))
    assert(run(path, rounds = 1) == Set(("n1", "n2")))
    assert(run(path, rounds = 2) == Set(("n1", "n2"), ("n3", "n4")))
    assert(run(path, rounds = 3) ==
      Set(("n1", "n2"), ("n3", "n4"), ("n5", "n6")))
  }

  test("matching ≡ naive synchronous replay on random graphs") {
    val gen: Gen[List[(Int, Int)]] = Gen.listOfN(30, for {
      a <- Gen.choose(0, 9); b <- Gen.choose(0, 9)
    } yield (a, b)).map(_.filter(e => e._1 != e._2).distinct)
    check(Prop.forAll(gen, Gen.choose(1, 3)) { (es0, rounds) =>
      es0.isEmpty || {
        val es = es0.map { case (a, b) => (s"n$a", s"n$b") }
        val sym = (es ++ es.map(_.swap)).distinct
        run(es, rounds) == naive(sym, rounds)
      }
    }, n = 10)
  }

  test("validity + maximality: no node matched twice, every pair an" +
      " edge, and at convergence no edge joins two unmatched nodes") {
    val gen: Gen[List[(Int, Int)]] = Gen.listOfN(35, for {
      a <- Gen.choose(0, 9); b <- Gen.choose(0, 9)
    } yield (a, b)).map(_.filter(e => e._1 != e._2).distinct)
    check(Prop.forAll(gen) { es0 =>
      es0.isEmpty || {
        val es = es0.map { case (a, b) => (s"n$a", s"n$b") }
        // ≤10 nodes → ≤5 pairs; every round matches ≥1 pair until no
        // edge remains (the global-min argument in the scaladoc), so
        // 6 rounds is past convergence
        val got = run(es, rounds = 6)
        val nodes = got.toSeq.flatMap(p => Seq(p._1, p._2))
        val edgeSet = (es ++ es.map(_.swap)).toSet
        val valid = nodes.distinct.length == nodes.length &&
          got.forall(edgeSet)
        val matched = nodes.toSet
        val maximal = !edgeSet.exists(e =>
          !matched(e._1) && !matched(e._2))
        valid && maximal
      }
    }, n = 8)
  }
}
