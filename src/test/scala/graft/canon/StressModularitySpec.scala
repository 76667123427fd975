package graft.canon

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** GraphAlgs.stressCentrality vs a naive layered-BFS path-counting
  * truth, plus the modularity identities (null partition sums to zero;
  * planted cliques score positive; singleton partition scores
  * −ΣD_c²).
  */
class StressModularitySpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop, n: Int = 6): Unit = {
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(n).withWorkers(1), p)
    assert(res.passed, res.status.toString)
  }

  /** Naive truth: layered BFS (dist, sigma) from each seed, then the
    * σ(s,v)·σ(t,v) combine over pairs s < t gated on d(s,v)+d(v,t) =
    * d(s,t), hop-bounded like the operator. */
  private def naiveStress(es: Seq[(String, String)], seeds: Seq[String],
      rounds: Int): Map[String, Long] = {
    val adj = es.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    def bfs(s: String): Map[String, (Int, Long)] = {
      var state = Map(s -> ((0, 1L)))
      var frontier = Map(s -> 1L)
      for (k <- 1 to rounds) {
        val next = scala.collection.mutable.Map[String, Long]()
        frontier.foreach { case (u, sig) =>
          adj.getOrElse(u, Nil).foreach { v =>
            if (!state.contains(v))
              next(v) = next.getOrElse(v, 0L) + sig
          }
        }
        state = state ++ next.map { case (v, sig) => v -> ((k, sig)) }
        frontier = next.toMap
      }
      state
    }
    val b = seeds.map(s => s -> bfs(s)).toMap
    val acc = scala.collection.mutable.Map[String, Long]()
    for {
      s <- seeds; t <- seeds if s < t
      dst <- b(s).get(t).map(_._1)
      (v, (d1, g1)) <- b(s) if v != s && v != t
      (d2, g2) <- b(t).get(v) if d1 + d2 == dst
    } acc(v) = acc.getOrElse(v, 0L) + g1 * g2
    acc.filter(_._2 > 0).toMap
  }

  private def run(es: Seq[(String, String)], seeds: Seq[String],
      rounds: Int = 4): Map[String, Long] = {
    val sym = (es ++ es.map(_.swap)).distinct
    GraphAlgs.stressCentrality(sym.toDF("src", "dst"),
        seeds.toDF("node"), rounds)
      .as[(String, Long)].collect().toMap
  }

  test("stress on a path: every interior node carries the one path") {
    // a-b-c-d-e undirected, seeds {a, e}: one shortest path, three
    // interior nodes
    val es = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"))
    assert(run(es, Seq("a", "e")) ==
      Map("b" -> 1L, "c" -> 1L, "d" -> 1L))
  }

  test("stress on a diamond: parallel branches split the count," +
      " sigma multiplies") {
    // a-{b,c}-e then e-f; seeds {a, f}: σ_af = 2, through b and c one
    // each, through e both
    val es = Seq(("a", "b"), ("a", "c"), ("b", "e"), ("c", "e"),
      ("e", "f"))
    assert(run(es, Seq("a", "f")) ==
      Map("b" -> 1L, "c" -> 1L, "e" -> 2L))
  }

  test("stress ≡ naive layered-BFS truth on random graphs") {
    val gen: Gen[List[(Int, Int)]] = Gen.listOfN(30, for {
      a <- Gen.choose(0, 9); b <- Gen.choose(0, 9)
    } yield (a, b)).map(_.filter(e => e._1 != e._2).distinct)
    check(Prop.forAll(gen) { es0 =>
      es0.isEmpty || {
        val es = es0.map { case (a, b) => (s"n$a", s"n$b") }
        val sym = (es ++ es.map(_.swap)).distinct
        val seeds = sym.map(_._1).distinct.sorted.take(4)
        run(es, seeds) == naiveStress(sym, seeds, rounds = 4)
      }
    }, n = 8)
  }

  test("modularity: the whole-graph partition sums to exactly zero") {
    // Σ_c q_contrib = 4m·m − (2m)² = 0 when one community holds all
    val es = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("a", "c"))
    val labels = Seq("a", "b", "c", "d").map(n => (n, "one"))
    val got = GraphAlgs.modularity(es.toDF("a", "b"),
        labels.toDF("node", "label"))
      .as[(String, Long, Long, Long, Long)].collect()
    assert(got.length == 1)
    val (_, n, intra, degSum, q) = got(0)
    assert((n, intra, degSum, q) == ((4L, 4L, 8L, 0L)), got(0).toString)
  }

  test("modularity: singleton partition scores −deg² per node," +
      " planted-clique partition scores positive") {
    // two disjoint triangles
    val es = Seq(("a", "b"), ("b", "c"), ("a", "c"),
      ("x", "y"), ("y", "z"), ("x", "z"))
    val singleton = es.flatMap(e => Seq(e._1, e._2)).distinct
      .map(n => (n, n))
    val gotS = GraphAlgs.modularity(es.toDF("a", "b"),
        singleton.toDF("node", "label"))
      .as[(String, Long, Long, Long, Long)].collect()
    assert(gotS.forall { case (_, _, intra, degSum, q) =>
      intra == 0L && q == -degSum * degSum }, gotS.mkString(","))
    // natural two-clique partition: q_contrib = 4·6·3 − 6² = 36 each
    val natural = Seq("a", "b", "c").map((_, "t1")) ++
      Seq("x", "y", "z").map((_, "t2"))
    val gotN = GraphAlgs.modularity(es.toDF("a", "b"),
        natural.toDF("node", "label"))
      .as[(String, Long, Long, Long, Long)].collect()
    assert(gotN.length == 2 && gotN.forall { case (_, n, intra, d, q) =>
      n == 3L && intra == 3L && d == 6L && q == 36L },
      gotN.mkString(","))
  }
}
