package graft.canon

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** GraphAlgs.louvainMove vs a naive synchronous replay of the gain
  * rule, the swap-guard convergence cases, and the planted-community
  * closed forms.
  */
class LouvainSpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop, n: Int = 6): Unit = {
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(n).withWorkers(1), p)
    assert(res.passed, res.status.toString)
  }

  /** Naive truth: the identical synchronous rule — insertion gain
    * 4m·k_ic − 2·deg_i·D_{c∖i}, Grappolo singleton-swap guard,
    * (gain desc, label asc) argmax — on in-memory maps. */
  private def naive(es: Seq[(String, String)],
      rounds: Int): Map[String, String] = {
    val sym = (es ++ es.map(_.swap)).distinct
    val adj = sym.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val deg = adj.map { case (k, v) => k -> v.size.toLong }
    val m = sym.size.toLong / 2
    var lab = deg.keys.map(n => n -> n).toMap
    for (_ <- 1 to rounds) {
      // .keys.toSeq before mapping to degrees: Set.map would collapse
      // equal degree values and under-count the community sum
      val dc = lab.groupBy(_._2).map { case (c, ms) =>
        c -> ms.keys.toSeq.map(deg).sum }
      val csz = lab.groupBy(_._2).map { case (c, ms) => c -> ms.size }
      lab = lab.map { case (i, own) =>
        val kic = adj(i).groupBy(lab).map { case (c, ns) =>
          c -> ns.size.toLong }
        val cands = (kic.keySet + own).toSeq
          .filter(c => !(csz(c) == 1 && csz(own) == 1 && c > own))
        val best = cands.map { c =>
          val d = dc(c) - (if (c == own) deg(i) else 0L)
          (4L * m * kic.getOrElse(c, 0L) - 2L * deg(i) * d, c)
        }.minBy { case (g, c) => (-g, c) }
        i -> best._2
      }
    }
    lab
  }

  private def run(es: Seq[(String, String)],
      rounds: Int = 2): Map[String, String] = {
    val sym = (es ++ es.map(_.swap)).distinct
    GraphAlgs.louvainMove(sym.toDF("src", "dst"), rounds)
      .as[(String, String)].collect().toMap
  }

  test("swap guard: an isolated edge converges to the smaller label" +
      " instead of oscillating") {
    assert(run(Seq(("a", "b"))) == Map("a" -> "a", "b" -> "a"))
    // and it is a fixpoint, not a phase of period 2
    assert(run(Seq(("a", "b")), rounds = 3) ==
      Map("a" -> "a", "b" -> "a"))
  }

  test("disjoint triangles collapse to per-triangle communities") {
    val es = Seq(("a", "b"), ("b", "c"), ("a", "c"),
      ("x", "y"), ("y", "z"), ("x", "z"))
    val got = run(es)
    assert(got == Map("a" -> "a", "b" -> "a", "c" -> "a",
      "x" -> "x", "y" -> "x", "z" -> "x"), got.toString)
    // the move strictly improves the 4m²-scaled modularity vs singletons
    val labels = got.toSeq.toDF("node", "label")
    val q = GraphAlgs.modularity(es.toDF("a", "b"), labels)
      .agg(sum(col("q_contrib"))).as[Long].head()
    assert(q == 72L, s"q=$q") // 2 × (4·6·3 − 36)
  }

  test("louvainMove ≡ naive synchronous replay on random graphs") {
    val gen: Gen[List[(Int, Int)]] = Gen.listOfN(30, for {
      a <- Gen.choose(0, 9); b <- Gen.choose(0, 9)
    } yield (a, b)).map(_.filter(e => e._1 != e._2).distinct)
    check(Prop.forAll(gen, Gen.choose(1, 3)) { (es0, rounds) =>
      es0.isEmpty || {
        val es = es0.map { case (a, b) => (s"n$a", s"n$b") }
        run(es, rounds) == naive(es, rounds)
      }
    }, n = 10)
  }
}
