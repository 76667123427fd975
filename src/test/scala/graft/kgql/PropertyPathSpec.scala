package graft.kgql

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Δ-BFS bounded closure vs a driver-side reference BFS on random
  * digraphs: min-hop distances, hop cap, single-source restriction,
  * cycle safety.
  */
class PropertyPathSpec extends SparkSpec {
  import spark.implicits._

  private def refClosure(edges: Seq[(String, String)], maxHops: Int,
      from: Option[Set[String]] = None): Set[(String, String, Int)] = {
    val adj = edges.distinct.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val sources = from.getOrElse(edges.map(_._1).toSet)
    val out = scala.collection.mutable.Set[(String, String, Int)]()
    for (s <- sources if adj.contains(s)) {
      val dist = scala.collection.mutable.Map(s -> 0)
      var frontier = Set(s)
      var d = 0
      while (d < maxHops && frontier.nonEmpty) {
        d += 1
        frontier = frontier.flatMap(adj.getOrElse(_, Nil))
          .filterNot(dist.contains)
        frontier.foreach(dist(_) = d)
      }
      dist.foreach { case (t, dd) if dd > 0 && t != s => out += ((s, t, dd))
        case _ => () }
    }
    out.toSet
  }

  private def run(edges: Seq[(String, String)], maxHops: Int,
      from: Option[Seq[String]] = None): Set[(String, String, Int)] =
    PropertyPath.boundedClosure(edges.toDF("src", "dst"), maxHops,
        from.map(_.toDF("src")))
      .as[(String, String, Int)].collect().toSet

  test("chain graph: distances and hop cap") {
    val chain = Seq("a" -> "b", "b" -> "c", "c" -> "d", "d" -> "e")
    assert(run(chain, 3) == refClosure(chain, 3))
    assert(run(chain, 1) == chain.map { case (a, b) => (a, b, 1) }.toSet)
    // a reaches e only at 4 hops
    assert(!run(chain, 3).contains(("a", "e", 4)))
    assert(run(chain, 4).contains(("a", "e", 4)))
  }

  test("cycle: no self pairs, min dist wins") {
    val cyc = Seq("a" -> "b", "b" -> "c", "c" -> "a", "a" -> "c")
    val got = run(cyc, 5)
    assert(got == refClosure(cyc, 5))
    assert(!got.exists { case (s, t, _) => s == t })
    assert(got.contains(("a", "c", 1))) // direct edge beats the 2-hop path
  }

  test("single-source restriction") {
    val chain = Seq("a" -> "b", "b" -> "c", "c" -> "d")
    assert(run(chain, 3, Some(Seq("a"))) ==
      refClosure(chain, 3, Some(Set("a"))))
  }

  test("random digraphs match reference BFS") {
    val nodes = ('a' to 'h').map(_.toString)
    val edgeGen = Gen.listOf(for {
      s <- Gen.oneOf(nodes); t <- Gen.oneOf(nodes)
    } yield (s, t)).suchThat(_.nonEmpty)
    val prop = Prop.forAll(edgeGen, Gen.choose(1, 4)) { (edges, k) =>
      run(edges, k) == refClosure(edges, k)
    }
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(12).withWorkers(1), prop)
    assert(res.passed, res.status.toString)
  }
}
