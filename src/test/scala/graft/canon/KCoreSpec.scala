package graft.canon

import graft.SparkSpec

/** k-core peeling: hand-checked structures (clique + pendant tail,
  * cascading chain), equivalence against a scalar reference peeler on
  * random graphs, fixpoint stability once converged, and partitioning
  * invariance.
  */
class KCoreSpec extends SparkSpec {
  import spark.implicits._

  private def und(pairs: Seq[(String, String)]) =
    (pairs ++ pairs.map(_.swap)).toDF("src", "dst")

  private def core(pairs: Seq[(String, String)], k: Int, rounds: Int) =
    GraphAlgs.kCore(und(pairs), k, rounds).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  test("2-core strips a pendant chain off a triangle") {
    // triangle a-b-c plus chain c-d-e: d and e peel (deg < 2 after e)
    val g = Seq(("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("d", "e"))
    val out = core(g, k = 2, rounds = 3)
    assert(out == Map("a" -> 2L, "b" -> 2L, "c" -> 2L))
  }

  test("cascading peel: each round unlocks the next removal") {
    // path a-b-c-d-e with k=2: ends peel one per round from both sides;
    // after round 2 no edge survives (a path has an empty 2-core)
    val g = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"))
    assert(core(g, 2, 1).keySet == Set("b", "c", "d"))
    assert(core(g, 2, 2).isEmpty)
  }

  test("matches a scalar reference peeler on random graphs") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val n = 14
      val pairs = (for {
        i <- 0 until n; j <- (i + 1) until n
        if rnd.nextDouble() < 0.25
      } yield (s"v$i", s"v$j")).toSeq
      if (pairs.nonEmpty) {
        val k = 2 + trial % 2
        // scalar synchronous peeler, same fixed rounds
        var adj = (pairs ++ pairs.map(_.swap)).groupBy(_._1)
          .view.mapValues(_.map(_._2).toSet).toMap
        for (_ <- 1 to 6) {
          val alive = adj.filter(_._2.size >= k).keySet
          adj = adj.collect { case (v, ns) if alive(v) =>
            v -> ns.filter(alive) }.toMap.filter(_._2.nonEmpty)
        }
        val expect = adj.map { case (v, ns) => v -> ns.size.toLong }
        assert(core(pairs, k, 6) == expect, s"trial $trial")
      }
    }
  }

  test("fixpoint: once converged, more rounds change nothing") {
    val g = Seq(("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("d", "e"),
      ("e", "f"), ("f", "d"))
    assert(core(g, 2, 3) == core(g, 2, 6))
  }

  test("partitioning invariance") {
    val g = (0 until 30).map(i => (s"x${i % 7}", s"y${i % 11}"))
    val e = und(g)
    val a = GraphAlgs.kCore(e.repartition(1), 3, 4)
      .orderBy("node").collect().map(_.toSeq).toSeq
    val b = GraphAlgs.kCore(e.repartition(5), 3, 4)
      .orderBy("node").collect().map(_.toSeq).toSeq
    assert(a == b)
  }
}
