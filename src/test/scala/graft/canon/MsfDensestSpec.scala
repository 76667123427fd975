package graft.canon

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** GraphAlgs.boruvkaForest and GraphAlgs.densestSubgraph vs naive
  * synchronous replays, plus the closed-form laws: Borůvka at
  * convergence equals the unique Kruskal forest under the (w, a, b)
  * total order; densest-peel surfaces a planted clique.
  */
class MsfDensestSpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop, n: Int = 6): Unit = {
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(n).withWorkers(1), p)
    assert(res.passed, res.status.toString)
  }

  // ---- Borůvka -------------------------------------------------------

  /** Naive Borůvka truth: per round each component's lightest out-edge
    * under the (w, a, b) total order, then min-label contraction.
    */
  private def naiveBoruvka(wedges: Seq[(String, String, Long)],
      rounds: Int): Set[(String, String, Long, Int)] = {
    val es = wedges.distinct
    var comp = es.flatMap(e => Seq(e._1, e._2)).distinct
      .map(n => n -> n).toMap
    val out = scala.collection.mutable.Set[(String, String, Long, Int)]()
    for (r <- 1 to rounds) {
      val lab = es.map { case (a, b, w) => (a, b, w, comp(a), comp(b)) }
        .filter(e => e._4 != e._5)
      val chosen = lab.flatMap(t => Seq(t._4 -> t, t._5 -> t))
        .groupBy(_._1).values
        .map(_.map(_._2).minBy { case (a, b, w, _, _) => (w, a, b) })
        .toSet
      out ++= chosen.map { case (a, b, w, _, _) => (a, b, w, r) }
      val adjPairs = chosen.map { case (_, _, _, ca, cb) => (ca, cb) }
      val adj = (adjPairs ++ adjPairs.map(_.swap)).groupBy(_._1)
        .map { case (k, v) => k -> v.map(_._2) }
      def minReach(start: String): String = {
        var seen = Set(start); var frontier = Set(start)
        while (frontier.nonEmpty) {
          val nxt = frontier.flatMap(adj.getOrElse(_, Set.empty)) -- seen
          seen ++= nxt; frontier = nxt
        }
        seen.min
      }
      val merged = adj.keys.map(c => c -> minReach(c)).toMap
      comp = comp.map { case (n, c) => n -> merged.getOrElse(c, c) }
    }
    out.toSet
  }

  /** Kruskal under the same (w, a, b) total order — the unique MSF. */
  private def kruskal(wedges: Seq[(String, String, Long)])
      : Set[(String, String, Long)] = {
    val parent = scala.collection.mutable.Map[String, String]()
    def find(x: String): String = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    val out = scala.collection.mutable.Set[(String, String, Long)]()
    for ((a, b, w) <- wedges.distinct
        .sortBy { case (a, b, w) => (w, a, b) }) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { parent(ra) = rb; out += ((a, b, w)) }
    }
    out.toSet
  }

  private def runBoruvka(wedges: Seq[(String, String, Long)],
      rounds: Int): Set[(String, String, Long, Int)] =
    GraphAlgs.boruvkaForest(wedges.toDF("a", "b", "w"), rounds)
      .as[(String, String, Long, Int)].collect().toSet

  /** Canonical a < b weighted edges over ≤8 nodes. */
  private val genWedges: Gen[List[(String, String, Long)]] =
    Gen.listOfN(16, for {
      a <- Gen.choose(0, 7); b <- Gen.choose(0, 7); w <- Gen.choose(1L, 5L)
    } yield (a min b, a max b, w))
      .map(_.filter(e => e._1 != e._2)
        .groupBy(e => (e._1, e._2)).values.map(_.head).toList
        .map { case (a, b, w) => (s"n$a", s"n$b", w) })

  test("Borůvka ≡ naive synchronous replay on random weighted graphs") {
    check(Prop.forAll(genWedges, Gen.choose(1, 3)) { (es, rounds) =>
      es.isEmpty || runBoruvka(es, rounds) == naiveBoruvka(es, rounds)
    }, n = 8)
  }

  test("Borůvka at convergence = the unique Kruskal forest under" +
      " (w, a, b)") {
    check(Prop.forAll(genWedges) { es =>
      es.isEmpty || {
        // ≤8 nodes: components at least halve per round, 3 rounds
        // converge; chosen edges may repeat across the two orientations
        // of one round but never across rounds (endpoints contracted).
        val forest = runBoruvka(es, rounds = 3)
          .map { case (a, b, w, _) => (a, b, w) }
        forest == kruskal(es)
      }
    }, n = 8)
  }

  test("Borůvka triangle tie-break: (w, a, b) picks the lexicographic" +
      " lightest, one round connects it") {
    // Equal weights everywhere — the (a, b) tie-break decides.
    val tri = Seq(("x", "y", 7L), ("x", "z", 7L), ("y", "z", 7L))
    val got = runBoruvka(tri, rounds = 1)
    // x and y both pick (7,x,y); z picks (7,x,z) — forest of 2 edges.
    assert(got == Set(("x", "y", 7L, 1), ("x", "z", 7L, 1)))
  }

  // ---- densest subgraph ----------------------------------------------

  private def naiveDensest(symEdges: Set[(String, String)], rounds: Int)
      : (Set[String], Long, Long, Int) = {
    var es = symEdges
    var v = symEdges.map(_._1)
    var best = v; var bestR = 0
    var bestNe = es.size.toLong / 2; var bestNv = v.size.toLong
    var bestD = if (bestNv == 0) -1.0 else bestNe.toDouble / bestNv
    for (r <- 1 to rounds) {
      val ne = es.size.toLong / 2; val nv = v.size.toLong
      if (nv > 0) {
        val deg = es.groupBy(_._1).map { case (k, g) => k -> g.size.toLong }
        v = v.filter(n => deg.getOrElse(n, 0L) * nv > 3L * ne)
        es = es.filter(e => v(e._1) && v(e._2))
        val ne2 = es.size.toLong / 2; val nv2 = v.size.toLong
        val d = if (nv2 == 0) -1.0 else ne2.toDouble / nv2
        if (d > bestD) {
          bestD = d; best = v; bestR = r; bestNe = ne2; bestNv = nv2
        }
      }
    }
    (best, bestNv, bestNe, bestR)
  }

  private def runDensest(es: Seq[(String, String)], rounds: Int)
      : (Set[String], Long, Long, Int) = {
    val s = (es ++ es.map(_.swap)).filter(e => e._1 != e._2).distinct
    val rows = GraphAlgs.densestSubgraph(s.toDF("src", "dst"), rounds)
      .as[(String, Long, Long, Int)].collect()
    if (rows.isEmpty) (Set.empty, 0L, 0L, 0)
    else (rows.map(_._1).toSet, rows.head._2, rows.head._3, rows.head._4)
  }

  test("densest peel ≡ naive replay (nodes, counts, best round)") {
    val gen: Gen[List[(String, String)]] = Gen.listOfN(30, for {
      a <- Gen.choose(0, 9); b <- Gen.choose(0, 9)
    } yield (s"n$a", s"n$b")).map(_.filter(e => e._1 != e._2).distinct)
    check(Prop.forAll(gen, Gen.choose(1, 4)) { (es, rounds) =>
      es.isEmpty || {
        val s = (es ++ es.map(_.swap)).toSet
        runDensest(es, rounds) == naiveDensest(s, rounds)
      }
    }, n = 8)
  }

  test("planted K6 in a 20-node path surfaces as the densest subgraph") {
    val clique = for {
      i <- 1 to 6; j <- (i + 1) to 6
    } yield (s"c$i", s"c$j")
    val path = (1 to 19).map(i => (f"p$i%02d", f"p${i + 1}%02d"))
    val (nodes, nv, ne, _) = runDensest(clique ++ path, rounds = 2)
    assert(nodes == (1 to 6).map(i => s"c$i").toSet)
    assert(nv == 6L && ne == 15L)
  }
}
