package graft.canon

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** GraphAlgs.scc vs the quadratic mutual-reachability truth, plus the
  * two structural laws the operator rests on: a planted bow-tie (the
  * web regime the trim-color-collect phases target) and the
  * symmetric-graph reduction SCC ≡ CC.
  */
class SccSpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop, n: Int = 6): Unit = {
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(n).withWorkers(1), p)
    assert(res.passed, res.status.toString)
  }

  /** Naive truth: scc_id(v) = min over {u : v→*u and u→*v} by
    * transitive-closure bitsets — O(n³), fine at test scale. */
  private def naiveScc(nodes: Seq[String],
      es: Seq[(String, String)]): Map[String, String] = {
    val ns = nodes.distinct.sorted
    val idx = ns.zipWithIndex.toMap
    val n = ns.length
    val reach = Array.fill(n, n)(false)
    ns.indices.foreach(i => reach(i)(i) = true)
    es.foreach { case (a, b) => reach(idx(a))(idx(b)) = true }
    var changed = true
    while (changed) {
      changed = false
      for (i <- 0 until n; j <- 0 until n if reach(i)(j);
           k <- 0 until n if reach(j)(k) && !reach(i)(k)) {
        reach(i)(k) = true; changed = true
      }
    }
    ns.indices.map { i =>
      val mutual = ns.indices.filter(j => reach(i)(j) && reach(j)(i))
      ns(i) -> ns(mutual.min) // ns is sorted, so min index = min label
    }.toMap
  }

  test("scc finds a planted bow-tie: core cycle, tendrils, 2-cycle") {
    // core 3-cycle a→b→c→a; OUT tendril c→d→e; reciprocal pair e↔f
    val es = Seq(("a", "b"), ("b", "c"), ("c", "a"),
      ("c", "d"), ("d", "e"), ("e", "f"), ("f", "e"))
    val got = GraphAlgs.scc(es.toDF("src", "dst"))
      .as[(String, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == Map(
      "a" -> (("a", 3L)), "b" -> (("a", 3L)), "c" -> (("a", 3L)),
      "d" -> (("d", 1L)),
      "e" -> (("e", 2L)), "f" -> (("e", 2L))), got.toString)
  }

  test("scc ≡ quadratic mutual-reachability truth on random digraphs" +
      " (local Tarjan path)") {
    val gen: Gen[List[(Int, Int)]] = Gen.listOfN(40, for {
      a <- Gen.choose(0, 11); b <- Gen.choose(0, 11)
    } yield (a, b)).map(_.filter(e => e._1 != e._2).distinct)
    check(Prop.forAll(gen) { es =>
      es.isEmpty || {
        val sEs = es.map { case (a, b) => (f"n$a%02d", f"n$b%02d") }
        val nodes = sEs.flatMap(e => Seq(e._1, e._2)).distinct
        val naive = naiveScc(nodes, sEs)
        val got = GraphAlgs.scc(sEs.toDF("src", "dst").repartition(3))
          .as[(String, String, Long)].collect()
        val ids = got.map(r => r._1 -> r._2).toMap
        val sizeOk = got.forall { case (_, id, sz) =>
          sz == naive.values.count(_ == id) }
        ids == naive && sizeOk
      }
    }, n = 10)
  }

  test("distributed trim-color-collect ≡ local Tarjan (path equality)") {
    val gen: Gen[List[(Int, Int)]] = Gen.listOfN(35, for {
      a <- Gen.choose(0, 9); b <- Gen.choose(0, 9)
    } yield (a, b)).map(_.filter(e => e._1 != e._2).distinct)
    check(Prop.forAll(gen) { es =>
      es.isEmpty || {
        val df = es.map { case (a, b) => (s"n$a", s"n$b") }
          .toDF("src", "dst").repartition(3)
        val local = GraphAlgs.scc(df)
          .as[(String, String, Long)].collect().sortBy(_._1).toSeq
        spark.conf.set("spark.graft.scc.localThreshold", "0")
        val dist =
          try GraphAlgs.scc(df)
            .as[(String, String, Long)].collect().sortBy(_._1).toSeq
          finally spark.conf.unset("spark.graft.scc.localThreshold")
        local == dist
      }
    }, n = 4)
  }

  test("condensation of the bow-tie: source core at level 0, tendril" +
      " chain after it") {
    val es = Seq(("a", "b"), ("b", "c"), ("c", "a"),
      ("c", "d"), ("d", "e"), ("e", "f"), ("f", "e"))
    val got = GraphAlgs.condensation(es.toDF("src", "dst"), rounds = 5)
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(("a", 3L, 0L), ("d", 1L, 1L), ("e", 2L, 2L)),
      got.toString)
  }

  test("condensation laws: levels strictly increase along condensed" +
      " edges; level 0 ⟺ no incoming condensed edge") {
    val gen: Gen[List[(Int, Int)]] = Gen.listOfN(35, for {
      a <- Gen.choose(0, 9); b <- Gen.choose(0, 9)
    } yield (a, b)).map(_.filter(e => e._1 != e._2).distinct)
    check(Prop.forAll(gen) { es0 =>
      es0.isEmpty || {
        val es = es0.map { case (a, b) => (s"n$a", s"n$b") }
        val df = es.toDF("src", "dst")
        val lvl = GraphAlgs.condensation(df, rounds = 12)
          .as[(String, Long, Long)].collect()
          .map(r => r._1 -> r._3).toMap
        val lab = GraphAlgs.scc(df).as[(String, String, Long)]
          .collect().map(r => r._1 -> r._2).toMap
        val ce = es.map { case (u, v) => (lab(u), lab(v)) }
          .filter(e => e._1 != e._2).distinct
        val monotone = ce.forall { case (cs, cd) => lvl(cs) < lvl(cd) }
        val hasIn = ce.map(_._2).toSet
        val sources = lvl.forall { case (c, l) =>
          (l == 0L) == !hasIn.contains(c) }
        monotone && sources
      }
    }, n = 8)
  }

  test("scc over a symmetrized graph ≡ connected components") {
    val es = Seq(("a", "b"), ("b", "c"), ("x", "y"), ("p", "q"),
      ("q", "r"), ("r", "a"))
    val sym = (es ++ es.map(_.swap)).toDF("src", "dst")
    val got = GraphAlgs.scc(sym)
      .select("node", "scc_id").as[(String, String)].collect().toMap
    val cc = ConnectedComponents.run(es.toDF("a", "b"))
      .as[(String, String)].collect().toMap
    assert(got == cc, s"scc=$got cc=$cc")
  }
}
