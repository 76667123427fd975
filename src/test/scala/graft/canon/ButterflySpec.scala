package graft.canon

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** GraphAlgs.butterflyCounts vs direct quadruple enumeration on random
  * bipartite graphs, plus closed forms: a complete K_{2,m} biclique and
  * butterfly-free stars/trees.
  */
class ButterflySpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop, n: Int = 8): Unit = {
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(n).withWorkers(1), p)
    assert(res.passed, res.status.toString)
  }

  /** Naive truth by DIRECT quadruple enumeration (not via the pair
    * histogram the engine uses): butterflies(e) = #{(e', {d1, d2}) :
    * e' != e, d1 < d2, both docs adjacent to both nodes}; partners(e) =
    * #{e' != e : they share >= 1 doc}.
    */
  private def naive(docs: Map[Int, Set[String]])
      : Map[String, (Long, Long)] = {
    val ents = docs.values.flatten.toSet
    ents.map { e =>
      val others = ents - e
      val mine = docs.filter(_._2.contains(e)).keys.toSeq.sorted
      val partners = others.count(o => mine.exists(d => docs(d).contains(o)))
      val bf = others.toSeq.map { o =>
        val shared = mine.count(d => docs(d).contains(o)).toLong
        shared * (shared - 1) / 2
      }.sum
      e -> (partners.toLong, bf)
    }.toMap
  }

  /** Engine path: per-doc sets -> canonical pair histogram -> counts. */
  private def run(docs: Map[Int, Set[String]]): Map[String, (Long, Long)] = {
    val pairs = docs.toSeq
      .flatMap { case (_, es) =>
        val s = es.toSeq.sorted
        for (i <- s.indices; j <- (i + 1) until s.length) yield (s(i), s(j))
      }
      .groupBy(identity).map { case ((a, b), xs) => (a, b, xs.size.toLong) }
      .toSeq
    if (pairs.isEmpty) Map.empty
    else GraphAlgs.butterflyCounts(pairs.toDF("a", "b", "c"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
  }

  private val genDocs: Gen[Map[Int, Set[String]]] = for {
    nd <- Gen.choose(1, 8)
    ne <- Gen.choose(2, 6)
    sets <- Gen.listOfN(nd,
      Gen.someOf((0 until ne).map(i => s"e$i")).map(_.toSet))
  } yield sets.zipWithIndex.map { case (s, i) => i -> s }.toMap

  test("butterflies ≡ direct quadruple enumeration on random bipartite graphs") {
    check(Prop.forAll(genDocs) { docs =>
      val got = run(docs)
      val want = naive(docs).filter { case (_, (p, _)) => p > 0 }
      got == want
    })
  }

  test("K_{2,m} biclique: both nodes count C(m,2) butterflies") {
    // two entities on m shared docs: one pair with c = m
    val m = 5
    val docs = (0 until m).map(d => d -> Set("x", "y")).toMap
    val got = run(docs)
    assert(got == Map("x" -> (1L, 10L), "y" -> (1L, 10L)))
  }

  test("star (every doc mentions a disjoint pair) is butterfly-free") {
    val docs = (0 until 4).map(d => d -> Set(s"a$d", "hub")).toMap
    val got = run(docs)
    assert(got.values.forall(_._2 == 0L))
    assert(got("hub")._1 == 4L)
  }
}
