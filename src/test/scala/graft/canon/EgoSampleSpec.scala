package graft.canon

import graft.SparkSpec
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** egoSample vs a scalar replay of the hash-rank selection, plus the
  * cap/coverage laws and the displacement-only stability law that makes
  * hash-rank sampling rerun-stable (unlike rand()).
  */
class EgoSampleSpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop, n: Int = 8): Unit = {
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(n).withWorkers(1), p)
    assert(res.passed, res.status.toString)
  }

  private val edgeGen: Gen[List[(Int, Int)]] =
    Gen.listOfN(60, for {
      a <- Gen.choose(0, 12); b <- Gen.choose(0, 12)
    } yield (a, b)).map(_.collect { case (a, b) if a != b =>
      (math.min(a, b), math.max(a, b)) }.distinct)

  private def h(src: String, dst: String): Long =
    graft.functions.MixHash.hash(UTF8String.fromString(s"$src>$dst"))

  /** Scalar replay: per-src (hash, dst) order, rank caps, layer join. */
  private def naive(es: List[(String, String)], k1: Int, k2: Int)
      : Set[(String, Long, String, String, Long)] = {
    val und = (es ++ es.map(_.swap)).distinct
    val ranked = und.groupBy(_._1).map { case (src, e) =>
      src -> e.map(_._2).distinct
        .sortBy(d => (h(src, d), d))
        .zipWithIndex.map { case (d, i) => (d, i + 1L) }
    }
    val s1 = for {
      (src, ds) <- ranked.toSeq; (d, rk) <- ds if rk <= k1
    } yield (src, d, rk)
    val l1 = s1.map { case (src, d, rk) => (src, 1L, src, d, rk) }
    val l2 = for {
      (seed, c, _) <- s1
      (g, rk) <- ranked.getOrElse(c, Nil) if rk <= k2
    } yield (seed, 2L, c, g, rk)
    (l1 ++ l2).toSet
  }

  private def run(es: List[(String, String)], k1: Int, k2: Int)
      : Set[(String, Long, String, String, Long)] =
    GraphAlgs.egoSample(
        es.toDF("a", "b").selectExpr("a AS src", "b AS dst")
          .unionAll(es.toDF("a", "b").selectExpr("b AS src", "a AS dst"))
          .distinct(),
        k1, k2)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getString(3), r.getLong(4)))
      .toSet

  test("egoSample ≡ the scalar hash-rank replay on random graphs") {
    check(Prop.forAll(edgeGen) { esI =>
      val es = esI.map { case (a, b) =>
        (('a' + a).toChar.toString, ('a' + b).toChar.toString) }
      es.isEmpty || run(es, 3, 2) == naive(es, 3, 2)
    })
  }

  test("caps and coverage: ≤k per (seed, layer, parent), ranks " +
      "contiguous from 1, layer-2 parents = layer-1 nodes") {
    val es = List(("a", "b"), ("a", "c"), ("a", "d"), ("a", "e"),
      ("b", "c"), ("b", "d"), ("c", "d"), ("d", "e"))
    val got = run(es, 3, 2).toSeq
    val byGroup = got.groupBy(r => (r._1, r._2, r._3))
    for (((_, layer, _), rows) <- byGroup) {
      val k = if (layer == 1L) 3 else 2
      assert(rows.size <= k)
      assert(rows.map(_._5).sorted == (1L to rows.size.toLong))
    }
    val l1nodes = got.filter(_._2 == 1L).map(r => (r._1, r._4)).toSet
    val l2parents = got.filter(_._2 == 2L).map(r => (r._1, r._3)).toSet
    assert(l2parents == l1nodes.filter { case (_, c) =>
      es.exists(e => e._1 == c || e._2 == c) })
  }

  test("displacement-only stability: growing the graph never reshuffles " +
      "a node's survivors, it only displaces by smaller hash") {
    val base = List(("a", "b"), ("a", "c"), ("a", "d"), ("a", "e"))
    val grown = base ++ List(("a", "f"), ("a", "g"))
    val k1 = 3
    def sample1(es: List[(String, String)]): Seq[(String, Long)] =
      run(es, k1, 2).toSeq.filter(r => r._2 == 1L && r._1 == "a")
        .map(r => (r._4, r._5)).sortBy(_._2)
    val before = sample1(base).map(_._1)
    val after = sample1(grown).map(_._1)
    // survivors keep their relative order; dropped nodes are exactly
    // those outranked by the new arrivals' smaller (h, dst) keys
    val survivors = before.filter(after.contains)
    assert(after.filter(before.contains) == survivors)
    val keyOf = (d: String) => (h("a", d), d)
    val expected = (base ++ List(("a", "f"), ("a", "g"))).map(_._2)
      .sortBy(keyOf).take(k1)
    assert(after == expected.sortBy(keyOf))
  }
}
