package graft.sketch

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** HeavyHitters.exact vs the brute-force histogram filter under RANDOM
  * repartitioning — the partitioning-invariance that makes the two-pass
  * shape oracle-able even though Misra–Gries itself is order-sensitive
  * — plus the superset law the recount relies on (per-partition MG(m≥k)
  * candidates cover every true heavy hitter) and the scalar MG
  * undercount bound.
  */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop, n: Int = 10): Unit = {
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(n).withWorkers(1), p)
    assert(res.passed, res.status.toString)
  }

  // skewed streams: a few hot keys over a small alphabet
  private val genToks: Gen[List[String]] = for {
    n <- Gen.choose(1, 400)
    toks <- Gen.listOfN(n, Gen.frequency(
      6 -> Gen.const("hot"), 3 -> Gen.const("warm"),
      2 -> Gen.oneOf("a", "b", "c"),
      1 -> Gen.choose(0, 40).map(i => s"t$i")))
  } yield toks

  private def brute(toks: List[String], k: Int): Set[(String, Long)] = {
    val n = toks.size.toLong
    toks.groupBy(identity).map { case (t, xs) => (t, xs.size.toLong) }
      .filter { case (_, c) => c * k >= n }.toSet
  }

  test("exact(k) equals the brute histogram filter on any partitioning") {
    check(Prop.forAll(genToks, Gen.choose(1, 7)) { (toks, parts) =>
      val ds = toks.toDS().repartition(parts)
      val rows = HeavyHitters.exact(ds, k = 4).collect()
      rows.map(r => (r.getString(0), r.getLong(1))).toSet ==
        brute(toks, 4) &&
        rows.forall(_.getLong(2) == toks.size.toLong)
    })
  }

  test("per-partition MG(m >= k) candidates cover every true heavy " +
      "hitter") {
    check(Prop.forAll(genToks, Gen.choose(1, 7)) { (toks, parts) =>
      val cand = HeavyHitters
        .candidates(toks.toDS().repartition(parts), m = 4)
        .collect().toSet
      brute(toks, 4).forall { case (t, _) => cand(t) }
    })
  }

  test("scalar MG undercount bound: surviving counter >= c - n/(m+1)") {
    check(Prop.forAll(genToks) { toks =>
      val m = 3
      val keys = HeavyHitters.misraGries(toks.iterator, m).toSet
      // any key with count > n/(m+1) must survive
      val n = toks.size
      toks.groupBy(identity).forall { case (t, xs) =>
        xs.size * (m + 1) <= n || keys(t)
      }
    })
  }

  test("MG state never exceeds m keys") {
    val toks = (0 until 1000).map(i => s"k${i % 97}")
    assert(HeavyHitters.misraGries(toks.iterator, 5).size <= 5)
  }
}
