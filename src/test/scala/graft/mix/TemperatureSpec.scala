package graft.mix

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Mix.temperatureBp vs a BigInt driver-side replay, the Σbp == total
  * invariant, the weak monotonicity the largest-remainder rounding
  * preserves, and isqrt exactness across the float-candidate boundary.
  */
class TemperatureSpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop, n: Int = 10): Unit = {
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(n).withWorkers(1), p)
    assert(res.passed, res.status.toString)
  }

  private def isqrtL(x: Long): Long = {
    val s = math.sqrt(x.toDouble).toLong
    Iterator.iterate(s)(_ - 1).dropWhile(v => v * v > x)
      .map(v => if ((v + 1) * (v + 1) <= x) v + 1 else v).next()
  }

  private def naive(counts: Map[String, Long], total: Long)
      : Map[String, (Long, Long)] = {
    val w = counts.map { case (s, c) => s -> isqrtL(c * 1000000L) }
    val tw = w.values.sum
    val base = w.map { case (s, x) => s -> x * total / tw }
    val rem = w.map { case (s, x) => s -> x * total % tw }
    val deficit = total - base.values.sum
    val bonus = counts.keys.toSeq
      .sortBy(s => (-rem(s), s))(Ordering.Tuple2(Ordering.Long,
        graft.model.CodePoint.ordering))
      .take(deficit.toInt).toSet
    counts.keys.map { s =>
      s -> (w(s), base(s) + (if (bonus(s)) 1L else 0L))
    }.toMap
  }

  private val genCounts: Gen[Map[String, Long]] = for {
    k <- Gen.choose(1, 12)
    cs <- Gen.listOfN(k, Gen.choose(1L, 100000L))
  } yield cs.zipWithIndex.map { case (c, i) => s"s$i" -> c }.toMap

  private def run(counts: Map[String, Long])
      : Map[String, (Long, Long, Long)] =
    Mix.temperatureBp(
        counts.toSeq.flatMap { case (s, c) =>
          (0L until c).map(i => (s, i))
        }.toDF("source", "i"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3)))
      .toMap

  test("temperatureBp equals the BigInt replay; sum is exactly 10000") {
    check(Prop.forAll(genCounts.map(_.map { case (s, c) =>
        s -> (c % 50 + 1)
      })) { counts =>
      val got = run(counts)
      val want = naive(counts, 10000L)
      got.map { case (s, (n, w, bp)) => s -> (w, bp) } == want &&
        got.values.map(_._3).sum == 10000L &&
        got.forall { case (s, (n, _, _)) => n == counts(s) }
    }, n = 8)
  }

  test("weak monotonicity: a bigger source is never more than 1 bp " +
      "below a smaller one") {
    val got = run(Map("a" -> 40L, "b" -> 10L, "c" -> 10L, "d" -> 1L))
    assert(got("a")._3 >= got("b")._3 - 1)
    assert(got("b")._3 >= got("d")._3 - 1)
    assert(got.values.map(_._3).sum == 10000L)
  }

  test("column isqrt is exact, including perfect squares and " +
      "off-by-one float candidates") {
    val xs = Seq(0L, 1L, 2L, 3L, 4L, 99L, 100L, 101L,
      999999L, 1000000L, 1000001L, (1L << 52) - 1, 1L << 52,
      4611686014132420608L) ++ (1 to 50).map(i => i.toLong * i * 1000000L)
    val got = xs.toDF("x").select(Mix.isqrt(org.apache.spark.sql
        .functions.col("x")).as("s"))
      .collect().map(_.getLong(0))
    xs.zip(got).foreach { case (x, s) =>
      assert(s * s <= x && (s + 1) * (s + 1) > x, s"isqrt($x) = $s")
    }
  }
}
