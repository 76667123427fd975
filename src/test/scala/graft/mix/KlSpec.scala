package graft.mix

import graft.SparkSpec
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Test.{check => scCheck, Parameters}

/** KL-audit laws: exact driver-side replay of the micro-nat term sum
  * over random corpora, exact zero for a single-source corpus (the four
  * ln terms cancel identically), near-zero (≤ quantization slack) for
  * two identical sources, and near-positivity (Gibbs up to quantization)
  * everywhere.
  */
class KlSpec extends SparkSpec {
  import spark.implicits._

  private def lnM(x: Long): Long = math.round(math.log(x.toDouble) * 1e6)

  private def bruteKl(docs: Seq[(String, String)]): Map[String, (Long, Long, Long)] = {
    val toks = docs.flatMap { case (s, t) =>
      t.split(" ").filter(_.nonEmpty).map(s -> _)
    }
    val h = toks.groupBy(identity).map { case ((s, w), g) => (s, w, g.size.toLong) }
    val ns = h.groupBy(_._1).map { case (s, g) => s -> g.map(_._3).sum }
    val nd = h.groupBy(_._1).map { case (s, g) => s -> g.size.toLong }
    val ct = h.groupBy(_._2).map { case (w, g) => w -> g.map(_._3).sum }
    val nn = h.map(_._3).sum
    h.groupBy(_._1).map { case (s, g) =>
      val sum = g.map { case (_, w, c) =>
        BigInt(c) * (lnM(c) + lnM(nn) - lnM(ns(s)) - lnM(ct(w)))
      }.sum
      s -> (ns(s), nd(s), sum.toLong)
    }
  }

  private def sparkKl(docs: Seq[(String, String)]) =
    Mix.klBySource(docs.zipWithIndex.map { case ((s, t), i) =>
        (i.toLong, s, t)
      }.toDF("doc_id", "source", "text"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap

  test("single-source corpus: kl_sum is exactly zero (terms cancel identically)") {
    val out = sparkKl(Seq("a" -> "x y x z", "a" -> "y y x"))
    assert(out("a")._3 == 0L)
  }

  test("two identical sources: |kl_sum| bounded by per-term quantization slack") {
    val out = sparkKl(Seq("a" -> "x y x z z", "b" -> "x y x z z"))
    for ((_, (nTok, _, s)) <- out) assert(math.abs(s) <= 2L * nTok)
  }

  test("ScalaCheck: exact replay + Gibbs near-positivity over random corpora") {
    val word = Gen.oneOf("u", "v", "w", "x", "y")
    val doc = Gen.nonEmptyListOf(word).map(_.mkString(" "))
    val src = Gen.oneOf("s1", "s2", "s3")
    val entry = Gen.zip(src, doc)
    val prop = Prop.forAll(Gen.nonEmptyListOf(entry)) { docs =>
      val b = bruteKl(docs)
      val s = sparkKl(docs)
      val replay = s == b
      // Gibbs: true KL ≥ 0; each of the 4 lnM roundings is off ≤ 0.5
      // micro, so the (s,w) term shifts ≤ 2·c and the sum ≥ −2·n_s
      val nearPos = s.values.forall { case (nTok, _, sum) =>
        sum >= -2L * nTok
      }
      replay && nearPos
    }
    val res = scCheck(Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }
}
