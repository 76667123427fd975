package graft.sketch

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** AMS F2 laws: the sketch matches a scalar replay, E[z²] ≈ F2 across
  * rows (unbiasedness in-sample), the sketch is partitioning-invariant,
  * and — the property CMS/HLL lack — it is LINEAR: z(A ⊎ B) =
  * z(A) + z(B), including deletion via negated counts.
  */
class AmsSpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop, n: Int = 8): Unit = {
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(n).withWorkers(1), p)
    assert(res.passed, res.status.toString)
  }

  private def docsOf(tokens: Seq[String]) =
    Seq(("g", tokens.mkString(" "))).toDF("source", "text")

  private def scalarZ(tokens: Seq[String], r: Int): Long =
    tokens.map(t => Ams.sign(r, t)).sum

  test("sketch ≡ scalar replay; partitioning-invariant") {
    check(Prop.forAll(Gen.listOfN(200, Gen.choose(0, 60).map(i => s"w$i"))) {
      toks =>
        toks.nonEmpty && {
          val rows = Ams.sketch(
              toks.map(t => ("g", t)).toDF("source", "text").repartition(7))
            .as[(String, Int, Long, Long)].collect()
            .map { case (_, r, z, x) => r -> (z, x) }.toMap
          (0 until Ams.K).forall { r =>
            val z = scalarZ(toks, r)
            rows(r) == (z, z * z)
          }
        }
    })
  }

  test("mean of z² tracks F2 within the AMS variance band") {
    val toks = (0 until 3000).map(i => s"t${i % 90}")
    val f2 = toks.groupBy(identity).map { case (_, g) =>
      g.size.toLong * g.size }.sum
    val xs = Ams.sketch(docsOf(toks)).select("x").as[Long].collect()
    val mean = xs.sum.toDouble / xs.length
    // Var[z²] ≤ 2·F2² per row; mean of 4 rows → sd ≤ F2/sqrt(2).
    // 3 sd one-sided band — loose but catches sign-hash breakage
    assert(math.abs(mean - f2) < 3 * f2 / math.sqrt(2.0),
      s"mean=$mean f2=$f2")
  }

  test("linearity: z over a multiset union = sum of the halves' z") {
    check(Prop.forAll(
      Gen.listOfN(80, Gen.choose(0, 40).map(i => s"a$i")),
      Gen.listOfN(80, Gen.choose(0, 40).map(i => s"b$i"))) { (as, bs) =>
        as.isEmpty || bs.isEmpty || {
          val whole = Ams.sketch(docsOf(as ++ bs))
            .select("r", "z").as[(Int, Long)].collect().toMap
          val parts = Ams.sketch(docsOf(as)).select("r", "z")
            .union(Ams.sketch(docsOf(bs)).select("r", "z"))
            .groupBy("r").agg(sum("z").as("z"))
            .as[(Int, Long)].collect().toMap
          whole == parts
        }
    })
  }

  test("deletion: adding a negated batch cancels its contribution") {
    val base = (0 until 100).map(i => s"k${i % 9}")
    val extra = (0 until 40).map(i => s"k${i % 5}")
    val zBase = (0 until Ams.K).map(r => scalarZ(base, r))
    // stream in extra, then delete it: z + z(extra) - z(extra) = z
    val zRound = (0 until Ams.K).map(r =>
      scalarZ(base, r) + scalarZ(extra, r) - scalarZ(extra, r))
    assert(zRound == zBase)
  }
}
