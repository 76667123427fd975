package graft.text

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** TextAnalysis.collocations vs a full driver-side replay of the
  * quantized G² (contingency table from scratch, StrictMath.log
  * micro-nats), plus the signature law: a pair that always co-occurs
  * outscores independent pairs.
  */
class CollocationsSpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop, n: Int = 8): Unit = {
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(n).withWorkers(1), p)
    assert(res.passed, res.status.toString)
  }

  private def lnq(x: Long): Long = math.round(StrictMath.log(x) * 1e6)
  private def s(x: Long): Long = if (x > 0) x * lnq(x) else 0L

  private def naive(texts: Seq[String], k: Int)
      : Seq[(String, String, Long, Long)] = {
    val bigrams = texts.flatMap { t =>
      val w = t.split(' ').filter(_.nonEmpty)
      if (w.length < 2) Nil else w.sliding(2).map(p => (p(0), p(1))).toSeq
    }
    val bc = bigrams.groupBy(identity).map { case (p, xs) =>
      p -> xs.size.toLong }
    val r = bc.groupBy(_._1._1).map { case (a, m) => a -> m.values.sum }
    val c = bc.groupBy(_._1._2).map { case (b, m) => b -> m.values.sum }
    val n = bc.values.sum
    bc.toSeq.map { case ((a, b), k11) =>
      val (ra, cb) = (r(a), c(b))
      val g2 = 2 * (s(k11) + s(ra - k11) + s(cb - k11) +
        s(n - ra - cb + k11) - s(ra) - s(n - ra) - s(cb) - s(n - cb) +
        s(n))
      (a, b, k11, g2)
    }.sortBy { case (a, b, _, g2) => (-g2, a, b) }.take(k)
  }

  private def run(texts: Seq[String], k: Int)
      : Seq[(String, String, Long, Long)] =
    TextAnalysis.collocations(texts.toDF("text"), topK = k)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
      .toSeq

  test("collocations equal the quantized G² replay (ScalaCheck)") {
    val genTexts = Gen.listOfN(25, Gen.listOfN(12,
        Gen.oneOf("a", "b", "c", "d", "e", "f")).map(_.mkString(" ")))
    check(Prop.forAll(genTexts) { texts =>
      run(texts, 50) == naive(texts, 50)
    })
  }

  test("an always-together pair outscores independent fillers") {
    // "new york" glued in every doc; fillers drawn round-robin
    val texts = (0 until 30).map { i =>
      s"w${i % 5} new york w${(i + 1) % 5} w${(i + 2) % 5}"
    }
    val top = run(texts, 3)
    assert(top.head._1 == "new" && top.head._2 == "york", top.toString)
    assert(top.head._4 > top(1)._4)
  }
}
