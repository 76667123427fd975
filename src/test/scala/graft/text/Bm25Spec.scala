package graft.text

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** BM25 integer core vs a naive scalar replay, plus the ranking
  * monotonicities that define the scorer: higher tf wins at equal
  * length, shorter documents win at equal tf, rarer terms weigh more.
  */
class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop, n: Int = 8): Unit = {
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(n).withWorkers(1), p)
    assert(res.passed, res.status.toString)
  }

  /** Scalar replay of the exact integer formulation in [[Bm25.topk]]. */
  private def naive(texts: Seq[String], terms: Seq[String], k: Int)
      : Seq[(Long, Long, Long)] = {
    val toks = texts.map(_.split(' ').filter(_.nonEmpty).toSeq)
    val n = toks.length.toLong
    val l = toks.map(_.length.toLong).sum
    val df = terms.map(t =>
      t -> toks.count(_.contains(t)).toLong).toMap
    def idfMicro(t: String): Long =
      math.round(math.log(1.0 + (n.toDouble - df(t) + 0.5) /
        (df(t) + 0.5)) * 1e6)
    val scored = toks.zipWithIndex.flatMap { case (w, d) =>
      val dl = w.length.toLong
      val ts = terms.filter(w.contains)
      if (ts.isEmpty) None
      else Some((d.toLong, ts.length.toLong, ts.map { t =>
        val tf = w.count(_ == t).toLong
        idfMicro(t) * 22L * tf * l / (10L * tf * l + 3L * l + 9L * dl * n)
      }.sum))
    }
    scored.sortBy { case (d, _, s) => (-s, d) }.take(k)
  }

  private val docGen: Gen[List[String]] = Gen.listOfN(25,
    Gen.listOf(Gen.frequency(
      5 -> Gen.oneOf("the", "a", "data", "row", "scan"),
      2 -> Gen.oneOf("spark", "vector", "hash"))).map(_.mkString(" ")))

  test("topk ≡ scalar integer replay on random corpora") {
    check(Prop.forAll(docGen) { texts =>
      val nonEmpty = texts.filter(_.split(' ').exists(_.nonEmpty))
      nonEmpty.isEmpty || {
        val docs = nonEmpty.zipWithIndex
          .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
        val got = Bm25.topk(docs, Seq("spark", "vector", "hash"), 10)
          .as[(Long, Long, Long)].collect().toSeq
        got == naive(nonEmpty, Seq("spark", "vector", "hash"), 10)
      }
    })
  }

  test("ranking monotonicities") {
    // doc 0: tf=3 of 'spark', doc 1: tf=1, same length; doc 2 longer
    val docs = Seq(
      (0L, "spark spark spark pad pad pad"),
      (1L, "spark pad pad pad pad pad"),
      (2L, "spark spark spark pad pad pad pad pad pad pad pad pad")
    ).toDF("doc_id", "text")
    val r = Bm25.topk(docs, Seq("spark"), 3)
      .as[(Long, Long, Long)].collect().map(t => t._1 -> t._3).toMap
    assert(r(0L) > r(1L), "higher tf must score higher at equal dl")
    assert(r(0L) > r(2L), "shorter doc must score higher at equal tf")
  }

  test("rarer terms weigh more (idf ordering)") {
    val docs = ((0 until 20).map(i => (i.toLong, "common pad")) :+
      (20L, "rare pad") :+ (21L, "common pad rare"))
      .toDF("doc_id", "text")
    val r = Bm25.topk(docs, Seq("common", "rare"), 25)
      .as[(Long, Long, Long)].collect()
    // top doc must be one containing 'rare'
    assert(Set(20L, 21L).contains(r.head._1))
  }
}
