package graft.sketch

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Bloom laws: no false negatives ever (the decontamination guarantee),
  * the false-positive rate at design load stays near theory, the filter
  * is duplicate/partitioning-invariant, and union-by-bit_or equals the
  * filter of the union (mergeability).
  */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop, n: Int = 10): Unit = {
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(n).withWorkers(1), p)
    assert(res.passed, res.status.toString)
  }

  test("bitPosCol ≡ scalar bitPos") {
    val toks = (0 until 300).map(i => s"token$i") :+ "𝕏道é"
    val got = toks.toDF("token")
      .select(col("token"), Bloom.bitPosCol(2, col("token")).as("p"))
      .as[(String, Int)].collect().toMap
    assert(toks.forall(t => got(t) == Bloom.bitPos(2, t)))
  }

  test("no false negatives: every member probes k hits") {
    check(Prop.forAll(Gen.listOfN(150, Gen.choose(0, 5000).map(i => s"m$i"))) {
      ms =>
        val members = ms.toDF("token")
        val f = Bloom.build(members)
        val probed = Bloom.probe(f, members.distinct())
          .as[(String, Long, Int)].collect()
        probed.forall { case (_, hits, maybe) =>
          hits == Bloom.K && maybe == 1 }
    }, n = 5)
  }

  test("false-positive rate at design load is near theory") {
    val members = (0 until 420).map(i => s"member$i").toDF("token")
    val f = Bloom.build(members)
    val absent = (0 until 2000).map(i => s"probe-$i").toDF("token")
    val fp = Bloom.probe(f, absent)
      .filter(col("maybe_present") === 1).count()
    // theory ~1.2% at n/m=0.1, k=4; allow generous sampling slack
    assert(fp < 2000 * 0.04, s"fp=$fp of 2000")
  }

  test("filter is duplicate- and partitioning-invariant; union = bit_or") {
    check(Prop.forAll(
      Gen.listOfN(80, Gen.choose(0, 900).map(i => s"a$i")),
      Gen.listOfN(80, Gen.choose(0, 900).map(i => s"b$i"))) { (as, bs) =>
        val whole = Bloom.build((as ++ bs).toDF("token"))
          .as[(Int, Long)].collect().toMap
        val unioned = Bloom.build((as ++ as).toDF("token").repartition(5))
          .union(Bloom.build(bs.toDF("token")))
          .groupBy("word").agg(expr("bit_or(bits)").as("bits"))
          .as[(Int, Long)].collect().toMap
        whole == unioned
    }, n = 5)
  }
}
