package graft.sketch

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** HLL laws: the rho column matches the scalar trailing-zero definition,
  * registers are duplicate- and partitioning-invariant (the property the
  * bit-exact oracle relies on), merging two half-corpus sketches by
  * pointwise max equals the whole-corpus sketch, and the float estimate
  * over the integer core lands within the theoretical error band.
  */
class HllSpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop, n: Int = 10): Unit = {
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(n).withWorkers(1), p)
    assert(res.passed, res.status.toString)
  }

  private def scalarRho(h: Long): Int = {
    val w = h >>> Hll.P
    if (w == 0L) Hll.WBits + 1
    else java.lang.Long.numberOfTrailingZeros(w) + 1
  }

  test("rhoCol ≡ scalar trailing-zero rho (boundary words included)") {
    val hs = Seq(0L, 1L, -1L, 63L, 64L, 65L, Long.MinValue, Long.MaxValue,
      1L << 62, (1L << 62) + 64L) ++
      (0 until 200).map(i => Kmv.tokenHash(s"t$i"))
    val got = hs.toDF("h")
      .select(Hll.bucketCol(col("h")).as("b"), Hll.rhoCol(col("h")).as("r"))
      .as[(Long, Int)].collect().toSeq
    val want = hs.map(h => ((h & (Hll.M - 1)).toLong, scalarRho(h)))
    assert(got == want)
  }

  private def docsOf(tokens: Seq[String], group: String = "g") =
    tokens.map(t => (group, t)).toDF("source", "text") // 1 token per doc

  test("registers are duplicate-invariant and partitioning-invariant") {
    check(Prop.forAll(Gen.listOfN(120, Gen.choose(0, 400).map(i => s"w$i"))) {
      toks =>
        val once = Hll.registers(docsOf(toks.distinct))
          .as[(String, Long, Int)].collect().toSet
        val thrice = Hll.registers(
            docsOf(toks ++ toks ++ toks).repartition(7))
          .as[(String, Long, Int)].collect().toSet
        once == thrice
    })
  }

  test("pointwise-max merge of split sketches ≡ whole-corpus sketch") {
    val toks = (0 until 500).map(i => s"tok$i")
    val (a, b) = toks.splitAt(213)
    val whole = Hll.registers(docsOf(toks))
      .select("b", "r").as[(Long, Int)].collect().toMap
    val merged = Hll.registers(docsOf(a)).select("b", "r")
      .union(Hll.registers(docsOf(b)).select("b", "r"))
      .groupBy("b").agg(max("r").as("r"))
      .as[(Long, Int)].collect().toMap
    assert(merged == whole)
  }

  test("summary integer core is consistent with the register rows") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val regs = Hll.registers(docs).as[(String, Long, Int)].collect()
      .groupBy(_._1)
    val sums = Hll.summary(docs)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(sums.nonEmpty)
    for ((src, nRegs, nZero, sumPow, checksum) <- sums) {
      val rs = regs(src).map { case (_, b, r) => (b, r) }
      assert(nRegs == rs.length && nZero == Hll.M - rs.length)
      val expPow = rs.map { case (_, r) =>
        1L << (Hll.FullExp - math.min(r, Hll.FullExp)) }.sum +
        nZero * (1L << Hll.FullExp)
      assert(sumPow == expPow)
      assert(checksum == rs.map { case (b, r) => (b + 1) * r }.sum)
    }
  }

  test("estimate lands within the m=64 error band on known cardinalities") {
    for (n <- Seq(80, 400, 2000)) {
      val toks = (0 until n).map(i => s"item-$i-x")
      val present = Hll.registers(docsOf(toks))
        .select("b", "r").as[(Long, Int)].collect().toMap
      val vec = (0 until Hll.M).map(b => present.getOrElse(b.toLong, 0))
      val est = Hll.estimate(vec)
      // 1.04/sqrt(64) = 13% standard error; allow 4 sigma
      assert(math.abs(est - n) < 4 * 0.13 * n,
        s"n=$n est=$est out of band")
    }
  }
}
