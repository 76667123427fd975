package graft.sketch

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** CMS laws on random token streams: estimates never underestimate
  * (the one-sided CMS guarantee), every matrix row sums to the stream
  * length (each occurrence lands in exactly one bucket per row), and
  * the whole sketch is partitioning-invariant (commutative integer
  * sums — the property the DuckDB oracle relies on).
  */
class CmsSpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop, n: Int = 10): Unit = {
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(n).withWorkers(1), p)
    assert(res.passed, res.status.toString)
  }

  private val streamGen: Gen[List[String]] =
    Gen.listOfN(300, Gen.frequency(
      3 -> Gen.choose(0, 15).map(i => s"tok$i"),  // heavy head
      1 -> Gen.choose(0, 500).map(i => s"rare$i") // long tail
    ))

  test("estimates never underestimate; exact on unseen tokens is 0") {
    check(Prop.forAll(streamGen) { toks =>
      val ds = toks.toDS()
      val exact = toks.groupBy(identity).view.mapValues(_.size.toLong)
      val queried = (0 to 15).map(i => s"tok$i") :+ "never-seen"
      val est = Cms.estimates(ds, queried)
        .as[(String, Long)].collect().toMap
      queried.forall(t => est(t) >= exact.getOrElse(t, 0L)) &&
        est("never-seen") >= 0L
    })
  }

  test("each matrix row sums to the total occurrence count") {
    val toks = (0 until 1000).map(i => s"w${i % 37}").toDS()
    val sums = Cms.matrix(toks).groupBy("r")
      .agg(org.apache.spark.sql.functions.sum("n").as("s"))
      .as[(Int, Long)].collect().toMap
    assert((0 until Cms.Depth).forall(r => sums(r) == 1000L))
  }

  test("FnvHash expression ≡ scalar Mix.fnv1a (incl. astral plane)") {
    import org.apache.spark.sql.functions.col
    val astral = "𝕏" // 𝕏 U+1D54F, a surrogate pair
    val gen = Gen.listOfN(40, Gen.oneOf(
      Gen.asciiPrintableStr,
      Gen.nonEmptyListOf(Gen.oneOf("道", astral, "é", "☃", "a"))
        .map(_.mkString)))
    check(Prop.forAll(gen) { ss =>
      val got = ss.toDF("s")
        .select(graft.functions.FnvHash(col("s")).as("h"))
        .as[Long].collect().toSeq
      got == ss.map(graft.mix.Mix.fnv1a)
    }, n = 15)
  }

  test("matrix plan is fully codegen'd — no typed-kernel round trip") {
    val toks = (0 until 100).map(i => s"w$i").toDS()
    val plan = Cms.matrix(toks).queryExecution.executedPlan.toString
    assert(!plan.contains("DeserializeToObject") &&
      !plan.contains("MapElements") && !plan.contains("mapelements"),
      s"typed kernel leaked into the CMS build:\n$plan")
  }

  test("sketch is partitioning-invariant") {
    val toks = (0 until 2000).map(i => s"w${(i * 31) % 97}")
    val a = Cms.estimates(toks.toDS().repartition(1), Seq("w0", "w13"))
      .as[(String, Long)].collect().toMap
    val b = Cms.estimates(toks.toDS().repartition(13), Seq("w0", "w13"))
      .as[(String, Long)].collect().toMap
    assert(a == b)
  }
}
