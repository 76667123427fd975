package graft.canon

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Round-3 verdict #10: property-test the skew guard AT THE DECISION
  * BOUNDARY — distributions generated around `minHot` and the
  * fair-share factor must (a) trip detection exactly per the formula
  * max ≥ minHot ∧ max > factor·total/partitions, and (b) produce
  * salted output identical to the plain join whichever side of the
  * boundary they land on.
  */
class SkewGuardPropertySpec extends SparkSpec {
  import spark.implicits._

  private def checkProp(p: Prop, n: Int): Unit = {
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(n).withWorkers(1), p)
    assert(res.passed, res.status.toString)
  }

  // distributions biased to straddle the boundary: a "hot" key with a
  // count near minHot / near factor·total/parts, plus background keys
  private val distGen: Gen[(List[(String, Int)], Long, Double)] = for {
    minHot <- Gen.choose(5L, 25L)
    factor <- Gen.choose(10, 40).map(_ / 10.0)
    nBg <- Gen.choose(0, 6)
    bg <- Gen.listOfN(nBg, for {
      k <- Gen.oneOf("b1", "b2", "b3", "b4")
      c <- Gen.choose(1, 12)
    } yield (k, c))
    // hot count clustered around the thresholds so both sides occur
    hot <- Gen.choose(math.max(1, minHot.toInt - 6), minHot.toInt + 10)
  } yield ((("hot", hot) :: bg), minHot, factor)

  test("detection trips exactly per the max/minHot/fair-share formula") {
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val p = Prop.forAll(distGen) { case (dist, minHot, factor) =>
      spark.conf.set("spark.graft.skew.minHot", minHot.toString)
      spark.conf.set("spark.graft.skew.factor", factor.toString)
      try {
        val rows = dist.zipWithIndex.flatMap { case ((k, c), i) =>
          (0 until c).map(j => (k, s"v$i-$j"))
        }
        if (rows.isEmpty) true
        else {
          val df = rows.toDF("k", "v")
          val counts = rows.groupBy(_._1).view.mapValues(_.size.toLong).toMap
          val mx = counts.values.max
          val total = rows.size.toLong
          val expected =
            if (mx >= minHot && mx > factor * total.toDouble / parts)
              Some(spark.conf.getOption("spark.graft.skew.salts")
                .getOrElse("8").toInt)
            else None
          Salting.skewSalts(df, "k", Seq("k", "v")) == expected
        }
      } finally {
        spark.conf.unset("spark.graft.skew.minHot")
        spark.conf.unset("spark.graft.skew.factor")
      }
    }
    checkProp(p, 30)
  }

  test("salted/skew-aware joins equal the plain join on either side of " +
       "the boundary (unmatched keys and duplicate map keys included)") {
    val smallGen: Gen[List[(String, String)]] = Gen.listOf(for {
      k <- Gen.oneOf("hot", "b1", "b2", "nokey")
      v <- Gen.oneOf("x", "y")
    } yield (k, v)).map(_.distinct)
    val p = Prop.forAll(distGen, smallGen) { case ((dist, minHot, factor), sm) =>
      spark.conf.set("spark.graft.skew.minHot", minHot.toString)
      spark.conf.set("spark.graft.skew.factor", factor.toString)
      try {
        val rows = dist.zipWithIndex.flatMap { case ((k, c), i) =>
          (0 until c).map(j => (k, s"v$i-$j"))
        }
        val big = rows.toDF("k", "v")
        val small = (("b9", "z") :: sm).toDF("k", "mapped")
        def canon(df: org.apache.spark.sql.DataFrame) =
          df.select("k", "v", "mapped").collect()
            .map(r => (r.getString(0), r.getString(1),
              Option(r.getString(2)))).sorted.toSeq
        val plain = canon(big.join(small, Seq("k"), "left"))
        val forcedSalt = canon(
          Salting.saltedJoin(big, small, "k", 8, Seq("k", "v"), "left"))
        val aware = canon(
          Salting.skewAwareLeftJoin(big, small, "k", Seq("k", "v")))
        plain == forcedSalt && plain == aware
      } finally {
        spark.conf.unset("spark.graft.skew.minHot")
        spark.conf.unset("spark.graft.skew.factor")
      }
    }
    checkProp(p, 20)
  }
}
