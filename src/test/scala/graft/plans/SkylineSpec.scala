package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Test.{check => scCheck, Parameters}

/** Skyline laws: equality with the brute quadratic dominance truth over
  * random point sets (ScalaCheck, multiple bucket shifts — the pruning
  * phase must be invisible in the result), duplicate survival, and the
  * phase-1 soundness invariant (survivor set ⊇ skyline).
  */
class SkylineSpec extends SparkSpec {
  import spark.implicits._

  private def bruteSkyline(pts: Seq[(Long, Long)]): Seq[(Long, Long)] =
    pts.filter { case (hi, lo) =>
      !pts.exists { case (h2, l2) =>
        h2 >= hi && l2 <= lo && (h2 > hi || l2 < lo)
      }
    }

  private def sparkSkyline(pts: Seq[(Long, Long)], shift: Int): Seq[(Long, Long)] =
    Skyline.skyline2d(pts.toDF("hi", "lo"), col("hi"), col("lo"), shift)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("ScalaCheck: skyline == brute dominance truth at shifts 2, 8, 20") {
    val pt = for {
      h <- Gen.chooseNum(0L, 300L); l <- Gen.chooseNum(0L, 300L)
    } yield (h, l)
    val prop = Prop.forAll(Gen.nonEmptyListOf(pt)) { pts =>
      val truth = bruteSkyline(pts).sorted
      Seq(2, 8, 20).forall(s => sparkSkyline(pts, s).sorted == truth)
    }
    val res = scCheck(Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("coordinate duplicates are mutually non-dominating: both survive") {
    val pts = Seq((10L, 5L), (10L, 5L), (8L, 7L), (12L, 9L))
    val sky = sparkSkyline(pts, 2).sorted
    // (8,7) dominated by (10,5); (12,9) survives (nothing has hi>=12 and lo<=9)
    assert(sky == Seq((10L, 5L), (10L, 5L), (12L, 9L)))
  }

  test("same-hi strictness: lower lo at equal hi dominates, equal survives") {
    val pts = Seq((5L, 1L), (5L, 2L), (5L, 1L))
    assert(sparkSkyline(pts, 2).sorted == Seq((5L, 1L), (5L, 1L)))
  }

  test("anti-chain input: every point is its own frontier") {
    // hi ascending, lo ascending — nothing dominates anything
    val pts = (0L until 50L).map(i => (i, i))
    assert(sparkSkyline(pts, 3).sorted == pts)
  }

  test("chain input: single maximal point survives") {
    // hi ascending, lo descending — the last point dominates all
    val pts = (0L until 50L).map(i => (i, 100L - i))
    assert(sparkSkyline(pts, 3) == Seq((49L, 51L)))
  }
}
