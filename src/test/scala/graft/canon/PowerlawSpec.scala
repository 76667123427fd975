package graft.canon

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Test.{check => scCheck, Parameters}

/** Power-law MLE laws: closed forms on regular and star graphs, exact
  * integer replay over random graphs, and the monotone direction — mass
  * concentrated at xmin (all-degree-1) reads the MAXIMUM α; pushing
  * degree mass into the tail (ring → clique) lowers it.
  */
class PowerlawSpec extends SparkSpec {
  import spark.implicits._

  private def lnMicro(x: Long): Long = math.round(math.log(x.toDouble) * 1e6)

  private def alphaOf(und: Seq[(String, String)]): (Long, Long, Long, Double) = {
    val r = GraphAlgs.powerLawAlpha(und.toDF("src", "dst")).collect()(0)
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
  }

  private def sym(e: Seq[(String, String)]) = e ++ e.map(_.swap)

  test("ring (2-regular): alpha == 1 + 1e6/ln_micro(4), n and d_max exact") {
    val n = 12
    val ring = (0 until n).map(i => (s"v$i", s"v${(i + 1) % n}"))
    val (nn, dmax, s, a) = alphaOf(sym(ring))
    assert(nn == n && dmax == 2L)
    assert(s == n * lnMicro(4))
    assert(a == 1.0 + nn.toDouble * 1e6 / s.toDouble)
  }

  test("star K(1,m): sum splits into hub + leaves terms") {
    val m = 9
    val star = (1 to m).map(i => ("hub", s"leaf$i"))
    val (nn, dmax, s, _) = alphaOf(sym(star))
    assert(nn == m + 1 && dmax == m.toLong)
    assert(s == lnMicro(2L * m) + m * lnMicro(2))
  }

  test("monotone in tail mass: larger typical degrees read a smaller alpha") {
    // all-degree-1 (perfect matching) concentrates at xmin = steepest
    // possible sequence = max alpha; a 2-regular ring sits lower; a
    // clique (degree n-1 everywhere) lower still
    val n = 12
    val matching = (0 until n by 2).map(i => (s"v$i", s"v${i + 1}"))
    val ring = (0 until n).map(i => (s"v$i", s"v${(i + 1) % n}"))
    val clique = for {
      i <- 0 until n; j <- (i + 1) until n
    } yield (s"v$i", s"v$j")
    val aM = alphaOf(sym(matching))._4
    val aR = alphaOf(sym(ring))._4
    val aC = alphaOf(sym(clique))._4
    assert(aM > aR && aR > aC)
    // closed forms: matching = 1 + 1/ln2, ring = 1 + 1/ln4 (micro-units)
    assert(aM == 1.0 + n.toDouble * 1e6 / (n * lnMicro(2)).toDouble)
  }

  test("ScalaCheck: exact integer replay over random symmetric multigraphs") {
    val node = Gen.chooseNum(0, 12).map(i => s"n$i")
    val edge = for { a <- node; b <- node if a != b } yield (a, b)
    val prop = Prop.forAll(Gen.nonEmptyListOf(edge)) { es0 =>
      val es = sym(es0.distinct)
      val deg = es.groupBy(_._1).map { case (_, g) => g.size.toLong }.toSeq
      val expS = deg.map(d => lnMicro(2 * d)).sum
      val (nn, dmax, s, a) = alphaOf(es)
      nn == deg.size && dmax == deg.max && s == expS &&
        a == 1.0 + nn.toDouble * 1e6 / s.toDouble
    }
    val res = scCheck(Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }
}
