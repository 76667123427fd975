package graft.canon

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** assortativityMoments / reciprocity vs naive driver-side replays on
  * random graphs, plus the closed forms: a star is perfectly
  * disassortative (r = −1), a regular graph has undefined r (zero
  * variance), a symmetrized digraph has reciprocity 1.
  */
class GraphStatsSpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop, n: Int = 10): Unit = {
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(n).withWorkers(1), p)
    assert(res.passed, res.status.toString)
  }

  private def momentsOf(und: Seq[(String, String)])
      : (Long, Long, Long, Long, Long, Long) = {
    val deg = und.groupBy(_._1).map { case (v, es) => v -> es.size.toLong }
    val xy = und.map { case (a, b) => (deg(a), deg(b)) }
    (xy.size.toLong, xy.map(_._1).sum, xy.map(_._2).sum,
      xy.map(p => p._1 * p._2).sum, xy.map(p => p._1 * p._1).sum,
      xy.map(p => p._2 * p._2).sum)
  }

  private def runMoments(und: Seq[(String, String)])
      : (Long, Long, Long, Long, Long, Long) = {
    val r = GraphAlgs.assortativityMoments(und.toDF("src", "dst")).head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5))
  }

  private val genEdges: Gen[Seq[(String, String)]] = for {
    n <- Gen.choose(2, 12)
    m <- Gen.choose(1, 30)
    es <- Gen.listOfN(m, for {
      a <- Gen.choose(0, n - 1); b <- Gen.choose(0, n - 1)
    } yield (s"v$a", s"v$b"))
  } yield es.filter { case (a, b) => a != b }.distinct

  test("assortativity moments equal the naive replay (ScalaCheck)") {
    check(Prop.forAll(genEdges) { es =>
      es.isEmpty || {
        val und = es.flatMap { case (a, b) => Seq((a, b), (b, a)) }.distinct
        runMoments(und) == momentsOf(und)
      }
    })
  }

  test("star K1,n is perfectly disassortative; regular graph undefined") {
    val star = (1 to 8).flatMap(i => Seq(("hub", s"l$i"), (s"l$i", "hub")))
    val (m, sx, sy, sxy, sxx, syy) = runMoments(star)
    val r = GraphAlgs.assortativityOf(m, sx, sy, sxy, sxx, syy)
    assert(r.isDefined && math.abs(r.get - (-1.0)) < 1e-12, r.toString)
    // 4-cycle: every degree 2 -> zero variance -> None
    val cyc = Seq("a" -> "b", "b" -> "c", "c" -> "d", "d" -> "a")
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val mm = runMoments(cyc)
    assert(GraphAlgs.assortativityOf(mm._1, mm._2, mm._3, mm._4, mm._5,
      mm._6).isEmpty)
  }

  test("rich club equals the naive replay; star closed form") {
    check(Prop.forAll(genEdges) { es =>
      es.isEmpty || {
        val und = es.flatMap { case (a, b) => Seq((a, b), (b, a)) }.distinct
        val deg = und.groupBy(_._1).map { case (v, e) => v -> e.size.toLong }
        val ks = Seq(1, 2, 4)
        val want = ks.flatMap { k =>
          val nodes = deg.count(_._2 > k).toLong
          val inner = und.count { case (a, b) => deg(a) > k && deg(b) > k }
          if (nodes == 0 && inner == 0) None
          else Some(k.toLong -> (nodes, inner.toLong))
        }.toMap
        val got = GraphAlgs.richClub(und.toDF("src", "dst"), ks)
          .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
          .toMap
        got == want
      }
    })
    // star K1,6: only the hub (deg 6) passes k=1, and no edge has both
    // endpoints in the club
    val star = (1 to 6).flatMap(i => Seq(("h", s"l$i"), (s"l$i", "h")))
    val got = GraphAlgs.richClub(star.toDF("src", "dst"), Seq(1, 2))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSet === Set((1L, 1L, 0L), (2L, 1L, 0L)))
  }

  test("reciprocity equals the naive replay; symmetrized graph reads 1") {
    check(Prop.forAll(genEdges) { es =>
      es.isEmpty || {
        val set = es.toSet
        val want = (es.size.toLong,
          es.count { case (a, b) => set((b, a)) }.toLong)
        val r = GraphAlgs.reciprocity(es.toDF("src", "dst")).head()
        (r.getLong(0), r.getLong(1)) == want
      }
    })
    val sym = Seq("a" -> "b", "b" -> "a", "b" -> "c", "c" -> "b")
    val r = GraphAlgs.reciprocity(sym.toDF("src", "dst")).head()
    assert(r.getLong(0) == 4L && r.getLong(1) == 4L)
  }
}
