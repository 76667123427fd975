package graft.canon

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** WL refinement laws: equivalence with a naive scalar replay (same
  * degree init, sorted-multiset string, FNV hash), isomorphism
  * invariance (two disjoint relabeled copies double every class
  * exactly), refinement monotonicity (round k+1 splits, never merges,
  * round k's classes), and the KNOWN WL boundary — C6 vs 2×C3 stay
  * indistinguishable, pinned so nobody ever "fixes" it into a wrong
  * stronger claim.
  */
class WlSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(String, String)], rounds: Int)
      : Map[String, Long] =
    GraphAlgs.wl(edges.toDF("src", "dst"), rounds)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  private def naive(edges: Seq[(String, String)], rounds: Int)
      : Map[String, Long] = {
    val und = (edges ++ edges.map(_.swap)).filter(e => e._1 != e._2)
      .distinct
    val adj = und.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    var lbl: Map[String, Long] =
      adj.map { case (n, ns) => n -> ns.size.toLong }.toMap
    for (_ <- 1 to rounds) {
      lbl = adj.map { case (n, ns) =>
        val s = lbl(n).toString + ":" +
          ns.map(lbl).sorted.map(_.toString).mkString(",")
        n -> graft.mix.Mix.fnv1a(s)
      }.toMap
    }
    lbl
  }

  test("≡ naive scalar replay over seeded random graphs") {
    val names = (0 until 9).map(i => s"n$i")
    for (seed <- 1 to 8) {
      val rnd = new scala.util.Random(seed)
      val edges = (1 to 14).map(_ =>
        (names(rnd.nextInt(9)), names(rnd.nextInt(9))))
        .filter(e => e._1 != e._2).distinct
      if (edges.nonEmpty)
        assert(run(edges, 2) == naive(edges, 2), s"seed $seed")
    }
  }

  test("isomorphism invariance: a relabeled disjoint copy doubles " +
      "every class exactly") {
    val base = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("b", "d"),
      ("d", "e"))
    val copy = base.map { case (x, y) => ("z" + x, "z" + y) }
    val one = run(base, 2).values.groupBy(identity)
      .map { case (k, v) => k -> v.size }
    val two = run(base ++ copy, 2).values.groupBy(identity)
      .map { case (k, v) => k -> v.size }
    assert(two == one.map { case (k, v) => k -> 2 * v })
  }

  test("refinement: round 2 splits, never merges, round 1's classes") {
    val rnd = new scala.util.Random(42)
    val names = (0 until 12).map(i => s"n$i")
    val edges = (1 to 20).map(_ =>
      (names(rnd.nextInt(12)), names(rnd.nextInt(12))))
      .filter(e => e._1 != e._2).distinct
    val r1 = run(edges, 1)
    val r2 = run(edges, 2)
    // same round-2 label ⇒ same round-1 label
    for (Seq(x, y) <- r2.keys.toSeq.combinations(2))
      if (r2(x) == r2(y)) assert(r1(x) == r1(y), s"$x,$y merged")
  }

  test("known WL boundary: C6 and 2×C3 are indistinguishable " +
      "(2-regular everywhere)") {
    val c6 = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"),
      ("e", "f"), ("f", "a"))
    val c3x2 = Seq(("x", "y"), ("y", "z"), ("z", "x"),
      ("p", "q"), ("q", "r"), ("r", "p"))
    val all = (run(c6, 2) ++ run(c3x2, 2)).values.toSet
    assert(all.size == 1, "every node of both graphs shares one label")
  }
}
