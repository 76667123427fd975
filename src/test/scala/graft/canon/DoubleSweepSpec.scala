package graft.canon

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Double-sweep laws: exact on a path (trees), the periphery pick and
  * tie-break on a star, and the certified sandwich
  * ⌈diam/2⌉ ≤ diam_lb ≤ diam against a naive all-pairs BFS truth on
  * seeded random connected graphs.
  */
class DoubleSweepSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(String, String)]) = {
    val sym = edges ++ edges.map(_.swap)
    GraphAlgs.doubleSweep(sym.toDF("src", "dst"), rounds = 12)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getLong(3)))
  }

  test("exact on a path: sweeps reach the far end, diam_lb = length") {
    val got = run(Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")))
    assert(got.forall(_._4 == 4L)) // path length = true diameter
    assert(got.forall(_._3 == "e")) // BFS1 from a peaks at e
    assert(got.map(r => r._1 -> r._2).toMap ==
      Map("a" -> 4L, "b" -> 3L, "c" -> 2L, "d" -> 1L, "e" -> 0L))
  }

  test("star: periphery tie breaks to the smallest leaf id") {
    val got = run(Seq(("hub", "a"), ("hub", "b"), ("hub", "c")))
    // BFS from 'a' (min node): hub at 1, leaves at 2; farthest ties
    // b/c → b; second sweep from b gives diam_lb = 2 (exact)
    assert(got.forall(r => r._3 == "b" && r._4 == 2L))
  }

  test("⌈diam/2⌉ ≤ diam_lb ≤ diam on seeded random connected graphs") {
    val names = (0 until 10).map(i => s"n$i")
    for (seed <- 1 to 10) {
      val rnd = new scala.util.Random(seed)
      // spanning chain keeps it connected; extra chords randomize
      val chain = names.sliding(2).map(p => (p(0), p(1))).toSeq
      val chords = (1 to 5).map(_ =>
        (names(rnd.nextInt(10)), names(rnd.nextInt(10))))
        .filter(e => e._1 != e._2)
      val edges = (chain ++ chords).distinct
      // naive truth: all-pairs BFS diameter
      val adj = (edges ++ edges.map(_.swap)).groupBy(_._1)
        .map { case (k, v) => k -> v.map(_._2).distinct }
      def bfs(s: String): Map[String, Int] = {
        val d = scala.collection.mutable.Map(s -> 0)
        val q = scala.collection.mutable.Queue(s)
        while (q.nonEmpty) {
          val c = q.dequeue()
          for (n <- adj.getOrElse(c, Nil) if !d.contains(n)) {
            d(n) = d(c) + 1; q += n
          }
        }
        d.toMap
      }
      val diam = names.map(s => bfs(s).values.max).max
      val lb = run(edges).head._4
      assert(lb <= diam && 2 * lb >= diam,
        s"seed $seed: lb $lb vs diam $diam")
    }
  }
}
