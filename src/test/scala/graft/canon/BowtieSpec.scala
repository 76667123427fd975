package graft.canon

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bow-tie census laws: the canonical Broder fixture (core cycle, IN,
  * OUT, a tendril, a tube, a disconnected 2-cycle that is also the
  * second-largest SCC), and equivalence with a naive all-pairs
  * reachability replay over seeded random digraphs — which pins the
  * largest-SCC tie-break, the IN/OUT disjointness corollary and the
  * WCC split all at once.
  */
class BowtieSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(String, String)]): Map[String, (String, Long)] =
    GraphAlgs.bowtie(edges.toDF("src", "dst"))
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getLong(2))))
      .toMap

  test("canonical fixture: core / in / out / tendril / tube / disconnected") {
    // a→b→c→a core; i reaches it; it reaches o; t hangs off i
    // (tendril), u sits on the i→o tube; x↔y is a separate WCC and
    // ALSO an SCC of size 2 — the census must still pick the 3-cycle.
    val got = run(Seq(
      ("a", "b"), ("b", "c"), ("c", "a"),
      ("i", "a"), ("c", "o"),
      ("i", "t"), ("i", "u"), ("u", "o"),
      ("x", "y"), ("y", "x")))
    assert(got("a")._1 == "CORE" && got("b")._1 == "CORE" &&
      got("c")._1 == "CORE")
    assert(got("i")._1 == "IN")
    assert(got("o")._1 == "OUT")
    assert(got("t")._1 == "TENDRIL" && got("u")._1 == "TENDRIL")
    assert(got("x")._1 == "DISCONNECTED" && got("y")._1 == "DISCONNECTED")
    assert(got("a")._2 == 3L && got("i")._2 == 1L && got("t")._2 == 2L &&
      got("x")._2 == 2L)
  }

  /** Naive truth: boolean closure over the adjacency matrix. */
  private def naive(edges: Seq[(String, String)]): Map[String, String] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val idx = nodes.zipWithIndex.toMap
    val n = nodes.length
    val reach = Array.fill(n, n)(false)
    for (i <- 0 until n) reach(i)(i) = true
    for ((s, d) <- edges) reach(idx(s))(idx(d)) = true
    for (k <- 0 until n; i <- 0 until n; j <- 0 until n)
      if (reach(i)(k) && reach(k)(j)) reach(i)(j) = true
    val sccOf = (0 until n).map(i =>
      (0 until n).filter(j => reach(i)(j) && reach(j)(i)))
    // tie-break replay: (size DESC, min-member ASC); sortBy is stable
    val coreExact = sccOf.distinct.sortBy(s => nodes(s.min))
      .sortBy(-_.size).head.toSet
    val wreach = Array.fill(n, n)(false)
    for (i <- 0 until n) wreach(i)(i) = true
    for ((s, d) <- edges) { wreach(idx(s))(idx(d)) = true
      wreach(idx(d))(idx(s)) = true }
    for (k <- 0 until n; i <- 0 until n; j <- 0 until n)
      if (wreach(i)(k) && wreach(k)(j)) wreach(i)(j) = true
    val c0 = coreExact.head
    nodes.zipWithIndex.map { case (name, i) =>
      name -> (if (coreExact(i)) "CORE"
        else if (coreExact.exists(c => reach(i)(c))) "IN"
        else if (coreExact.exists(c => reach(c)(i))) "OUT"
        else if (wreach(i)(c0)) "TENDRIL"
        else "DISCONNECTED")
    }.toMap
  }

  test("distributed DAG path ≡ driver path (threshold forced to 0)") {
    val edges = Seq(
      ("a", "b"), ("b", "c"), ("c", "a"),
      ("i", "a"), ("c", "o"),
      ("i", "t"), ("i", "u"), ("u", "o"),
      ("x", "y"), ("y", "x"))
    val local = run(edges)
    spark.conf.set("spark.graft.scc.localThreshold", "0")
    try {
      val dist = run(edges)
      assert(dist == local)
    } finally spark.conf.unset("spark.graft.scc.localThreshold")
  }

  test("≡ naive reachability replay over seeded random digraphs") {
    val names = (0 until 10).map(i => s"n$i")
    for (seed <- 1 to 12) {
      val rnd = new scala.util.Random(seed)
      val edges = (1 to 18).map(_ =>
        (names(rnd.nextInt(10)), names(rnd.nextInt(10))))
        .filter(e => e._1 != e._2).distinct
      if (edges.nonEmpty) {
        val got = run(edges).map { case (k, v) => k -> v._1 }
        assert(got == naive(edges), s"seed $seed edges $edges")
      }
    }
  }
}
