package graft.canon

import graft.SparkSpec

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def bruteForce(edges: Seq[(String, String)]): Map[String, String] = {
    val parent = scala.collection.mutable.Map[String, String]()
    def find(x: String): String = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    for ((a, b) <- edges) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(ra) = rb
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val byRoot = nodes.groupBy(find)
    byRoot.flatMap { case (_, members) =>
      val label = members.min
      members.map(_ -> label)
    }
  }

  private def runCc(edges: Seq[(String, String)]): Map[String, String] =
    ConnectedComponents.run(edges.toDF("a", "b"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap

  test("two components with chain and triangle") {
    val edges = Seq("a" -> "b", "b" -> "c", "c" -> "a", "x" -> "y", "y" -> "z")
    assert(runCc(edges) == bruteForce(edges))
  }

  test("long chain converges in O(log n) rounds (n=200)") {
    val edges = (0 until 200).map(i => (f"n$i%03d", f"n${i + 1}%03d"))
    val cc = runCc(edges)
    assert(cc.values.toSet == Set("n000"))
    assert(cc.size == 201)
  }

  test("star with skewed hub") {
    val edges = (1 to 100).map(i => ("hub", f"leaf$i%03d"))
    val cc = runCc(edges)
    assert(cc.values.toSet == Set("hub"))
  }

  test("random graphs match union-find brute force") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 5) {
      val n = 30 + rnd.nextInt(40)
      val edges = Seq.fill(n)((s"v${rnd.nextInt(40)}", s"v${rnd.nextInt(40)}"))
        .filter(e => e._1 != e._2)
      assert(runCc(edges) == bruteForce(edges), s"trial $trial")
    }
  }

  test("self-loops and duplicate edges are harmless") {
    val edges = Seq("a" -> "a", "a" -> "b", "b" -> "a", "a" -> "b")
    val cc = runCc(edges)
    assert(cc == Map("a" -> "a", "b" -> "a"))
  }
}
