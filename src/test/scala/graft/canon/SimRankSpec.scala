package graft.canon

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** SimRank vs a naive scalar replay of the SAME quantized recurrence on
  * random graphs, plus closed forms, orientation-agnosticism, and the
  * hub-guard semantics the oracle replays.
  */
class SimRankSpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop, n: Int = 8): Unit = {
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(n).withWorkers(1), p)
    assert(res.passed, res.status.toString)
  }

  private val edgeGen: Gen[List[(Int, Int)]] =
    Gen.listOfN(50, for {
      a <- Gen.choose(0, 11); b <- Gen.choose(0, 11)
    } yield (a, b)).map(_.collect { case (a, b) if a != b =>
      (math.min(a, b), math.max(a, b)) }.distinct)

  /** Scalar replay of the quantized hub-guarded recurrence. Node ids are
    * single letters, so code-point order == the engine's binary order. */
  private def naive(es: List[(String, String)], iters: Int,
      maxHub: Int): Map[(Long, String, String), Long] = {
    val und = (es ++ es.map(_.swap)).groupMapReduce(_._1)(
      e => Set(e._2))(_ ++ _)
    val deg = und.map { case (z, ns) => z -> ns.size.toLong }
    val nonHub = deg.filter(_._2 <= maxHub).keySet
    val nodes = und.keys.toSeq.sorted
    val pairs = for {
      a <- nodes; b <- nodes if a < b
    } yield (a, b)
    var p = Map.empty[(String, String), Long] // positive off-diag scores
    def s(i: String, j: String): Long =
      if (i == j) 1000000L
      else p.getOrElse(if (i < j) (i, j) else (j, i), 0L)
    val out = scala.collection.mutable.Map[(Long, String, String), Long]()
    for (k <- 1 to iters) {
      val next = pairs.flatMap { case (a, b) =>
        val t = (for {
          i <- und(a).toSeq if nonHub(i)
          j <- und(b).toSeq if nonHub(j)
        } yield s(i, j)).sum
        val sc = (4L * t) / (5L * deg(a) * deg(b))
        if (sc > 0) Some((a, b) -> sc) else None
      }.toMap
      p = next
      p.foreach { case ((a, b), sc) => out((k.toLong, a, b)) = sc }
    }
    out.toMap
  }

  private def run(es: List[(String, String)], iters: Int,
      maxHub: Int): Map[(Long, String, String), Long] =
    GraphAlgs.simRank(es.toDF("a", "b"), iters, maxHub)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)) ->
        r.getLong(3))
      .toMap

  test("simRank ≡ the naive scalar replay on random graphs, 2 rounds") {
    check(Prop.forAll(edgeGen) { esI =>
      val es = esI.map { case (a, b) =>
        (('a' + a).toChar.toString, ('a' + b).toChar.toString) }
      es.isEmpty || run(es, 2, 64) == naive(es, 2, 64)
    })
  }

  test("hub guard drops hub NEIGHBOURS from evidence (star collapses)") {
    // K1,4: center degree 4 > cap 3 ⇒ leaves share no non-hub
    // neighbour ⇒ no positive pairs at all
    val es = List(("c", "l"), ("c", "m"), ("c", "n"), ("c", "o"))
    assert(run(es, 2, 3).isEmpty)
    // cap 4 admits the center: every leaf pair scores
    // (4·1e6) div (5·1·1) = 800000, stable at round 2 (T is the
    // diagonal term only: both sides' sole neighbour is the center)
    val got = run(es, 2, 4)
    val leaves = Seq("l", "m", "n", "o")
    for (a <- leaves; b <- leaves if a < b; k <- 1L to 2L)
      assert(got((k, a, b)) == 800000L)
  }

  test("triangle closed form: s1 = 200000, s2 = 320000") {
    // N(a)={b,c}, N(b)={a,c}: cn=1 ⇒ s1 = 4e6 div (5·2·2) = 200000;
    // round 2: T = 1e6 + s1(b,a)+s1(b,c)+s1(c,a) = 1.6e6 ⇒ s2 = 320000
    val es = List(("a", "b"), ("b", "c"), ("a", "c"))
    val got = run(es, 2, 64)
    for (p <- Seq(("a", "b"), ("a", "c"), ("b", "c"))) {
      assert(got((1L, p._1, p._2)) == 200000L)
      assert(got((2L, p._1, p._2)) == 320000L)
    }
  }

  test("orientation-agnostic: reversed edge list gives identical trace") {
    val es = List(("a", "b"), ("b", "c"), ("c", "d"), ("a", "c"))
    assert(run(es, 2, 64) == run(es.map(_.swap), 2, 64))
  }

  test("scores bounded by C = 800000 micro off the diagonal") {
    check(Prop.forAll(edgeGen) { esI =>
      val es = esI.map { case (a, b) =>
        (('a' + a).toChar.toString, ('a' + b).toChar.toString) }
      es.isEmpty || run(es, 2, 64).values.forall(s =>
        s > 0 && s <= 800000L)
    }, n = 4)
  }
}
