package graft.canon

import graft.SparkSpec
import graft.functions.MixHash
import graft.sketch.Hll
import org.apache.spark.sql.DataFrame
import org.apache.spark.unsafe.types.UTF8String

/** Anf.neighborhoodFunction vs a full driver-side replay: exact BFS
  * balls hashed with the same MixHash chain, registers max-merged by
  * hand, summaries compared INTEGER-EXACTLY. Plus the structural laws
  * the sketch algebra guarantees (monotone sum_pow, component fixpoint,
  * identical sketches for identical sets) and estimate/diameter
  * accuracy against exact BFS ball sizes.
  */
class AnfSpec extends SparkSpec {
  import spark.implicits._

  /** Exact distance-<=t ball membership by BFS over adjacency. */
  private def balls(adj: Map[String, Set[String]], rounds: Int)
      : Map[(String, Int), Set[String]] = {
    val nodes = adj.keySet
    nodes.flatMap { v =>
      val byT = Iterator.iterate(Set(v))(b => b ++ b.flatMap(adj(_)))
        .take(rounds + 1).toSeq
      byT.zipWithIndex.map { case (b, t) => (v, t) -> b }
    }.toMap
  }

  /** Driver-side register summary of a node set — the Hll geometry
    * replayed by hand over MixHash of each member. */
  private def summarize(members: Set[String]): (Long, Long, Long, Long) = {
    val regs = members.toSeq
      .map { s =>
        val h = MixHash.hash(UTF8String.fromString(s))
        val b = h & 63L
        val w = h >>> 6
        val r = if (w == 0L) 59 else java.lang.Long.numberOfTrailingZeros(w) + 1
        (b, r)
      }
      .groupBy(_._1).map { case (b, xs) => b -> xs.map(_._2).max }
    val nRegs = regs.size.toLong
    val sumPow = regs.values.map(r => 1L << (57 - math.min(r, 57))).sum +
      (64L - nRegs) * (1L << 57)
    val checksum = regs.map { case (b, r) => (b + 1) * r }.sum
    (nRegs, 64L - nRegs, sumPow, checksum)
  }

  private def run(edges: Seq[(String, String)], rounds: Int): DataFrame = {
    val und = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }.distinct
    Anf.neighborhoodFunction(und.toDF("src", "dst"), rounds)
  }

  private def collect(df: DataFrame)
      : Map[(String, Int), (Long, Long, Long, Long)] =
    df.collect().map { r =>
      (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
    }.toMap

  private def adjOf(edges: Seq[(String, String)]): Map[String, Set[String]] = {
    val und = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    und.groupBy(_._1).map { case (v, es) => v -> es.map(_._2).toSet }
  }

  private val path = (0 until 5).map(i => (s"n$i", s"n${i + 1}"))

  test("path graph: every (node, t) summary equals the exact-BFS replay") {
    val got = collect(run(path, rounds = 5))
    val want = balls(adjOf(path), rounds = 5).map { case (k, members) =>
      k -> summarize(members)
    }
    assert(got === want)
  }

  test("seeded random graph: integer-exact vs replay, monotone sum_pow") {
    val rnd = new scala.util.Random(7)
    val n = 40
    val edges = (0 until 120).map(_ =>
      (s"v${rnd.nextInt(n)}", s"v${rnd.nextInt(n)}"))
      .filter { case (a, b) => a != b }.distinct
    val got = collect(run(edges, rounds = 4))
    val want = balls(adjOf(edges), rounds = 4).map { case (k, m) =>
      k -> summarize(m)
    }
    assert(got === want)
    // registers only grow => each 2^(57-r) term shrinks: sum_pow and
    // n_zero are non-increasing in t for every node
    got.groupBy(_._1._1).foreach { case (_, rows) =>
      val byT = rows.toSeq.sortBy(_._1._2).map(_._2)
      byT.sliding(2).foreach {
        case Seq((_, z0, p0, _), (_, z1, p1, _)) =>
          assert(z1 <= z0); assert(p1 <= p0)
        case _ =>
      }
    }
  }

  test("fixpoint: past the component diameter the sketch stops changing" +
      " and equals every component member's full-set sketch") {
    // two components: a 4-cycle and a 3-path (diameters 2)
    val edges = Seq("a" -> "b", "b" -> "c", "c" -> "d", "d" -> "a",
      "x" -> "y", "y" -> "z")
    val got = collect(run(edges, rounds = 4))
    for (v <- Seq("a", "b", "c", "d", "x", "y", "z"); t <- 3 to 4)
      assert(got((v, t)) === got((v, 2)), s"$v t=$t")
    // same ball set => identical registers => identical summary
    for (v <- Seq("b", "c", "d")) assert(got((v, 2)) === got(("a", 2)))
    for (v <- Seq("y", "z")) assert(got((v, 2)) === got(("x", 2)))
    assert(got(("a", 2)) !== got(("x", 2)))
  }

  test("estimates track exact ball sizes; nf/effectiveDiameter behave") {
    val rnd = new scala.util.Random(11)
    val n = 300
    val edges = (0 until 600).map(_ =>
      (s"v${rnd.nextInt(n)}", s"v${rnd.nextInt(n)}"))
      .filter { case (a, b) => a != b }.distinct
    val df = run(edges, rounds = 3)
    val got = collect(df)
    val exact = balls(adjOf(edges), rounds = 3)
    val relErrs = got.toSeq.map { case (k, (_, z, p, _)) =>
      val est = Hll.estimateFromSummary(z, p)
      math.abs(est - exact(k).size) / exact(k).size.toDouble
    }
    val mean = relErrs.sum / relErrs.size
    assert(mean < 0.15, s"mean relative error $mean")
    // N(t) non-decreasing (balls only grow) and the exact total tracks
    val nf = Anf.nf(df)
    assert(nf.map(_._1) === Seq(0, 1, 2, 3))
    nf.sliding(2).foreach { case Seq((_, a), (_, b)) => assert(b >= a - 1e-9)
      case _ => }
    val exactNf = exact.groupBy(_._1._2).map { case (t, m) =>
      t -> m.values.map(_.size).sum.toDouble }
    nf.foreach { case (t, v) =>
      assert(math.abs(v - exactNf(t)) / exactNf(t) < 0.1,
        s"N($t)=$v vs ${exactNf(t)}")
    }
    val ed = Anf.effectiveDiameter(df, q = 0.9)
    assert(ed >= 0 && ed <= 3)
  }

  test("directed input: OUT-balls, and a pure sink still counts itself") {
    // a -> b -> c, plus d -> b: out-balls differ from in-balls on
    // every node, and c is a pure sink (never a src)
    val edges = Seq("a" -> "b", "b" -> "c", "d" -> "b")
    val adjOut = Map("a" -> Set("b"), "b" -> Set("c"), "d" -> Set("b"),
      "c" -> Set.empty[String])
    val got = collect(
      Anf.neighborhoodFunction(edges.toDF("src", "dst"), rounds = 2))
    val want = (for {
      v <- adjOut.keys; t <- 0 to 2
    } yield {
      val ball = Iterator.iterate(Set(v))(b => b ++ b.flatMap(adjOut(_)))
        .drop(t).next()
      (v, t) -> summarize(ball)
    }).toMap
    assert(got === want)
  }

  test("estCol equals Hll.estimateFromSummary bit-exactly per row") {
    val rnd = new scala.util.Random(5)
    val edges = (0 until 200).map(_ =>
      (s"v${rnd.nextInt(80)}", s"v${rnd.nextInt(80)}"))
      .filter { case (a, b) => a != b }.distinct
    val df = run(edges, rounds = 3)
    val rows = df.withColumn("est", Anf.estCol)
      .select("n_zero", "sum_pow", "est").collect()
    rows.foreach { r =>
      val want = Hll.estimateFromSummary(r.getLong(0), r.getLong(1))
      assert(r.getDouble(2) == want, s"$r vs $want")
    }
  }

  test("HyperBall centralities track exact BFS harmonic/closeness") {
    val rnd = new scala.util.Random(23)
    val n = 200
    val edges = (0 until 500).map(_ =>
      (s"v${rnd.nextInt(n)}", s"v${rnd.nextInt(n)}"))
      .filter { case (a, b) => a != b }.distinct
    val rounds = 4
    val df = run(edges, rounds)
    val got = Anf.centralities(df).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    // exact truncated-at-rounds harmonic / closeness sums by BFS
    val exact = balls(adjOf(edges), rounds)
    val nodes = exact.keys.map(_._1).toSet
    val (hErrs, cErrs) = nodes.toSeq.map { v =>
      val sizes = (0 to rounds).map(t => exact((v, t)).size)
      val h = (1 to rounds).map(t => (sizes(t) - sizes(t - 1)).toDouble / t).sum
      val c = (1 to rounds).map(t => (sizes(t) - sizes(t - 1)).toDouble * t).sum
      val (gh, gc) = got(v)
      (math.abs(gh - h) / math.max(h, 1.0),
        math.abs(gc - c) / math.max(c, 1.0))
    }.unzip
    assert(hErrs.sum / hErrs.size < 0.15,
      s"harmonic mean rel err ${hErrs.sum / hErrs.size}")
    assert(cErrs.sum / cErrs.size < 0.2,
      s"closeness mean rel err ${cErrs.sum / cErrs.size}")
  }
}
