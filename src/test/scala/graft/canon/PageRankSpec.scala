package graft.canon

import org.apache.spark.sql.functions._
import graft.SparkSpec

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private def undirected(pairs: Seq[(String, String)]) = {
    val fwd = pairs.toDF("src", "dst")
    fwd.union(fwd.select(col("dst"), col("src")))
  }

  test("regular graph is a fixed point: every score stays exactly 10^12") {
    // on a d-regular symmetric graph each node receives d * (S div d)
    // back; with S = 10^12 and d | 10^12 the integer recurrence is
    // exact: 0.15e12 + (85 * 1e12) div 100 = 1e12. Cycle of 8 (d = 2).
    val cyc = (0 until 8).map(i => (f"n$i%02d", f"n${(i + 1) % 8}%02d"))
    val out = PageRank.run(undirected(cyc), iters = 5).collect()
    assert(out.length == 8)
    assert(out.forall(_.getLong(1) == PageRank.Scale))
  }

  test("star graph: hub outranks leaves, leaves tie exactly") {
    val star = (1 to 9).map(i => ("hub", f"leaf$i"))
    val scores = PageRank.run(undirected(star), iters = 5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val leafScores = (1 to 9).map(i => scores(f"leaf$i")).distinct
    assert(leafScores.size == 1, "leaves must tie bit-exactly")
    assert(scores("hub") > leafScores.head * 5,
      "hub absorbs the walk mass")
  }

  test("integer fixed point is partitioning-invariant") {
    val rnd = new scala.util.Random(7)
    val edges = (0 until 300).map(_ =>
      (f"v${rnd.nextInt(40)}%02d", f"v${rnd.nextInt(40)}%02d"))
      .filter(p => p._1 != p._2).distinct
    val e = undirected(edges).distinct()
    val a = PageRank.run(e.repartition(1), iters = 4)
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted
    val b = PageRank.run(e.repartition(17), iters = 4)
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted
    assert(a.sameElements(b))
  }

  test("kg_pagerank matches a driver-side replay of the recurrence") {
    val df = graft.queries.KgQueries.kgPagerank(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // independent replay: adjacency maps + the same integer recurrence
    val pages = graft.pages.PageGen.pages(spark, "/root/testdata/sf0.001")
    val m = graft.extract.MentionScan
      .mentions(pages, graft.extract.Gazetteer(graft.extract.Gazetteer.DefaultEntities))
      .select("doc_id", "entity").collect()
      .map(r => (s"urn:doc:${r.getLong(0)}", s"urn:ent:${r.getString(1)}"))
    val und = (m ++ m.map(_.swap)).toSeq
    val adj = und.groupBy(_._1).map { case (s, es) => s -> es.map(_._2) }
    var score = adj.keys.map(_ -> PageRank.Scale).toMap
    for (_ <- 1 to 5) {
      val in = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
      for ((u, ns) <- adj; c = score(u) / ns.length; v <- ns) in(v) += c
      score = in.map { case (v, s) =>
        v -> (PageRank.Teleport + (PageRank.DampNum * s) / PageRank.DampDen)
      }.toMap
    }
    assert(df.length == score.size && df.length > 0)
    assert(df.forall { case (n, s) => score(n) == s })
  }

  test("weighted PageRank ≡ naive weighted recurrence; uniform weights" +
      " ≡ unweighted") {
    val rnd = new scala.util.Random(11)
    val raw = (0 until 120).map(_ =>
      (f"v${rnd.nextInt(16)}%02d", f"v${rnd.nextInt(16)}%02d",
        (rnd.nextInt(9) + 1).toLong))
      .filter(p => p._1 != p._2)
      .groupBy(p => (p._1, p._2)).map { case ((a, b), g) => (a, b, g.head._3) }
      .toSeq
    val edges = raw ++ raw.map(t => (t._2, t._1, t._3))
    val iters = 4
    // naive replay
    val wtot = edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val in = edges.groupBy(_._2)
    var s = wtot.keys.map(_ -> PageRank.Scale).toMap
    for (_ <- 1 to iters)
      s = wtot.keys.map { v =>
        val mass = in.getOrElse(v, Seq.empty)
          .map { case (u, _, w) => s(u) * w / wtot(u) }.sum
        v -> (PageRank.Teleport + 85L * mass / 100L)
      }.toMap
    val got = PageRank.runWeighted(
        edges.toDF("src", "dst", "w").repartition(5), iters)
      .as[(String, Long)].collect().toMap
    assert(got == s)
    // law: all-equal weights reduce to the unweighted recurrence
    val uni = edges.map(t => (t._1, t._2, 7L)).distinct
    val w1 = PageRank.runWeighted(uni.toDF("src", "dst", "w"), 3)
      .as[(String, Long)].collect().toMap
    val u1 = PageRank.run(uni.map(t => (t._1, t._2)).distinct
        .toDF("src", "dst"), 3)
      .as[(String, Long)].collect().toMap
    assert(w1 == u1, "uniform weights must reduce to unweighted PageRank")
  }

  test("personalized PageRank: seed-restart recurrence, scala replay") {
    val star = (1 to 5).map(i => ("hub", f"leaf$i"))
    val edges = undirected(star)
    val got = PageRank.runPersonalized(edges, Seq("hub").toDF("node"),
        iters = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // replay the identical integer recurrence driver-side
    val adj = (star ++ star.map(_.swap)).groupBy(_._1).view
      .mapValues(_.map(_._2)).toMap
    val deg = adj.view.mapValues(_.size.toLong).toMap
    var s = adj.keys.map(n =>
      n -> (if (n == "hub") PageRank.Scale else 0L)).toMap
    for (_ <- 1 to 4) {
      val in = scala.collection.mutable.Map[String, Long]()
      adj.foreach { case (u, vs) =>
        val c = s(u) / deg(u)
        vs.foreach(v => in(v) = in.getOrElse(v, 0L) + c)
      }
      s = in.keys.map { v =>
        v -> ((if (v == "hub") PageRank.Teleport else 0L) +
          85L * in(v) / 100L)
      }.toMap
    }
    assert(got == s)
    // seed holds the mass; leaves share the rest symmetrically
    assert(got("hub") > got("leaf1"))
    assert((1 to 5).map(i => got(f"leaf$i")).distinct.size == 1)
  }

  test("personalized PageRank is partitioning-invariant") {
    val rnd = new scala.util.Random(11)
    val edges = (0 until 200).map(_ =>
      (f"v${rnd.nextInt(30)}%02d", f"v${rnd.nextInt(30)}%02d"))
      .filter(p => p._1 != p._2).distinct
    val e = undirected(edges).distinct()
    val seeds = Seq("v01", "v07").toDF("node")
    val a = PageRank.runPersonalized(e.repartition(1), seeds, iters = 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted
    val b = PageRank.runPersonalized(e.repartition(13), seeds, iters = 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted
    assert(a.sameElements(b))
  }
}
