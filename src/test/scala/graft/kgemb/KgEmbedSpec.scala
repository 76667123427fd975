package graft.kgemb

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** TransE hash-embedding scoring vs a naive JVM replay of the same FNV
  * fold — the invariants the kg_transe oracle relies on.
  */
class KgEmbedSpec extends SparkSpec {
  import spark.implicits._

  private def embJvm(key: String, d: Int): Long =
    java.lang.Long.remainderUnsigned(
      graft.mix.Mix.fnv1a(s"$key#$d"), 2 * KgEmbed.Amp + 1) - KgEmbed.Amp

  private def scoreJvm(s: String, p: String, o: String): Long =
    (0 until KgEmbed.Dim).map { d =>
      math.abs(embJvm(s, d) + embJvm(p, d) - embJvm(o, d))
    }.sum

  test("embComponent ≡ JVM FNV replay and stays in [-Amp, Amp]") {
    val keys = Seq("urn:doc:0", "urn:ent:spark", "urn:graft:mentions",
      "αβγ", "")
    val df = keys.toDF("k")
    for (d <- 0 until KgEmbed.Dim) {
      val got = df.select(col("k"), KgEmbed.embComponent(col("k"), d))
        .as[(String, Long)].collect().toMap
      keys.foreach { k =>
        assert(got(k) == embJvm(k, d), s"key=$k d=$d")
        assert(math.abs(got(k)) <= KgEmbed.Amp)
      }
    }
  }

  test("transeScore ≡ naive L1 over the hash embeddings; identity is 0") {
    val rows = Seq(("urn:doc:1", "urn:ent:spark"),
      ("urn:doc:2", "urn:ent:vector"), ("x", "y"))
    val got = rows.toDF("s", "o")
      .select(col("s"), col("o"),
        KgEmbed.transeScore(col("s"), "urn:graft:mentions", col("o"))
          .as("sc"))
      .as[(String, String, Long)].collect()
    got.foreach { case (s, o, sc) =>
      assert(sc == scoreJvm(s, "urn:graft:mentions", o))
      assert(sc >= 0)
    }
    // a triple scored against itself translated by a zero predicate:
    // emb(s) + 0 - emb(s) needs p with all-zero components, which the
    // hash doesn't guarantee — instead check s==o collapses to the
    // predicate's own L1 norm
    val pNorm = (0 until KgEmbed.Dim)
      .map(d => math.abs(embJvm("urn:graft:mentions", d))).sum
    val self = Seq(("a", "a")).toDF("s", "o")
      .select(KgEmbed.transeScore(col("s"), "urn:graft:mentions", col("o")))
      .as[Long].head()
    assert(self == pNorm)
  }

  test("distmultScore ≡ naive bilinear product over the hash embeddings") {
    def dmJvm(s: String, p: String, o: String): Long =
      (0 until KgEmbed.Dim).map { d =>
        embJvm(s, d) * embJvm(p, d) * embJvm(o, d)
      }.sum
    val rows = Seq(("urn:doc:1", "urn:ent:spark"),
      ("urn:doc:2", "urn:ent:vector"), ("x", "y"), ("a", "a"))
    val got = rows.toDF("s", "o")
      .select(col("s"), col("o"),
        KgEmbed.distmultScore(col("s"), "urn:graft:mentions", col("o"))
          .as("sc"))
      .as[(String, String, Long)].collect()
    got.foreach { case (s, o, sc) =>
      assert(sc == dmJvm(s, "urn:graft:mentions", o), s"s=$s o=$o")
      // bound check: |sc| ≤ Dim · Amp³
      assert(math.abs(sc) <= KgEmbed.Dim * KgEmbed.Amp * KgEmbed.Amp *
        KgEmbed.Amp)
    }
    // DistMult is symmetric in s and o (a known expressiveness limit of
    // the bilinear-diagonal family) — the swap law pins the formula
    val sym = Seq(("u", "v"), ("v", "u")).toDF("s", "o")
      .select(KgEmbed.distmultScore(col("s"), "urn:graft:mentions",
        col("o")))
      .as[Long].collect()
    assert(sym(0) == sym(1))
  }

  test("transeGradUpdates ≡ naive hinge subgradient aggregation") {
    val p = "urn:graft:mentions"
    val pairs = Seq(
      ("urn:doc:1", "urn:ent:spark", "urn:ent:join"),
      ("urn:doc:2", "urn:ent:vector", "urn:ent:spark"),
      ("urn:doc:3", "urn:ent:merge", "urn:ent:hash"),
      ("urn:doc:1", "urn:ent:window", "urn:ent:batch"))
    def sgn(x: Long): Long = java.lang.Long.signum(x).toLong
    val naive = pairs.flatMap { case (s, o, on) =>
      val pos = (0 until KgEmbed.Dim)
        .map(d => math.abs(embJvm(s, d) + embJvm(p, d) - embJvm(o, d))).sum
      val neg = (0 until KgEmbed.Dim)
        .map(d => math.abs(embJvm(s, d) + embJvm(p, d) - embJvm(on, d))).sum
      if (pos + KgEmbed.Margin > neg)
        (0 until KgEmbed.Dim).flatMap { d =>
          val sp = sgn(embJvm(s, d) + embJvm(p, d) - embJvm(o, d))
          val sn = sgn(embJvm(s, d) + embJvm(p, d) - embJvm(on, d))
          Seq((s, d.toLong, sn - sp), (o, d.toLong, sp),
            (on, d.toLong, -sn))
        }
      else Seq.empty
    }.groupBy(t => (t._1, t._2)).view
      .mapValues(_.map(_._3).sum).toMap
    val got = KgEmbed.transeGradUpdates(
        pairs.toDF("s", "o", "o_neg").repartition(3), p)
      .as[(String, Long, Long)].collect()
      .map(r => ((r._1, r._2), r._3)).toMap
    assert(got == naive)
    // at least one pair must be hinge-active or the test is vacuous
    assert(naive.nonEmpty, "fixture: no violated pairs — widen it")
  }

  test("applying the aggregated gradient step DECREASES total hinge " +
      "loss (the update actually descends)") {
    val p = "urn:graft:mentions"
    // enough pairs that several are hinge-active and entities repeat
    // (the aggregation path, not just per-pair updates)
    val ents = Seq("spark", "join", "window", "batch", "vector", "hash")
    val pairs = for {
      i <- 0 until 12
      o = s"urn:ent:${ents(i % 6)}"; on = s"urn:ent:${ents((i + 2) % 6)}"
      if o != on
    } yield (s"urn:doc:$i", o, on)
    def emb(upd: Map[(String, Int), Long])(x: String, d: Int): Long =
      embJvm(x, d) + upd.getOrElse((x, d), 0L)
    def loss(upd: Map[(String, Int), Long]): Long = pairs.map {
      case (s, o, on) =>
        val e = emb(upd) _
        def l1(ob: String) = (0 until KgEmbed.Dim)
          .map(d => math.abs(e(s, d) + embJvm(p, d) - e(ob, d))).sum
        math.max(0L, KgEmbed.Margin + l1(o) - l1(on))
    }.sum
    val updates = KgEmbed.transeGradUpdates(
        pairs.toDF("s", "o", "o_neg"), p)
      .as[(String, Long, Long)].collect()
      .map(r => ((r._1, r._2.toInt), r._3)).toMap
    assert(updates.nonEmpty, "fixture: no violated pairs — widen it")
    val before = loss(Map.empty)
    // unit-step integer SGD: scale the ±votes modestly so one step
    // moves components without overshooting the hinge geometry
    val after = loss(updates.view.mapValues(_ * 8L).toMap)
    assert(after < before,
      s"aggregated step did not descend: $before -> $after")
  }

  test("complexScore ≡ naive real-part expansion; breaks the swap law") {
    def cxJvm(s: String, p: String, o: String): Long =
      (0 until KgEmbed.Dim).map { d =>
        val (sr, si) = (embJvm(s, 2 * d), embJvm(s, 2 * d + 1))
        val (pr, pi) = (embJvm(p, 2 * d), embJvm(p, 2 * d + 1))
        val (or_, oi) = (embJvm(o, 2 * d), embJvm(o, 2 * d + 1))
        sr * pr * or_ + si * pr * oi + sr * pi * oi - si * pi * or_
      }.sum
    val rows = Seq(("urn:doc:1", "urn:ent:spark"),
      ("urn:doc:2", "urn:ent:vector"), ("x", "y"), ("a", "a"))
    val got = rows.toDF("s", "o")
      .select(col("s"), col("o"),
        KgEmbed.complexScore(col("s"), "urn:graft:mentions", col("o"))
          .as("sc"))
      .as[(String, String, Long)].collect()
    got.foreach { case (s, o, sc) =>
      assert(sc == cxJvm(s, "urn:graft:mentions", o), s"s=$s o=$o")
    }
    // unlike DistMult, ComplEx CAN order (s, o): the conjugation makes
    // the swap inequality possible (antisymmetry capability) — check it
    // actually differs on a concrete pair
    val asym = Seq(("u", "v"), ("v", "u")).toDF("s", "o")
      .select(KgEmbed.complexScore(col("s"), "urn:graft:mentions",
        col("o")))
      .as[Long].collect()
    assert(asym(0) != asym(1),
      "swap produced equal scores — conjugation not applied?")
  }
}
