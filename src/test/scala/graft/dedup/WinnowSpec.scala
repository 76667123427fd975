package graft.dedup

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Dedup.winnowed / winnowPairs vs a naive replay of the MOSS
  * definition, plus the winnowing guarantee: a shared token run of
  * ≥ k+w−1 tokens always yields a shared fingerprint.
  */
class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private val K = 4
  private val W = 4

  private def check(p: Prop, n: Int = 10): Unit = {
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(n).withWorkers(1), p)
    assert(res.passed, res.status.toString)
  }

  /** Naive truth straight from the definition: k-gram FNV hashes at
    * every position, min per w-window (one global window when there
    * are fewer grams), distinct.
    */
  private def naive(text: String): Set[Long] = {
    val toks = text.split(' ').filter(_.nonEmpty)
    if (toks.length < K) return Set.empty
    val hs = toks.sliding(K).map(g => graft.mix.Mix.fnv1a(g.mkString(" ")))
      .toArray
    if (hs.length <= W) Set(hs.min)
    else hs.sliding(W).map(_.min).toSet
  }

  private def run(texts: Seq[String]): Map[Long, Set[Long]] =
    Dedup.winnowed(texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text"), k = K, w = W)
      .collect()
      .groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.map(_.getLong(1)).toSet }

  private val genText: Gen[String] = for {
    n <- Gen.choose(0, 40)
    ts <- Gen.listOfN(n, Gen.oneOf("a", "b", "c", "dd", "e1", "xyz"))
  } yield ts.mkString(" ")

  test("winnowed ≡ naive definition replay on random token streams") {
    check(Prop.forAll(Gen.listOfN(3, genText)) { texts =>
      val got = run(texts)
      texts.zipWithIndex.forall { case (t, i) =>
        got.getOrElse(i.toLong, Set.empty) == naive(t)
      }
    })
  }

  test("guarantee: shared run of k+w−1 tokens ⇒ ≥1 shared fingerprint") {
    check(Prop.forAll(
      Gen.listOfN(K + W - 1, Gen.oneOf("p", "q", "r", "s")),
      Gen.listOfN(12, Gen.oneOf("u", "v", "w")),
      Gen.listOfN(12, Gen.oneOf("m", "n", "o"))) { (shared, pre, post) =>
      val a = (pre ++ shared).mkString(" ")
      val b = (shared ++ post).mkString(" ")
      (naive(a) & naive(b)).nonEmpty
    })
  }

  test("fingerprint density is sparse: ≤ #windows, ≥ ceil(windows/w)") {
    check(Prop.forAll(genText) { t =>
      val toks = t.split(' ').filter(_.nonEmpty)
      val grams = toks.length - K + 1
      val fp = naive(t).size
      if (grams <= 0) fp == 0
      else {
        val windows = math.max(grams - W + 1, 1)
        // a chosen min persists across at most w consecutive windows
        fp <= windows && fp >= (windows + W - 1) / W
      }
    })
  }

  test("winnowPairs recovers planted near-dups and respects the cap") {
    val base = (0 until 30).map(i => s"tok$i").mkString(" ")
    val twin = base.split(' ').drop(2).mkString(" ") // 28-token shared run
    val noise = (0 until 30).map(i => s"other${i * 7}").mkString(" ")
    val boiler = (0 until 8).map(_ => "x y z w x y z w q") // shared 9-tokens
    val docs = (Seq(base, twin, noise) ++ boiler).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val pairs = Dedup.winnowPairs(docs, k = K, w = W, minShared = 2, cap = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)), s"planted twin missing: $pairs")
    // the 8 boilerplate docs share fingerprints seen in 8 > cap=4 docs:
    // every one of their pairs must be suppressed by the stop-cap
    assert(pairs.forall { case (a, b) => a < 3 || b < 3 }, pairs.toString)
  }
}
