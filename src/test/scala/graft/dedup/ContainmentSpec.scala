package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Dedup.containmentPairs vs a brute-force shingle-set truth — the
  * ScalaCheck pass is the losslessness proof for the rarest-token
  * prefix filter (every true pair must survive candidate generation),
  * plus the planted-snippet and CJK-routing closed cases.
  */
class ContainmentSpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop, n: Int = 6): Unit = {
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(n).withWorkers(1), p)
    assert(res.passed, res.status.toString)
  }

  /** The operator's gram rule, replayed: distinct word 3-grams, one
    * truncated gram for docs under 3 tokens. */
  private def grams(text: String): Set[String] = {
    val w = text.split(" ")
    (1 to math.max(1, w.length - 2))
      .map(i => w.slice(i - 1, i + 2).mkString(" ")).toSet
  }

  /** Quadratic truth: all oriented pairs (smaller contained in larger,
    * ties a < b) with inter·den ≥ n_a·num. */
  private def naive(docs: Seq[(Long, String)], num: Int,
      den: Int): Set[(Long, Long, Long, Long)] = {
    val g = docs.map { case (id, t) => id -> grams(t) }.toMap
    (for {
      (a, ga) <- g.toSeq; (b, gb) <- g.toSeq
      if a != b
      if ga.size < gb.size || (ga.size == gb.size && a < b)
      inter = (ga & gb).size
      if inter.toLong * den >= ga.size.toLong * num
    } yield (a, b, inter.toLong, ga.size.toLong)).toSet
  }

  private def run(docs: Seq[(Long, String)], num: Int = 9,
      den: Int = 10): Set[(Long, Long, Long, Long)] =
    Dedup.containmentPairs(docs.toDF("doc_id", "text"), num, den)
      .select("a", "b", "inter", "n_a")
      .as[(Long, Long, Long, Long)].collect().toSet

  test("planted snippet: a doc's prefix is contained at exactly 1.0," +
      " Jaccard would miss it") {
    val full = "alpha beta gamma delta epsilon zeta eta theta iota " +
      "kappa lambda mu nu xi omicron pi rho sigma tau upsilon"
    val snippet = "alpha beta gamma delta epsilon zeta"
    val got = Dedup.containmentPairs(
      Seq((1L, full), (2L, snippet)).toDF("doc_id", "text"))
      .select("a", "b", "inter", "n_a", "containment")
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(got.toSeq == Seq((2L, 1L, 4L, 4L, 1.0)), got.mkString(","))
    // the symmetric tier at the same threshold sees J = 4/18 — nothing
    assert(Dedup.jaccardPairs(Seq((1L, full, "en", "web"),
        (2L, snippet, "en", "web"))
      .toDF("doc_id", "text", "lang", "source"), 0.9).count() == 0)
  }

  test("containmentPairs ≡ quadratic truth on random corpora" +
      " (prefix filter is lossless)") {
    val word = Gen.oneOf("aa", "bb", "cc", "dd", "ee", "ff", "gg")
    val doc = Gen.choose(3, 14)
      .flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))
    val corpus = Gen.choose(2, 8).flatMap(k => Gen.listOfN(k, doc))
    check(Prop.forAll(corpus, Gen.oneOf((9, 10), (4, 5), (1, 2))) {
      (texts, t) =>
        val docs = texts.zipWithIndex.map { case (s, i) => (i.toLong, s) }
        run(docs, t._1, t._2) == naive(docs, t._1, t._2)
    }, n = 12)
  }

  test("CJK route: an unspaced snippet inside an unspaced doc is" +
      " caught via character trigrams") {
    val full = "早稲田大学は東京都新宿区に本部を置く日本の私立大学である"
    val snippet = full.take(12)
    val got = run(Seq((1L, full), (2L, snippet)))
    assert(got.exists { case (a, b, _, _) => a == 2L && b == 1L },
      got.toString)
  }
}
