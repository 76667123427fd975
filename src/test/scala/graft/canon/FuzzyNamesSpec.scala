package graft.canon

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Deletion-neighbourhood fuzzy matching vs the quadratic truth — the
  * recall-completeness law the kg_fuzzy oracle relies on, plus the
  * variant-generation invariants.
  */
class FuzzyNamesSpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop, n: Int = 8): Unit = {
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(n).withWorkers(1), p)
    assert(res.passed, res.status.toString)
  }

  /** Classic DP Levenshtein, the scalar truth. */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def delsJvm(s: String, k: Int): Set[String] = {
    def d1(x: String): Set[String] =
      x.indices.map(i => x.take(i) + x.drop(i + 1)).toSet
    val one = d1(s) + s
    if (k == 1) one else one ++ d1(s).flatMap(d1)
  }

  // short alphabet + short strings so near-pairs actually occur
  private val nameGen: Gen[List[String]] =
    Gen.listOfN(14, Gen.choose(0, 5).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString)))

  test("deletionVariants ≡ JVM deletion closure (k=1 and k=2)") {
    val names = Seq("", "a", "ab", "abc", "spark", "αβγδ")
    for (k <- Seq(1, 2)) {
      val got = names.toDF("name")
        .select(col("name"),
          FuzzyNames.deletionVariants(col("name"), k).as("v"))
        .as[(String, Seq[String])].collect().toMap
      names.foreach { n =>
        assert(got(n).toSet == delsJvm(n, k), s"name='$n' k=$k")
        assert(got(n).distinct.size == got(n).size, s"dups for '$n'")
      }
    }
  }

  test("fuzzyPairs ≡ quadratic levenshtein truth (recall-complete)") {
    for (k <- Seq(1, 2)) check(Prop.forAll(nameGen) { ns =>
      val names = ns.distinct
      names.isEmpty || {
        val naive = (for {
          a <- names; b <- names if a < b && lev(a, b) <= k
        } yield (a, b, lev(a, b).toLong)).toSet
        val got = FuzzyNames.fuzzyPairs(
            names.toDF("name").repartition(5), k)
          .as[(String, String, Long)].collect().toSet
        got == naive
      }
    })
  }

  test("alias groups: CC over fuzzy pairs merges typo CHAINS " +
      "(endpoints beyond k) and leaves singletons canonical-self") {
    // chain: aaaa ~ aaab ~ aabb ~ abbb (each step ed 1); endpoints at
    // ed 3 > k=2 — only transitive closure unites them
    val names = Seq("aaaa", "aaab", "aabb", "abbb", "zzzzzz")
    val pairs = FuzzyNames.fuzzyPairs(names.toDF("name"), k = 2)
      .select(col("a"), col("b"))
    val comp = ConnectedComponents.run(pairs)
      .as[(String, String)].collect().toMap
    val chain = Seq("aaaa", "aaab", "aabb", "abbb")
    assert(chain.map(comp).distinct == Seq("aaaa"),
      s"chain not united under min label: ${chain.map(comp)}")
    assert(!comp.contains("zzzzzz")) // isolated: coalesces to itself
  }

  test("planted typo family resolves into the expected alias pairs") {
    val names = Seq("acme corp", "acme crop", "acme corp.", "zenith",
      "zennith", "wholly unrelated")
    val got = FuzzyNames.fuzzyPairs(names.toDF("name"), k = 2)
      .as[(String, String, Long)].collect().toSet
    assert(got.contains(("acme corp", "acme crop", 2L)))
    assert(got.contains(("acme corp", "acme corp.", 1L)))
    assert(got.contains(("zenith", "zennith", 1L)))
    assert(!got.exists(p => p._1 == "wholly unrelated" ||
      p._2 == "wholly unrelated"))
  }
}
