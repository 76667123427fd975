package graft.ontology

import graft.SparkSpec
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Test.{check => scCheck, Parameters}

/** OWL identity-materialization laws: fixture equivalence classes
  * (eq-trans through the 2-hop chain), ScalaCheck equivalence with a
  * brute union-find over random assertion sets, dictionary rep-map
  * closure under the dictionary, and the eq-rep end-to-end law — the
  * canonical co-occurrence graph equals co-occurrence computed over a
  * corpus whose surface forms were pre-substituted by representative.
  */
class OwlSpec extends SparkSpec {
  import spark.implicits._

  private def reps(pairs: Seq[(String, String)]): Map[String, String] =
    Owl.representatives(pairs.toDF("a", "b"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap

  private def bruteReps(pairs: Seq[(String, String)]): Map[String, String] = {
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val parent = scala.collection.mutable.Map(nodes.map(n => n -> n): _*)
    def find(x: String): String =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for ((a, b) <- pairs) parent(find(a)) = find(b)
    // label every class by its min member (the contract CC documents)
    nodes.groupBy(find).flatMap { case (_, members) =>
      val m = members.min; members.map(_ -> m)
    }
  }

  test("fixture: the 2-hop chain merges to one class labeled by its min member") {
    val r = reps(Owl.SameAs)
    assert(r("spark") == "batch" && r("stream") == "batch" && r("batch") == "batch")
    assert(r("vector") == "hash" && r("hash") == "hash")
    assert(!r.contains("join")) // untouched vocabulary absent
  }

  test("ScalaCheck: representatives == brute union-find over random assertion sets") {
    val names = Gen.oneOf("a", "b", "c", "d", "e", "f", "g", "h")
    val pairGen = for { x <- names; y <- names if x != y } yield (x, y)
    val prop = Prop.forAll(Gen.nonEmptyListOf(pairGen)) { pairs =>
      reps(pairs) == bruteReps(pairs)
    }
    val res = scCheck(Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("repIndex: closed under the dictionary, identity off-assertion, idempotent") {
    val dict = graft.extract.Gazetteer.DefaultEntities
      .sorted(graft.model.CodePoint.ordering)
    val idx = Owl.repIndex(spark, dict, Owl.SameAs)
    assert(idx.length == dict.length)
    idx.foreach(i => assert(i >= 0 && i < dict.length))
    // idempotent: a representative is its own representative
    idx.foreach(i => assert(idx(i) == i))
    // identity where no assertion names the entity
    val touched = Owl.SameAs.flatMap(p => Seq(p._1, p._2)).toSet
    dict.zipWithIndex.foreach { case (e, i) =>
      if (!touched(e)) assert(idx(i) == i, s"$e moved without an assertion")
    }
    // the chain and the pair land on their min members
    def at(e: String) = dict(idx(dict.indexOf(e)))
    assert(at("spark") == "batch" && at("stream") == "batch")
    assert(at("vector") == "hash")
  }

  test("eq-rep end-to-end: canonical co-occurrence == pre-substituted corpus co-occurrence") {
    val docs = Seq(
      0L -> "spark join stream",   // spark+stream merge: one canonical entity
      1L -> "stream batch filter", // whole chain collapses to batch
      2L -> "vector join hash",    // pair merges
      3L -> "join window",         // untouched
      4L -> "spark vector")
    val dict = docs.flatMap(_._2.split(" ")).distinct
      .sorted(graft.model.CodePoint.ordering)
    val idx = Owl.repIndex(spark, dict, Owl.SameAs)

    def cooccur(rows: Seq[(Long, String)]): Set[(String, String)] =
      rows.flatMap { case (d, t) =>
        val es = t.split(" ").distinct.sorted
        for (i <- es.indices; j <- (i + 1) until es.length) yield (es(i), es(j))
      }.toSet

    // path A: rewrite indices through repIndex, then pair
    val a = cooccur(docs.map { case (d, t) =>
      d -> t.split(" ").map(e => dict(idx(dict.indexOf(e)))).mkString(" ")
    })
    // path B: substitute surface forms first (the semantics eq-rep claims)
    val sub = Map("spark" -> "batch", "stream" -> "batch", "vector" -> "hash")
    val b = cooccur(docs.map { case (d, t) =>
      d -> t.split(" ").map(e => sub.getOrElse(e, e)).mkString(" ")
    })
    assert(a == b)
    assert(a.contains(("batch", "join"))) // merged entity pairs with neighbors
    assert(!a.exists(p => p._1 == p._2))  // no self-loops from merges
  }
}
