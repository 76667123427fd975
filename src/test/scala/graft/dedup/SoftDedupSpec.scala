package graft.dedup

import graft.SparkSpec
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Test.{check => scCheck, Parameters}

/** Soft-dedup laws: weight = floor(10000/size) per exact cluster, every
  * doc keeps a row (reweighting never drops), cluster count agrees with
  * Dedup.exact's survivor count, and the per-cluster mass bound
  * Σ weight_bp ≤ 10000 (floor division loses at most size−1 bp).
  */
class SoftDedupSpec extends SparkSpec {
  import spark.implicits._

  test("ScalaCheck: exact weights, full coverage, cluster-count agreement, mass bound") {
    val texts = Gen.oneOf("aa", "bb", "cc", "dd", "ee")
    val prop = Prop.forAll(Gen.nonEmptyListOf(texts)) { ts =>
      val docs = ts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val w = Dedup.softDedupWeights(docs).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val byText = ts.zipWithIndex.groupBy(_._1)
      val sizeOf = ts.zipWithIndex.map { case (t, i) =>
        i.toLong -> byText(t).size.toLong
      }.toMap
      val coverage = w.length == ts.length
      val exactW = w.forall { case (id, sz, bp) =>
        sz == sizeOf(id) && bp == 10000L / sz
      }
      val survivors = Dedup.exact(docs).count()
      val clusterAgree = survivors == byText.size.toLong
      val massBound = byText.values.forall { g =>
        val sz = g.size.toLong
        sz * (10000L / sz) <= 10000L
      }
      coverage && exactW && clusterAgree && massBound
    }
    val res = scCheck(Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("fixture: sizes 1 and 3 give 10000 and 3333 bp") {
    val docs = Seq((0L, "x"), (1L, "y"), (2L, "y"), (3L, "y"))
      .toDF("doc_id", "text")
    val w = Dedup.softDedupWeights(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(w(0L) == ((1L, 10000L)))
    assert(w(1L) == ((3L, 3333L)) && w(2L) == w(1L) && w(3L) == w(1L))
  }
}
