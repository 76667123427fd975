package graft.sketch

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Priority-sampling laws: the draw ≡ a naive scalar replay (hash →
  * pmod u → w/u top-k, τ = (k+1)-th), heavy items (w ≥ τ) contribute
  * their exact weight, nested samples (k=8 ⊂ k=16 — priority order is
  * fixed), and partitioning invariance.
  */
class PrioritySampleSpec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")

  private def naive(k: Int): (Set[Long], Double) = {
    val rows = docs.select("doc_id", "n_chars")
      .collect().map(r => (r.getLong(0), math.max(1L, r.getLong(1))))
    val pri = rows.map { case (id, w) =>
      val h = graft.functions.MixHash.hash(
        org.apache.spark.unsafe.types.UTF8String.fromString(id.toString))
      val u = (h % 2147483647L + 2147483647L) % 2147483647L + 1L
      (id, w, w.toDouble / u)
    }.sortBy(p => (-p._3, p._1))
    val tau = if (pri.length > k) pri(k)._3 else 0.0
    (pri.take(k).map(_._1).toSet, tau)
  }

  test("draw ≡ naive scalar replay; heavy items keep exact weight") {
    val got = PrioritySample.sample(docs, k = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
    val (ids, tau) = naive(16)
    assert(got.map(_._1).toSet == ids)
    assert(got.forall(_._4 == tau))
    for ((_, w, est, t) <- got)
      assert(est == math.max(w.toDouble, t))
    // the heavy-tail guarantee is exercised: at least one sampled item
    // has w >= tau and enters with its exact weight
    assert(got.exists { case (_, w, est, t) => w >= t && est == w.toDouble })
  }

  test("nested samples: the k=8 draw is a subset of the k=16 draw") {
    val s8 = PrioritySample.sample(docs, 8)
      .collect().map(_.getLong(0)).toSet
    val s16 = PrioritySample.sample(docs, 16)
      .collect().map(_.getLong(0)).toSet
    assert(s8.subsetOf(s16) && s8.size == 8 && s16.size == 16)
  }

  test("partitioning invariance") {
    val a = PrioritySample.sample(docs, 16)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSet
    val b = PrioritySample.sample(docs.repartition(13), 16)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSet
    assert(a == b)
  }

  test("small corpus: n ≤ k ⇒ τ = 0 and every estimate is exact") {
    val tiny = docs.limit(5)
    val got = PrioritySample.sample(tiny, 16)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.length == 5)
    assert(got.forall(g => g._3 == 0.0 && g._2 == g._1.toDouble))
  }
}
