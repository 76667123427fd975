package graft.mix

import graft.SparkSpec
import graft.functions.MixHash
import org.apache.spark.unsafe.types.UTF8String

/** Mix.sample vs a full driver-side replay (MixHash rank order), plus
  * the laws that make it the STABLE eval-draw primitive: determinism
  * across runs, exact per-group size min(k, |group|), and
  * displacement-only membership (growing the corpus can only displace
  * a sampled doc with a smaller hash, never reshuffle survivors).
  */
class SampleSpec extends SparkSpec {
  import spark.implicits._

  private def hashOf(id: Long): Long =
    MixHash.hash(UTF8String.fromString(id.toString))

  private def run(rows: Seq[(Long, String)], k: Int)
      : Map[String, Seq[Long]] =
    Mix.sample(rows.toDF("doc_id", "source"), k)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
      .map { case (s, xs) => s -> xs.sortBy(_._3).map(_._2).toSeq }

  private def naive(rows: Seq[(Long, String)], k: Int)
      : Map[String, Seq[Long]] =
    rows.groupBy(_._2).map { case (s, xs) =>
      s -> xs.map(_._1).sortBy(id => (hashOf(id), id)).take(k)
    }

  private val corpus = (0L until 300L).map(i => (i, s"src${i % 4}"))

  test("sample equals the hash-rank replay, in rank order") {
    assert(run(corpus, 5) === naive(corpus, 5))
  }

  test("per-group size is min(k, group size); k > group is the group") {
    val tiny = (0L until 7L).map(i => (i, if (i < 2) "a" else "b"))
    val got = run(tiny, 4)
    assert(got("a").size == 2 && got("b").size == 4)
    assert(got("a").toSet == Set(0L, 1L))
  }

  test("displacement-only: survivors of a grown corpus were sampled " +
      "before it grew") {
    val grown = corpus ++ (1000L until 1150L).map(i => (i, s"src${i % 4}"))
    val before = run(corpus, 5)
    val after = run(grown, 5)
    for ((s, docs) <- after; d <- docs if d < 300L)
      assert(before(s).contains(d),
        s"$d kept in grown $s but was not in the original sample")
  }
}
