package graft.mix

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Stride-interleave laws: the closed-form positions form an exact
  * permutation (bijectivity — the strongest machine check a position
  * formula admits), equal a naive event-driven stride simulation on a
  * weighted fixture, and respect the weighted-fairness bound in every
  * prefix.
  */
class InterleaveSpec extends SparkSpec {
  import spark.implicits._

  /** Naive truth: simulate the scheduler — repeatedly pick the pending
    * item with the smallest virtual time (r+1)/w, ties by source name,
    * via exact cross-multiplied rational comparison. */
  private def naive(items: Seq[(Long, String)]): Map[Long, Long] = {
    val w = items.map(_._2).distinct
      .map(s => s -> (s.length % 5 + 1).toLong).toMap
    val perSource = items.groupBy(_._2).map { case (s, xs) =>
      s -> xs.map(_._1).sorted
    }
    val next = scala.collection.mutable.Map[String, Int]()
    perSource.keys.foreach(next(_) = 0)
    val out = scala.collection.mutable.ArrayBuffer[Long]()
    while (out.length < items.length) {
      val ready = perSource.keys.toSeq
        .filter(s => next(s) < perSource(s).length).sorted
      val ord: Ordering[String] = Ordering.fromLessThan { (a, b) =>
        val (ra, rb) = (next(a) + 1L, next(b) + 1L)
        val cmp = ra * w(b) - rb * w(a) // t_a < t_b ⟺ ra·w_b < rb·w_a
        cmp < 0 || (cmp == 0 && a < b)
      }
      val best = ready.min(ord)
      out += perSource(best)(next(best))
      next(best) += 1
    }
    out.zipWithIndex.map { case (id, p) => id -> p.toLong }.toMap
  }

  test("≡ naive stride simulation on a 3-weight fixture") {
    // weights from name length mod 5 + 1: "a"→2, "ab"→3, "abcde"→1
    val items = (0L until 12L).map(i => (i, "a")) ++
      (12L until 20L).map(i => (i, "ab")) ++
      (20L until 24L).map(i => (i, "abcde"))
    val got = Interleave.schedule(items.toDF("doc_id", "source"))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got == naive(items))
  }

  test("positions are an exact permutation over the real corpus") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val pos = Interleave.schedule(docs)
      .select("pos").collect().map(_.getLong(0)).sorted
    assert(pos.toSeq == (0L until docs.count()).toSeq)
  }

  test("weighted fairness: a weight-w source holds ≤ ceil(w·(p+1)/W)+1 " +
      "slots of any prefix") {
    val items = (0L until 30L).map(i => (i, "a")) ++      // w=2
      (30L until 60L).map(i => (i, "abcd"))               // w=5
    val order = Interleave.schedule(items.toDF("doc_id", "source"))
      .orderBy("pos").collect().map(_.getString(1))
    val wTot = 7L
    // the lag bound holds while both sources are still active; the
    // weight-5 source drains its 30 items first, around slot 42
    val bothActive = order.indices
      .takeWhile(p => order.drop(p + 1).contains("abcd"))
    assert(bothActive.size > 30) // the window genuinely exercises it
    for (p <- bothActive) {
      val ca = order.take(p + 1).count(_ == "a")
      // stride scheduling's lag bound: within one quantum of fair share
      assert(ca <= 2L * (p + 1) / wTot + 2,
        s"prefix $p: source a holds $ca slots")
    }
  }
}
