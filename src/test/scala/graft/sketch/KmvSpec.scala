package graft.sketch

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** KMV sketch laws: exact below k, bounded state, estimator accuracy,
  * merge/partitioning invariance, unsigned ordering.
  */
class KmvSpec extends SparkSpec {
  import spark.implicits._

  private def docsOf(rows: (String, String)*) =
    rows.zipWithIndex.map { case ((s, t), i) => (i.toLong, s, t) }
      .toDF("doc_id", "source", "text")

  test("exact count below k (duplicates ignored)") {
    val df = docsOf(
      ("a", "x y z x y"), ("a", "z w"), ("b", "p"))
    val r = Kmv.distinctSketch(df, k = 64).orderBy("source")
      .select("source", "n_min", "est_distinct")
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2)))
    assert(r === Array(("a", 4L, 4L), ("b", 1L, 1L)))
  }

  test("estimator within 30% at 5000 distinct tokens (k=64)") {
    val text = (0 until 5000).map(i => s"tok$i").mkString(" ")
    val r = Kmv.distinctSketch(docsOf(("a", text)), k = 64).head()
    val est = r.getAs[Long]("est_distinct")
    assert(r.getAs[Long]("n_min") === 64L)
    assert(est > 3500 && est < 6500, s"est=$est")
  }

  test("partitioning- and merge-order-invariant") {
    val rows = (0 until 500).map(i => ("s", s"w${i % 311}"))
    val a = Kmv.distinctSketch(docsOf(rows: _*), k = 16).collect().toSeq
    val b = Kmv.distinctSketch(docsOf(rows.reverse: _*).repartition(13), k = 16)
      .collect().toSeq
    assert(a.map(r => (r.getLong(1), r.getLong(2), r.getLong(3))) ===
      b.map(r => (r.getLong(1), r.getLong(2), r.getLong(3))))
  }

  test("unsigned ordering: negative-signed hashes rank above positives") {
    // state must order by UNSIGNED value: a hash with the sign bit set
    // is LARGE, so with k=2 two small-unsigned hashes must win
    val agg = new Kmv.KmvAgg(2)
    val st = Seq(-1L, 5L, 3L, Long.MinValue).foldLeft(agg.zero)(agg.reduce)
    assert(st.mins.toSeq === Seq(3L, 5L))
    val fin = agg.finish(st)
    assert(fin.kth_min === 5L)
    // est = (2-1)*2^64 / 5
    assert(fin.est_distinct === (BigInt(1) << 64) / 5)
  }

  test("merge equals sequential reduce") {
    val agg = new Kmv.KmvAgg(8)
    val xs = (0 until 100).map(i => Kmv.fnv1a(s"t$i"))
    val (l, r) = xs.splitAt(37)
    val merged = agg.merge(
      l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
    val seq = xs.foldLeft(agg.zero)(agg.reduce)
    assert(merged.mins.toSeq === seq.mins.toSeq)
  }
}
