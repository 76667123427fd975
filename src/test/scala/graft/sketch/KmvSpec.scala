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

  // ---- theta set operations ------------------------------------------

  test("theta ops exact below k: union/intersection are the true sets") {
    val df = docsOf(
      ("a", "x y z shared1 shared2"), ("b", "p q shared1 shared2"))
    val r = Kmv.thetaPairs(df, k = 64).head()
    assert(r.getAs[Long]("n_union") === 7L)     // x y z p q shared1 shared2
    assert(r.getAs[Long]("kth_union") === 0L)   // not full
    assert(r.getAs[Long]("est_union") === 7L)
    assert(r.getAs[Long]("n_match") === 2L)
    assert(r.getAs[Long]("est_intersect") === 2L)
  }

  test("theta estimators within 40% on 2000-token vocabularies, 50% overlap") {
    val shared = (0 until 1000).map(i => s"s$i")
    val ta = (shared ++ (0 until 1000).map(i => s"a$i")).mkString(" ")
    val tb = (shared ++ (0 until 1000).map(i => s"b$i")).mkString(" ")
    val r = Kmv.thetaPairs(docsOf(("a", ta), ("b", tb)), k = 128).head()
    val eu = r.getAs[Long]("est_union")       // true 3000
    val ei = r.getAs[Long]("est_intersect")   // true 1000
    assert(eu > 1800 && eu < 4200, s"est_union=$eu")
    assert(ei > 600 && ei < 1400, s"est_intersect=$ei")
    assert(ei <= eu)
  }

  test("theta ops match a brute-force replay of the definition") {
    // ground truth recomputed from the definition on the raw hash sets
    val ha = (0 until 300).map(i => Kmv.tokenHash(s"w${i % 97}")).distinct
    val hb = (0 until 300).map(i => Kmv.tokenHash(s"w${(i % 83) + 40}")).distinct
    val k = 16
    def bottomK(xs: Seq[Long]) =
      xs.distinct.sortBy(_ ^ Long.MinValue).take(k).toArray
    val (sa, sb) = (bottomK(ha), bottomK(hb))
    val got = Kmv.thetaOps(sa, sb, k)
    val union = (sa ++ sb).distinct.sortBy(_ ^ Long.MinValue).take(k)
    val theta = union(k - 1)
    val thetaU = BigInt(theta) & ((BigInt(1) << 64) - 1)
    val estU = ((BigInt(k - 1) << 64) / thetaU).toLong
    val m = union.count(h => sa.contains(h) && sb.contains(h)).toLong
    assert(got === (k.toLong, theta, estU, m, (BigInt(m) * estU / k).toLong))
  }

  test("theta pairs partitioning-invariant and symmetric in content") {
    val rows = (0 until 400).map(i => (if (i % 2 == 0) "a" else "b", s"t${i % 151}"))
    val x = Kmv.thetaPairs(docsOf(rows: _*), k = 16).collect().toSeq
    val y = Kmv.thetaPairs(docsOf(rows.reverse: _*).repartition(7), k = 16)
      .collect().toSeq
    assert(x.map(_.toSeq) === y.map(_.toSeq))
  }
}
