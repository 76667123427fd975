package graft.sketch

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Log-bucketed quantile sketch laws: bucket monotonicity and exact
  * bound containment over the full small-value range plus octave
  * boundaries, the ≤6.25% relative-error guarantee against exact
  * quantiles, bounded bucket count, and partitioning invariance (the
  * sketch is a commutative monoid — any shard split merges to the same
  * histogram, hence identical quantiles).
  */
class QuantileHistSpec extends SparkSpec {
  import spark.implicits._

  test("bucket is monotone and bounds contain their values") {
    // dense low range (linear buckets + first octaves) and the edges of
    // higher octaves, where shift arithmetic would break first
    val vals = (1L to 5000L) ++
      Seq(1L << 20, (1L << 20) + 1, (1L << 21) - 1, (1L << 40),
        (1L << 40) + 12345L, (1L << 62) - 1, 1L << 62)
    val df = vals.toDF("v")
      .select(col("v"), QuantileHist.bucket(col("v")).as("b"))
    val (lo, hi) = QuantileHist.bounds(col("b"))
    val rows = df.select(col("v"), col("b"), lo.as("lo"), hi.as("hi"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    rows.foreach { case (v, _, l, h) =>
      assert(l <= v && v <= h, s"v=$v outside [$l,$h]")
      // relative error guarantee: bucket width ≤ 2^-4 · lo
      assert(h - l <= math.max(0L, l >> QuantileHist.SubBits),
        s"bucket [$l,$h] wider than the 6.25% guarantee")
    }
    // monotone: sorting by value sorts by bucket
    val sorted = rows.sortBy(_._1)
    sorted.sliding(2).foreach {
      case Array((v1, b1, _, _), (v2, b2, _, _)) =>
        assert(b1 <= b2, s"bucket not monotone at $v1->$v2")
      case _ => ()
    }
  }

  test("bucket count is bounded regardless of value spread") {
    val vals = (0 until 2000).map(i => (1L << (i % 60)) + i)
    val n = QuantileHist.histogram(vals.toDF("v"), "v").count()
    assert(n <= 64L * (1 << QuantileHist.SubBits))
  }

  test("quantiles bracket the exact order statistics") {
    // deterministic long-tailed values: mostly small, some huge
    val vals = (1 to 100000).map(i =>
      if (i % 100 == 0) (i.toLong * 997) % 1000000 + 1000
      else (i % 300 + 1).toLong)
    val qs = Seq(50, 90, 99)
    val out = QuantileHist.quantiles(vals.toDF("v"), "v", qs)
      .orderBy("q").collect()
    assert(out.map(_.getInt(0)).toSeq == qs)
    val sorted = vals.sorted
    qs.zip(out).foreach { case (q, r) =>
      // exact order statistic the sketch targets: first index with
      // cum ≥ ceil(q·n/100)
      val target = sorted(((q.toLong * vals.size + 99) / 100).toInt - 1)
      val (lo, hi) = (r.getLong(2), r.getLong(3))
      assert(lo <= target && target <= hi,
        s"q$q: exact $target outside sketch bucket [$lo,$hi]")
    }
  }

  test("partitioning invariance: 1 vs 7 partitions, identical output") {
    val vals = (1 to 20000).map(i => ((i * 31L) % 5000) + 1)
    val a = QuantileHist.quantiles(
      vals.toDF("v").repartition(1), "v", Seq(50, 90, 99))
      .orderBy("q").collect().map(_.toSeq).toSeq
    val b = QuantileHist.quantiles(
      vals.toDF("v").repartition(7), "v", Seq(50, 90, 99))
      .orderBy("q").collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("keyed quantiles ≡ per-key global quantiles") {
    val vals = (1 to 12000).map(i =>
      (s"k${i % 3}", ((i * 13L) % (800 * (i % 3 + 1))) + 1))
    val df = vals.toDF("k", "v")
    val keyed = QuantileHist.quantilesByKey(df, "k", "v", Seq(50, 90, 99))
      .collect().map(r => ((r.getString(0), r.getInt(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    for (key <- Seq("k0", "k1", "k2")) {
      val global = QuantileHist.quantiles(
        df.filter(col("k") === key).select("v"), "v", Seq(50, 90, 99))
        .collect().map(r => (r.getInt(0),
          (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      for (q <- Seq(50, 90, 99))
        assert(keyed((key, q)) == global(q), s"$key q$q")
    }
  }

  test("histogram merge law: shard histograms sum to the whole") {
    val vals = (1 to 9999).map(i => ((i * 17L) % 2048) + 1)
    val (l, r) = vals.splitAt(4000)
    val whole = QuantileHist.histogram(vals.toDF("v"), "v")
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val merged = (QuantileHist.histogram(l.toDF("v"), "v").collect() ++
      QuantileHist.histogram(r.toDF("v"), "v").collect())
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(1)).sum).toMap
    assert(whole == merged)
  }
}
