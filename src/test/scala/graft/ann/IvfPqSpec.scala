package graft.ann

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** IVF-PQ (round-5): product-quantized candidate scan + exact rerank.
  * Asserts the three properties the tier exists for — the codebook is
  * partitioning-invariant (integer-quantized Lloyd's), the compressed
  * scan plus rerank recovers brute-force neighbors on clustered data,
  * and the code payload is a fraction of the float payload.
  */
class IvfPqSpec extends SparkSpec {
  import spark.implicits._

  // clustered corpus (real embedding spaces cluster; same shape as the
  // trained-IVF spec)
  private val dim = 32
  private lazy val vecs: Seq[(Long, Seq[Float])] = {
    val rnd = new scala.util.Random(13)
    val centers = Array.fill(20)(Array.fill(dim)(rnd.nextGaussian().toFloat))
    (0 until 2000).map { i =>
      val c = centers(i % 20)
      (i.toLong, c.toSeq.map(x => x + 0.15f * rnd.nextGaussian().toFloat))
    }
  }
  private lazy val cemb = vecs.toDF("vec_id", "embedding").localCheckpoint()

  test("PQ training is partitioning-invariant (quantized partials)") {
    val a = Similarity.trainPq(cemb, col("vec_id") % 40 === 3, m = 8,
      ksub = 50, iters = 3)
    val b = Similarity.trainPq(cemb.repartition(7),
      col("vec_id") % 40 === 3, m = 8, ksub = 50, iters = 3)
    assert(a.books.flatten.flatten.toSeq == b.books.flatten.flatten.toSeq)
    assert(a.m == 8 && a.dsub == dim / 8)
  }

  test("codes are m small ints: the scan payload compresses ~16x here") {
    val pq = Similarity.trainPq(cemb, col("vec_id") % 40 === 3, m = 8,
      ksub = 50, iters = 2)
    val codes = Similarity.pqCodes(cemb, pq)
    val row = codes.head()
    assert(row.getSeq[Int](1).length == 8)
    assert(codes.count() == 2000)
    // 32 floats × 4 B = 128 B vs 8 one-byte codes (ksub ≤ 256)
    assert((dim * 4.0) / pq.m >= 16.0)
    // every code is in range
    assert(codes.select(max(array_max(col("codes")))).head.getInt(0) < 50)
  }

  test("IVF-PQ with rerank recovers brute-force top-5 on clustered data") {
    val queryIds = (0L until 2000L by 97L).toSet
    val qPred = col("vec_id").isin(queryIds.toSeq: _*)
    // coarse quantizer: trained IVF centroids (the production pairing)
    val cents = Similarity.trainCodebook(cemb, col("vec_id") % 100 === 7,
      iters = 5)
    val pq = Similarity.trainPq(cemb, col("vec_id") % 8 === 1, m = 8,
      ksub = 250, iters = 3)

    // driver-side exact truth
    val all = vecs.map { case (id, v) => (id, v.map(_.toDouble).toArray) }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val truth = queryIds.map { q =>
      val qv = all.find(_._1 == q).get._2
      q -> all.filter(_._1 != q).map { case (id, v) => (id, cos(qv, v)) }
        .sortBy { case (id, c) => (-c, id) }(
          Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long))
        .take(5).map(_._1).toSet
    }.toMap

    def recallOf(rows: Array[org.apache.spark.sql.Row]): Double = {
      val got = rows.groupBy(_.getAs[Long]("query_id"))
        .map { case (q, rs) => q -> rs.map(_.getAs[Long]("cand_id")).toSet }
      val recalls = queryIds.toSeq.map(q =>
        truth(q).count(got.getOrElse(q, Set.empty)).toDouble / 5)
      recalls.sum / recalls.size
    }
    val flatRecall = recallOf(
      Similarity.ivfTopKWithCodebook(cemb, qPred, cents, 5, 2).collect())
    val recall = recallOf(Similarity.ivfPqTopK(cemb, qPred, cents, pq,
      k = 5, nProbe = 2, rerank = 64).collect())
    // the PQ approximation may cost a few recall points vs the flat scan
    // at equal probes (it reads 16x fewer bytes); the rerank window keeps
    // the loss small
    assert(recall >= flatRecall - 0.05,
      s"IVF-PQ recall $recall too far below flat $flatRecall")
    assert(recall >= 0.75, s"IVF-PQ recall $recall below clustered floor")

    // and the rerank is honest: every returned cos equals the exact
    // cosine (full-vector), so PQ error never reaches the output scores
    val flat = Similarity.ivfTopKWithCodebook(cemb, qPred, cents, 5, 2)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val pqPairs = Similarity.ivfPqTopK(cemb, qPred, cents, pq, 5, 2,
        rerank = 1000) // ≥ probed-list size: every candidate survives
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(pqPairs == flat,
      "with a rerank window covering the probed lists, PQ ≡ IVF-Flat")
  }
}
