package graft.ann

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.util.Random

/** MaxSim laws: exact scalar replay of the slice-dot/late-interaction
  * kernel on random vectors, the planted-best-token lower bound, and
  * the m=1 degeneration to a plain full-vector dot ranking.
  */
class MaxSimSpec extends SparkSpec {
  import spark.implicits._

  private def naiveScore(a: Array[Float], b: Array[Float],
      m: Int): Double = {
    val sub = a.length / m
    var total = 0.0
    for (i <- 0 until m) {
      var best = Double.NegativeInfinity
      for (j <- 0 until m) {
        var d = 0.0
        for (t <- 0 until sub)
          d += (a(i * sub + t) * b(j * sub + t)).toDouble
        if (d > best) best = d
      }
      total += best
    }
    total
  }

  private def vecs(n: Int, dim: Int, seed: Long): Seq[(Long, Seq[Float])] = {
    val r = new Random(seed)
    (0L until n.toLong).map(i =>
      i -> Seq.fill(dim)((r.nextDouble() * 2 - 1).toFloat))
  }

  test("maxSimTopK ≡ the scalar replay (exact doubles), all ranks") {
    val vs = vecs(40, 64, 7L)
    val df = vs.toDF("vec_id", "embedding")
    val got = Similarity.maxSimTopK(df, col("vec_id") < 3, k = 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    val m = vs.toMap.map { case (k, v) => k -> v.toArray }
    for (q <- 0L until 3L) {
      val exp = (0L until 40L).filter(_ != q)
        .map(c => (c, naiveScore(m(q), m(c), 8)))
        .sortBy { case (c, s) => (-s, c) }.take(5)
      for ((e, i) <- exp.zipWithIndex)
        assert(got((q, i + 1L)) == e)
    }
  }

  test("planted best token: a doc sharing one token slice scores at " +
      "least that slice's self-dot") {
    val r = new Random(11L)
    val token = Array.fill(8)((r.nextDouble() * 2 - 1).toFloat)
    val q = token ++ Array.fill(56)((r.nextDouble() * 2 - 1).toFloat)
    val d = Array.fill(24)((r.nextDouble() * 2 - 1).toFloat) ++ token ++
      Array.fill(32)((r.nextDouble() * 2 - 1).toFloat)
    var selfDot = 0.0
    for (t <- 0 until 8) selfDot += (token(t) * token(t)).toDouble
    // token i=0's best j is at least the planted copy at j=3
    val firstTokenBest = (0 until 8).map { j =>
      var s = 0.0
      for (t <- 0 until 8) s += (q(t) * d(j * 8 + t)).toDouble
      s
    }.max
    assert(firstTokenBest >= selfDot)
  }

  test("m=1 degenerates to the full-vector dot") {
    val vs = vecs(20, 64, 13L)
    val m = vs.toMap.map { case (k, v) => k -> v.toArray }
    for (q <- 0L until 2L; c <- 10L until 15L) {
      var dot = 0.0
      for (t <- 0 until 64) dot += (m(q)(t) * m(c)(t)).toDouble
      assert(naiveScore(m(q), m(c), 1) == dot)
    }
    val df = vs.toDF("vec_id", "embedding")
    val viaM1 = Similarity.maxSimTopK(df, col("vec_id") === 0L, k = 3, m = 1)
      .collect().map(r => (r.getLong(2), r.getDouble(3))).toSeq
    val exp = (1L until 20L).map { c =>
      var dot = 0.0
      for (t <- 0 until 64) dot += (m(0L)(t) * m(c)(t)).toDouble
      (c, dot)
    }.sortBy { case (c, s) => (-s, c) }.take(3)
    assert(viaM1 == exp)
  }
}
