package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** TopicCluster laws: scalar replay of the integer Lloyd's recurrence,
  * tie-to-lowest-centroid, empty-cluster centroid retention, and
  * partitioning invariance.
  */
class TopicClusterSpec extends SparkSpec {
  import spark.implicits._

  private def docsDf(rows: Seq[(Long, String)]) =
    rows.map { case (id, t) => (id, t, "en", "s1", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  /** Scalar replay with the same hashing, init, update and tie rules. */
  private def naive(rows: Seq[(Long, String)], rounds: Int)
      : Map[Long, (Long, Long)] = {
    def vec(t: String): Array[Long] = {
      val v = new Array[Long](16)
      t.split(" ").filter(_.nonEmpty).foreach { tok =>
        v((graft.mix.Mix.fnv1a(tok) & 15L).toInt) += 1L
      }
      v
    }
    val fs = rows.sortBy(_._1).map { case (id, t) => id -> vec(t) }
    var cents = fs.take(4).map(_._2.clone()).toArray
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    def assignAll = fs.map { case (id, v) =>
      val j = cents.indices.minBy(j => (d2(v, cents(j)), j))
      (id, j, d2(v, cents(j)))
    }
    for (_ <- 1 to rounds) {
      val byJ = assignAll.groupBy(_._2)
      cents = cents.zipWithIndex.map { case (old, j) =>
        byJ.get(j) match {
          case None => old
          case Some(members) =>
            val vs = members.map(m => fs.find(_._1 == m._1).get._2)
            (0 until 16).map(i => vs.map(_(i)).sum / vs.length).toArray
        }
      }
    }
    assignAll.map { case (id, j, d) => id -> ((j.toLong, d)) }.toMap
  }

  private val corpus: Seq[(Long, String)] = Seq(
    (1L, "alpha alpha beta"), (2L, "gamma delta delta"),
    (3L, "epsilon zeta zeta zeta"), (4L, "eta theta"),
    (5L, "alpha alpha alpha beta"), (6L, "gamma delta"),
    (7L, "epsilon zeta zeta"), (8L, "eta eta theta"),
    (9L, "iota kappa"), (10L, "alpha beta beta"))

  test("assign ≡ the scalar Lloyd's replay, 1 and 2 rounds") {
    for (r <- Seq(1, 2)) {
      val got = TopicCluster.assign(docsDf(corpus), rounds = r)
        .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2))))
        .toMap
      assert(got == naive(corpus, r))
    }
  }

  test("identical init vectors: ties break to the lowest centroid id") {
    // docs 1 and 2 identical → centroids 0 and 1 equal → nothing ever
    // assigns to cluster 1
    val twin = Seq((1L, "same words here"), (2L, "same words here"),
      (3L, "other things"), (4L, "third topic now"),
      (5L, "same words here"), (6L, "other things"))
    val got = TopicCluster.assign(docsDf(twin), rounds = 2)
      .collect().map(r => r.getLong(1)).toSet
    assert(!got.contains(1L))
    assert(TopicCluster.assign(docsDf(twin), rounds = 2).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap ==
      naive(twin, 2))
  }

  test("partitioning invariance") {
    val df = docsDf(corpus)
    val a = TopicCluster.assign(df.repartition(7), rounds = 2).collect()
      .map(_.toSeq).toSeq
    val b = TopicCluster.assign(df.coalesce(1), rounds = 2).collect()
      .map(_.toSeq).toSeq
    assert(a == b)
  }
}
