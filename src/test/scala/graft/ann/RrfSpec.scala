package graft.ann

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** RRF laws: hand-computed fixture fusion (both-lists beats one-list,
  * absent docs contribute zero, ties break on cand id), and the exact
  * integer replay over the real embeddings through the full two-scorer
  * pipeline.
  */
class RrfSpec extends SparkSpec {
  import spark.implicits._

  private def lists(a: Seq[(Long, Long, Long)], b: Seq[(Long, Long, Long)]) =
    (a.toDF("query_id", "rank", "cand_id"),
      b.toDF("query_id", "rank", "cand_id"))

  test("fixture: consensus beats single-list wins; absent = 0; ties " +
      "break on cand id") {
    // list A ranks docs 10,11,12; list B ranks 11,13,10
    val (a, b) = lists(
      Seq((1L, 1L, 10L), (1L, 2L, 11L), (1L, 3L, 12L)),
      Seq((1L, 1L, 11L), (1L, 2L, 13L), (1L, 3L, 10L)))
    val got = Similarity.rrfFuse(a, b, k = 4)
      .orderBy("rank")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    // doc 11: 1e6/62 + 1e6/61 = 16129 + 16393 = 32522
    // doc 10: 1e6/61 + 1e6/63 = 16393 + 15873 = 32266
    // doc 12: 1e6/63 = 15873 ; doc 13: 1e6/62 = 16129
    assert(got.toSeq == Seq((1L, 11L, 32522L), (2L, 10L, 32266L),
      (3L, 13L, 16129L), (4L, 12L, 15873L)))
  }

  test("exact tie breaks toward the smaller cand id") {
    // both docs appear at rank 1 in exactly one list → equal scores
    val (a, b) = lists(Seq((1L, 1L, 20L)), Seq((1L, 1L, 7L)))
    val got = Similarity.rrfFuse(a, b, k = 2)
      .orderBy("rank").collect().map(_.getLong(2))
    assert(got.toSeq == Seq(7L, 20L))
  }

  test("integer replay over the real two-scorer pipeline") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val a = Similarity.bruteForceTopK(emb, col("vec_id") % 50 === 0, 20)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("cand_id"))
    val b = Similarity.maxSimTopK(emb, col("vec_id") % 50 === 0, 20)
      .select(col("query_id"), col("rank"), col("cand_id"))
    val ra = a.collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(1)).toMap
    val rb = b.collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(1)).toMap
    val got = Similarity.rrfFuse(a, b, k = 5).collect()
    assert(got.nonEmpty)
    for (r <- got) {
      val key = (r.getLong(0), r.getLong(2))
      val expect = ra.get(key).map(rk => 1000000L / (60 + rk)).getOrElse(0L) +
        rb.get(key).map(rk => 1000000L / (60 + rk)).getOrElse(0L)
      assert(r.getLong(3) == expect, s"score mismatch at $key")
    }
    // top-1 per query must dominate every candidate of that query
    val all = (ra.keySet ++ rb.keySet).groupBy(_._1)
    val top1 = got.filter(_.getLong(1) == 1L)
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    for ((q, keys) <- all; k <- keys) {
      val s = ra.get(k).map(rk => 1000000L / (60 + rk)).getOrElse(0L) +
        rb.get(k).map(rk => 1000000L / (60 + rk)).getOrElse(0L)
      assert(s <= top1(q))
    }
  }
}
