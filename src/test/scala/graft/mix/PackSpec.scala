package graft.mix

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Sequence packing invariants: exact integer assignments, shard-local
  * token conservation, straddle arithmetic, partitioning invariance.
  */
class PackSpec extends SparkSpec {
  import spark.implicits._

  private val L = 10

  // shard a: docs of 4, 3, 8, 10, 1 tokens → cum 4,7,15,25,26
  // shard b: one 25-token doc spanning seqs 0..2
  private lazy val docs = Seq(
    (0L, "a", "t " * 4), (1L, "a", "t " * 3), (2L, "a", "t " * 8),
    (3L, "a", "t " * 10), (4L, "a", "t " * 1),
    (5L, "b", "t " * 25), (6L, "b", ""), (7L, "b", "   ")
  ).map { case (id, s, t) => (id, s, t.trim) }.toDF("doc_id", "source", "text")

  private def packed = Pack.pack(docs, seqLen = L)

  test("assignments are exact (hand-computed)") {
    val rows = packed.orderBy("doc_id")
      .select("doc_id", "n_tok", "seq_first", "seq_last", "offset")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows === Array(
      (0L, 4L, 0L, 0L, 0L),   // tokens 0..3
      (1L, 3L, 0L, 0L, 4L),   // tokens 4..6
      (2L, 8L, 0L, 1L, 7L),   // tokens 7..14 — straddles
      (3L, 10L, 1L, 2L, 5L),  // tokens 15..24
      (4L, 1L, 2L, 2L, 5L),   // token 25
      (5L, 25L, 0L, 2L, 0L))) // whole of shard b
  }

  test("zero-token docs are dropped; offsets bounded by seqLen") {
    assert(packed.filter(col("doc_id").isin(6L, 7L)).count() === 0)
    assert(packed.filter(col("offset") >= L || col("offset") < 0).count() === 0)
    assert(packed.filter(col("seq_last") < col("seq_first")).count() === 0)
  }

  test("straddle iff offset + n_tok > seqLen") {
    val bad = packed.filter(
      (col("seq_last") > col("seq_first")) =!=
        (col("offset") + col("n_tok") > L))
    assert(bad.count() === 0)
  }

  test("sequence stats conserve tokens per shard") {
    val stats = Pack.sequenceStats(packed, seqLen = L)
    val perShard = stats.groupBy("shard")
      .agg(sum("n_tokens").as("tot")).orderBy("shard")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(perShard === Array(("a", 26L), ("b", 25L)))
    // every non-final sequence is exactly full
    val nonFinal = stats.join(
      stats.groupBy("shard").agg(max("seq").as("last")), Seq("shard"))
      .filter(col("seq") < col("last"))
    assert(nonFinal.filter(col("n_tokens") =!= L).count() === 0)
  }

  test("partitioning-invariant") {
    val a = packed.orderBy("doc_id").collect().toSeq
    val b = Pack.pack(docs.repartition(7), seqLen = L)
      .orderBy("doc_id").collect().toSeq
    assert(a === b)
  }
}
