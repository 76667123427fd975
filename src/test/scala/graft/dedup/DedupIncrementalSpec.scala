package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** dd_incremental laws: no false negatives (candidate ⊇ dup on every
  * row — the Bloom guarantee that makes is_dup exact), planted
  * re-delivered copies are all caught, and fresh docs pass through.
  */
class DedupIncrementalSpec extends SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)]) = {
    val dir = java.nio.file.Files.createTempDirectory("ddinc").toString
    docs.map { case (id, t) => (id, t, "en", "s1", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    graft.queries.DataQueries.ddIncremental(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
  }

  test("planted re-delivery: exact copies flagged, fresh docs pass, " +
      "candidate ⊇ dup everywhere") {
    // corpus = ids < 400; batch = ids >= 350. 360/361 re-deliver texts
    // of 10/11; 450+ are fresh
    val docs = Seq(
      (10L, "alpha bravo charlie"), (11L, "delta echo foxtrot"),
      (12L, "golf hotel india"),
      (360L, "alpha bravo charlie"), // dup of 10
      (361L, "delta echo foxtrot"),  // dup of 11
      (362L, "juliet kilo lima"),    // in-overlap but fresh text… and
                                     // in corpus itself (< 400): dup of
                                     // itself by definition
      (450L, "mike november oscar"), // fresh
      (451L, "papa quebec romeo"))   // fresh
    val out = run(docs)
    val m = out.map(r => r._1 -> ((r._2, r._3))).toMap
    assert(m(360L)._2 == 1L && m(361L)._2 == 1L)
    assert(m(362L)._2 == 1L) // overlap rows are their own corpus copies
    assert(m(450L)._2 == 0L && m(451L)._2 == 0L)
    // the Bloom never misses: every dup is a candidate
    assert(out.forall { case (_, cand, dup) => dup == 0L || cand == 1L })
  }

  test("no false negatives on real data (sf0.001)") {
    val out = graft.queries.DataQueries
      .ddIncremental(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty)
    assert(out.forall { case (cand, dup) => dup == 0L || cand == 1L })
  }
}
