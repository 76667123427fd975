package graft.streaming

import graft.SparkSpec
import graft.dedup.Dedup
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Streaming MinHash candidates ≡ the batch banding tier on the same
  * corpus (pair-set equality after the downstream distinct), plus the
  * bucket cap bound.
  */
class NearDupStreamSpec extends SparkSpec {

  private val params = Dedup.MinHashParams(numHashes = 64, bands = 16,
    seed = 42L)

  test("stream candidate pairs equal batch LSH banding candidates") {
    val corpus = graft.queries.DataQueries
      .minhashCorpus(spark, "/root/testdata/sf0.001")
    val dir = Files.createTempDirectory("neardupstream").toString
    corpus.write.mode("overwrite").parquet(dir)

    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    val got = EventStream.runToCompletion(
        NearDupStream.candidatePairs(stream, n = 3, params).toDF(),
        "neardup_stream")
      .select("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val batch = Dedup.minHashCandidatePairs(
        spark.read.parquet(dir), 3, params)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batch.nonEmpty)
    assert(got == batch)
  }

  test("idle buckets are evicted after the TTL (state stays bounded)") {
    val spark2 = spark
    import spark2.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext

    val base = (0 until 30).map(i => s"w$i").mkString(" ")
    val near = (0 until 30).map(i => if (i == 7) "zz" else s"w$i").mkString(" ")

    // NOTE: with ProcessingTimeTimeout, FlatMapGroupsWithStateExec's
    // shouldRunAnotherBatch is unconditionally true (batches must keep
    // running to check timeouts), so `processAllAvailable` never observes
    // noNewData and would hang — progress is awaited by polling processed
    // input counts under a throttled trigger instead.
    val name = "neardup_ttl"
    val ms = MemoryStream[(Long, String)]
    val q = NearDupStream.candidatePairs(
        ms.toDF().toDF("doc_id", "text"), 3, params,
        idleTimeout = Some("200 milliseconds"))
      .toDF().writeStream.outputMode("append")
      .format("memory").queryName(name)
      .trigger(org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("100 milliseconds"))
      .start()
    def awaitProcessed(rows: Long): Unit = {
      val deadline = System.currentTimeMillis + 60000
      def done = q.recentProgress.map(_.numInputRows).sum >= rows
      while (System.currentTimeMillis < deadline && !done) Thread.sleep(50)
      assert(done, s"stream did not process $rows input rows in time")
    }
    try {
      ms.addData((1L, base))
      awaitProcessed(1)
      // idle > TTL: timeout batches keep running and evict doc 1's
      // buckets before the twin arrives
      Thread.sleep(1000)
      ms.addData((2L, near))
      awaitProcessed(2)
      Thread.sleep(300) // let the twin's batch commit to the sink
    } finally q.stop()
    val got = spark.table(name).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!got.contains((1L, 2L)),
      "evicted bucket must not pair with a later twin")
    // control: the NoTimeout tier on the same corpus DOES pair them
    // (state retained) — proven by the parquet batch≡stream spec above;
    // here assert the twin re-seeded fresh state rather than erroring
    assert(q.exception.isEmpty)
  }

  test("degenerate buckets stop pairing at the cap") {
    // 50 docs with IDENTICAL text land in the same bucket in every band;
    // cap 10 bounds pairs to C(10,2) per band ≤ 45*16 (vs C(50,2)=1225)
    val spark2 = spark
    import spark2.implicits._
    val docs = (0 until 50).map(i => (i.toLong, "w1 w2 w3 w4 w5"))
      .toDF("doc_id", "text")
    val dir = Files.createTempDirectory("neardupcap").toString
    docs.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(docs.schema).parquet(dir)
    val got = EventStream.runToCompletion(
        NearDupStream.candidatePairs(stream, 3, params, maxBucket = 10).toDF(),
        "neardup_cap")
      .select("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.size == 45) // C(10,2): only the first 10 arrivals pair
  }
}
