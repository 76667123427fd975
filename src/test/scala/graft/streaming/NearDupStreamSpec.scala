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
