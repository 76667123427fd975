package graft.streaming

import graft.SparkSpec
import graft.dedup.Dedup
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Streaming exact dedup ≡ the batch tier on the same corpus. */
class DedupStreamSpec extends SparkSpec {

  test("stream first-arrivals equal batch exact dedup survivors") {
    // corpus with REAL duplicates: every doc gets an identical twin at
    // doc_id + 100000, so half the rows must be dropped
    val base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text", "lang", "source")
    val corpus = base.unionAll(
      base.select((col("doc_id") + 100000L).as("doc_id"), col("text"),
        col("lang"), col("source")))
    val dir = Files.createTempDirectory("dedupstream").toString
    corpus.write.mode("overwrite").parquet(dir)

    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    val got = EventStream.runToCompletion(
        DedupStream.firstArrivals(stream).toDF(), "dedup_stream")
      .select("doc_id").collect().map(_.getLong(0)).toSet

    val batch = Dedup.exact(spark.read.parquet(dir))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got.nonEmpty)
    assert(got == batch)
    // and the dup twins were actually dropped
    assert(got.size.toLong == base.count())
  }
}
