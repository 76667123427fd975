package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Streaming quantile histogram ≡ batch histogram on the same values:
  * the update-mode running bucket counts converge to the batch sketch
  * bucket-for-bucket (counts are monotone → the final value per bucket
  * is the max the memory sink observed), across several micro-batches.
  * State is bounded by the ≤1024-bucket sketch geometry.
  */
class QuantileStreamSpec extends SparkSpec {
  import spark.implicits._

  test("update-mode streaming histogram converges to the batch sketch") {
    val vals = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(size(split(col("text"), " ")).cast("long").as("v"))
    val dir = Files.createTempDirectory("qhstream").toString
    vals.repartition(4).write.mode("overwrite").parquet(dir)

    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1) // force several micro-batches
      .parquet(dir)
    val q = QuantileStream.startMemorySink(stream, "v", "qh_stream")
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("qh_stream")
      .groupBy("bucket").agg(max("cnt").as("cnt")) // monotone → final
      .as[(Long, Long)].collect().toSet
    val batch = graft.sketch.QuantileHist
      .histogram(spark.read.parquet(dir), "v")
      .as[(Long, Long)].collect().toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }
}
