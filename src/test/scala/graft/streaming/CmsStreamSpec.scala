package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Streaming CMS ≡ batch CMS on the same corpus: the update-mode
  * running matrix converges to the batch matrix cell-for-cell (counts
  * are monotone, so the final value per cell is the max the memory
  * sink observed), across multiple micro-batches.
  */
class CmsStreamSpec extends SparkSpec {
  import spark.implicits._

  test("update-mode streaming matrix converges to the batch matrix") {
    val toks = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "").as[String]
    val dir = Files.createTempDirectory("cmsstream").toString
    toks.toDF("tok").repartition(4).write.mode("overwrite").parquet(dir)

    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1) // force several micro-batches
      .parquet(dir).select(col("tok")).as[String]
    val q = CmsStream.startMemorySink(stream, "cms_stream")
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("cms_stream")
      .groupBy("r", "b").agg(max("n").as("n")) // monotone → final value
      .as[(Int, Int, Long)].collect().toSet
    val batch = graft.sketch.Cms.matrix(
        spark.read.parquet(dir).select(col("tok")).as[String])
      .as[(Int, Int, Long)].collect().toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }
}
