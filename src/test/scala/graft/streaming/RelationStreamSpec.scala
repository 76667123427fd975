package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Streaming relation mining ≡ batch on the same corpus: running
  * support counts converge per (s, pred, o) across micro-batches
  * (counts are monotone, so the final value per key is the max the
  * memory sink observed).
  */
class RelationStreamSpec extends SparkSpec {
  import spark.implicits._

  test("update-mode running support converges to the batch aggregate") {
    val ents = graft.extract.Gazetteer.DefaultEntities
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val dir = Files.createTempDirectory("relstream").toString
    docs.repartition(4).write.mode("overwrite").parquet(dir)

    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1) // force several micro-batches
      .parquet(dir)
    val q = RelationStream.startMemorySink(stream, ents, "rel_stream")
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("rel_stream")
      .groupBy("s", "pred", "o").agg(max("support").as("support"))
      .as[(String, String, String, Long)].collect().toSet
    // batch truth at minSupport=1, n_docs dropped (the streaming tier
    // deliberately omits it — scaladoc)
    val batch = graft.extract.RelationMiner
      .windowTriples(spark.read.parquet(dir), ents, minSupport = 1L)
      .select(col("s"), col("pred"), col("o"), col("support"))
      .as[(String, String, String, Long)].collect().toSet
    assert(streamed == batch)
    assert(batch.nonEmpty, "fixture produced no windows")
  }
}
