package graft.streaming

import graft.SparkSpec
import graft.extract.Gazetteer
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** T5 on the KG path: streaming mention counts equal the batch plan. */
class MentionStreamSpec extends SparkSpec {

  test("windowed mention counts over a page stream match the batch aggregate") {
    // stage pages with SPREAD timestamps (append mode only emits windows
    // the watermark has closed, so a single constant ts would emit none)
    val dir = Files.createTempDirectory("pagestream").toString
    graft.pages.PageGen.pages(spark, "/root/testdata/sf0.001")
      .withColumn("warc_ts",
        expr("timestampadd(MINUTE, CAST(doc_id * 7 AS INT), warc_ts)"))
      .write.mode("overwrite").parquet(dir)

    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    val gaz = Gazetteer(Gazetteer.DefaultEntities)
    val got = EventStream.runToCompletion(
      MentionStream.windowedMentionCounts(stream, gaz), "mention_win")

    val batchMentions = graft.extract.MentionScan.mentions(
      spark.read.parquet(dir).select(col("doc_id"), col("warc_ts"),
        col("text")), gaz)
      .join(spark.read.parquet(dir).select("doc_id", "warc_ts"), Seq("doc_id"))
    val batch = batchMentions
      .groupBy(window(col("warc_ts"), "1 hour"), col("entity"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tf")).as("total_tf"))
      .select(col("window.start").as("bucket"), col("entity"),
        col("n_docs"), col("total_tf"))

    def asMap(df: org.apache.spark.sql.DataFrame) = df
      .select(col("bucket").cast("timestamp").cast("long"), col("entity"),
        col("n_docs"), col("total_tf"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val gotMap = asMap(got)
    val batchMap = asMap(batch)
    assert(gotMap.nonEmpty, "no watermark-closed windows emitted")
    // every emitted (closed) window row equals the batch result
    assert(gotMap.forall { case (k, v) => batchMap.get(k).contains(v) })
  }
}
