package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.extract.{Gazetteer, HtmlText, MentionScan}

/** Streaming flavor of the KG front-end (T5 over the north-star path):
  * a stream of pages → deterministic text extraction → gazetteer mention
  * scan → watermarked windowed mention counts. The batch and streaming
  * plans share every operator — the scan is the same broadcast-trie
  * mapPartitions, extraction the same native expression — so batch
  * results ARE the streaming results once the watermark closes a window
  * (asserted in MentionStreamSpec via MemoryStream).
  *
  * At 100 TB-scale ingestion this is the continuous shape: micro-batches
  * of WARC pages, state bounded by the watermark, counts merging
  * map-side exactly like the batch aggregate.
  */
object MentionStream {

  /** pages(url, warc_ts, html, text, lang, doc_id) stream → one row per
    * (window, entity) with mention doc counts and total tf.
    */
  def windowedMentionCounts(pages: DataFrame, gazetteer: Gazetteer,
                            watermark: String = "10 minutes",
                            windowLen: String = "1 hour"): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(gazetteer)
    val mentions = pages
      .select(col("warc_ts"), col("doc_id"),
        graft.extract.ExtractMainText(col("html")).as("text"))
      .as[(java.sql.Timestamp, Long, String)]
      .mapPartitions { it =>
        val trie = bc.value
        it.flatMap { case (ts, docId, text) =>
          trie.countMatches(text).map { case (e, tf) => (ts, docId, e, tf.toLong) }
        }
      }
      .toDF("warc_ts", "doc_id", "entity", "tf")
    mentions
      .withWatermark("warc_ts", watermark)
      .groupBy(window(col("warc_ts"), windowLen), col("entity"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tf")).as("total_tf"))
      .select(col("window.start").as("bucket"), col("entity"),
        col("n_docs"), col("total_tf"))
  }
}
