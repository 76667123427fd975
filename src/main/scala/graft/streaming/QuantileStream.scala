package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming quantile sketch — the incremental form of
  * [[graft.sketch.QuantileHist]]. The sketch is a bucket-count monoid,
  * so (exactly like [[CmsStream]]) the streaming build is LITERALLY the
  * batch histogram aggregation run in update mode: streaming state =
  * the ≤1024 bucket counters (bounded by the sketch geometry, not the
  * stream length — no watermark or timeout needed), and
  * stream-of-batches ≡ one batch by the same commutativity that makes
  * the batch sketch partitioning-invariant (QuantileStreamSpec).
  * Quantile read-off happens on the sink table with the batch
  * machinery — the state is the whole sketch.
  */
object QuantileStream {

  /** Update-mode running histogram: same (bucket, cnt) schema as
    * [[graft.sketch.QuantileHist.histogram]].
    */
  def histogram(values: DataFrame, valueCol: String): DataFrame =
    graft.sketch.QuantileHist.histogram(values, valueCol)

  /** Convenience: memory-sink update-mode query over a streaming value
    * source.
    */
  def startMemorySink(values: DataFrame, valueCol: String, name: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    histogram(values, valueCol).writeStream
      .format("memory")
      .queryName(name)
      .outputMode(OutputMode.Update)
      .start()
}
