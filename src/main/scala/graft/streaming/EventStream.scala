package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming re-expression of the reference's chunked/streaming
  * execution (SURVEY §2.10, `src/core/services/streaming.py`,
  * `streaming_converter.py`):
  *  - T1's phase/batch structure maps to micro-batches; batch size becomes
  *    `maxFilesPerTrigger`/partition sizing;
  *  - T2's read_chunks → process_chunk → merge_results → finalize is
  *    exactly source → stateless transform → stateful agg → sink;
  *  - cancellation tokens map to `query.stop()`;
  *  - watermarks bound state where the reference relied on bounded chunk
  *    buffers.
  */
object EventStream {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** File-source stream over a directory of event parquet files. */
  def readEvents(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventSchema).parquet(dir)

  /** Tumbling-window aggregation with watermark (the streaming analogue of
    * q10_time_bucket): counts + decimal-exact sums per (window, type).
    */
  def windowedAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
      .select(col("window.start").as("bucket"), col("event_type"),
        col("n"), col("sum_value"))

  final case class UserState(nEvents: Long, total: Double, lastSeen: Timestamp)
  final case class UserUpdate(userId: Long, nEvents: Long, total: Double)

  /** Custom per-key state (T2's merge-results step as
    * flatMapGroupsWithState): running per-user event count + value total,
    * emitted on every update.
    */
  def statefulUserTotals(events: DataFrame): Dataset[UserUpdate] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), col("ts"), col("value"))
      .as[(Long, Timestamp, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[(Long, Timestamp, Double)],
         state: GroupState[UserState]) =>
          val prev = state.getOption.getOrElse(
            UserState(0L, 0.0, new Timestamp(0L)))
          var n = prev.nEvents
          var total = prev.total
          var last = prev.lastSeen
          for ((_, ts, v) <- rows) {
            n += 1; total += v
            if (ts.after(last)) last = ts
          }
          state.update(UserState(n, total, last))
          Iterator(UserUpdate(userId, n, total))
      }
  }

  /** Run a streaming query to completion over the currently-available
    * files (batch-equivalent execution of the streaming plan) and return
    * the materialized result from the memory sink.
    */
  def runToCompletion(df: DataFrame, name: String,
                      mode: OutputMode = OutputMode.Append): DataFrame = {
    val q = df.writeStream.outputMode(mode)
      .format("memory").queryName(name).start()
    try q.processAllAvailable() finally q.stop()
    df.sparkSession.table(name)
  }
}
