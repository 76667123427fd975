package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked STREAM-STREAM interval join — purchase→click attribution
  * (every click by the same user in the `windowSeconds` before a
  * purchase is credited), the native Structured Streaming two-stream
  * operator the rest of the streaming family deliberately avoids via
  * per-key state machines. Both sides carry an event-time watermark and
  * the join predicate bounds click time to
  * [purchase − window, purchase], which is exactly what lets Spark's
  * symmetric hash join EVICT buffered rows: a click older than
  * `watermark − window` can never match a future purchase, so per-side
  * state is bounded by (arrival rate × window + delay), not stream
  * length — the stream-stream analogue of SessionStream's timeout
  * eviction, expressed declaratively instead of hand-rolled.
  *
  * Output: one row per attributed (purchase, click) pair, append-mode —
  * with ordered delivery this equals the batch interval join verbatim
  * (AttributionStreamSpec pins stream ≡ batch on the real events
  * table across multi-file delivery).
  */
object AttributionStream {

  /** Batch twin — the same projections and interval predicate on a
    * static frame, so the spec compares one definition, not two. */
  def attributeBatch(events: DataFrame, windowSeconds: Long): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").cast("timestamp").as("c_ts"),
        col("event_id").as("click_id"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").cast("timestamp").as("p_ts"),
        col("event_id").as("purchase_id"))
    purchases.join(clicks, Seq("user_id"))
      .filter(col("c_ts") <= col("p_ts") &&
        col("c_ts") >= col("p_ts") - expr(s"interval $windowSeconds seconds"))
      .select(col("user_id"), col("purchase_id"), col("click_id"),
        unix_micros(col("p_ts")).as("p_us"), unix_micros(col("c_ts")).as("c_us"))
  }

  /** The streaming form: `events` is a STREAMING frame; both filtered
    * sides are watermarked (a self-join of one source — Spark plans the
    * symmetric hash join with per-side eviction). */
  def attribute(events: DataFrame, windowSeconds: Long,
      watermarkDelay: String = "0 seconds"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").cast("timestamp").as("c_ts"),
        col("event_id").as("click_id"))
      .withWatermark("c_ts", watermarkDelay)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").cast("timestamp").as("p_ts"),
        col("event_id").as("purchase_id"))
      .withWatermark("p_ts", watermarkDelay)
    purchases.join(clicks, Seq("user_id"))
      .filter(col("c_ts") <= col("p_ts") &&
        col("c_ts") >= col("p_ts") - expr(s"interval $windowSeconds seconds"))
      .select(col("user_id"), col("purchase_id"), col("click_id"),
        unix_micros(col("p_ts")).as("p_us"), unix_micros(col("c_ts")).as("c_us"))
  }
}
