package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Gap-based sessionization: split each key's event stream into sessions
  * wherever the gap to the previous event exceeds `gapSeconds` (the
  * classic web-analytics session cut; also the batch twin of Structured
  * Streaming's `session_window`, which this module deliberately mirrors
  * so a streaming pipeline can be replayed in batch and compared).
  *
  * Plan shape: ONE hash exchange on the key, then everything is
  * in-partition — a sort by (ts, tiebreaker), a lag, and a running sum
  * (the standard break-flag → prefix-sum formulation), then the
  * per-session aggregate reuses the same partitioning (no second
  * exchange: Catalyst sees the groupBy key prefix (key, session_idx)
  * co-partitioned with the window's `partitionBy(key)`). At 100 TB the
  * irreducible cost is that single user-keyed shuffle; a hot key is a
  * within-partition sort, never a cross-partition join.
  *
  * Gap comparison is in MICROSECONDS over `unix_micros` — exact integer
  * arithmetic, so the session boundary is bit-deterministic and matches
  * DuckDB's `epoch_us` oracle replay.
  */
object Sessionize {

  /** Per-event session index (1-based per key): input columns plus
    * `session_idx`. `tieCol` breaks equal timestamps deterministically.
    */
  def withSessionIdx(events: DataFrame, keyCol: String, tsCol: String,
                     tieCol: String, gapSeconds: Long): DataFrame = {
    require(gapSeconds > 0, "gapSeconds must be positive")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    // cast covers TIMESTAMP_NTZ inputs (parquet default here):
    // unix_micros only accepts TIMESTAMP, and with the session timezone
    // pinned to UTC the NTZ->LTZ reinterpretation is value-stable and
    // matches DuckDB's epoch_us over naive timestamps
    val micros = unix_micros(col(tsCol).cast("timestamp"))
    val prev = lag(micros, 1).over(w)
    val brk: Column = when(prev.isNull
        .or(micros - prev > gapSeconds * 1000000L), 1L)
      .otherwise(0L)
    events.withColumn("session_idx",
      sum(brk).over(w.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)))
  }

  /** Session summary table: (key, session_idx, n_events, start_ts,
    * end_ts). Callers add measure aggregates on top of
    * [[withSessionIdx]] when they need them.
    */
  def sessions(events: DataFrame, keyCol: String, tsCol: String,
               tieCol: String, gapSeconds: Long): DataFrame =
    withSessionIdx(events, keyCol, tsCol, tieCol, gapSeconds)
      .groupBy(col(keyCol), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("start_ts"),
        max(col(tsCol)).as("end_ts"))
}
