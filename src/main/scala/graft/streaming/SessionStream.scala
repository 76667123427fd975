package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming gap sessionization — the incremental twin of
  * [[graft.plans.Sessionize]] (q13's operator): per user, an open
  * session extends while consecutive events arrive within `gapSeconds`;
  * a larger gap CLOSES the session (emitted immediately, exactly once)
  * and opens the next. The tail session closes through an EVENT-TIME
  * TIMEOUT: the watermark passing last_event + gap fires the state
  * handler with no rows, emitting the final session and dropping the
  * user's state — so a quiet key costs zero memory after one gap, the
  * ADVICE-round fix pattern for unbounded `NoTimeout` state.
  *
  * With event-time-ordered delivery the emitted sessions equal the
  * batch operator's output exactly (the break-flag prefix-sum and this
  * walk compute the same cuts; SessionStreamSpec pins stream ≡ batch
  * across multi-file delivery, including the timeout-closed tails).
  * Cross-batch stragglers older than the open session's last event are
  * counted into it without moving its bounds — the documented policy,
  * mirroring FunnelStream.
  *
  * Scale shape: state is one 32-byte session summary per ACTIVE user
  * (idx, start, last, n), keyed across executors; emission is one row
  * per CLOSED session, never per event.
  */
object SessionStream {

  final case class SessionOut(user_id: Long, session_idx: Long,
      n_events: Long, start_us: Long, end_us: Long)
  final case class St(idx: Long, startUs: Long, lastUs: Long, n: Long)

  def sessions(events: DataFrame, gapSeconds: Long,
      watermarkDelay: String = "0 seconds"): Dataset[SessionOut] = {
    require(gapSeconds > 0, "gapSeconds must be positive")
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapSeconds * 1000000L
    events.select(col("user_id"), col("ts").cast("timestamp").as("ts"),
        col("event_id"))
      .withWatermark("ts", watermarkDelay)
      // the watermarked ts column must survive into the stateful
      // operator (the analyzer rejects EventTimeTimeout otherwise), so
      // it rides along next to the precomputed micros
      .select(col("user_id"), col("ts"), unix_micros(col("ts")).as("us"),
        col("event_id"))
      .as[(Long, java.sql.Timestamp, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[(Long, java.sql.Timestamp, Long, Long)],
         state: GroupState[St]) =>
          val out = scala.collection.mutable.ArrayBuffer[SessionOut]()
          def closed(st: St): SessionOut =
            SessionOut(user, st.idx, st.n, st.startUs, st.lastUs)
          if (state.hasTimedOut) {
            state.getOption.foreach(st => out += closed(st))
            state.remove()
          } else {
            var st = state.getOption.orNull
            // micro-batch iterators carry no order guarantee — restore
            // the per-user (us, event_id) total order before walking
            for ((_, _, us, _) <- rows.toSeq.sortBy(r => (r._3, r._4))) {
              if (st == null) st = St(1L, us, us, 1L)
              else if (us - st.lastUs > gapUs) {
                out += closed(st)
                st = St(st.idx + 1, us, us, 1L)
              } else if (us >= st.lastUs)
                st = st.copy(lastUs = us, n = st.n + 1)
              else st = st.copy(n = st.n + 1) // straggler: counted, bounds keep
            }
            state.update(st)
            // event-time timeout at last + gap: the watermark passing it
            // closes the tail session and frees the key's state
            state.setTimeoutTimestamp(st.lastUs / 1000L +
              gapSeconds * 1000L)
          }
          out.iterator
      }
  }
}
