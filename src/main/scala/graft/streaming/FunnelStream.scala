package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming funnel progression — the incremental form of the batch
  * q24 operator: per user, advance view → click → purchase, each stage
  * strictly after the previously chosen event in (ts, event_id) order.
  * With an event-time-ordered source the final streamed level equals the
  * batch greedy-earliest level (greedy is prefix-monotone: the level
  * after any prefix is the batch level of that prefix, so processing in
  * order converges — FunnelStreamSpec pins stream ≡ batch across
  * multi-file delivery).
  *
  * Scale shape: state is 17 bytes per ACTIVE user (level + the chosen
  * event's (us, id) for the strict-after guard), keyed by user across
  * executors; emission is one row per level ADVANCE (≤ 3 per user ever),
  * not per event. Out-of-order stragglers older than the last chosen
  * event are skipped — the documented late-data policy (a production
  * deployment would pair this with a watermark).
  */
object FunnelStream {

  final case class LevelOut(user_id: Long, level: Int)
  final case class St(level: Int, us: Long, id: Long)

  private val stageOf = Map("view" -> 1, "click" -> 2, "purchase" -> 3)

  def levels(events: DataFrame): Dataset[LevelOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), col("event_type"),
        unix_micros(col("ts").cast("timestamp")).as("us"), col("event_id"))
      .as[(Long, String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, String, Long, Long)],
         state: GroupState[St]) =>
          var st = state.getOption.getOrElse(St(0, Long.MinValue, Long.MinValue))
          val out = scala.collection.mutable.ArrayBuffer[LevelOut]()
          // micro-batch iterators carry no order guarantee — restore the
          // per-user total order before walking stages
          for ((_, ty, us, id) <- rows.toSeq.sortBy(r => (r._3, r._4))) {
            val wanted = st.level + 1
            val after = us > st.us || (us == st.us && id > st.id)
            if (st.level < 3 && stageOf.get(ty).contains(wanted) && after) {
              st = St(wanted, us, id)
              out += LevelOut(user, wanted)
            }
          }
          if (out.nonEmpty) state.update(st)
          out.iterator
      }
  }
}
