package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Streaming sessionization ≡ batch Sessionize on the same events
  * across multi-file delivery — including the TAIL sessions, which only
  * close via the event-time timeout (a far-future sentinel event pushes
  * the watermark past every open session's gap) — plus the
  * immediate-close semantics on a mid-stream gap and state removal
  * after timeout.
  */
class SessionStreamSpec extends SparkSpec {
  import spark.implicits._

  private def write(dir: String, name: String,
      rows: Seq[(Long, String, Long)]): Unit =
    rows.map { case (id, ts, u) => (id, ts, u) }
      .toDF("event_id", "ts_s", "user_id")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
      .coalesce(1).write.parquet(s"$dir/$name")

  test("stream ≡ batch sessions on real events, tails closed by the " +
      "event-time timeout") {
    val src = "/root/testdata/sf0.001"
    val ev = spark.read.parquet(s"$src/events.parquet")
      .select("event_id", "ts", "user_id")
    val dir = Files.createTempDirectory("sessionstream").toString
    val cuts = ev.stat.approxQuantile("event_id", Array(0.5), 0.0)
    ev.filter(col("event_id") <= cuts(0)).coalesce(1)
      .write.parquet(s"$dir/f0")
    ev.filter(col("event_id") > cuts(0)).coalesce(1)
      .write.parquet(s"$dir/f1")
    // sentinel: one far-future event for a user id outside the corpus
    // pushes the GLOBAL watermark past every open session's gap, firing
    // the tail timeouts
    write(dir, "f2", Seq((999999L, "2030-01-01 00:00:00", 999999L)))

    val schema = spark.read.parquet(s"$dir/f0").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/*")
    val got = EventStream.runToCompletion(
        SessionStream.sessions(stream, gapSeconds = 1800L).toDF(),
        "session_stream")
      .filter(col("user_id") =!= 999999L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2),
        r.getLong(3), r.getLong(4))).toMap

    val batch = graft.plans.Sessionize.sessions(
        spark.read.parquet(s"$src/events.parquet"),
        "user_id", "ts", "event_id", 1800L)
      .select(col("user_id"), col("session_idx"),
        col("n_events"),
        unix_micros(col("start_ts").cast("timestamp")).as("s"),
        unix_micros(col("end_ts").cast("timestamp")).as("e"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2),
        r.getLong(3), r.getLong(4))).toMap
    assert(batch.nonEmpty)
    assert(got == batch)
  }

  test("mid-stream gap closes a session immediately; straggler counts " +
      "into the open session without moving bounds") {
    val dir = Files.createTempDirectory("sessiongap").toString
    write(dir, "f0", Seq(
      (1L, "1970-01-01 00:00:10", 1L),
      (2L, "1970-01-01 00:00:20", 1L)))
    write(dir, "f1", Seq(
      (3L, "1970-01-01 02:00:00", 1L), // > 1800s → closes session 1
      (4L, "1970-01-01 01:59:50", 1L))) // straggler INTO session 2? no —
    // sorted within the batch: 01:59:50 then 02:00:00, both > gap from
    // :20 → the 01:59:50 event OPENS session 2 and 02:00:00 extends it
    write(dir, "f2", Seq((99L, "2030-01-01 00:00:00", 9L)))
    val schema = spark.read.parquet(s"$dir/f0").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/*")
    val got = EventStream.runToCompletion(
        SessionStream.sessions(stream, gapSeconds = 1800L).toDF(),
        "session_gap")
      .filter(col("user_id") === 1L)
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, 2L, 10000000L, 20000000L),
      (2L, 2L, 7190000000L, 7200000000L)))
  }
}
