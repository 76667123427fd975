package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Funnel semantics on hand-built event fixtures: stages must advance
  * STRICTLY after the previous stage's chosen event, out-of-order
  * prefixes don't count, greedy-earliest picks the min position per
  * stage, and ties on ts resolve by event_id.
  */
class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, String, Long, String)]) = {
    val dir = java.nio.file.Files.createTempDirectory("funnel").toString
    rows.map { case (id, ts, u, ty) => (id, ts, u, ty, 0.0, "{}") }
      .toDF("event_id", "ts_s", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    RelationalQueries.q24Funnel(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)), r.getLong(4)))
      .toMap
  }

  test("stage order matters: click before view does not advance the funnel") {
    val out = run(Seq(
      // user 1: click at pos 1, view at 2, purchase at 3 → view(2) then
      // purchase(3), but no click AFTER the view → level 1... except the
      // purchase needs a click first: level stays 1
      (1L, "1970-01-01 00:00:01", 1L, "click"),
      (2L, "1970-01-01 00:00:02", 1L, "view"),
      (3L, "1970-01-01 00:00:03", 1L, "purchase"),
      // user 2: the full ordered funnel
      (4L, "1970-01-01 00:00:01", 2L, "view"),
      (5L, "1970-01-01 00:00:02", 2L, "click"),
      (6L, "1970-01-01 00:00:03", 2L, "purchase"),
      // user 3: no view at all → level 0
      (7L, "1970-01-01 00:00:01", 3L, "click"),
      (8L, "1970-01-01 00:00:02", 3L, "purchase")))
    assert(out(1L) == ((Some(2L), None, None, 1L)))
    assert(out(2L) == ((Some(1L), Some(2L), Some(3L), 3L)))
    assert(out(3L) == ((None, None, None, 0L)))
  }

  test("greedy earliest: later repeats don't move chosen positions; strict-after excludes same position") {
    val out = run(Seq(
      (1L, "1970-01-01 00:00:01", 1L, "view"),
      (2L, "1970-01-01 00:00:02", 1L, "view"),   // ignored (later)
      (3L, "1970-01-01 00:00:03", 1L, "click"),
      (4L, "1970-01-01 00:00:04", 1L, "click"),  // ignored
      (5L, "1970-01-01 00:00:05", 1L, "purchase")))
    assert(out(1L) == ((Some(1L), Some(3L), Some(5L), 3L)))
  }

  test("ts ties resolve by event_id: the total order decides strict-after") {
    // same timestamp everywhere — event_id order: view(1), click(2),
    // purchase(3) → full funnel; flipping ids breaks it
    val full = run(Seq(
      (1L, "1970-01-01 00:00:00", 1L, "view"),
      (2L, "1970-01-01 00:00:00", 1L, "click"),
      (3L, "1970-01-01 00:00:00", 1L, "purchase")))
    assert(full(1L)._4 == 3L)
    val broken = run(Seq(
      (3L, "1970-01-01 00:00:00", 1L, "view"),
      (2L, "1970-01-01 00:00:00", 1L, "click"),
      (1L, "1970-01-01 00:00:00", 1L, "purchase")))
    assert(broken(1L)._4 == 1L) // view is last in the total order
  }
}
