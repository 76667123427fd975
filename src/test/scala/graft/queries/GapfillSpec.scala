package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Gap-fill semantics on a hand-built events fixture: densification
  * covers exactly [min, max] hour per user, filled rows carry 0 events,
  * LOCF carries the (ts, event_id)-last value of the most recent
  * observed hour, and the in-hour pick is by (ts, event_id) order.
  */
class GapfillSpec extends SparkSpec {
  import spark.implicits._

  test("densify + LOCF on a fixture with a 2-hour gap and an in-hour tie") {
    val dir = java.nio.file.Files.createTempDirectory("gapfill").toString
    // user 1: hours 0 and 3 observed (gap at 1, 2); hour 0 has two
    // events — the later ts wins the carry; hour 3's single event.
    // user 2: one hour only — no fill rows at all.
    Seq(
      (100L, "1970-01-01 00:10:00", 1L, "a", 1.25, "{}"),
      (101L, "1970-01-01 00:50:00", 1L, "a", 2.75, "{}"), // later ts wins
      (102L, "1970-01-01 03:05:00", 1L, "a", 9.50, "{}"),
      (200L, "1970-01-01 05:00:00", 2L, "b", 4.00, "{}")
    ).toDF("event_id", "ts_s", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val out = RelationalQueries.q22Gapfill(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3), r.getDouble(4)))

    assert(out.toSeq == Seq(
      (1L, 0L, 2L, false, 2.75),
      (1L, 1L, 0L, true, 2.75),  // filled, carries hour 0's last value
      (1L, 2L, 0L, true, 2.75),
      (1L, 3L, 1L, false, 9.50),
      (2L, 5L, 1L, false, 4.00)))
  }

  test("in-hour pick breaks ts ties by event_id") {
    val dir = java.nio.file.Files.createTempDirectory("gapfill2").toString
    Seq(
      (7L, "1970-01-01 00:30:00", 1L, "a", 1.00, "{}"),
      (9L, "1970-01-01 00:30:00", 1L, "a", 3.00, "{}"), // higher id wins
      (8L, "1970-01-01 00:30:00", 1L, "a", 2.00, "{}")
    ).toDF("event_id", "ts_s", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = RelationalQueries.q22Gapfill(spark, dir).collect()
    assert(out.length == 1 && out(0).getDouble(4) == 3.00)
  }
}
