package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q26_decay laws: closed-form day ladder, translation invariance
  * (shifting every timestamp by whole days leaves all scores unchanged
  * because the anchor shifts with them), the >62-day zero floor, and an
  * exact scalar replay over real events.
  */
class DecaySpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, String, Long, String)]) = {
    val dir = java.nio.file.Files.createTempDirectory("decay").toString
    rows.map { case (id, ts, u, ty) => (id, ts, u, ty, 0.0, "{}") }
      .toDF("event_id", "ts_s", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    RelationalQueries.q26Decay(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
  }

  test("closed-form day ladder: 1e6 + 5e5 + 2.5e5, floor at the day") {
    val out = run(Seq(
      (1L, "2024-01-10 12:00:00", 1L, "view"), // anchor, age 0
      (2L, "2024-01-09 12:00:01", 1L, "view"), // 23h59m59s -> age 0
      (3L, "2024-01-09 12:00:00", 1L, "view"), // exactly 1 day -> age 1
      (4L, "2024-01-08 12:00:00", 1L, "view"))) // age 2
    assert(out == Seq((1L, "view", 4L, 1000000L + 1000000L +
      500000L + 250000L)))
  }

  test("translation invariance: shifting all events by whole days " +
      "changes nothing") {
    val base = Seq(
      (1L, "2024-01-10 00:00:00", 1L, "view"),
      (2L, "2024-01-07 03:00:00", 1L, "click"),
      (3L, "2024-01-01 09:30:00", 2L, "view"))
    val shifted = base.map { case (id, ts, u, ty) =>
      (id, ts.replace("2024-01", "2024-03"), u, ty) }
    assert(run(base) == run(shifted))
  }

  test("ages beyond 62 days contribute exactly 0") {
    val out = run(Seq(
      (1L, "2024-06-01 00:00:00", 1L, "view"),
      (2L, "2024-01-01 00:00:00", 1L, "view"))) // 152 days old
    assert(out == Seq((1L, "view", 2L, 1000000L)))
  }

  test("exact scalar replay over real events (sf0.001)") {
    val src = "/root/testdata/sf0.001"
    val got = RelationalQueries.q26Decay(spark, src).collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    val raw = spark.read.parquet(s"$src/events.parquet")
      .select(unix_micros(col("ts").cast("timestamp")).as("us"),
        col("user_id"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val anchor = raw.map(_._1).max
    val exp = raw.groupBy(r => (r._2, r._3)).map { case (k, rs) =>
      k -> (rs.length.toLong, rs.map { r =>
        val age = (anchor - r._1) / 86400000000L
        if (age > 62) 0L else 1000000L / (1L << age)
      }.sum)
    }
    assert(got == exp)
  }
}
