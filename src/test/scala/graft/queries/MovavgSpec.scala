package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** RANGE-interval frame laws: inclusive 1h boundary, us-ties see the
  * identical frame (the property a ROWS frame cannot express), and a
  * brute per-row replay over the real events table.
  */
class MovavgSpec extends SparkSpec {
  import spark.implicits._

  test("fixture: inclusive boundary and tie-frame equality") {
    val dir = java.nio.file.Files.createTempDirectory("movavg").toString
    Seq(
      (1L, "2024-01-01 10:00:00", 1L, "view", 1.00),
      (2L, "2024-01-01 11:00:00", 1L, "view", 2.00), // exactly 1h later: includes #1
      (3L, "2024-01-01 11:00:00", 1L, "view", 4.00), // us-tie with #2
      (4L, "2024-01-01 12:00:01", 1L, "view", 8.00), // #2/#3 out by 1s? no: 11:00 ≥ 11:00:01−1h fails by 1s
      (5L, "2024-01-01 10:30:00", 2L, "view", 16.00)) // other user isolated
      .toDF("event_id", "ts_s", "user_id", "event_type", "value")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
      .write.parquet(s"$dir/events.parquet")
    val got = RelationalQueries.q31Movavg(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4),
        r.getLong(5)))).toMap
    assert(got(1L) == ((1L, 100L, 100000000L)))
    // ties 2 and 3 share the identical frame {1,2,3}
    assert(got(2L) == ((3L, 700L, 233333333L)))
    assert(got(3L) == ((3L, 700L, 233333333L)))
    // 12:00:01 − 1h = 11:00:01 > 11:00:00 → frame is just itself
    assert(got(4L) == ((1L, 800L, 800000000L)))
    assert(got(5L) == ((1L, 1600L, 1600000000L)))
  }

  test("one user-keyed exchange serves the whole query") {
    val df = RelationalQueries.q31Movavg(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r
      .findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 hash exchange:\n$plan")
  }

  test("≡ brute per-row replay over real events") {
    val dir = "/root/testdata/sf0.001"
    val rows = spark.read.parquet(s"$dir/events.parquet")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("us"),
        round(col("value") * 100).cast("long").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    val byUser = rows.groupBy(_._2)
    val expect = rows.map { case (id, u, us, _) =>
      val frame = byUser(u).filter(e => e._3 <= us && e._3 >= us - 3600000000L)
      val n = frame.length.toLong
      val s = frame.map(_._4).sum
      id -> ((n, s, 1000000L * s / n))
    }.toMap
    val got = RelationalQueries.q31Movavg(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4),
        r.getLong(5)))).toMap
    assert(got == expect)
  }
}
