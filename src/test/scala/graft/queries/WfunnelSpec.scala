package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q29_wfunnel semantics: the minimal-span chain is found even when the
  * greedy-earliest chain misses the window (the case that separates
  * this operator from q24), deadline cuts, strict ordering, and level
  * monotonicity vs q24 on real data.
  */
class WfunnelSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, String, Long, String)]) = {
    val dir = java.nio.file.Files.createTempDirectory("wf").toString
    rows.map { case (id, ts, u, ty) => (id, ts, u, ty, 0.0, "{}") }
      .toDF("event_id", "ts_s", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    RelationalQueries.q29Wfunnel(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("minimal-span chain beats greedy: a late restart converts " +
      "inside the window") {
    // W = 4 h. Greedy-earliest chain: v@00:00, c@01:00, p@07:00 —
    // span 7 h, misses. The LATE chain v@05:00, c@06:00, p@07:00
    // spans 2 h → level 3.
    val out = run(Seq(
      (1L, "2024-01-01 00:00:00", 1L, "view"),
      (2L, "2024-01-01 01:00:00", 1L, "click"),
      (3L, "2024-01-01 05:00:00", 1L, "view"),
      (4L, "2024-01-01 06:00:00", 1L, "click"),
      (5L, "2024-01-01 07:00:00", 1L, "purchase")))
    assert(out == Map(1L -> 3L))
  }

  test("deadline cuts: same chain shifted past 4 h stops at level 2") {
    val out = run(Seq(
      (1L, "2024-01-01 00:00:00", 1L, "view"),
      (2L, "2024-01-01 01:00:00", 1L, "click"), // span 1 h → level 2
      (3L, "2024-01-01 09:00:00", 1L, "purchase"))) // 9 h from any view
    assert(out == Map(1L -> 2L))
  }

  test("order is strict: purchase before click never completes; " +
      "view-less users read 0") {
    val out = run(Seq(
      (1L, "2024-01-01 00:00:00", 1L, "view"),
      (2L, "2024-01-01 00:10:00", 1L, "purchase"),
      (3L, "2024-01-01 00:20:00", 1L, "click"),
      (4L, "2024-01-01 00:00:00", 2L, "click"),
      (5L, "2024-01-01 00:05:00", 2L, "purchase")))
    assert(out == Map(1L -> 2L, 2L -> 0L))
  }

  test("windowed level never exceeds the deadline-free q24 level " +
      "(real events)") {
    val src = "/root/testdata/sf0.001"
    val wf = RelationalQueries.q29Wfunnel(spark, src).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val q24 = RelationalQueries.q24Funnel(spark, src)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(wf.nonEmpty)
    // a chain that fits the window is in particular a chain, and greedy
    // is exact without deadlines — so the deadline can only lower levels
    for ((u, l) <- wf) assert(l <= q24(u))
  }
}
