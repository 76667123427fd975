package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Stream-stream interval join ≡ the batch interval join on the real
  * events table across multi-file delivery, plus a window-edge fixture
  * (inclusive bounds, cross-user isolation) and the physical-plan fact
  * that the streaming plan carries the symmetric hash join with
  * watermark state eviction.
  */
class AttributionStreamSpec extends SparkSpec {
  import spark.implicits._

  private val W = 3600L // 1 h attribution window

  test("stream ≡ batch attribution on real events, multi-file delivery") {
    val src = "/root/testdata/sf0.001"
    val ev = spark.read.parquet(s"$src/events.parquet")
      .select("event_id", "ts", "user_id", "event_type")
    val dir = Files.createTempDirectory("attrstream").toString
    val cuts = ev.stat.approxQuantile("event_id", Array(0.33, 0.66), 0.0)
    ev.filter(col("event_id") <= cuts(0)).coalesce(1)
      .write.parquet(s"$dir/f0")
    ev.filter(col("event_id") > cuts(0) && col("event_id") <= cuts(1))
      .coalesce(1).write.parquet(s"$dir/f1")
    ev.filter(col("event_id") > cuts(1)).coalesce(1)
      .write.parquet(s"$dir/f2")
    val schema = spark.read.parquet(s"$dir/f0").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/*")
    val got = EventStream.runToCompletion(
        AttributionStream.attribute(stream, W), "attr_stream")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val want = AttributionStream.attributeBatch(ev, W)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(want.nonEmpty && got == want)
  }

  test("window edges: inclusive bounds, same-user only") {
    val rows = Seq(
      // user 1: clicks at -window (in), -window-1s (out), 0 (in),
      // +1s after purchase (out)
      (1L, "2024-01-01 10:00:00", 1L, "purchase"),
      (2L, "2024-01-01 09:00:00", 1L, "click"),
      (3L, "2024-01-01 08:59:59", 1L, "click"),
      (4L, "2024-01-01 10:00:00", 1L, "click"),
      (5L, "2024-01-01 10:00:01", 1L, "click"),
      // user 2's click must not attribute to user 1's purchase
      (6L, "2024-01-01 09:30:00", 2L, "click"))
      .toDF("event_id", "ts_s", "user_id", "event_type")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    val got = AttributionStream.attributeBatch(rows, W)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 2L), (1L, 4L)))
  }

  test("the streaming plan is a symmetric stream-stream join with " +
      "watermark eviction, not an unbounded buffer") {
    val dir = Files.createTempDirectory("attrplan").toString
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select("event_id", "ts", "user_id", "event_type")
    ev.coalesce(1).write.parquet(s"$dir/f0")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$dir/f0").schema)
      .parquet(s"$dir/*")
    val q = AttributionStream.attribute(stream, W)
      .writeStream.format("memory").queryName("attr_plan").start()
    try {
      q.processAllAvailable()
      val baos = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(baos)) { q.explain() }
      val plan = baos.toString
      assert(plan.contains("StreamingSymmetricHashJoin"), plan)
      // the eviction predicates the interval condition buys us: both
      // sides carry a "state cleanup" value predicate (clicks evict a
      // full window earlier than purchases — the bounded-state proof)
      assert(plan.contains("state cleanup [ left value predicate"), plan)
      assert(plan.contains("right value predicate"), plan)
    } finally q.stop()
  }
}
