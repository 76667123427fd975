package graft.streaming

import graft.SparkSpec
import graft.queries.RelationalQueries
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Streaming funnel ≡ batch q24 on the same events, delivered across
  * multiple time-ordered files (so state genuinely carries stage
  * progress between micro-batches), plus the late-straggler skip policy.
  */
class FunnelStreamSpec extends SparkSpec {
  import spark.implicits._

  test("stream max level per user equals the batch funnel level, multi-file delivery") {
    val src = "/root/testdata/sf0.001"
    val ev = spark.read.parquet(s"$src/events.parquet")
    val dir = Files.createTempDirectory("funnelstream").toString
    // three event-time-ordered slices → three micro-batches in order
    val cuts = ev.stat.approxQuantile("event_id", Array(0.33, 0.66), 0.0)
    ev.filter(col("event_id") <= cuts(0))
      .coalesce(1).write.parquet(s"$dir/f0")
    ev.filter(col("event_id") > cuts(0) && col("event_id") <= cuts(1))
      .coalesce(1).write.parquet(s"$dir/f1")
    ev.filter(col("event_id") > cuts(1))
      .coalesce(1).write.parquet(s"$dir/f2")

    val schema = ev.schema
    val stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
      .parquet(s"$dir/*")
    val got = EventStream.runToCompletion(
        FunnelStream.levels(stream).toDF(), "funnel_stream")
      .groupBy("user_id").agg(max("level").as("level"))
      .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap

    val batch = RelationalQueries.q24Funnel(spark, src)
      .select("user_id", "level")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(batch.nonEmpty && batch.values.exists(_ == 3L))
    // stream emits no row for level-0 users; all advancing users match
    assert(got == batch.filter(_._2 > 0L))
  }

  test("stragglers older than the chosen stage event are skipped") {
    val dir = Files.createTempDirectory("funnelstraggler").toString
    def write(name: String, rows: Seq[(Long, String, Long, String)]): Unit =
      rows.map { case (id, ts, u, ty) => (id, ts, u, ty, 0.0, "{}") }
        .toDF("event_id", "ts_s", "user_id", "event_type", "value", "props")
        .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
        .coalesce(1).write.parquet(s"$dir/$name")
    // batch 1 advances to click at t=5; batch 2 delivers a purchase
    // EARLIER than the chosen click → must not advance
    write("f0", Seq(
      (1L, "1970-01-01 00:00:01", 1L, "view"),
      (2L, "1970-01-01 00:00:05", 1L, "click")))
    write("f1", Seq(
      (3L, "1970-01-01 00:00:03", 1L, "purchase")))
    val schema = spark.read.parquet(s"$dir/f0").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/*")
    val got = EventStream.runToCompletion(
        FunnelStream.levels(stream).toDF(), "funnel_straggler")
      .groupBy("user_id").agg(max("level").as("level")).collect()
    assert(got.length == 1 && got(0).getInt(1) == 2)
  }
}
