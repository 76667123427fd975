package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

class EventStreamSpec extends SparkSpec {

  private def eventsDir: String = {
    // file source wants a directory; stage the sf0.001 events parquet
    val dir = Files.createTempDirectory("events").toString
    val src = Paths.get("/root/testdata/sf0.001/events.parquet")
    Files.copy(src, Paths.get(dir, "events.parquet"))
    dir
  }

  test("T1/T5: windowed agg over the stream equals the batch plan") {
    val dir = eventsDir
    val stream = EventStream.readEvents(spark, dir)
    val got = EventStream.runToCompletion(
      EventStream.windowedAgg(stream), "win_test")
    // batch reference: same buckets from a plain read
    val batch = spark.read.parquet(dir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("bucket"), col("event_type"), col("n"))
    // append-mode emits only watermark-closed windows; every emitted row
    // must match the batch result exactly
    // normalize bucket to epoch seconds: streaming/batch rows may carry
    // different java time classes for the same instant
    def asMap(df: org.apache.spark.sql.DataFrame) = df
      .select(col("bucket").cast("timestamp").cast("long"), col("event_type"), col("n"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val gotMap = asMap(got)
    val batchMap = asMap(batch)
    assert(gotMap.nonEmpty)
    assert(gotMap.forall { case (k, v) => batchMap.get(k).contains(v) })
  }

  test("T2: flatMapGroupsWithState accumulates per-user state across batches") {
    val dir = eventsDir
    val stream = EventStream.readEvents(spark, dir)
    val updates = EventStream.runToCompletion(
      EventStream.statefulUserTotals(stream).toDF(), "state_test")
    // final update per user equals the batch per-user counts
    val finalPerUser = updates.groupBy("userId")
      .agg(max(col("nEvents")).as("nEvents"))
    val batch = spark.read.parquet(dir).groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"))
    val got = finalPerUser.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = batch.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expect)
  }
}

class StatsSpec extends SparkSpec {
  import graft.pipeline.StatsAggregator

  test("A5: typed aggregator matches the reference merge monoid") {
    import spark.implicits._
    val entities = Seq("a", "b", "c").toDF("x")
    val rels = Seq("r1").toDF("x")
    val skipped = Seq("s1", "s2").toDF("x")
    val stats = StatsAggregator.ledger(entities, rels, skipped)
    assert(stats.entityTypes == 3 && stats.relationshipTypes == 1 &&
      stats.skippedItems == 2)
    // success rate = converted / (converted + skipped) (conversion.py:87-104)
    assert(math.abs(stats.successRate - 4.0 / 6) < 1e-12)
    // monoid laws
    val z = graft.model.ConversionStats()
    assert(stats.merge(z) == stats)
    assert(z.merge(stats) == stats)
  }

  test("A9: observe() surfaces row counts without a second pass") {
    import spark.implicits._
    val df = StatsAggregator.observed(Seq(1, 2, 3).toDF("v"), "metrics")
    assert(df.count() == 3) // observation attached; plan still correct
  }
}
