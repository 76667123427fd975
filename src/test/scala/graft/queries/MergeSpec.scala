package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q27_merge clause semantics on hand-built changelogs (kept / updated /
  * inserted / matched-delete / insert-suppressing tombstone), plus the
  * conservation law over real events.
  */
class MergeSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, String, Long, String)]) = {
    val dir = java.nio.file.Files.createTempDirectory("merge").toString
    rows.map { case (id, ts, u, ty) => (id, ts, u, ty, 0.0, "{}") }
      .toDF("event_id", "ts_s", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    RelationalQueries.q27Merge(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getString(3))).toSeq
  }

  test("all merge clauses: kept, updated, inserted, matched-delete, " +
      "tombstone suppresses insert") {
    val pre = "2024-01-10 00:00:0"
    val post = "2024-01-20 00:00:0"
    val out = run(Seq(
      // u1: pre only -> kept, last_type from target
      (1L, pre + "1", 1L, "view"),
      (2L, pre + "2", 1L, "click"),
      // u2: both -> updated, counts add, last_type from source
      (3L, pre + "1", 2L, "view"),
      (4L, post + "1", 2L, "purchase"),
      (5L, post + "2", 2L, "click"),
      // u3: post only, clean -> inserted
      (6L, post + "1", 3L, "view"),
      // u4: both, 5 post errors -> DELETE
      (7L, pre + "1", 4L, "view")) ++
      (0 until 5).map(i => (8L + i, s"$post$i", 4L, "error")) ++ Seq(
      // u5: post only, 5 errors -> tombstone suppresses INSERT
      (13L, post + "1", 5L, "view")) ++
      (0 until 5).map(i => (14L + i, s"$post$i", 5L, "error")))
    assert(out == Seq(
      (1L, 2L, "click", "kept"),
      (2L, 3L, "click", "updated"), // post argmax: event 5 at :02
      (3L, 1L, "view", "inserted")))
  }

  test("conservation over real events: surviving counts + deleted " +
      "users' counts == total") {
    val src = "/root/testdata/sf0.001"
    val merged = RelationalQueries.q27Merge(spark, src).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val e = spark.read.parquet(s"$src/events.parquet")
      .withColumn("us", unix_micros(col("ts").cast("timestamp")))
    val cut = e.select(unix_micros(
      to_timestamp(lit("2024-01-16 00:00:00")))).head().getLong(0)
    val all = e.groupBy("user_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val deleted = all.keySet -- merged.keySet
    // every deleted user really has >=5 post-cutoff errors
    val errs = e.filter(col("us") >= cut &&
        col("event_type") === "error")
      .groupBy("user_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(deleted.forall(u => errs.getOrElse(u, 0L) >= 5L))
    assert((all.keySet -- deleted).forall(u => merged(u) == all(u)))
  }
}
