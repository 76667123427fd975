package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q28_retention semantics: fixture matrix with gaps, the k=0 identity
  * (every cohort fully active on its first day), and bounds on real
  * events.
  */
class RetentionSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, String, Long)]) = {
    val dir = java.nio.file.Files.createTempDirectory("ret").toString
    rows.map { case (id, ts, u) => (id, ts, u, "view", 0.0, "{}") }
      .toDF("event_id", "ts_s", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    RelationalQueries.q28Retention(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
  }

  test("fixture matrix: gaps skipped, multi-event days deduped, " +
      "cohorts independent") {
    val out = run(Seq(
      (1L, "1970-01-01 08:00:00", 1L), // A cohort day 0
      (2L, "1970-01-01 09:00:00", 1L), // same day — dedup
      (3L, "1970-01-03 08:00:00", 1L), // A k=2 (day 1 gap)
      (4L, "1970-01-02 10:00:00", 2L), // B cohort day 1
      (5L, "1970-01-20 10:00:00", 2L))) // B k=18 > 7 — out of window
    assert(out == Seq(
      (0L, 0L, 1L, 1L), (0L, 2L, 1L, 1L), (1L, 0L, 1L, 1L)))
  }

  test("k=0 identity and monotone bounds on real events (sf0.001)") {
    val rows = RelationalQueries
      .q28Retention(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    for ((_, k, active, cohort) <- rows) {
      assert(active <= cohort)
      if (k == 0L) assert(active == cohort)
    }
    // every cohort has its k=0 row
    val byCohort = rows.groupBy(_._1)
    assert(byCohort.values.forall(_.exists(_._2 == 0L)))
  }
}
