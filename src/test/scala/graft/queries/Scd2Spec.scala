package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SCD2 semantics on a hand-built changelog: run collapse, half-open
  * validity chaining (each run's valid_to == next run's valid_from,
  * last is NULL), A→B→A reopens a NEW run (no merge across gaps), and
  * per-run event counts.
  */
class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, String, Long, String)]) = {
    val dir = java.nio.file.Files.createTempDirectory("scd2").toString
    rows.map { case (id, ts, u, ty) => (id, ts, u, ty, 0.0, "{}") }
      .toDF("event_id", "ts_s", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    RelationalQueries.q25Scd2(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        Option(r.get(4)).map(_.asInstanceOf[Long]), r.getLong(5)))
  }

  test("runs collapse, chain half-open, A→B→A reopens") {
    val out = run(Seq(
      (1L, "1970-01-01 00:00:01", 1L, "view"),
      (2L, "1970-01-01 00:00:02", 1L, "view"),     // same run
      (3L, "1970-01-01 00:00:03", 1L, "click"),
      (4L, "1970-01-01 00:00:04", 1L, "view")))    // reopened run
    assert(out.toSeq == Seq(
      (1L, 1L, "view", 1000000L, Some(3000000L), 2L),
      (1L, 2L, "click", 3000000L, Some(4000000L), 1L),
      (1L, 3L, "view", 4000000L, None, 1L)))
  }

  test("validity chains exactly: valid_to == next valid_from for every non-final run") {
    val src = "/root/testdata/sf0.001"
    val rows = RelationalQueries.q25Scd2(spark, src).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3),
        Option(r.get(4)).map(_.asInstanceOf[Long])))
    val byUser = rows.groupBy(_._1)
    assert(byUser.nonEmpty)
    for ((_, rs) <- byUser) {
      val sorted = rs.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._4.contains(b._3))
        case _ =>
      }
      assert(sorted.last._4.isEmpty)
      assert(sorted.map(_._2).toSeq == (1L to sorted.length).toSeq)
    }
  }
}
