package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TimelineSpec extends SparkSpec {

  test("warc_ts scatter is the closed form the oracle replays") {
    val pages = graft.pages.PageGen.pages(spark, "/root/testdata/sf0.001")
    val bad = pages.select(col("doc_id"),
        (unix_timestamp(col("warc_ts")) -
          unix_timestamp(to_timestamp(lit("2024-01-01 00:00:00")))).as("age"))
      .filter(col("age") =!= (col("doc_id") * 9973) % 2678400)
      .count()
    assert(bad == 0L)
  }

  test("kg_timeline aggregates match a driver-side replay") {
    val out = KgQueries.kgTimeline(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    val pages = graft.pages.PageGen.pages(spark, "/root/testdata/sf0.001")
    val m = graft.extract.MentionScan
      .mentions(pages, graft.extract.Gazetteer(graft.extract.Gazetteer.DefaultEntities))
      .select("doc_id", "entity").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val byEnt = m.groupBy(_._2).map { case (e, rows) =>
      val ages = rows.map { case (d, _) => (d * 9973) % 2678400 }
      e -> (ages.min, ages.max, ages.max - ages.min, ages.length.toLong,
        ages.map(_ / 86400).distinct.length.toLong)
    }
    assert(out.size == byEnt.size && out.nonEmpty)
    assert(byEnt.forall { case (e, v) => out(e) == v })
    // the scatter actually spreads entities across multiple days
    assert(out.values.exists(_._5 > 1))
  }
}
