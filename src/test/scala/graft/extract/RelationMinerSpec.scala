package graft.extract

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Window relation mining vs a naive JVM sliding window, plus the plan
  * shape (no doc-keyed exchange before the final aggregations).
  */
class RelationMinerSpec extends SparkSpec {
  import spark.implicits._

  private val ents = Seq("spark", "join", "window")

  private def naive(docs: Seq[(Long, String)], minSupport: Long)
      : Set[(String, String, String, Long, Long)] = {
    val occ = docs.flatMap { case (id, text) =>
      text.split(" ", -1).sliding(3).collect {
        case Array(s, p, o)
          if ents.contains(s) && ents.contains(o) && s != o =>
          (id, s, p, o)
      }
    }
    occ.groupBy(t => (t._2, t._3, t._4)).collect {
      case ((s, p, o), hits) if hits.size >= minSupport =>
        (s, p, o, hits.size.toLong, hits.map(_._1).distinct.size.toLong)
    }.toSet
  }

  test("windowTriples ≡ naive sliding window; support threshold holds") {
    val docs = Seq(
      (0L, "spark runs join fast and spark beats join"),
      (1L, "spark runs join slowly but window uses join"),
      (2L, "join helps spark"),
      (3L, "spark spark spark"), // self-pairs excluded
      (4L, "ab"), (5L, ""), // short docs: no window
      (6L, "spark runs join"))
    for (minSup <- Seq(1L, 2L)) {
      val got = RelationMiner.windowTriples(
          docs.toDF("doc_id", "text").repartition(4), ents, minSup)
        .as[(String, String, String, Long, Long)].collect().toSet
      assert(got == naive(docs, minSup), s"minSupport=$minSup")
    }
    // planted expectation at minSupport=2: "spark runs join" in docs 0,
    // 1, 6 (support 3, 3 docs)
    val got2 = RelationMiner.windowTriples(
        docs.toDF("doc_id", "text"), ents, 2L)
      .as[(String, String, String, Long, Long)].collect().toSet
    assert(got2.contains(("spark", "runs", "join", 3L, 3L)))
  }

  test("window enumeration is in-row: no exchange below the aggregate") {
    val df = RelationMiner.windowTriples(
      Seq((0L, "spark uses join")).toDF("doc_id", "text"), ents, 1L)
    val plan = df.queryExecution.executedPlan.toString
    // exactly the aggregation exchange(s); the explode/scan side must
    // carry none (windows never leave the scanning task)
    val beforeAgg = plan.split("HashAggregate").last
    assert(!beforeAgg.contains("Exchange"),
      s"doc-keyed exchange below the aggregate:\n$plan")
  }
}
