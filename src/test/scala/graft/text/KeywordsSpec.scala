package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** tf-idf keyword extraction: scoring/tie-break semantics and the
  * bounded top-k plan shape (the WindowGroupLimit must sit BELOW the
  * exchange so ≤ k rows per doc per map task cross the wire).
  */
class KeywordsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "apple apple banana cherry"),
    (2L, "banana banana banana date"),
    (3L, "apple date date date date")
  ).toDF("doc_id", "text")

  test("rank order: higher tf wins, rarer term wins at equal tf") {
    val out = TextAnalysis.keywords(docs, topK = 2)
      .orderBy("doc_id", "rnk")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
    // doc 1: apple tf=2 df=2 → 1000000; banana tf=1 df=2 → 500000;
    //        cherry tf=1 df=1 → 1000000: apple ties cherry, term asc
    assert(out.filter(_._1 == 1L).map(t => (t._2, t._3)).toSeq ==
      Seq(("apple", 1L), ("cherry", 2L)))
    // doc 2: banana tf=3 df=2 → 1500000 beats date tf=1 df=2 → 500000
    assert(out.filter(_._1 == 2L).map(_._2).toSeq ==
      Seq("banana", "date"))
  }

  test("score is the integer proxy tf*1e6 div df") {
    val s = TextAnalysis.keywords(docs, topK = 5)
      .filter(col("doc_id") === 3L && col("term") === "date")
      .head.getAs[Long]("score")
    assert(s == 4L * 1000000L / 2L)
  }

  test("plan bounds the window below the exchange (WindowGroupLimit)") {
    val plan = TextAnalysis.keywords(docs, topK = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
  }
}
