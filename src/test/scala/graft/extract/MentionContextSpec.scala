package graft.extract

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Context-window entity-link scoring (round 3). */
class MentionContextSpec extends SparkSpec {
  import spark.implicits._

  private val gaz = Gazetteer.DefaultEntities

  test("context counts on a hand-built document") {
    //          0      1      2     3      4    5       6
    val text = "spark join x y z hash spark" // positions 0,1,5,6 are gaz
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val got = MentionScan.mentionContexts(df, gaz, window = 2)
      .collect().map(r => (r.getString(1), (r.getLong(2), r.getLong(3)))).toMap
    // positions: spark@0, join@1, hash@5, spark@6
    // spark@0: window {1,2} -> join@1        = 1
    // join@1:  window {0,2,3} minus self -> spark@0 = 1
    // hash@5:  window {3,4,6,7} -> spark@6   = 1
    // spark@6: window {4,5,7,8} -> hash@5    = 1
    assert(got == Map("spark" -> ((2L, 2L)), "join" -> ((1L, 1L)),
      "hash" -> ((1L, 1L))))
  }

  test("context-scan tf equals the trie scan tf on the corpus") {
    val pages = graft.pages.PageGen.pages(spark, "/root/testdata/sf0.001")
    val trie = MentionScan.mentions(pages, Gazetteer(gaz))
      .select("doc_id", "entity", "tf").collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val ctx = MentionScan.mentionContexts(pages, gaz, window = 5)
      .select("doc_id", "entity", "tf").collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(ctx.nonEmpty)
    assert(ctx == trie)
  }

  test("scoredWithContext applies the documented boost to tf-idf") {
    val pages = graft.pages.PageGen.pages(spark, "/root/testdata/sf0.001")
    val n = pages.count()
    val w = 5
    val ctxDf = MentionScan.mentionContexts(pages, gaz, w)
    val dfMap = ctxDf.groupBy("entity").agg(count(lit(1)).as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = MentionScan.scoredWithContext(ctxDf, n, w)
      .select("doc_id", "entity", "tf", "ctx", "score").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (e, tf, cx, score) =
        (r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      val expected = tf * math.log(n.toDouble / dfMap(e)) *
        (1.0 + cx / (2.0 * w * tf))
      assert(math.abs(score - expected) <= math.abs(expected) * 1e-12,
        s"$e: $score vs $expected")
    }
  }
}
