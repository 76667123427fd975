package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Fixed-weight integer quality classifier vs a naive JVM replay, plus
  * the decision boundaries the curation funnel relies on.
  */
class ClassifySpec extends SparkSpec {
  import spark.implicits._

  private val Stop =
    Set("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  private def naive(text: String): (Long, Long, Long, Long, Long, Boolean) = {
    val nChars = text.length.toLong
    val toksArr = text.trim.split("\\s+").filter(_.nonEmpty)
    val nTokens = if (text.trim.isEmpty) 0L else toksArr.length.toLong
    val nPunct = text.count(c =>
      "!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~".contains(c)).toLong
    val nStop = toksArr.count(Stop).toLong
    val fStop = if (nTokens > 0) 1000000L * nStop / nTokens else 0L
    val fPunct = if (nChars > 0) 1000000L * nPunct / nChars else 0L
    val fLen = math.min(1000000L, 1000000L * nTokens / 400L)
    val fMtl = if (nTokens > 0)
      1000000L * (nChars - nTokens + 1) / (6L * nTokens) else 0L
    val score = 3 * fStop - 4 * fPunct + 2 * fLen + fMtl - 1500000L
    (fStop, fPunct, fLen, fMtl, score, score >= 0)
  }

  test("classify ≡ naive integer replay over boundary inputs") {
    val docs = Seq(
      (0L, "the cat sat on the mat and it is a good day in the sun"),
      (1L, "!!! ??? ... ;;; ::: %%% $$$ ###"), // punctuation soup
      (2L, ""), (3L, "   "), // empty / whitespace-only
      (4L, ("the and of " * 200).trim), // long, stopword-rich: keep
      (5L, "xqzt vprw jklm")) // short gibberish: drop
    val got = TextAnalysis.classify(docs.toDF("doc_id", "text"))
      .select(col("doc_id"), col("f_stop"), col("f_punct"), col("f_len"),
        col("f_mtl"), col("score"), col("keep"))
      .as[(Long, Long, Long, Long, Long, Long, Boolean)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7)))
      .toMap
    docs.foreach { case (id, text) =>
      assert(got(id) == naive(text), s"doc $id: '$text'")
    }
    // decision sanity: stopword-rich prose keeps, soup and empties drop
    assert(got(4L)._6 === true)
    assert(got(1L)._6 === false && got(2L)._6 === false)
    assert(got(5L)._6 === false)
  }
}
