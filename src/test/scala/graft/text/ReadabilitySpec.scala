package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Flesch–Kincaid integer micro-grade vs a naive JVM replay, plus the
  * count edges the guard clauses exist for (no sentence marks → clamp,
  * empty doc → sentinel) and hand-computed closed forms.
  */
class ReadabilitySpec extends SparkSpec {
  import spark.implicits._

  private def naive(text: String): (Long, Long, Long, Long) = {
    val w = if (text.trim.isEmpty) 0L
      else text.trim.split("\\s+").length.toLong
    val s = math.max(1L,
      "[.!?]+".r.findAllIn(text).length.toLong)
    val y = "[aeiouyAEIOUY]+".r.findAllIn(text).length.toLong
    val fk = if (w > 0) 390000L * w / s + 11800000L * y / w - 15590000L
      else 0L
    (w, s, y, fk)
  }

  test("closed form: The cat sat on the mat.") {
    // words 6, one sentence mark, vowel runs e,a,a,o,e,a = 6
    // fk = 390000*6/1 + 11800000*6/6 - 15590000 = -1450000  (~grade -1.45,
    // the canonical "simple sentences read below grade 0" FK behavior)
    val got = TextAnalysis.readability(
        Seq((1L, "The cat sat on the mat.")).toDF("doc_id", "text"))
      .select("n_words", "n_sents", "n_syll", "fk_micro")
      .head()
    assert((got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3))
      == ((6L, 1L, 6L, -1450000L)))
  }

  test("no sentence marks clamp to 1; empty doc gets the 0 sentinel") {
    val got = TextAnalysis.readability(Seq(
        (1L, "fragment with no terminal punctuation"),
        (2L, ""), (3L, "   ")).toDF("doc_id", "text"))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(4)))
    assert(got(0)._2 == 1L)         // clamped
    assert(got(1) == ((0L, 1L, 0L)))
    assert(got(2) == ((0L, 1L, 0L)))
  }

  test("column kernel ≡ naive replay over hostile + real rows") {
    val fixtures = Seq(
      (0L, "Dr. Smith went to Washington. He saw the sights! Did he?"),
      (1L, "one.two.three...four"), // adjacent marks fold into runs
      (2L, "yyy aeiou bcd"),        // y-as-vowel + pure-vowel + no-vowel
      (3L, "Multi?! mixed?! runs?! everywhere."),
      (4L, "中文 no ascii vowels 。"))
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id") + 100, col("text")).limit(40)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val all = fixtures ++ real
    val got = TextAnalysis.readability(all.toDF("doc_id", "text"))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    for ((id, text) <- all)
      assert(got(id) == naive(text), s"doc $id: '$text'")
  }
}
