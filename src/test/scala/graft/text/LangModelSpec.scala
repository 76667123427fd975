package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bigram-LM NLL vs a hand-computed model on a 3-doc corpus. */
class LangModelSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed add-one bigram NLL") {
    val docs = Seq(
      (0L, "a b a b"),
      (1L, "a b c"),
      (2L, "c")
    ).toDF("doc_id", "text")
    // unigrams: a:3 b:3 c:2, V=3
    // bigrams: (a,b):3 (b,a):1 (b,c):1
    val v = 3.0
    def t(c2: Long, c1: Long): Long =
      math.round((math.log(c1 + v) - math.log(c2 + 1.0)) * 1e6)
    val tab = Map(("a", "b") -> t(3, 3), ("b", "a") -> t(1, 3),
      ("b", "c") -> t(1, 3))
    val d0 = 2 * tab(("a", "b")) + tab(("b", "a"))
    val d1 = tab(("a", "b")) + tab(("b", "c"))
    val got = LangModel.bigramNll(docs)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (0L, 3L, d0, d0 / 3000L),
      (1L, 2L, d1, d1 / 2000L)))
    // doc 2 has one token → no bigrams → absent
    assert(!got.exists(_._1 == 2L))
  }

  test("frequent transitions score lower than rare ones") {
    val docs = (0L until 20L).map(i => (i, "x y x y x y"))
      .toDF("doc_id", "text")
      .union(Seq((100L, "y x y x y x")).toDF("doc_id", "text"))
    val rows = LangModel.bigramNll(docs)
      .select("doc_id", "nll_milli_avg")
      .as[(Long, Long)].collect().toMap
    // (x,y) appears 62×, (y,x) 43× — the doc made mostly of the rarer
    // transition must score a strictly higher NLL
    assert(rows(100L) > rows(0L))
  }
}
