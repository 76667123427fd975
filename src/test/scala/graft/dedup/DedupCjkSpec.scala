package graft.dedup

import graft.SparkSpec
import graft.text.TextAnalysis
import org.apache.spark.sql.functions._

/** Round-4 verdict #5: whitespace tokenization yields ONE token for
  * unspaced scripts, so near-dup recall silently collapsed for zh/ja/th.
  * Content-routed character n-grams must catch CJK near-dups at the SAME
  * thresholds, while space-delimited rows (every oracle row) keep the
  * word path bit-for-bit.
  */
class DedupCjkSpec extends SparkSpec {
  import spark.implicits._

  // distinct Han characters; deterministic
  private def han(from: Int, n: Int): String =
    (from until from + n).map(i => (0x4E00 + i).toChar).mkString

  private val base = han(0, 60)
  private val nearDup = {
    val cs = base.toCharArray
    cs(30) = 0x9F00.toChar
    new String(cs)
  }
  private val far = han(500, 60)

  private def docsDf(rows: Seq[(Long, String, String, String)]) =
    rows.toDF("doc_id", "text", "lang", "source")

  test("routing predicate: content-based, both engines agree") {
    assert(TextAnalysis.isCjkText(base))
    assert(TextAnalysis.isCjkText("甲乙 丙丁 戊")) // spaced CJK still routes
    assert(!TextAnalysis.isCjkText("the quick brown fox"))
    // the synthetic zh rows are space-delimited ASCII — word path
    assert(!TextAnalysis.isCjkText("window merge spark merge batch"))
    assert(!TextAnalysis.isCjkText(""))
    // Column mirror agrees on all four
    val got = Seq(base, "甲乙 丙丁 戊", "the quick brown fox",
        "window merge spark merge batch")
      .toDF("t").select(TextAnalysis.isCjkCol(col("t")))
      .collect().map(_.getBoolean(0)).toSeq
    assert(got == Seq(true, true, false, false))
  }

  test("charShingles + shinglesAuto route and window correctly") {
    assert(Dedup.charShingles("甲乙丙", 2) == Set("甲乙", "乙丙"))
    assert(Dedup.charShingles("甲 乙丙", 2) == Set("甲乙", "乙丙")) // spaces squeezed
    assert(Dedup.charShingles("甲　乙丙", 2) == Set("甲乙", "乙丙")) // U+3000 too
    assert(Dedup.charShingles("甲", 3) == Set("甲")) // short fallback
    assert(Dedup.shinglesAuto(base, 3) == Dedup.charShingles(base, 3))
    assert(Dedup.shinglesAuto("a b c d", 3) == Dedup.shingles("a b c d", 3))
    // windows are CODE POINTS: a supplementary-plane Han neighbor must
    // not be split into surrogate halves (round-5 review)
    val supp = new String(Character.toChars(0x20000))
    assert(Dedup.charShingles(supp + "甲乙", 2) ==
      Set(supp + "甲", "甲乙"))
  }

  test("jaccard tier finds CJK near-dups at the standard threshold") {
    val docs = docsDf(Seq(
      (1L, base, "zh", "s"), (2L, nearDup, "zh", "s"), (3L, far, "zh", "s"),
      // spaced English rows in the same run stay on the word path
      (10L, "a b c d e", "en", "s"), (11L, "a b c d f", "en", "s")))
    val pairs = Dedup.jaccardPairs(docs, 0.5).collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"))).toSet
    assert(pairs.contains((1L, 2L)),
      "one changed character out of 60 must pair at J >= 0.5")
    assert(!pairs.exists(p => p._2 == 3L || p._1 == 3L),
      "unrelated CJK docs must not pair")
    assert(pairs.contains((10L, 11L)), "word path unchanged in the same run")
  }

  test("minhash tier: planted CJK near-dup caught, far pair not") {
    val docs = docsDf(Seq(
      (1L, base, "zh", "s"), (2L, nearDup, "zh", "s"), (3L, far, "zh", "s")))
    val found = Dedup.minHashCandidates(docs, n = 3,
        Dedup.MinHashParams(64, 16, 42L), verifyThreshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found == Set((1L, 2L)),
      s"char-3-gram LSH must catch the planted CJK twin: $found")
    // threshold parity: the verify value equals the exact char-shingle J
    val j = Dedup.ngramJaccard(base, nearDup, 3)
    assert(j >= 0.8, s"fixture must sit above the threshold: $j")
  }

  test("repetition signals see characters, not one giant token") {
    val rep = ("甲乙" * 30) + han(100, 20) // heavy char-bigram repetition
    val out = TextAnalysis.repetition(Seq((1L, rep)).toDF("doc_id", "text"))
      .select("n_tokens", "n_distinct", "dup_bigram_n").head()
    assert(out.getLong(0) == 80, "token unit must be the character")
    assert(out.getLong(1) == 22)
    assert(out.getLong(2) > 50, "repeated char bigrams must be counted")
    // spaced rows keep the word tokenizer bit-for-bit
    val spaced = TextAnalysis.repetition(
        Seq((1L, "a b a b c")).toDF("doc_id", "text"))
      .select("n_tokens", "dup_bigram_n").head()
    assert(spaced.getLong(0) == 5 && spaced.getLong(1) == 1)
  }

  test("tokenSets routes CJK rows to characters") {
    val ts = Dedup.tokenSets(docsDf(Seq(
        (1L, "甲乙丙", "zh", "s"), (2L, "a b b", "en", "s"))))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSeq).toMap
    assert(ts(1L) == Seq("丙", "乙", "甲"))
    assert(ts(2L) == Seq("a", "b"))
  }
}
