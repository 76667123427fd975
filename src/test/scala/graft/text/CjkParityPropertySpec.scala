package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** The CJK routing predicate exists in two implementations — the Scala
  * kernel (`TextAnalysis.isCjkText`, used by the typed MinHash shingle
  * pass) and the Column mirror (`isCjkCol`, used by the relational
  * tiers). If they ever disagree on a text, one dedup tier would
  * tokenize by words while another tokenizes by characters for the SAME
  * row. Property: agreement on adversarial mixes — ASCII, spaced/
  * unspaced CJK blocks, Thai, boundary ratios around 30%, and
  * supplementary-plane codepoints (where Java's code-UNIT length
  * diverges from Spark's codepoint length — the classic trap).
  */
class CjkParityPropertySpec extends SparkSpec {
  import spark.implicits._

  private val fragmentGen: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(8)),
    Gen.choose(0x4E00, 0x4E00 + 80).map(_.toChar.toString),      // Han
    Gen.choose(0x3041, 0x3096).map(_.toChar.toString),           // Hiragana
    Gen.choose(0x0E01, 0x0E2E).map(_.toChar.toString),           // Thai
    Gen.const(" "), Gen.const("\t"), Gen.const("\n"),
    Gen.const("　"), // IDEOGRAPHIC SPACE — ubiquitous in real CJK;
                         // ASCII-only \s missed it (round-5 review)
    Gen.const(" "), Gen.const(" "),
    // supplementary plane: 𝕊 (math bold, non-CJK) and a CJK-ext-B char
    // (U+20000 — OUTSIDE the routed blocks; counts as non-CJK on both
    // sides, but its surrogate pair stresses the length accounting)
    Gen.const(new String(Character.toChars(0x1D54A))),
    Gen.const(new String(Character.toChars(0x20000))))

  private val textGen: Gen[String] = for {
    n <- Gen.choose(0, 24)
    parts <- Gen.listOfN(n, fragmentGen)
  } yield parts.mkString

  test("isCjkText (Scala) agrees with isCjkCol (Column) on adversarial mixes") {
    val texts = (1 to 300).flatMap(i =>
      textGen(Gen.Parameters.default.withSize(24),
        org.scalacheck.rng.Seed(i.toLong)))
      .distinct
    assert(texts.nonEmpty)
    val scalaSide = texts.map(TextAnalysis.isCjkText)
    val colSide = texts.toDF("t")
      .select(TextAnalysis.isCjkCol(col("t")))
      .collect().map(_.getBoolean(0)).toSeq
    val diffs = texts.zip(scalaSide.zip(colSide)).collect {
      case (t, (a, b)) if a != b => (t, a, b)
    }
    assert(diffs.isEmpty,
      s"Scala/Column CJK routing diverged on ${diffs.take(3)}")
  }

  test("full-width spaces are whitespace on BOTH sides (round-5 review)") {
    // 3 Han + 7 ASCII + 7 ideographic spaces: U+3000 must not count as
    // content, or the two predicates split at the 30% boundary
    val t = "甲乙丙abcdefg" + "　" * 7
    assert(TextAnalysis.isCjkText(t))
    val col1 = Seq(t).toDF("t")
      .select(TextAnalysis.isCjkCol(col("t"))).head.getBoolean(0)
    assert(col1, "Column side must strip U+3000 before the ratio")
  }

  test("boundary ratios route identically on both sides") {
    // exactly 3 CJK of 10 non-space chars = 30% → routed (>=)
    val exactly30 = "甲乙丙abcdefg"
    val under30 = "甲乙丙abcdefgh" // 3/11 < 30%
    assert(TextAnalysis.isCjkText(exactly30))
    assert(!TextAnalysis.isCjkText(under30))
    val got = Seq(exactly30, under30).toDF("t")
      .select(TextAnalysis.isCjkCol(col("t"))).collect().map(_.getBoolean(0))
    assert(got.toSeq == Seq(true, false))
  }
}
