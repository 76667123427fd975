package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** TextAnalysis.langId (the UDF-free integer-exact scorer) vs the float
  * detectLanguage UDF on clear-cut inputs, plus the quantization's own
  * contract: exact integer replay, "und" fallbacks, partitioning
  * invariance.
  */
class LangIdSpec extends SparkSpec {
  import spark.implicits._

  private val samples = Seq(
    "the quick brown fox jumps over the lazy dog in the field",
    "der schnelle braune fuchs springt über den faulen hund im feld",
    "le rapide renard brun saute par dessus le chien paresseux",
    "el rápido zorro marrón salta sobre el perro perezoso en el campo",
    "la rapida volpe marrone salta sopra il cane pigro nel campo")

  test("agrees with detectLanguage on clear-cut sentences") {
    val docs = samples.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = TextAnalysis.langId(docs)
      .select("doc_id", "lang_pred").as[(Long, String)]
      .collect().sortBy(_._1).map(_._2).toSeq
    val want = samples.map(TextAnalysis.detectLanguage)
    assert(got == want)
    assert(got == Seq("en", "de", "fr", "es", "it"))
  }

  test("empty / no-profile-hit docs fall back to und with score 0") {
    val docs = Seq((0L, ""), (1L, "   "), (2L, "qqq qqq 12345"),
      (3L, "the field")).toDF("doc_id", "text")
    val got = TextAnalysis.langId(docs)
      .orderBy("doc_id").as[(Long, String, Long)].collect().toSeq
    assert(got(0) == ((0L, "und", 0L)))
    assert(got(1) == ((1L, "und", 0L)))
    assert(got(2)._2 == "und" && got(2)._3 == 0L)
    assert(got(3)._2 == "en" && got(3)._3 > 0L)
  }

  test("scores replay the exact integer formula") {
    // one doc, one hit path computed by hand from ProfileCounts
    val text = "the"
    val docs = Seq((0L, text)).toDF("doc_id", "text")
    val padded = " " + text + " "
    val grams = padded.sliding(3).toSeq
    val docCount = grams.groupBy(identity).view.mapValues(_.size.toLong)
    val expected = TextAnalysis.ProfileCounts.toSeq.flatMap {
      case (lang, (prof, np)) =>
        val raw = docCount.toSeq
          .map { case (g, dc) => prof.getOrElse(g, 0L) * dc }.sum
        if (raw > 0) Some((lang, raw * 1000000L / np)) else None
    }
    val best = expected.minBy { case (lang, s) => (-s, lang) }
    val got = TextAnalysis.langId(docs)
      .as[(Long, String, Long)].collect().head
    assert((got._2, got._3) == best)
  }

  test("partitioning-invariant") {
    val docs = (0 until 64).map(i =>
        (i.toLong, samples(i % samples.size) + s" pad$i"))
      .toDF("doc_id", "text")
    val a = TextAnalysis.langId(docs.repartition(7))
      .orderBy("doc_id").collect().toSeq
    val b = TextAnalysis.langId(docs.coalesce(1))
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }
}
