package graft.extract

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets
import graft.ontology.PropertyChecking

class HtmlTextSpec extends AnyFunSuite with PropertyChecking {
  test("tag stripping, entity decode, whitespace collapse") {
    val html = "<html><body><h1>Title</h1><p>a &amp; b &lt;c&gt;</p>" +
      "<script>var x = '<p>no</p>';</script><style>p{}</style>" +
      "<footer>end</footer></body></html>"
    assert(HtmlText.extract(html) == "Title a & b <c> end")
  }

  test("inline tags glue, block tags separate") {
    assert(HtmlText.extract("<p>he<b>ll</b>o</p><p>world</p>") == "hello world")
  }

  test("numeric character references") {
    assert(HtmlText.extract("&#65;&#x42;") == "AB")
  }

  test("decode ladder: strict utf-8, latin-1 fallback (rdf_converter.py:650-660)") {
    val utf8 = "héllo".getBytes(StandardCharsets.UTF_8)
    assert(HtmlText.decodeBytes(utf8) == "héllo")
    val latin1 = "héllo".getBytes(StandardCharsets.ISO_8859_1) // 0xE9 invalid in utf-8
    assert(HtmlText.decodeBytes(latin1) == "héllo")
  }

  test("PageGen round-trip law: extractMain(template(text)) == text byte-identically") {
    forAll { s =>
      // corpus text is space-separated words; model that shape but keep
      // arbitrary word content (minus whitespace/control/surrogate chars)
      val words = s.filterNot(Character.isSurrogate)
        .split("[\\s\\u0000-\\u001f]+").filter(_.nonEmpty)
      val text = words.mkString(" ")
      val html = graft.pages.PageGen.template(1L, "en", "src0", HtmlText.escape(text))
      HtmlText.extractMainFromBytes(html.getBytes(StandardCharsets.UTF_8)) == text
    }
  }

  test("extractMain falls back to whole page without <p>") {
    assert(HtmlText.extractMain("<html><body><h1>x</h1> y</body></html>") == "x y")
  }
}

class GazetteerSpec extends AnyFunSuite {
  test("word-boundary matches equal token counts on word-shaped text") {
    val g = Gazetteer(Seq("spark", "join", "window"))
    val text = "spark join sparkly window spark respark join"
    // 'sparkly' and 'respark' must NOT match (word boundaries)
    assert(g.countMatches(text) == Map("spark" -> 2, "join" -> 2, "window" -> 1))
  }

  test("overlapping dictionary entries all found (failure links)") {
    val g = Gazetteer(Seq("he", "she", "his", "hers"))
    val ms = g.findAll("she hers his").map(m => (m.entity, m.begin)).toSet
    // word-boundary filter: "she" matches at 0; "he" inside "she"/"hers" is
    // boundary-blocked; "hers" at 4; "his" at 9
    assert(ms == Set(("she", 0), ("hers", 4), ("his", 9)))
  }

  test("matches agree with naive regex scan on random corpus text") {
    val rnd = new scala.util.Random(42)
    val vocab = Vector("spark", "join", "windows", "wind", "ow", "stream",
      "streaming", "a", "batchjoin", "xyz")
    val dict = Seq("spark", "join", "wind", "stream", "batchjoin")
    val g = Gazetteer(dict)
    for (_ <- 1 to 200) {
      val text = Seq.fill(rnd.nextInt(30))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      val expected = dict.flatMap { w =>
        ("(?<![\\p{L}\\p{N}])" + java.util.regex.Pattern.quote(w) + "(?![\\p{L}\\p{N}])")
          .r.findAllMatchIn(text).map(_ => w)
      }.groupBy(identity).map { case (k, v) => k -> v.size }
      assert(g.countMatches(text) == expected, s"text: $text")
    }
  }
}

/** Fused co-occurrence ≡ declarative explode formulation. */
class CoOccurrenceFusedSpec extends graft.SparkSpec {
  test("coOccurrenceFused matches coOccurrenceFromSets on real pages") {
    val pages = graft.pages.PageGen.pages(spark, "/root/testdata/sf0.001")
    val gaz = Gazetteer(Gazetteer.DefaultEntities)
    val sets = MentionScan.mentionSets(pages, gaz).localCheckpoint()
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getString(2), r.getLong(3))).toSet
    val declarative = rows(MentionScan.coOccurrenceFromSets(sets))
    val fused = rows(MentionScan.coOccurrenceFused(sets, Gazetteer.DefaultEntities))
    assert(declarative.nonEmpty)
    assert(fused == declarative)
  }
}

/** Native ExtractMainText expression: codegen + parity with the scala path. */
class ExtractMainTextSpec extends graft.SparkSpec {
  import org.apache.spark.sql.functions._

  test("expression output is byte-identical to the function and the source text") {
    val pages = graft.pages.PageGen.pages(spark, "/root/testdata/sf0.001")
    val out = pages
      .withColumn("viaExpr", ExtractMainText(col("html")))
      .select("text", "viaExpr")
    assert(out.filter(col("viaExpr") =!= col("text")).count() == 0)
    // whole-stage codegen survives: the project sits inside a
    // WholeStageCodegenExec (rendered as the *(n) prefix)
    val hasWsc = out.queryExecution.executedPlan.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.WholeStageCodegenExec])
    assert(hasWsc, out.queryExecution.executedPlan.toString.take(500))
  }

  test("null-safe and type-checked") {
    import spark.implicits._
    val df = Seq((1L, null: Array[Byte]),
      (2L, "<html><body><p>x</p></body></html>".getBytes("UTF-8")))
      .toDF("id", "html")
    val r = df.select(col("id"), ExtractMainText(col("html")).as("t"))
      .collect().map(x => (x.getLong(0), Option(x.getString(1)))).toMap
    assert(r(1L).isEmpty) // null in, null out
    assert(r(2L).contains("x"))
    intercept[Exception] {
      df.select(ExtractMainText(col("id"))).collect() // wrong input type
    }
  }
}
