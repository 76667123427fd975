package graft.pages

import java.nio.charset.StandardCharsets
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.extract.HtmlText

/** Deterministic synthesis of the Common-Crawl-style page table
  * (BASELINE.json input_hint: `url, warc_ts, html, text, lang`) from the
  * driver-generated `documents` table — no external data, seeded by the
  * testdata itself, so the expected output of every downstream stage is
  * computable in closed form.
  *
  * The html template embeds the document text in a single `<p>`; the
  * HtmlText extractor must recover `text` byte-identically per url
  * (round-trip law tested in HtmlTextSpec and enforced by the
  * `kg_extract_text` oracle: extracted == documents.text).
  */
object PageGen {

  val template: (Long, String, String, String) => String =
    (docId, lang, source, escapedText) =>
      s"""<!DOCTYPE html><html lang="$lang"><head><title>doc $docId</title>""" +
        s"""<meta charset="utf-8"/><script>var x=1;</script>""" +
        s"""<style>p{margin:0}</style></head><body><h1>Document $docId</h1>""" +
        s"""<p>$escapedText</p><footer>src=$source</footer></body></html>"""

  def url(docId: Long): String = s"https://example.org/doc/$docId"

  /** documents(doc_id, text, lang, source, n_chars) → pages. Pure
    * per-row map, fully parallel; html is utf-8 bytes of the template.
    */
  def pages(spark: SparkSession, dir: String): DataFrame = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val mkHtml = udf { (docId: Long, lang: String, source: String, text: String) =>
      template(docId, lang, source, HtmlText.escape(text))
        .getBytes(StandardCharsets.UTF_8)
    }
    docs.select(
      // codegen'd concat (round-1 advice: a UDF here broke whole-stage
      // codegen for the whole projection)
      concat(lit("https://example.org/doc/"), col("doc_id")).as("url"),
      // deterministic crawl-time scatter over 31 days (9973 is prime, so
      // consecutive doc_ids land far apart); replayable in closed form by
      // the kg_timeline oracle: age_s = (doc_id * 9973) % 2678400
      expr("timestampadd(SECOND, CAST((doc_id * 9973) % 2678400 AS INT), " +
        "to_timestamp('2024-01-01 00:00:00'))").as("warc_ts"),
      mkHtml(col("doc_id"), col("lang"), col("source"), col("text")).as("html"),
      col("text"),
      col("lang"),
      col("doc_id"))
  }
}
