package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL (newline-delimited JSON) source tier — the interchange format
  * every LLM training-data pipeline speaks (one document object per
  * line). The reference ships JSON serializers for its definition
  * ledger (`/root/reference/src/formats/fabric/definition_writer.py`,
  * CPython `json.dumps` semantics pinned byte-for-byte by FabricParts);
  * this tier covers the DATA side: documents → JSONL shards → parse,
  * text recovered byte-identically through JSON string escaping
  * (newlines, quotes, control chars, supplementary-plane unicode).
  *
  * Spark-first: serialization is `to_json(struct(...))` and parsing is
  * `from_json` / the built-in json datasource — codegen'd expressions
  * end to end, zero custom row code; the round-trip law (and the
  * hostile-content suite) lives in JsonlSpec, and the driver query's
  * oracle is the source table itself, so one mis-escaped byte
  * hash-fails.
  */
object Jsonl {

  val docSchema: StructType = new StructType()
    .add("doc_id", LongType)
    .add("lang", StringType)
    .add("source", StringType)
    .add("text", StringType)

  /** Documents → one JSON line per doc (deterministic field order via
    * the struct; Spark renders compact JSON with no whitespace).
    */
  def encodeLines(docs: DataFrame): DataFrame =
    docs.select(to_json(struct(col("doc_id"), col("lang"),
      col("source"), col("text"))).as("line"))

  /** Parse JSONL lines back to typed documents. FAILFAST: a corrupt
    * line is a loud error, not a silent null row (the tier is a source
    * of record, not a best-effort scraper).
    */
  def parseLines(lines: DataFrame): DataFrame =
    lines.select(from_json(col("line"), docSchema,
        Map("mode" -> "FAILFAST")).as("r"))
      .select(col("r.doc_id").as("doc_id"), col("r.lang").as("lang"),
        col("r.source").as("source"), col("r.text").as("text"))

  /** Write docs as JSONL text shards and read them back via the
    * built-in json datasource (the production path — encode/parse above
    * are the in-plan equivalents the driver query exercises).
    */
  def writeShards(docs: DataFrame, dir: String): Unit =
    encodeLines(docs).write.mode("overwrite").text(dir)

  def readShards(spark: SparkSession, dir: String): DataFrame =
    spark.read.schema(docSchema).option("mode", "FAILFAST").json(dir)
      .select("doc_id", "lang", "source", "text")
}
