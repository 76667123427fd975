package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CSV source tier — the other interchange format data vendors actually
  * ship (RFC 4180 quoting: fields containing separator / quote /
  * newline are quoted, quotes escape by doubling). The reference's
  * format surface is JSON-side only (its definition ledger); this tier
  * completes the DATA side next to [[Jsonl]]: documents → CSV shards →
  * parse, text recovered byte-identically through quoting.
  *
  * Spark-first: serialization is `to_csv(struct(...))` and parsing is
  * `from_csv` — codegen'd expressions end to end; the file path uses the
  * built-in csv datasource with `multiLine` read (embedded newlines live
  * inside quoted fields, so shard files are NOT line-splittable — the
  * spec pins that behavior; JSONL remains the splittable-at-scale
  * choice, which is exactly the trade this pair of tiers documents).
  *
  * Empty-vs-null: CSV cannot natively distinguish them unaided, so both
  * directions pin a non-empty `nullValue` sentinel (classic `\\N`) —
  * quoted-empty stays the empty string, the sentinel stays null, and the
  * spec proves both.
  */
object Csv {

  val docSchema: StructType = new StructType()
    .add("doc_id", LongType)
    .add("lang", StringType)
    .add("source", StringType)
    .add("text", StringType)

  /** RFC-style options shared by both directions: quotes escape by
    * doubling (escape = quote char), empty string survives, null gets an
    * explicit sentinel that cannot collide with real text. */
  private val opts = Map(
    "quote" -> "\"",
    "escape" -> "\"",
    "nullValue" -> "\\N")

  private def jOpts(m: Map[String, String]): java.util.Map[String, String] = {
    import scala.jdk.CollectionConverters._
    m.asJava
  }

  /** Documents → one CSV record per doc (field order = docSchema). */
  def encodeLines(docs: DataFrame): DataFrame =
    docs.select(to_csv(struct(col("doc_id"), col("lang"),
      col("source"), col("text")), jOpts(opts)).as("line"))

  /** Parse CSV records back to typed documents (FAILFAST: corrupt rows
    * are loud errors, matching [[Jsonl.parseLines]]). */
  def parseLines(lines: DataFrame): DataFrame =
    lines.select(from_csv(col("line"), docSchema,
        opts ++ Map("mode" -> "FAILFAST")).as("r"))
      .select(col("r.doc_id").as("doc_id"), col("r.lang").as("lang"),
        col("r.source").as("source"), col("r.text").as("text"))

  /** Write docs as CSV shards (with header) and read them back via the
    * built-in csv datasource — `multiLine` because quoted fields may
    * contain newlines. */
  def writeShards(docs: DataFrame, dir: String): Unit =
    docs.select(col("doc_id"), col("lang"), col("source"), col("text"))
      .write.mode("overwrite").options(opts)
      .option("header", "true").csv(dir)

  def readShards(spark: SparkSession, dir: String): DataFrame =
    spark.read.schema(docSchema).options(opts)
      .option("header", "true").option("multiLine", "true")
      .option("mode", "FAILFAST").csv(dir)
      .select("doc_id", "lang", "source", "text")
}
