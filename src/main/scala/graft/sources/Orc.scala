package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** ORC source tier — the OTHER splittable columnar format large
  * ingestion estates actually hold (Hive/Trino-era lakes are ORC;
  * Common-Crawl derivative corpora ship in both). Completes the data
  * side of the source family next to [[Jsonl]] (splittable rows),
  * [[Csv]] (quoted interchange), [[TfRecord]] (ML records) and parquet
  * (the native tier the testdata itself uses): at 100 TB a conversion
  * pipeline must READ the estate's format in place rather than demand a
  * parquet rewrite first.
  *
  * Spark-first: the built-in native ORC datasource (`spark.sql.orc.impl
  * = native` — vectorized reader, no Hive involvement) does everything;
  * zero custom row code. What the tier buys at scale, and what OrcSpec
  * pins as machine-checked laws rather than folklore:
  *
  *   - '''column pruning''': a 1-column projection reads a 1-column
  *     schema from the file (ReadSchema in the physical plan) — stripes
  *     store columns separately, so unread columns cost no I/O;
  *   - '''predicate pushdown''': filters reach the scan (PushedFilters)
  *     and prune stripes/row-groups via min/max statistics, plus
  *     optional per-column bloom filters ([[writeShards]] enables them
  *     on `doc_id` — the point-lookup key every dedup/join probe uses);
  *   - '''splittability''': stripes split independently, so one big ORC
  *     file parallelizes — unlike the quoted-newline CSV tier, whose
  *     spec documents exactly the opposite;
  *   - '''null ≠ empty''' natively (column presence streams), no `\\N`
  *     sentinel discipline needed — the trap [[Csv]] must spec away
  *     simply does not exist here.
  *
  * The driver query `src_orc` is the identity round trip through REAL
  * files (there is no in-plan `to_orc` expression, and faking one would
  * test nothing): one mis-encoded byte anywhere in the writer/reader
  * pair hash-fails against the source table.
  */
object Orc {

  val docSchema: StructType = new StructType()
    .add("doc_id", LongType)
    .add("lang", StringType)
    .add("source", StringType)
    .add("text", StringType)

  /** Write docs as ORC shards: zlib (the ORC default codec the estate's
    * existing files use), bloom filters on the point-lookup key. */
  def writeShards(docs: DataFrame, dir: String): Unit =
    docs.select(col("doc_id"), col("lang"), col("source"), col("text"))
      .write.mode("overwrite")
      .option("compression", "zlib")
      .option("orc.bloom.filter.columns", "doc_id")
      .orc(dir)

  /** Read ORC shards back as typed documents. Schema supplied (not
    * inferred) so a writer drift fails loudly at analysis, not as a
    * silent cast. */
  def readShards(spark: SparkSession, dir: String): DataFrame =
    spark.read.schema(docSchema).orc(dir)
      .select("doc_id", "lang", "source", "text")
}
