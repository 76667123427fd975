package graft.pipeline

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.model.ConversionStats

/** A5 — the associative conversion ledger as a typed Aggregator
  * (reference: `ConversionResult.merge`, `conversion.py:176-195`; used by
  * the chunk pipeline at `streaming.py:547-558`). Spark's partial
  * aggregation runs [[ConversionStats.merge]] map-side per partition and
  * once more at the final reduce — the exact partial+final skeleton the
  * reference hand-rolls.
  *
  * Rows: (kind, warnings) where kind ∈ entity | relationship | skipped |
  * triple.
  */
object StatsAggregator extends Aggregator[Row, ConversionStats, ConversionStats] {
  override def zero: ConversionStats = ConversionStats()

  override def reduce(b: ConversionStats, r: Row): ConversionStats = {
    val kind = r.getAs[String]("kind")
    b.merge(kind match {
      case "entity" => ConversionStats(entityTypes = 1)
      case "relationship" => ConversionStats(relationshipTypes = 1)
      case "skipped" => ConversionStats(skippedItems = 1)
      case "warning" => ConversionStats(warnings = 1)
      case _ => ConversionStats(tripleCount = 1)
    })
  }

  override def merge(a: ConversionStats, b: ConversionStats): ConversionStats =
    a.merge(b)
  override def finish(s: ConversionStats): ConversionStats = s
  override def bufferEncoder: Encoder[ConversionStats] =
    Encoders.product[ConversionStats]
  override def outputEncoder: Encoder[ConversionStats] =
    Encoders.product[ConversionStats]

  def column: TypedColumn[Row, ConversionStats] = toColumn

  /** Ledger over extraction outputs: entities/rels/skipped unioned into
    * kind rows, one treeAggregate-style pass.
    */
  def ledger(entities: DataFrame, rels: DataFrame,
             skipped: DataFrame): ConversionStats = {
    val rows = entities.select(lit("entity").as("kind"))
      .union(rels.select(lit("relationship").as("kind")))
      .union(skipped.select(lit("skipped").as("kind")))
    rows.as(Encoders.row(rows.schema)).select(column).head()
  }

  /** A9-style live metrics: attach an `observe` to any DataFrame — counts
    * surface in QueryExecutionListener / StreamingQueryProgress without a
    * second pass.
    */
  def observed(df: DataFrame, name: String): DataFrame =
    df.observe(name, count(lit(1)).as("rows"))
}
