package graft.sink

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** D1 — semantic ontology diff (reference: `compare_ontologies`,
  * `src/formats/rdf/fabric_to_ttl.py:387-523`): local-name set comparison
  * per kind (classes / data properties / object properties), reporting
  * `only_in_first` / `only_in_second` / matches. This is the P/R oracle
  * shape of the north rule — precision/recall over (subj, pred, obj) or
  * name sets, computed with `except`-style left-anti joins.
  */
object Diff {

  /** Per-kind name-set diff of two (kind, name) DataFrames. */
  def compare(first: DataFrame, second: DataFrame): DataFrame = {
    val a = first.select(col("kind"), col("name")).distinct()
    val b = second.select(col("kind"), col("name")).distinct()
    val onlyA = a.join(b, Seq("kind", "name"), "left_anti")
      .groupBy("kind").agg(count(lit(1)).as("only_in_first"))
    val onlyB = b.join(a, Seq("kind", "name"), "left_anti")
      .groupBy("kind").agg(count(lit(1)).as("only_in_second"))
    val common = a.join(b, Seq("kind", "name"), "left_semi")
      .groupBy("kind").agg(count(lit(1)).as("n_matching"))
    val kinds = a.select("kind").union(b.select("kind")).distinct()
    kinds
      .join(common, Seq("kind"), "left")
      .join(onlyA, Seq("kind"), "left")
      .join(onlyB, Seq("kind"), "left")
      .select(col("kind"),
        coalesce(col("n_matching"), lit(0L)).as("n_matching"),
        coalesce(col("only_in_first"), lit(0L)).as("only_in_first"),
        coalesce(col("only_in_second"), lit(0L)).as("only_in_second"))
      .withColumn("match", col("only_in_first") === 0 && col("only_in_second") === 0)
  }

  /** Precision/recall of a candidate triple set vs a golden set — the
    * north-rule metric (P/R ≥ 0.95). Exact set semantics like
    * `compare_ontologies`, on (s, p, o).
    */
  def precisionRecall(candidate: DataFrame, golden: DataFrame): (Double, Double) = {
    val c = candidate.select("s", "p", "o").distinct()
    val g = golden.select("s", "p", "o").distinct()
    val tp = c.join(g, Seq("s", "p", "o"), "left_semi").count().toDouble
    val nc = c.count().toDouble
    val ng = g.count().toDouble
    val precision = if (nc == 0) 1.0 else tp / nc
    val recall = if (ng == 0) 1.0 else tp / ng
    (precision, recall)
  }
}
