package graft.mix

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Weighted stride-scheduling interleave (Waldspurger & Weihl, OSDI
  * 1994 — the scheduler algebra; as a data-mixing order it is the
  * deterministic twin of the sampling-with-rates schedule LLM trainers
  * run): given per-source integer weights, emit the GLOBAL training
  * order in which item r of source s occupies the slot its virtual
  * time t_s(r) = (r+1)/w_s dictates, ties broken by source id — so a
  * weight-5 source appears 5× as often as a weight-1 source, evenly
  * spread rather than front-loaded, and every engine/partitioning
  * reproduces the identical order.
  *
  * The scale point: the global position needs NO global sort. Against
  * each other source s', the number of its items scheduled before
  * (s, r) has a closed form by cross-multiplying the rationals —
  * t_s'(r') < t_s(r) ⟺ (r'+1)·w_s < (r+1)·w_s', so
  *
  *   count(s') = min(n_s', ⌈(r+1)·w_s' / w_s⌉ − 1)        (s' > s)
  *   count(s') = min(n_s', ⌊(r+1)·w_s' / w_s⌋)            (s' < s, ties count)
  *
  * and pos(s, r) = r + Σ_{s'≠s} count(s') — one in-row integer
  * expression over the broadcast (s', w, n) dictionary. The only
  * exchange is the source-keyed window that ranks r; the oracle
  * computes the SAME order by a genuinely different algorithm (exact
  * LCM-scaled sort keys + a global ROW_NUMBER), so the closed form
  * itself is machine-checked. All arithmetic is exact integers
  * (products ≤ n·w), floor/ceil division via `div` ≡ `//`.
  *
  * Weights here derive deterministically from the source name
  * (`length(s) mod 5 + 1` — a stand-in for the tuned mixing rates a
  * production run would pass in; the operator shape is identical).
  * Returns (doc_id, source, r, pos).
  */
object Interleave {

  def weightExpr: org.apache.spark.sql.Column =
    (length(col("source")) % 5 + 1).cast("long")

  /** The interleave order over `docs(doc_id, source)`. */
  def schedule(docs: DataFrame): DataFrame = {
    val base = docs.select(col("doc_id"), col("source"))
      .withColumn("w", weightExpr)
      .withColumn("r",
        (row_number().over(Window.partitionBy("source")
          .orderBy("doc_id")) - 1).cast("long"))
    // dictionary-scale (source, weight, size) stats — the broadcast side
    val stats = base.groupBy("source")
      .agg(first(col("w")).as("w"), count(lit(1)).as("n"))
      .collect()
      .map(row => (row.getString(0), row.getLong(1), row.getLong(2)))
      .sortBy(_._1)
    // Column API, not string-spliced SQL (round-6 advice): a source
    // name containing a quote/backslash would break expr() parsing —
    // lit() carries the value out-of-band. `div` has no Column-API
    // twin, so the two floor divisions go through pmod-free floor_div
    // on provably non-negative operands: both numerators are products
    // of non-negative counts/weights, so `cast(a / b as long)` is NOT
    // used (double rounding); integer division of non-negative longs
    // via the `div` FUNCTION call keeps exact floor semantics.
    val divLong = (a: org.apache.spark.sql.Column,
        b: org.apache.spark.sql.Column) => call_function("div", a, b)
    val terms = stats.map { case (s2, w2, n2) =>
      val a = (col("r") + 1L) * lit(w2)
      when(col("source") === lit(s2), lit(0L))
        .when(lit(s2) < col("source"),
          least(lit(n2), divLong(a, col("w"))))
        .otherwise(
          least(lit(n2), divLong(a + col("w") - 1L, col("w")) - 1L))
    }
    base.withColumn("pos", terms.foldLeft(col("r"))(_ + _))
      .select(col("doc_id"), col("source"), col("r"), col("pos"))
  }
}
