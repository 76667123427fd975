package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** AMS (Alon–Matias–Szegedy 1996) second-moment sketch — the F2
  * estimator completing the sketch family: [[Kmv]]/[[Hll]] count
  * distinct (F0), [[Cms]] estimates point frequencies, AMS estimates
  * F2 = Σ_tok count(tok)² — the self-join size, which is what a
  * planner needs to size joins/skew at 100 TB and what a curation
  * pipeline reads as a token-concentration (repetitiveness) signal.
  *
  * Each of k estimator rows keeps ONE integer: z_r = Σ_tok s_r(tok) ·
  * count(tok), where s_r(tok) ∈ {−1, +1} is a deterministic sign hash
  * (the FNV low bit under the [[Cms]] row-salt convention). E[z²] = F2,
  * Var[z²] ≤ 2·F2² — averaging/medianing k rows tightens it. AMS is a
  * LINEAR sketch: z(A ⊎ B) = z(A) + z(B), so it merges by plain
  * addition — stronger than CMS/HLL's lattice merges (it supports
  * DELETIONS by feeding negative counts).
  *
  * Spark-first shape: one `groupBy(group, r).agg(sum(sign))` over the
  * exploded (occurrence × row) cells — map-side combine bounds the
  * shuffle at `groups × k` longs; integer sums are partitioning- and
  * merge-order-invariant by construction, so every z_r replays
  * bit-exactly in the DuckDB oracle (`sketch_ams`).
  */
object Ams {

  /** Estimator rows: k = 4, the [[Cms.Depth]] convention. */
  val K = 4

  /** Sign of token `tok` in estimator row `r`: +1 / −1 off the FNV low
    * bit of `"r:tok"`. */
  def sign(r: Int, tok: String): Long =
    1L - 2L * (graft.mix.Mix.fnv1a(s"$r:$tok") & 1L)

  /** Column form via the native codegen'd FnvHash. */
  def signCol(r: Int, tok: Column): Column =
    lit(1L) - lit(2L) * graft.functions.FnvHash(concat(lit(s"$r:"), tok))
      .bitwiseAND(lit(1L))

  /** Per-group estimator rows (group, r, z, x = z²) — exactly
    * `groups × K` rows; x is the row's F2 estimate. The K sums ride ONE
    * aggregation as K columns (no K× row explode — the token relation
    * is scanned once, fully codegen'd); the (r, z) unpivot happens on
    * the groups-scale result. */
  def sketch(docs: DataFrame, groupCol: String = "source",
             textCol: String = "text"): DataFrame = {
    val sums = (0 until K).map(r =>
      sum(signCol(r, col("tok"))).as(s"z$r"))
    docs
      .select(col(groupCol),
        explode(filter(split(col(textCol), " "), t => t =!= "")).as("tok"))
      .groupBy(col(groupCol))
      .agg(sums.head, sums.tail: _*)
      .select(col(groupCol), posexplode(array(
        (0 until K).map(r => col(s"z$r")): _*)).as(Seq("r", "z")))
      .select(col(groupCol), col("r"), col("z"),
        (col("z") * col("z")).as("x"))
  }
}
