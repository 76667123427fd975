package graft.sketch

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Priority sampling (Duffield, Lund & Thorup, JACM 2007) — the
  * weighted-sampling sketch the family still lacked: draw k items with
  * probability ∝ weight AND keep unbiased subset-sum estimates, the
  * exact primitive a curation pipeline needs to subsample a corpus by
  * token mass while still estimating any slice's true size from the
  * sample (VarOpt's simpler ancestor; near-optimal variance per the
  * paper). Each item gets priority q_i = w_i / u_i with u_i uniform;
  * the sample is the top-k priorities and τ = the (k+1)-th priority;
  * the estimator for a sampled item is max(w_i, τ) — heavy items
  * (w ≥ τ) enter with probability 1 and contribute their exact
  * weight, so the heavy tail is NEVER subsampled away.
  *
  * Deterministic: u_i derives from the shared splitmix-finalized
  * [[graft.functions.MixHash]] over the doc id (pmod into [1, 2³¹−1],
  * identical signed arithmetic on both engines), so priorities are the
  * same IEEE doubles everywhere — same inputs, same division — and the
  * whole draw replays bit-for-bit across engines, partitionings and
  * reruns; re-drawing with a larger k only ADDS items (priority order
  * is fixed — the nested-samples property the spec pins).
  *
  * Scale shape: one codegen'd projection computes priorities; the
  * top-(k+1) plans as TakeOrderedAndProject (per-partition bounded
  * heaps + one k-row driver merge, no global sort); τ is the
  * allowlisted 1-row driver scalar. Weight here = n_chars (clamped
  * ≥ 1) — a stand-in for token counts; the operator shape is
  * weight-agnostic.
  */
object PrioritySample {

  private val M = 2147483647L // 2^31 − 1

  def sample(docs: DataFrame, k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val h = graft.functions.MixHash(col("doc_id").cast("string"))
    val base = docs.select(col("doc_id"),
        greatest(lit(1L), col("n_chars")).as("w"))
      .withColumn("u", (h % M + M) % M + 1L)
      .withColumn("pri", col("w").cast("double") / col("u"))
    val top = base.orderBy(col("pri").desc, col("doc_id")).limit(k + 1)
      .localCheckpoint()
    val tau =
      if (top.count() <= k) 0.0
      else top.orderBy(col("pri").asc, col("doc_id").desc)
        .select("pri").limit(1).collect()(0).getDouble(0)
    top.orderBy(col("pri").desc, col("doc_id")).limit(k)
      .select(col("doc_id"), col("w"),
        greatest(col("w").cast("double"), lit(tau)).as("est_w"),
        lit(tau).as("tau"))
  }
}
