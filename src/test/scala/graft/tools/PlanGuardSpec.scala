package graft.tools

import graft.SparkSpec

/** Suite-wide physical-plan guard over EVERY driver query: no
  * CartesianProduct anywhere, and BroadcastNestedLoopJoin only where a
  * 1-row global-aggregate scalar is broadcast (the optimal plan for
  * joining a corpus against a single reduced row):
  *  - onto_limits: entity-stats × relationship-stats, both global aggs
  *    (`shape/Limits.scala` global), 1 row × 1 row;
  *  - txt_perplexity: per-bigram terms × the vocab-size scalar
  *    (`text/LangModel.scala` vDf), broadcast 1 row;
  *  - txt_bm25: per-(doc, term) scores × the (N, L) corpus-scalar row
  *    (`text/Bm25.scala` scalars), broadcast 1 row;
  *  - sketch_bloom: probe verdicts × the filter-popcount scalar
  *    (`queries/DataQueries.scala` popcount), broadcast 1 row;
  *  - kg_hits: per-half-round max-normalization — node scores × the
  *    1-row MAX(raw) scalar (`canon/Hits.scala` normalize);
  *  - txt_heavyhitters: candidate exact counts × the corpus-total
  *    scalar (`sketch/HeavyHitters.scala` exact), broadcast 1 row;
  *  - txt_collocations: bigram contingency rows × the total-bigrams
  *    scalar (`text/TextAnalysis.scala` collocations), broadcast 1 row;
  *  - mix_kl: per-(source, token) terms × the corpus-total scalar
  *    (`mix/Mix.scala` klBySource), broadcast 1 row.
  * One further category is allowed: ALL-PAIRS-BY-SEMANTICS joins over
  * dictionary-scale sketch relations, where the OUTPUT is O(n²) rows
  * by definition so no join algorithm beats a broadcast nested loop —
  *  - sketch_theta: per-source KMV sketches paired src_a < src_b
  *    (`sketch/Kmv.scala` thetaPairs); |sources| rows a side, corpus
  *    touched once upstream by the bounded agg.
  * Any new query whose join degenerates to a nested loop over real
  * (corpus-scale) relations fails here before it can reach the driver.
  */
class PlanGuardSpec extends SparkSpec {

  private val scalarBnljAllowed =
    Set("onto_limits", "txt_perplexity", "txt_bm25", "sketch_bloom",
      "kg_hits", "sketch_theta", "txt_heavyhitters", "txt_collocations",
      "mix_kl")

  test("no cartesian products; BNLJ only for 1-row scalar broadcasts") {
    val dir = "/root/testdata/sf0.001"
    val violations = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .flatMap { case (name, f) =>
        val plan = f(spark, dir).queryExecution.executedPlan.toString
        val v = scala.collection.mutable.ArrayBuffer[String]()
        if (plan.contains("CartesianProduct"))
          v += s"$name: CartesianProduct"
        if (plan.contains("BroadcastNestedLoopJoin") &&
            !scalarBnljAllowed(name))
          v += s"$name: BroadcastNestedLoopJoin"
        v
      }
    assert(violations.isEmpty,
      s"plan regressions:\n${violations.mkString("\n")}")
  }
}
