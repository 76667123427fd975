package graft.sketch

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Exact distributed heavy hitters — the frequent-token report
  * (stopword discovery, boilerplate-phrase mining, vocabulary heads)
  * over a corpus whose full histogram is vocabulary-scale.
  *
  * Two-pass shape (the classic MapReduce formulation, cf. Agarwal et
  * al., "Mergeable Summaries", PODS 2012): pass 1 runs Misra–Gries
  * with `m` counters INSIDE each partition (`mapPartitions`, O(m)
  * state, no shuffle) and emits only the surviving keys; pass 2
  * recounts the candidate keys EXACTLY with one broadcast semi-join +
  * one hash aggregation, and keeps those with `c · k ≥ n`.
  *
  * Why this dodges MG's order-sensitivity ([[Cms]]'s scaladoc flags
  * it): the candidate SET is order/partitioning-dependent, but it is
  * always a SUPERSET of the true heavy hitters — if a token has global
  * count c ≥ n/k then by pigeonhole some partition p holds it with
  * c_p ≥ n_p/k, and MG with m ≥ k counters never evicts a key whose
  * in-partition count exceeds n_p/(m+1) < n_p/k. The exact recount
  * then filters the superset down to a result that depends ONLY on the
  * data — bit-identical on any cluster size, any partitioning, any
  * engine (the `txt_heavyhitters` oracle is the plain HAVING query).
  *
  * Scale shape at 100 TB: pass 1 shuffles nothing and emits
  * ≤ m × partitions keys; the candidate table broadcasts (m is a
  * constant ~2k); pass 2's aggregation is map-side-combined on the
  * candidate keys only, so its exchange carries ≤ m × partitions rows
  * — never the vocabulary, never the corpus. No global sort, no
  * driver-side histogram.
  */
object HeavyHitters {

  /** Misra–Gries over one iterator: the ≤ m keys whose counters
    * survive. Deterministic given the iteration order (each overflow
    * decrements every counter by the new key's implicit 1).
    */
  def misraGries(toks: Iterator[String], m: Int): Iterator[String] = {
    val ctr = scala.collection.mutable.HashMap.empty[String, Long]
    while (toks.hasNext) {
      val t = toks.next()
      ctr.get(t) match {
        case Some(c) => ctr.update(t, c + 1)
        case None if ctr.size < m => ctr.update(t, 1L)
        case None =>
          // decrement-all: absorbs this token plus one unit of every
          // tracked key — the step that caps undercount at n_p/(m+1)
          val dead = ctr.iterator.collect { case (k, 1L) => k }.toList
          ctr.mapValuesInPlace((_, c) => c - 1)
          dead.foreach(ctr.remove)
      }
    }
    ctr.keysIterator
  }

  /** Candidate keys: union of the per-partition MG(m) survivors —
    * ⊇ every token with global count ≥ n/k whenever m ≥ k
    * (HeavyHittersSpec pins the superset law under random
    * repartitioning).
    */
  def candidates(tokens: Dataset[String], m: Int): Dataset[String] = {
    require(m > 0, s"m must be positive: $m")
    import tokens.sparkSession.implicits._
    tokens.mapPartitions(misraGries(_, m)).distinct()
  }

  /** Tokens with exact count `c` satisfying `c · k ≥ n`, with the
    * corpus total alongside: (tok, c, n_tokens). `m` defaults to 2k —
    * any m ≥ k is correct; the slack halves pass-1 evictions.
    */
  def exact(tokens: Dataset[String], k: Int, m: Int = -1): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val mm = if (m > 0) m else 2 * k
    require(mm >= k, s"m=$mm would break the superset guarantee (k=$k)")
    val cand = candidates(tokens, mm).toDF("tok")
    val total = tokens.toDF("tok").agg(count(lit(1)).as("n_tokens"))
    tokens.toDF("tok")
      .join(broadcast(cand), Seq("tok"), "left_semi")
      .groupBy("tok").agg(count(lit(1)).as("c"))
      .crossJoin(broadcast(total))
      .filter(col("c") * k >= col("n_tokens"))
  }
}
