package graft.canon

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-point integer PageRank over the knowledge graph — entity
  * salience for the north star's "TF-IDF/context-window entity-link
  * scoring" family: a random-walk centrality over the doc↔entity
  * mention graph ranks entities by how much document mass links to
  * them (HITS/PageRank over a bipartite citation graph; Page et al.
  * 1999, public formulation).
  *
  * All arithmetic is 64-bit integer fixed point (scores in units of
  * 1e-12): init 10^12 per node, one iteration is
  *
  *   s'(v) = T + (85 * Σ_{u∈N(v)} (s(u) div deg(u))) div 100
  *
  * with teleport T = 0.15 * 10^12 and integer (floor) division. Sums of
  * integers are order- and partitioning-independent, so the result is
  * bit-exact across engines — the DuckDB oracle replays the identical
  * recurrence with `//` — and across cluster sizes, unlike a
  * floating-point PageRank whose low bits depend on reduction order.
  *
  * Scale shape (the canonical distributed PageRank): the edge list is
  * hash-partitioned by `src` ONCE and persisted; every iteration is one
  * sort-merge join scores⋈edges on that same key (no re-shuffle of the
  * edge side — the join reuses the persisted partitioning) followed by
  * one map-side-combined groupBy(dst) of 16-byte (dst, contrib) rows.
  * Per-iteration shuffle is therefore ∝ edges ONCE at fixed row width,
  * never ∝ corpus text. Scores are node-cardinality (≪ edges); under
  * the broadcast threshold AQE turns the join into a broadcast and the
  * per-iteration cost is a single scan of the persisted edges. Degree is
  * precomputed and attached to the edge row so the inner loop never
  * joins a third table. Skewed in-degree (head entities) is absorbed by
  * the map-side combine: partial sums per partition bound any single
  * reducer's input by the partition count, not the hub degree.
  */
object PageRank {

  val Scale: Long = 1000000000000L            // 10^12 fixed-point unit
  val Teleport: Long = 150000000000L          // 0.15 * Scale
  val DampNum = 85L                           // 0.85 * ...
  val DampDen = 100L

  /** edges(src, dst): DIRECTED adjacency (pass both directions for an
    * undirected graph). Every node must appear as a `src` (symmetric
    * graphs guarantee this); dangling nodes are the caller's concern.
    * Returns (node, score) after `iters` fixed-point iterations.
    */
  def run(edges: DataFrame, iters: Int = 5): DataFrame = {
    val deg = edges.groupBy("src").agg(count(lit(1)).cast("long").as("deg"))
    // one co-partitioned, degree-annotated edge table reused every round
    val e = edges.join(deg, "src")
      .repartition(col("src"))
      .localCheckpoint()
    var scores = deg.select(col("src").as("node"), lit(Scale).as("score"))
    for (i <- 1 to iters) {
      scores = e.join(scores.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst"), expr("score div deg").as("c"))
        .groupBy("dst")
        .agg(sum(col("c")).as("in"))
        .select(col("dst").as("node"),
          (lit(Teleport) + expr(s"($DampNum * in) div $DampDen"))
            .cast("long").as("score"))
      // cut lineage every SECOND round (round-6): the checkpoint is an
      // eager job, so batching two iterations per cut halves the job
      // round-trips while the lazy tree stays ≤ 2 rounds deep — far
      // below the exponential-plan regime the cut guards against. The
      // using-column join keeps the twice-used edge table unambiguous
      // inside one lazy tree (same rows as the old attribute-ref join).
      if (i % 2 == 0 || i == iters) scores = scores.localCheckpoint()
    }
    scores
  }

  /** Edge-WEIGHTED PageRank: u's mass flows to v in proportion to the
    * edge weight out of u's total outgoing weight —
    *
    *   s'(v) = T + (85 · Σ_u (s(u)·w(u,v)) div W(u)) div 100
    *
    * the salience variant that respects co-mention STRENGTH (an entity
    * pair seen together in 500 documents should pull harder than one
    * seen once — unweighted PageRank treats them identically). Same
    * integer fixed point and plan shape as [[run]]: weight totals are
    * precomputed onto the src-partitioned edge table, each round is one
    * co-partitioned join + map-side-combined sum. Overflow headroom:
    * s(u)·w needs s·w < 2^63; total mass is n·Scale = n·10^12, so the
    * product is safe while n·max_w < ~9·10^6 per hub — far beyond any
    * dictionary-sized entity graph, and the weight is bounded by the
    * corpus doc count regardless.
    */
  def runWeighted(edges: DataFrame, iters: Int = 5): DataFrame = {
    val wtot = edges.groupBy("src")
      .agg(sum(col("w")).cast("long").as("wtot"))
    val e = edges.join(wtot, "src")
      .repartition(col("src"))
      .localCheckpoint()
    var scores = wtot.select(col("src").as("node"), lit(Scale).as("score"))
    for (i <- 1 to iters) {
      scores = e.join(scores.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst"), expr("(score * w) div wtot").as("c"))
        .groupBy("dst")
        .agg(sum(col("c")).as("in"))
        .select(col("dst").as("node"),
          (lit(Teleport) + expr(s"($DampNum * in) div $DampDen"))
            .cast("long").as("score"))
      // batched lineage cut, same rationale as [[run]] (round-6)
      if (i % 2 == 0 || i == iters) scores = scores.localCheckpoint()
    }
    scores
  }

  /** Personalized PageRank: the restart (teleport) mass concentrates on
    * `seeds` (a 1-column `node` DataFrame) instead of spreading
    * uniformly — salience RELATIVE to a seed set (Haveliwala 2002,
    * topic-sensitive PageRank; the standard random-walk-with-restart
    * relevance measure). Same integer fixed point as [[run]] — init
    * Scale on seeds / 0 elsewhere, per-round
    * `s'(v) = [v∈seeds]·Teleport + (85·Σ(s(u) div deg u)) div 100` —
    * so the result replays bit-exactly in the oracle. Plan adds one
    * broadcast left-semi-style join against the (dictionary-sized) seed
    * set per round; everything else is the [[run]] shape.
    */
  def runPersonalized(edges: DataFrame, seeds: DataFrame,
      iters: Int = 5): DataFrame = {
    val deg = edges.groupBy("src").agg(count(lit(1)).cast("long").as("deg"))
    val e = edges.join(deg, "src")
      .repartition(col("src"))
      .localCheckpoint()
    val seedSet = broadcast(seeds.select(col("node")).distinct()
      .withColumn("is_seed", lit(1L))
      .localCheckpoint())
    var scores = deg.select(col("src").as("node"))
      .join(seedSet, Seq("node"), "left_outer")
      .select(col("node"),
        (coalesce(col("is_seed"), lit(0L)) * Scale).as("score"))
    for (i <- 1 to iters) {
      scores = e.join(scores.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst"), expr("score div deg").as("c"))
        .groupBy("dst")
        .agg(sum(col("c")).as("in"))
        .join(seedSet.withColumnRenamed("node", "dst"), Seq("dst"),
          "left_outer")
        .select(col("dst").as("node"),
          (coalesce(col("is_seed"), lit(0L)) * Teleport +
            expr(s"($DampNum * in) div $DampDen")).cast("long").as("score"))
      // batched lineage cut, same rationale as [[run]] (round-6)
      if (i % 2 == 0 || i == iters) scores = scores.localCheckpoint()
    }
    scores
  }
}
