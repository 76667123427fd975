package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.canon.ConnectedComponents
import graft.extract.{Gazetteer, MentionScan}

/** Canonical graph + its component map, the unit of incremental
  * materialization. `triples` are already rewritten through `components`
  * (node → canonical label = component min).
  */
final case class KgGraph(triples: DataFrame, components: DataFrame)

/** Incremental graph materialization — MERGE semantics over plain
  * parquet (the north star names Iceberg MERGE INTO; the jars aren't in
  * this sandbox, so the merge algebra is implemented engine-side and the
  * snapshot/commit layer stays the checkpointed-phase protocol of
  * [[KgPipeline]]).
  *
  * The merge never re-reads old raw documents: a previous graph is
  * represented by its component STAR EDGES (node → label), which span
  * exactly the same partition of the entity space, so running CC over
  * `starEdges(prev) ∪ starEdges(batch)` reconnects only where the new
  * batch actually bridges components. Cost ∝ |new batch| + |affected
  * component maps|, not corpus size — the 100 TB shape for continuous
  * ingestion. Old triples re-labeled through the merged map are correct
  * because every old label is itself a member (and map key) of its
  * merged component; `merge(A, B) ≡ fromPages(A ∪ B)` exactly
  * (IncrementalKgSpec, and the `kg_canonical_inc` driver query shares
  * the full-batch kg_canonical oracle).
  */
object IncrementalKg {

  /** Build a canonical graph from a page batch (same semantics as
    * KgQueries.kgCanonical, returned with its component map). */
  def fromPages(pages: DataFrame, gaz: Gazetteer): KgGraph = {
    // scan feeds mention triples + co-occurrence: materialize once
    val m = MentionScan.mentions(pages, gaz).localCheckpoint()
    val mentionT = MentionScan.mentionTriples(m)
    val co = MentionScan.coOccurrenceTriplesFused(m, gaz.entityList)
      .select("s", "p", "o")
    val edges = co.select(col("s").as("a"), col("o").as("b"))
    val canonMap = ConnectedComponents.run(edges)
      .select(col("node"), col("component"))
    // materialized: skew detection + both rewrite joins consume the union
    val allT = mentionT.union(co).localCheckpoint()
    KgGraph(rewrite(allT, canonMap), canonMap)
  }

  /** Merge a new batch graph into a previous graph. */
  def merge(prev: KgGraph, batch: KgGraph): KgGraph = {
    val all = prev.components.union(batch.components)
    // star edges reconnect each old component; self-edges keep singleton
    // (label == node) components present as CC nodes
    val edges = all.select(col("node").as("a"), col("component").as("b"))
    val canonMap = ConnectedComponents.run(edges)
      .select(col("node"), col("component"))
    // materialized for the same multi-consumer reason as fromPages: the
    // two sides may be arbitrary (possibly unmaterialized) join plans
    val allT = prev.triples.union(batch.triples).localCheckpoint()
    KgGraph(rewrite(allT, canonMap).distinct(), canonMap)
  }

  private def rewrite(triples: DataFrame, canonMap: DataFrame): DataFrame =
    graft.canon.Canonicalize.rewriteTriples(triples, canonMap)
}
