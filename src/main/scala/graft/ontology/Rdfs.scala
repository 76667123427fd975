package graft.ontology

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** RDFS forward-chaining entailment, materialized (the inference step the
  * reference consumes but never materializes: it reads
  * `rdfs:subClassOf` chains one hop at a time —
  * `/root/reference/src/formats/rdf/property_extractor.py:112-119` walks
  * direct parents, `/root/reference/src/core/compliance/constants.py:66`
  * maps subClassOf to baseEntityTypeId — whereas a KG store wants the
  * CLOSURE of rule rdfs9 ((x type C) ∧ (C ⊑* D) → (x type D)) and the
  * domain/range rules rdfs2/rdfs3 ((s p o) ∧ (p domain C) → (s type C);
  * range likewise) materialized once so queries never re-derive them).
  *
  * Scale split: the TBox (class hierarchy) is schema-scale — the
  * reference caps ontologies at hundreds of types — while the ABox
  * (instance triples) is corpus-scale. So the closure iterates over the
  * TBox only (semi-naive: each round joins just the DELTA against the
  * one-step relation, fixpoint after `depth` rounds) and is then
  * broadcast into ONE join against the instance-type table; the corpus
  * is never touched by the iteration.
  */
object Rdfs {

  /** Fixture TBox over the gazetteer domain: (class, parent). */
  val SubClassOf: Seq[(String, String)] = Seq(
    "Runtime" -> "Infra", "Infra" -> "Thing",
    "Operator" -> "Transform", "Transform" -> "Thing",
    "DataObject" -> "Thing",
    "Mentioned" -> "Thing")

  /** Fixture direct typing of the gazetteer entities. */
  val DirectType: Seq[(String, String)] = Seq(
    "spark" -> "Runtime", "stream" -> "Runtime", "batch" -> "Runtime",
    "join" -> "Operator", "window" -> "Operator", "filter" -> "Operator",
    "merge" -> "Operator",
    "customer" -> "DataObject", "vector" -> "DataObject",
    "hash" -> "DataObject")

  /** Reflexive-transitive `rdfs:subClassOf` closure: (c, anc) with
    * (c, c) for every class mentioned on either side. Semi-naive
    * iteration — round k joins only the paths discovered in round k−1
    * against the one-step relation, so total work is O(|closure|), and
    * each round localCheckpoints to keep lineage O(1). Cycles converge
    * (the closure of a cycle is finite); fixpoint = empty delta.
    */
  def subClassClosure(sub: DataFrame): DataFrame = {
    val one = sub.toDF("c", "anc")
    val refl = one.select(col("c")).union(one.select(col("anc")))
      .distinct().select(col("c"), col("c").as("anc"))
    var clo = refl.union(one).distinct().localCheckpoint()
    var delta = one.localCheckpoint()
    while (delta.limit(1).count() > 0) {
      val next = delta.as("d")
        .join(sub.toDF("c2", "p").as("s"), col("d.anc") === col("s.c2"))
        .select(col("d.c").as("c"), col("s.p").as("anc"))
        .distinct()
      delta = next.join(clo, Seq("c", "anc"), "left_anti").localCheckpoint()
      clo = clo.union(delta).localCheckpoint()
    }
    clo
  }

  /** rdfs9: inherit every ancestor of each asserted type. `types` is
    * corpus/ABox-scale (x, cls); `closure` is TBox-scale and broadcast —
    * one join, no iteration touches the instances.
    */
  def entailTypes(types: DataFrame, closure: DataFrame): DataFrame =
    types.toDF("x", "cls")
      .join(broadcast(closure.toDF("c", "anc")), col("cls") === col("c"))
      .select(col("x"), col("anc").as("cls"))
      .distinct()
}
