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

  /** Property TBox fixture: (p, super) — the mention predicate chains
    * two hops up (rdfs5 transitivity of ⊑) and co-occurrence one.
    */
  val SubPropertyOf: Seq[(String, String)] = Seq(
    "urn:graft:mentions" -> "urn:graft:refersTo",
    "urn:graft:refersTo" -> "urn:graft:linksTo",
    "urn:graft:coOccursWith" -> "urn:graft:relatedTo")

  /** rdfs2/rdfs3 fixtures over the ENTAILED predicates — domain/range
    * constraints attach to the superproperties, so typing only fires
    * through the rdfs7 closure (the composition the materializer must
    * get right).
    */
  val PropDomain: Seq[(String, String)] = Seq(
    "urn:graft:refersTo" -> "Document",
    "urn:graft:relatedTo" -> "Entity")
  val PropRange: Seq[(String, String)] = Seq(
    "urn:graft:refersTo" -> "Entity",
    "urn:graft:linksTo" -> "Resource")

  /** rdfs7: every (s, p, o) with p ⊑* q also holds as (s, q, o). The
    * ⊑ closure is [[subClassClosure]] over the property TBox (the rule
    * algebra is identical — reflexive-transitive closure of a
    * schema-scale relation); the corpus-scale triples see ONE broadcast
    * join. Reflexivity keeps the original triples in the output, so the
    * result IS the materialized triple set (bag; callers `.distinct()`
    * for RDF set semantics).
    */
  def entailProperties(triples: DataFrame, subProp: DataFrame): DataFrame = {
    val clo = subClassClosure(subProp).toDF("p0", "q")
    triples.join(broadcast(clo), col("p") === col("p0"))
      .select(col("s"), col("q").as("p"), col("o"))
  }

  /** rdfs2 + rdfs3 over a materialized triple set: (s p o) ∧
    * (p domain C) → s : C, and (p range C) → o : C. Both constraint
    * tables are schema-scale broadcasts; output is the (node, cls)
    * typing relation (bag — callers dedup).
    */
  def typeAssertions(triples: DataFrame, domain: DataFrame,
                     range: DataFrame): DataFrame = {
    val d = domain.toDF("pd", "cls")
    val r = range.toDF("pr", "cls")
    triples.join(broadcast(d), col("p") === col("pd"))
      .select(col("s").as("node"), col("cls"))
      .union(
        triples.join(broadcast(r), col("p") === col("pr"))
          .select(col("o").as("node"), col("cls")))
  }
}
