package graft.ontology

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** OWL 2 RL identity materialization (rules eq-sym / eq-trans / eq-rep).
  *
  * The reference DETECTS `owl:sameAs` and `owl:equivalentClass` axioms and
  * reports them as unsupported — "Identity assertions are not preserved"
  * (`/root/reference/src/formats/rdf/preflight_validator.py:574-599`,
  * `:448-456`; the compliance matrix pins both to `support: none`,
  * `/root/reference/src/core/compliance/constants.py:102,118`). A KG
  * store wants the opposite: the identity relation CLOSED (eq-sym +
  * eq-trans ⇒ equivalence classes) and every instance triple REWRITTEN
  * onto one representative per class (eq-rep-s/eq-rep-o), so downstream
  * queries see a canonical graph.
  *
  * Scale split (same shape as [[Rdfs]]): sameAs assertions live at
  * SCHEMA/dictionary scale (they relate vocabulary entities, not corpus
  * rows), so the equivalence closure runs over the tiny assertion graph —
  * [[graft.canon.ConnectedComponents.run]], whose adaptive local path
  * finishes it driver-side in microseconds while staying on the O(log n)
  * star iteration for open-vocabulary inputs. The corpus-scale rewrite is
  * then ONE in-row dictionary-array lookup inside the scan projection
  * (index → representative index), shuffling nothing and joining nothing.
  */
object Owl {

  /** Fixture ABox identity assertions over the gazetteer vocabulary: a
    * 2-hop chain (spark ≡ stream ≡ batch — exercises eq-trans, the rule
    * a naive pairwise rewrite misses) plus an independent pair.
    */
  val SameAs: Seq[(String, String)] = Seq(
    "spark" -> "stream",
    "stream" -> "batch",
    "vector" -> "hash")

  /** Equivalence classes of the sameAs graph: (node, rep) with rep = the
    * code-point-min member (deterministic, matches Spark/DuckDB string
    * MIN over the closure). Nodes outside every assertion are absent —
    * callers coalesce to identity.
    */
  def representatives(sameAs: DataFrame): DataFrame =
    graft.canon.ConnectedComponents
      .run(sameAs.toDF("a", "b"))
      .toDF("node", "rep")

  /** Dictionary-domain representative map: position i holds the index of
    * entity i's representative in the SAME sorted dictionary (identity
    * where no assertion applies). Representatives are class minima, so
    * they are always existing dictionary members. Collect is
    * dictionary-scale (≤ |vocabulary| rows) — the sanctioned scale for
    * driver materialization.
    */
  def repIndex(spark: SparkSession, sortedDict: Seq[String],
               sameAs: Seq[(String, String)]): Seq[Int] = {
    import spark.implicits._
    val reps = representatives(sameAs.toDF("a", "b"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    sortedDict.map { e =>
      val r = reps.getOrElse(e, e)
      val i = sortedDict.indexOf(r)
      require(i >= 0, s"representative $r not in dictionary")
      i
    }
  }
}
