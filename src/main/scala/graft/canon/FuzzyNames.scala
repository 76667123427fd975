package graft.canon

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy entity-alias resolution: find all pairs of distinct surface
  * forms within Levenshtein distance ≤ k — the name-variant merge step
  * of KG canonicalization (typos, OCR noise, pluralization) that the
  * exact-match gazetteer tier (`extract/MentionScan`) cannot see. The
  * reference converter normalizes ontology names through a deterministic
  * character pipeline (`src/core/domain/naming.py`) but has no
  * approximate matcher; at web scale the alias merge is what keeps
  * "Acme Corp" / "Acme Crop" from becoming two canonical entities.
  *
  * A quadratic all-pairs `levenshtein` join is impossible at 10^8
  * distinct surface forms, so candidates come from DELETION-
  * NEIGHBOURHOOD blocking (the FastSS / SymSpell family, Bocek et al.
  * 2007): index every string under each of its ≤k-character-deletion
  * variants; two strings with ed(a,b) ≤ k ALWAYS share at least one
  * variant (delete from `a` the positions edited in an optimal script,
  * and from `b` the corresponding ones — both reach the same
  * subsequence), so the equi-join on variants is recall-complete and
  * candidates grow with the number of true near-aliases, never
  * quadratically. Each candidate is then verified with the engine's
  * codegen'd `levenshtein` — exactness is anchored by the oracle, which
  * computes the UNBLOCKED quadratic truth (the dd_jaccard pattern:
  * blocked result must equal full-join truth, proving zero recall loss).
  *
  * Scale shape: variant generation is in-row (higher-order array
  * expressions, no UDF, no shuffle) emitting O(L²) short keys per name;
  * the join shuffles (variant, name) pairs — bytes ∝ names·L², not
  * names². Hot keys are the very short variants of very short names
  * (the "" variant of 1–2-char strings); real gazetteers bound surface-
  * form length from below, and the SimHash sub-pigeonhole guard
  * (`dedup/Dedup.scala`) applies verbatim if a corpus ships degenerate
  * 1-char aliases. Verification is ∝ candidates.
  */
object FuzzyNames {

  /** s with the i-th character removed (1-based). */
  private def del(s: Column, i: Column): Column =
    concat(s.substr(lit(1), i - 1), s.substr(i + 1, length(s)))

  /** All strings reachable from `s` by deleting ≤ k characters
    * (k ∈ {1, 2}), `s` itself included, deduplicated — one in-row
    * array expression, no UDF.
    */
  def deletionVariants(s: Column, k: Int): Column = {
    require(k == 1 || k == 2, s"k=$k unsupported (FastSS depth 1 or 2)")
    val v1 = transform(sequence(lit(1), length(s)), i => del(s, i))
    val base = concat(array(s), v1)
    val all = if (k == 1) base else {
      val v2 = flatten(transform(sequence(lit(1), length(s)), i =>
        transform(sequence(lit(1), greatest(length(s) - 1, lit(1))),
          j => del(del(s, i), j))))
      concat(base, v2)
    }
    // empty-string guard: sequence(1, 0) is DESCENDING [1, 0] in Spark,
    // so filter the phantom variants a 0-length input would emit
    array_distinct(when(length(s) === 0, array(s)).otherwise(all))
  }

  /** All unordered pairs (a < b) of distinct `name`s with
    * levenshtein(a, b) ≤ k, plus the distance. Input: one string
    * column `name`; output (a, b, dist) with dist as long.
    */
  def fuzzyPairs(names: DataFrame, k: Int = 2): DataFrame = {
    val n = names.select(col("name")).distinct()
    val inv = n.select(col("name"),
        explode(deletionVariants(col("name"), k)).as("v"))
      .localCheckpoint()
    val cand = inv.alias("x").join(inv.alias("y"),
        col("x.v") === col("y.v") && col("x.name") < col("y.name"))
      .select(col("x.name").as("a"), col("y.name").as("b"))
      .distinct()
    cand
      .withColumn("dist", levenshtein(col("a"), col("b")).cast("long"))
      .filter(col("dist") <= k)
  }
}
