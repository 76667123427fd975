package graft.extract

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Open-IE-style surface-relation mining: every `entity TOKEN entity`
  * window in the corpus proposes a candidate triple whose PREDICATE is
  * the literal middle token, aggregated by corpus support. This is the
  * step that grows the predicate vocabulary BEYOND the fixed
  * `mentions` / `coOccursWith` relations the gazetteer front end emits
  * — the reference converter's relationship inference (usage-derived
  * relations, `src/core/services/ontology/extractor.py` J3/J4) works
  * from schema usage; at web scale the analogous signal is lexical
  * co-location, mined here in the ReVerb/PATTY spirit (pattern-based
  * open relation extraction) reduced to its deterministic core.
  *
  * Plan shape (the fused co-occurrence story, `MentionScan`): windows
  * are enumerated IN-ROW by one higher-order transform+filter over the
  * token array — a document's candidate windows never leave the task
  * that scanned it — and the only shuffles are the (s, pred, o)-keyed
  * count (map-side combined, domain ≤ |gaz|²·|vocab|) and the distinct
  * doc count. Nothing doc-keyed, nothing ∝ corpus text. Entity
  * membership probes a broadcast-literal sorted array via
  * `array_contains` (|gaz| is dictionary-scale by construction).
  */
object RelationMiner {

  /** Candidate triples (s, pred, o, support, n_docs) from windows
    * `s pred o` of three consecutive tokens where s and o are distinct
    * gazetteer entities; kept when total occurrence support ≥
    * `minSupport`. Deterministic: pure integer counts over exact token
    * positions, bit-exact in the DuckDB oracle's positional replay.
    */
  /** One (doc_id, s, pred, o) row per qualifying window — the flat form
    * shared by the batch aggregate and the streaming update-mode tier.
    * Works unchanged on a streaming DataFrame (pure projections).
    */
  private[graft] def windowRows(docs: DataFrame,
      entities: Seq[String]): DataFrame = {
    val ents = typedLit(entities.sorted(graft.model.CodePoint.ordering))
    // materialize the token array ONCE per row before the higher-order
    // window enumeration: lambdas block common-subexpression
    // elimination, so an inline split(text) would re-tokenize the whole
    // document for EVERY element_at — O(tokens²) character work per doc
    val t = col("t")
    val n = size(t)
    // windows start at 1-based i, need t[i], t[i+1], t[i+2]
    val idx = when(n >= 3, sequence(lit(1), n - 2))
      .otherwise(array().cast("array<int>"))
    val wins = filter(
      transform(idx, i => struct(
        element_at(t, i).as("s"),
        element_at(t, i + 1).as("pred"),
        element_at(t, i + 2).as("o"))),
      w => array_contains(ents, w.getField("s")) &&
        array_contains(ents, w.getField("o")) &&
        w.getField("s") =!= w.getField("o"))
    docs.select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(col("doc_id"), explode(wins).as("w"))
      .select(col("doc_id"), col("w.s").as("s"), col("w.pred").as("pred"),
        col("w.o").as("o"))
  }

  def windowTriples(docs: DataFrame, entities: Seq[String],
      minSupport: Long = 2L): DataFrame =
    windowRows(docs, entities)
      .groupBy("s", "pred", "o")
      .agg(count(lit(1)).as("support"),
        countDistinct(col("doc_id")).as("n_docs"))
      .filter(col("support") >= minSupport)
}
