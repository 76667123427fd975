package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

/** Streaming open-IE relation mining — the ingestion form of
  * [[graft.extract.RelationMiner]]: window enumeration is a pure
  * per-row projection (the SAME `windowRows` expression the batch tier
  * compiles), so the streaming build is the batch aggregation run in
  * update mode. State = one integer counter per distinct (s, pred, o)
  * — bounded by the predicate-vocabulary size (≤ |gaz|²·|middle
  * vocabulary|), not the stream length — and stream-of-batches ≡ one
  * batch by the commutativity of the count (RelationStreamSpec). The
  * min-support gate applies at READ time: running totals only grow, so
  * filtering inside the stream would emit a triple and never retract
  * it if the threshold later rose.
  *
  * `n_docs` is deliberately absent here: COUNT(DISTINCT) needs
  * unbounded per-group doc sets in streaming state; corpora needing it
  * run the batch tier (the standard lambda split, as NearDupStream
  * documents for its backfill).
  */
object RelationStream {

  /** Update-mode running support per (s, pred, o). */
  def support(docs: DataFrame, entities: Seq[String]): DataFrame =
    graft.extract.RelationMiner.windowRows(docs, entities)
      .groupBy("s", "pred", "o")
      .agg(count(lit(1)).as("support"))

  /** Convenience: memory-sink update-mode query. */
  def startMemorySink(docs: DataFrame, entities: Seq[String],
      name: String): StreamingQuery =
    support(docs, entities).writeStream
      .format("memory")
      .queryName(name)
      .outputMode(OutputMode.Update)
      .start()
}
