package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming exact deduplication — the incremental form of the batch tier
  * (`Dedup.exact`, which keeps the smallest doc_id per text): the first
  * document to arrive with a given content hash passes, later identical
  * texts are dropped. With a source delivered in doc_id order the two are
  * equivalent (batch≡stream ScalaTested in DedupStreamSpec).
  *
  * Scale shape: state is one boolean per DISTINCT text keyed by
  * sha2(text) — the same cardinality the batch shuffle carries, spread
  * across executors by the groupByKey hash. The text itself never enters
  * state. A production deployment bounds state in time with a
  * GroupStateTimeout TTL; corpus-global curation semantics keep NoTimeout
  * here.
  */
object DedupStream {

  final case class DocOut(doc_id: Long, lang: String, source: String)

  def firstArrivals(docs: DataFrame): Dataset[DocOut] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(sha2(col("text"), 256).as("h"), col("doc_id"),
        col("lang"), col("source"))
      .as[(String, Long, String, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[(String, Long, String, String)],
         state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            // within one micro-batch the smallest doc_id is the first
            // arrival, matching the batch keep-min rule
            val first = rows.minBy(_._2)
            state.update(true)
            Iterator(DocOut(first._2, first._3, first._4))
          }
      }
  }
}
