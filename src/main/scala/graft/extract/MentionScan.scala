package graft.extract

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Mention detection + entity-link scoring over the page table (north
  * star: gazetteer mentions with TF-IDF/context-window scoring, emitting
  * candidate (subj, pred, obj) triples).
  *
  * Plan shape at scale:
  *  1. `mapPartitions` scan: broadcast trie, one pass per document →
  *     flat mention rows `(doc_id, entity, tf)` — no shuffle;
  *  2. document frequency: one hash-agg on `entity` (tiny, dictionary
  *     cardinality) → broadcast back;
  *  3. score = tf · ln(N/df) as a Column expression;
  *  4. triples via `select`s/unions — everything downstream of the
  *     opaque scan stays relational so Catalyst can optimize it.
  */
object MentionScan {

  /** (doc_id, entity, tf) — one row per (document, gazetteer entity). */
  def mentions(pages: DataFrame, gazetteer: Gazetteer): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(gazetteer)
    pages.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val trie = bc.value
        it.flatMap { case (docId, text) =>
          trie.countMatches(text).map { case (ent, tf) => (docId, ent, tf.toLong) }
        }
      }
      .toDF("doc_id", "entity", "tf")
  }

  /** TF-IDF link score per mention: `tf * ln(nDocs / df)`. The df side is
    * dictionary-sized → broadcast join.
    */
  def scored(mentionsDf: DataFrame, nDocs: Long): DataFrame = {
    val df = mentionsDf.groupBy("entity").agg(count(lit(1)).as("df"))
    mentionsDf
      .join(broadcast(df), Seq("entity"))
      .withColumn("score", col("tf") * log(lit(nDocs.toDouble) / col("df")))
  }

  /** Candidate triples from scored mentions:
    *  - (page url, mentions, entity) per mention,
    *  - (entity, coOccursWith, entity) for entity pairs co-mentioned in a
    *    document (undirected, emitted with e1 < e2).
    * Predicates use the synthetic namespace `urn:graft:`.
    */
  val MentionsPred = "urn:graft:mentions"
  val CoOccursPred = "urn:graft:coOccursWith"

  def mentionTriples(mentionsDf: DataFrame): DataFrame =
    mentionsDf.select(
      concat(lit("urn:doc:"), col("doc_id")).as("s"),
      lit(MentionsPred).as("p"),
      concat(lit("urn:ent:"), col("entity")).as("o"))

  def coOccurrenceTriples(mentionsDf: DataFrame): DataFrame = {
    val a = mentionsDf.select(col("doc_id"), col("entity").as("e1"))
    val b = mentionsDf.select(col("doc_id"), col("entity").as("e2"))
    a.join(b, Seq("doc_id"))
      .filter(col("e1") < col("e2"))
      .groupBy("e1", "e2").agg(count(lit(1)).as("n_docs"))
      .select(
        concat(lit("urn:ent:"), col("e1")).as("s"),
        lit(CoOccursPred).as("p"),
        concat(lit("urn:ent:"), col("e2")).as("o"),
        col("n_docs"))
  }
}
