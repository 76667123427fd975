package graft.mix

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

/** Sequence packing — the "concat and chunk" step that turns a curated
  * corpus into fixed-length training sequences (GPT-style: documents
  * are concatenated in a deterministic order and the token stream is
  * cut every `seqLen` tokens, so a document may straddle a sequence
  * boundary).
  *
  * Packing is per SHARD (default: the `source` column), matching how
  * real pipelines shard the corpus so packing parallelizes: a global
  * total order over 10^12 documents would funnel the whole corpus
  * through one window partition, while per-shard windows give Spark
  * one exchange on the shard key and then a linear in-partition scan.
  * Within a shard the order is `doc_id` — unique, so the cumulative
  * sum (and therefore every sequence assignment) is deterministic and
  * partitioning-invariant.
  *
  * All arithmetic is integer (`div` / `pmod` on longs, never double
  * division) so assignments are exact at any corpus size and replay
  * bit-identically in the DuckDB oracle (`//` and `%`).
  */
object Pack {

  /** Per-document packing assignment: for each doc with ≥1 token,
    * (doc_id, shard, n_tok, seq_first, seq_last, offset) where
    * `seq_first`/`seq_last` are the 0-based indices of the training
    * sequences the doc's first/last token land in, and `offset` is the
    * position of the first token within `seq_first`. Zero-token docs
    * contribute nothing to the stream and are dropped.
    */
  def pack(docs: DataFrame, seqLen: Int, shardCol: String = "source",
           textCol: String = "text"): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive: $seqLen")
    val w = Window.partitionBy(col(shardCol)).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("n_tok", TextAnalysis.tokenCount(col(textCol)))
      .filter(col("n_tok") > 0)
      .withColumn("cum", sum(col("n_tok")).over(w))
      .select(
        col("doc_id"),
        col(shardCol).as("shard"),
        col("n_tok"),
        expr(s"(cum - n_tok) div ${seqLen}L").as("seq_first"),
        expr(s"(cum - 1) div ${seqLen}L").as("seq_last"),
        pmod(col("cum") - col("n_tok"), lit(seqLen.toLong)).as("offset"))
  }

  /** Per-sequence fill stats: how many docs start in each sequence and
    * how many tokens it holds (the last sequence of a shard may be
    * short — real pipelines pad or drop it; we report it honestly).
    *
    * Shape: each doc explodes into the sequences it SPANS — the array
    * is bounded by ceil(n_tok/seqLen)+1 per doc, never a shard-wide
    * range — and one map-side-combinable agg folds the splits. A
    * per-shard `sequence(0, last_seq)` would materialize a billion-slot
    * array on one row at 10^12-token shards; this never does. The doc's
    * running total is reconstructed from its own assignment
    * (cum = seq_first·L + offset + n_tok), so stats need only [[pack]]'s
    * public output.
    */
  def sequenceStats(packed: DataFrame, seqLen: Int): DataFrame = {
    val L = lit(seqLen.toLong)
    packed
      .withColumn("cum", col("seq_first") * L + col("offset") + col("n_tok"))
      .withColumn("seq", explode(sequence(col("seq_first"), col("seq_last"))))
      .withColumn("tok_in_seq",
        least((col("seq") + 1) * L, col("cum")) -
          greatest(col("seq") * L, col("cum") - col("n_tok")))
      .groupBy(col("shard"), col("seq"))
      .agg(sum(when(col("seq") === col("seq_first"), 1L).otherwise(0L))
          .as("n_docs_starting"),
        sum(col("tok_in_seq")).as("n_tokens"))
  }

}
