package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 ranked retrieval over the corpus — the relevance scorer a
  * training-data pipeline uses for targeted curation (pull documents
  * matching a topic query, score quality-weighted mixtures) and the
  * standard lexical baseline next to the embedding ANN tier
  * ([[graft.ann.Similarity]]).
  *
  * Scoring is Robertson/Zaragoza BM25 with the Lucene non-negative idf:
  *   idf(t)  = ln(1 + (N - df + 0.5)/(df + 0.5))
  *   s(d,t)  = idf(t) · tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))
  * with k1 = 1.2, b = 0.75. The engine evaluates it in EXACT integer
  * arithmetic so the ranking replays bit-for-bit in the DuckDB oracle
  * (`txt_bm25`): with L = Σ dl and N = doc count, avgdl = L/N exactly,
  * and multiplying the tf fraction through by 10·L gives
  *   s_micro(d,t) = idf_micro(t) · 22·tf·L  //  (10·tf·L + 3·L + 9·dl·N)
  * — all BIGINT products of exact counts (22/10 = k1+1, 3/10 = k1(1-b),
  * 9/10 = k1·b), floor division on positives. The single float step,
  * idf_micro = round(idf · 10^6), is one libm ln over integer-derived
  * doubles — the `txt_perplexity` micro-nat quantization convention
  * (identical IEEE inputs on both engines, collisions at the rounding
  * boundary need ~1e-16 relative alignment).
  *
  * Plan shape at 100 TB: the query-term filter prunes the token explode
  * BEFORE any shuffle (tf rows ∝ matching docs × |q|, never corpus
  * tokens); df and the (N, L) scalars are one map-side-combined
  * aggregation each; the scalar pair joins back by broadcast; the final
  * top-k is an ordered LIMIT — TakeOrderedAndProject, per-partition
  * bounded heaps, no global sort materialization.
  */
object Bm25 {

  /** Integer micro-idf: round(ln(1 + (N-df+0.5)/(df+0.5)) · 1e6). */
  def idfMicro(n: Column, df: Column): Column =
    round(log(lit(1.0) + (n.cast("double") - df + lit(0.5)) /
      (df + lit(0.5))) * 1e6).cast("long")

  /** Top-k documents for `queryTerms` by summed integer BM25.
    * Output: (doc_id, n_terms = matched query terms, score_micro).
    */
  def topk(docs: DataFrame, queryTerms: Seq[String], k: Int,
           textCol: String = "text"): DataFrame = {
    val toks = docs.select(col("doc_id"),
      filter(split(col(textCol), " "), t => t =!= "").as("w"))
    val dls = toks.select(col("doc_id"), size(col("w")).cast("long").as("dl"))
    // one row: exact corpus scalars (N docs, L total tokens)
    val scalars = dls.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("total_len"))
    // term frequencies for query terms only — the IN-list prunes the
    // exploded tokens before the (doc, term) aggregation
    val tf = toks
      .select(col("doc_id"), explode(col("w")).as("t"))
      .filter(col("t").isin(queryTerms: _*))
      .groupBy("doc_id", "t")
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("t").agg(count(lit(1)).as("df"))
    val scored = tf
      .join(broadcast(df), "t")
      .join(dls, "doc_id")
      .crossJoin(broadcast(scalars))
      .select(col("doc_id"),
        (idfMicro(col("n_docs"), col("df")) * 22L * col("tf") * col("total_len"))
          .as("num"),
        (lit(10L) * col("tf") * col("total_len") + lit(3L) * col("total_len")
          + lit(9L) * col("dl") * col("n_docs")).as("den"))
      .select(col("doc_id"), expr("num div den").as("s"))
    scored.groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"), sum(col("s")).as("score_micro"))
      .orderBy(col("score_micro").desc, col("doc_id"))
      .limit(k)
  }
}
