package graft.mix

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Per-domain document cap — the RefinedWeb/C4-style "no domain may
  * contribute more than N documents" curation stage (the reference's
  * capacity caps — 500 entity types, 200 props/entity,
  * `/root/reference/src/constants.py:154-203` — are the same shape:
  * bounded contribution per group, deterministic survivor choice).
  *
  * Keeps the top `n` documents per domain by (n_chars DESC, doc_id ASC)
  * — a fully replayable ordering (ties impossible: doc_id is unique).
  *
  * Scale shape — why this is NOT a window function: `row_number().over(
  * Window.partitionBy(domain))` shuffles EVERY corpus row to the
  * domain's reducer; one hot domain (half the crawl) lands on one task
  * (the exact-dedup text-shuffle lesson, round-4 verdict #1, applied at
  * the domain key where skew is the NORM — web crawls are Zipfian by
  * host). Instead a typed Aggregator with a BOUNDED buffer runs
  * map-side: each map task keeps ≤ n (key, id) pairs per domain it
  * sees, so the exchange carries ≤ tasks × domains × n 16-byte pairs —
  * independent of corpus size, immune to domain skew. Survivor rows
  * are then recovered by a semi-join on doc_id (shuffle-free over a
  * doc_id-bucketed layout, per BucketingSpec).
  */
object DomainCap {

  final case class DocKey(n_chars: Long, doc_id: Long)
  final case class TopBuf(items: Seq[DocKey])

  /** (n_chars DESC, doc_id ASC) — "better" sorts first. */
  private def better(a: DocKey, b: DocKey): Boolean =
    a.n_chars > b.n_chars || (a.n_chars == b.n_chars && a.doc_id < b.doc_id)

  /** Bounded top-n typed Aggregator: buffer is a sorted Seq capped at n,
    * so partial (map-side) aggregation state is O(n) per domain per
    * task and merge is a bounded sorted merge — associative and
    * commutative (MergeLawSpec-style property in DomainCapSpec).
    */
  final class TopN(n: Int)
      extends Aggregator[DocKey, TopBuf, Seq[DocKey]] {
    require(n >= 1, "cap must be >= 1")
    override def zero: TopBuf = TopBuf(Nil)
    override def reduce(b: TopBuf, a: DocKey): TopBuf =
      merge(b, TopBuf(Seq(a)))
    override def merge(x: TopBuf, y: TopBuf): TopBuf = {
      val out = scala.collection.mutable.ArrayBuffer[DocKey]()
      var (i, j) = (0, 0)
      val (xs, ys) = (x.items, y.items)
      while (out.length < n && (i < xs.length || j < ys.length)) {
        if (j >= ys.length || (i < xs.length && better(xs(i), ys(j)))) {
          out += xs(i); i += 1
        } else { out += ys(j); j += 1 }
      }
      TopBuf(out.toSeq)
    }
    override def finish(r: TopBuf): Seq[DocKey] = r.items
    override def bufferEncoder: Encoder[TopBuf] = Encoders.product[TopBuf]
    override def outputEncoder: Encoder[Seq[DocKey]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[DocKey]]()
  }

  /** Survivor keys per domain: (source, doc_id, n_chars, rk) with
    * rk = 1-based rank in the domain's kept set. Input needs columns
    * (source, doc_id, n_chars) — only those three are read, so column
    * pruning keeps text out of the scan entirely.
    */
  def capKeys(docs: DataFrame, n: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val topn = new TopN(n).toColumn
    docs.select(col("source"), col("n_chars"), col("doc_id"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .mapValues { case (_, nc, id) => DocKey(nc, id) }
      .agg(topn.name("kept"))
      .flatMap { case (src, kept) =>
        kept.iterator.zipWithIndex.map { case (k, i) =>
          (src, k.doc_id, k.n_chars, (i + 1).toLong)
        }
      }
      .toDF("source", "doc_id", "n_chars", "rk")
  }

  /** Full survivor rows: semi-join of the corpus on the capped key set
    * (broadcast — the key set is ≤ |domains| × n).
    */
  def cap(docs: DataFrame, n: Int): DataFrame =
    docs.join(broadcast(capKeys(docs, n).select("doc_id")),
      Seq("doc_id"), "left_semi")
}
