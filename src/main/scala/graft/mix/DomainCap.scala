package graft.mix

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

/** Per-domain document cap — the RefinedWeb/C4-style "no host may
  * contribute more than N documents" curation stage (the reference's
  * capacity caps — 500 entity types, 200 props/entity,
  * `/root/reference/src/constants.py:154-203` — are the same shape:
  * bounded contribution per group, deterministic survivor choice).
  *
  * Keeps the top `n` documents per domain by (n_chars DESC, doc_id ASC)
  * — a fully replayable ordering (ties impossible: doc_id is unique).
  *
  * Scale shape, measured not guessed (StressBench `domcap`, 1 M docs,
  * one domain holding 50%): the production path is a window
  * `row_number() <= n` over the THREE KEY COLUMNS ONLY — Spark 4's
  * WindowGroupLimit rule pushes the rank filter below the exchange
  * (per-task per-domain bounded state, so the Zipf-hot host is
  * pre-truncated map-side to ≤ n rows per task), and the exchange
  * carries 24-byte key rows, never text. Survivor rows are recovered
  * by a semi-join on doc_id (broadcast — the kept set is ≤ |domains| ×
  * n; or co-located over a doc_id-bucketed layout, per BucketingSpec).
  * A hand-built bounded typed Aggregator ([[TopN]], kept below) has the
  * same bounded-exchange shape but measured 2.5× slower than the
  * codegen'd window+group-limit at 1 M rows (typed per-row
  * encode/decode tax: 5.1 s vs 2.0 s; full keys+semi-join row recovery
  * 4.6 s) — DomainCapSpec pins BOTH plans so a Spark regression that
  * drops WindowGroupLimit (reverting the window to a full corpus-row
  * shuffle at the domain key) fails the suite. Regime note: group
  * limit prunes only where a task sees > n rows of a domain; with
  * |domains| ≫ rows-per-task nothing prunes and a FULL-ROW window
  * shuffles the whole corpus text — the keys-only formulation bounds
  * that worst case at 24 B × corpus regardless of the domain
  * distribution.
  */
object DomainCap {

  final case class DocKey(n_chars: Long, doc_id: Long)
  final case class TopBuf(items: Seq[DocKey])

  /** (n_chars DESC, doc_id ASC) — "better" sorts first. */
  private def better(a: DocKey, b: DocKey): Boolean =
    a.n_chars > b.n_chars || (a.n_chars == b.n_chars && a.doc_id < b.doc_id)

  /** Survivor keys per domain: (source, doc_id, n_chars, rk) with
    * rk = 1-based rank in the domain's kept set. Keys-only window —
    * the scan is pruned to three columns, WindowGroupLimit bounds the
    * map side, the exchange never carries text.
    */
  def capKeys(docs: DataFrame, n: Int): DataFrame = {
    require(n >= 1, "cap must be >= 1")
    val w = Window.partitionBy("source")
      .orderBy(col("n_chars").desc, col("doc_id"))
    docs.select(col("source"), col("n_chars"), col("doc_id"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= n)
      .select("source", "doc_id", "n_chars", "rk")
  }

  /** Full survivor rows: semi-join of the corpus on the capped key set
    * (broadcast — the key set is ≤ |domains| × n).
    */
  def cap(docs: DataFrame, n: Int): DataFrame =
    docs.join(broadcast(capKeys(docs, n).select("doc_id")),
      Seq("doc_id"), "left_semi")

  /** Bounded top-n typed Aggregator: buffer is a sorted Seq capped at n,
    * so partial (map-side) aggregation state is O(n) per domain per
    * task and merge is a bounded sorted merge — associative and
    * commutative (property-tested). Same bounded-exchange shape as the
    * window+WindowGroupLimit plan; kept as the measured alternative
    * (and for engines/settings without the group-limit rewrite).
    */
  final class TopN(n: Int)
      extends Aggregator[DocKey, TopBuf, Seq[DocKey]] {
    require(n >= 1, "cap must be >= 1")
    override def zero: TopBuf = TopBuf(Nil)
    override def reduce(b: TopBuf, a: DocKey): TopBuf =
      // fast path: once the buffer is saturated, a row not beating the
      // current floor is O(1) — the common case after the first n rows
      // of each domain, so per-row cost is amortized constant
      if (b.items.length >= n && !better(a, b.items.last)) b
      else merge(b, TopBuf(Seq(a)))
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

  /** [[capKeys]] via the bounded [[TopN]] Aggregator — identical output
    * (DomainCapSpec), ObjectHashAggregate with partial merge instead of
    * the window; ~3× slower at 1 M rows (StressBench `domcap`).
    */
  def capKeysAgg(docs: DataFrame, n: Int): DataFrame = {
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
}
