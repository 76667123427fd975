package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Log-bucketed quantile sketch (HdrHistogram-style exponential
  * histogram; Tene's public HdrHistogram formulation) — deterministic
  * quantile estimation over corpus-scale positive integers where an
  * exact quantile would need a full sort of the corpus.
  *
  * Every value v ≥ 1 maps to a bucket keyed by its binary magnitude
  * plus `SubBits` mantissa bits:
  *
  *   msb(v)    = length(bin(v)) - 1           -- integer, no floating log
  *   bucket(v) = v                              if v < 2^(SubBits+1)
  *             = msb·2^SubBits + ((v >> (msb-SubBits)) & (2^SubBits - 1))
  *
  * which guarantees relative error ≤ 2^-SubBits (6.25% at SubBits=4)
  * and a bucket count bounded by 64·2^SubBits = 1024 REGARDLESS of
  * corpus size — the whole histogram always fits one partition / the
  * driver / an executor's L2. `bin()` (binary string of a BIGINT)
  * exists verbatim in both Spark and DuckDB, so the bucket function —
  * and therefore the entire sketch and every quantile read off it — is
  * bit-exact replayable in the oracle; a sampling or KLL sketch could
  * never be driver-oracled this way.
  *
  * Plan shape: ONE map-side-combined groupBy(bucket) over the corpus
  * (shuffle rows = live buckets ≤ 1024 per map task, 16 bytes each),
  * then cumulative counts via an unpartitioned window — safe ONLY
  * because the histogram is bounded by construction (never do this on
  * unbounded data). Merging shards/streams = summing bucket counts:
  * the sketch is a commutative monoid, so it is partitioning- and
  * order-invariant by construction.
  */
object QuantileHist {

  val SubBits = 4
  private val SubSize = 1 << SubBits        // 16 sub-buckets per octave
  private val Linear = 1L << (SubBits + 1)  // below this, v IS its bucket

  /** Bucket index of a positive integer column (see object doc).
    * shiftright/shiftleft with a COLUMN shift amount go through
    * call_function (the Scala helpers only take literal shifts); both
    * are plain codegen'd expressions.
    */
  def bucket(v: Column): Column = {
    val msb = (length(bin(v)) - 1).cast("long")
    val sub = call_function("shiftright", v,
      (msb - SubBits).cast("int")) % SubSize
    when(v < Linear, v).otherwise(msb * SubSize + sub)
  }

  /** Inclusive value bounds [lo, hi] of a bucket index. */
  def bounds(b: Column): (Column, Column) = {
    val msb = (b / SubSize).cast("long")
    val rem = b % SubSize
    val width = call_function("shiftleft", lit(1L),
      (msb - SubBits).cast("int"))
    val lo = when(b < Linear, b).otherwise(
      call_function("shiftleft", lit(1L), msb.cast("int")) + rem * width)
    val hi = when(b < Linear, b).otherwise(lo + width - 1)
    (lo, hi)
  }

  /** The sketch: (bucket, cnt) histogram of a positive-integer column.
    * One aggregation, map-side combined, ≤ 1024 result rows.
    */
  def histogram(values: DataFrame, valueCol: String): DataFrame =
    values.select(bucket(col(valueCol)).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))

  /** Keyed sketch: one ≤1024-bucket histogram per key (per-domain /
    * per-language distribution monitoring — the realistic corpus-audit
    * shape). Still ONE map-side-combined aggregation; result rows ≤
    * |keys| × 1024.
    */
  def histogramBy(values: DataFrame, keyCol: String,
      valueCol: String): DataFrame =
    values.select(col(keyCol), bucket(col(valueCol)).as("bucket"))
      .groupBy(keyCol, "bucket").agg(count(lit(1)).as("cnt"))

  /** Per-key quantiles: the [[quantilesOfHistogram]] read-off with the
    * cumulative window PARTITIONED BY the key — each key's walk is over
    * its own ≤1024 buckets, so the window never concentrates more than
    * a bounded histogram on one task (unlike the global variant's
    * deliberate single-partition walk).
    */
  def quantilesByKey(values: DataFrame, keyCol: String,
      valueCol: String, qs: Seq[Int]): DataFrame = {
    val hist = histogramBy(values, keyCol, valueCol)
    val wCum = Window.partitionBy(keyCol).orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(keyCol)
    val cum = hist
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("total", sum(col("cnt")).over(wAll))
    val qarr = typedLit(qs.sorted)
    val covered = cum.withColumn("q", explode(filter(qarr, q =>
      (col("cum") - col("cnt")) * 100 < q * col("total") &&
        q * col("total") <= col("cum") * 100)))
    val (lo, hi) = bounds(col("bucket"))
    covered.select(col(keyCol), col("q"), col("bucket"),
      lo.as("lo"), hi.as("hi"))
  }

  /** Quantile estimates at integer percentiles `qs` (e.g. 50, 90, 99):
    * for each q, the first bucket whose cumulative count reaches
    * ceil(q·total/100), reported with its exact value bounds. All
    * comparisons in cross-multiplied integer arithmetic — no floating
    * point anywhere, so the result replays bit-exactly.
    */
  def quantiles(values: DataFrame, valueCol: String,
      qs: Seq[Int]): DataFrame =
    quantilesOfHistogram(histogram(values, valueCol), qs)

  /** Quantile read-off from an ALREADY-BUILT (bucket, cnt) histogram —
    * callers holding a materialized or merged sketch (streaming sink,
    * shard union) read quantiles without re-scanning the corpus.
    */
  def quantilesOfHistogram(hist: DataFrame, qs: Seq[Int]): DataFrame = {
    // bounded-histogram windows (≤1024 rows; see object doc)
    val wCum = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy()
    val cum = hist
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("total", sum(col("cnt")).over(wAll))
    val qarr = typedLit(qs.sorted)
    val covered = cum.withColumn("q", explode(filter(qarr, q =>
      (col("cum") - col("cnt")) * 100 < q * col("total") &&
        q * col("total") <= col("cum") * 100)))
    val (lo, hi) = bounds(col("bucket"))
    covered.select(col("q"), col("bucket"), lo.as("lo"), hi.as("hi"))
  }
}
