package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D Pareto frontier (skyline) — maximize one integer measure,
  * minimize the other. Dominance: y dominates x iff
  * `y.hi >= x.hi ∧ y.lo <= x.lo` with at least one strict; the skyline
  * is every non-dominated row (duplicates on both coordinates are
  * mutually non-dominating and BOTH survive).
  *
  * Scale shape — the naive formulations both fail at 100 TB: the
  * NOT-EXISTS self-join is quadratic, and a single global window sort
  * funnels the corpus through one partition. This is the textbook
  * grid-pruned two-phase plan instead:
  *
  *  1. PRUNE: bucket `hi` by a power-of-two shift, aggregate
  *     `min(lo)` per bucket (ONE map-side-combined hash agg, output =
  *     bucket-scale), prefix-min the buckets driver-side from the top
  *     (bucket-scale collect — sanctioned), and broadcast the exclusive
  *     prefix back as an in-row lookup. A row whose `lo` is ≥ the min
  *     `lo` of any STRICTLY higher bucket is dominated (higher bucket ⇒
  *     strictly higher `hi`), so the filter is sound and every true
  *     skyline row survives it.
  *  2. EXACT: the survivor set (⊇ skyline, ∝ skyline + the top
  *     bucket's residents for well-spread `hi`) goes through the exact
  *     window test — running `min(lo)` over strictly-higher `hi` rows
  *     (integer RANGE frame ending at −1 on the descending order) plus
  *     the same-`hi` group min for equal-measure strictness. The global
  *     window is single-partition BY DESIGN: it runs on the pruned
  *     residue, never the corpus. Dominance is transitive, so testing
  *     survivors only against survivors is exact — every dominated
  *     survivor has a SKYLINE dominator, and skyline rows always
  *     survive phase 1.
  *
  * Both coordinates are BIGINT (cents / epoch days), so the RANGE −1
  * bound is exact strictness and both engines agree bit-for-bit.
  */
object Skyline {

  /** Rows of `df` on the (maximize `hi`, minimize `lo`) frontier.
    * `shift`: bucket width = 2^shift in `hi` units; the bucket count —
    * range(hi)/2^shift — must stay driver-collectable (the default 2^20
    * on cent-scale money gives tens of buckets).
    */
  def skyline2d(df: DataFrame, hi: Column, lo: Column,
                shift: Int = 20): DataFrame = {
    val withCoords = df.withColumn("__hi", hi.cast("long"))
      .withColumn("__lo", lo.cast("long"))
      .withColumn("__b", shiftright(col("__hi"), shift))

    // phase 1: per-bucket min(lo), exclusive prefix-min from the top
    val buckets = withCoords.groupBy(col("__b"))
      .agg(min(col("__lo")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .sortBy(-_._1)
    val prefix = scala.collection.mutable.Map.empty[Long, Long]
    var best = Long.MaxValue
    for ((b, m) <- buckets) { prefix(b) = best; best = math.min(best, m) }
    val prunedAbove = typedLit(prefix.toMap)
    val survivors = withCoords
      .filter(col("__lo") < coalesce(element_at(prunedAbove, col("__b")),
        lit(Long.MaxValue)))

    // phase 2: exact window test over the pruned residue
    val wStrict = Window.orderBy(col("__hi").desc)
      .rangeBetween(Window.unboundedPreceding, -1)
    val wSame = Window.partitionBy(col("__hi"))
    survivors
      .withColumn("__minStrict", min(col("__lo")).over(wStrict))
      .withColumn("__minSame", min(col("__lo")).over(wSame))
      .filter(!(coalesce(col("__minStrict") <= col("__lo"), lit(false)) ||
        col("__minSame") < col("__lo")))
      .drop("__b", "__minStrict", "__minSame", "__hi", "__lo")
  }
}
