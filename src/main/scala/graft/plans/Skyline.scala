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
  *  2. LOCAL SKYLINE: the grid alone leaves the TOP bucket intact (no
  *     higher bucket prunes it), so its residue is corpus/buckets-
  *     proportional — StressBench's skyline section caught exactly
  *     this (survivors 2 137 → 21 370 at 10×, before this pass). Each
  *     partition therefore sorts ITS OWN residue (`sortWithinPartitions`
  *     — CPU only, zero shuffle) and streams the exact per-partition
  *     skyline with two running minima; output ∝ Σ partition frontiers.
  *     Dominance is transitive, so dropping locally-dominated rows
  *     never loses a global skyline row.
  *  3. EXACT: the surviving residue goes through the exact window test
  *     — running `min(lo)` over strictly-higher `hi` rows (integer
  *     RANGE frame ending at −1 on the descending order) plus the
  *     same-`hi` group min for equal-measure strictness. The global
  *     window is single-partition BY DESIGN: it runs on the pruned
  *     residue, never the corpus. Testing survivors only against
  *     survivors is exact — every dominated survivor has a SKYLINE
  *     dominator, and skyline rows survive both prior phases.
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
    val survivors = pruneSurvivors(df, hi, lo, shift)

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

  /** Phase 1 alone (the sound grid prune) — exposed so StressBench can
    * machine-check the residue law: survivors ⊇ skyline and
    * |survivors| ≪ |corpus| as the corpus grows.
    */
  private[graft] def pruneSurvivors(df: DataFrame, hi: Column, lo: Column,
                                    shift: Int): DataFrame = {
    val withCoords = df.withColumn("__hi", hi.cast("long"))
      .withColumn("__lo", lo.cast("long"))
      .withColumn("__b", shiftright(col("__hi"), shift))

    // per-bucket min(lo), exclusive prefix-min from the top
    val buckets = withCoords.groupBy(col("__b"))
      .agg(min(col("__lo")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .sortBy(-_._1)
    val prefix = scala.collection.mutable.Map.empty[Long, Long]
    var best = Long.MaxValue
    for ((b, m) <- buckets) { prefix(b) = best; best = math.min(best, m) }
    val prunedAbove = typedLit(prefix.toMap)
    val grid = withCoords
      .filter(col("__lo") < coalesce(element_at(prunedAbove, col("__b")),
        lit(Long.MaxValue)))
    localSkyline(grid)
  }

  /** Exact per-partition skyline of the grid residue: sort each
    * partition by (hi DESC, lo ASC) — no exchange — and stream-filter
    * with two running minima (strictly-higher-hi min and same-hi min,
    * mirroring phase 3's window semantics). Coordinates must be
    * non-null (the grid filter upstream already drops null lo).
    */
  private def localSkyline(grid: DataFrame): DataFrame = {
    val schema = grid.schema
    val hiIdx = schema.fieldIndex("__hi")
    val loIdx = schema.fieldIndex("__lo")
    grid.sortWithinPartitions(col("__hi").desc, col("__lo"))
      .mapPartitions { it =>
        var minStrict = Long.MaxValue
        var curHi = Long.MinValue
        var minSame = Long.MaxValue
        var first = true
        it.flatMap { r =>
          val hi = r.getLong(hiIdx); val lo = r.getLong(loIdx)
          if (first || hi != curHi) {
            if (!first) minStrict = math.min(minStrict, minSame)
            curHi = hi; minSame = Long.MaxValue; first = false
          }
          val dominated = (minStrict != Long.MaxValue && minStrict <= lo) ||
            minSame < lo
          if (lo < minSame) minSame = lo
          if (dominated) None else Some(r)
        }
      }(org.apache.spark.sql.Encoders.row(schema))
  }
}
