package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for multi-column data skipping — the
  * layout lever that makes 100 TB scans with CONJUNCTIVE range
  * predicates cheap: sorting by the bit-interleaved key gives every
  * parquet row group a tight min/max envelope on BOTH dimensions, so
  * pushed filters skip row groups on either column (a single-column
  * sort gives tight stats on that column only; the other column's
  * ranges span the domain and prune nothing).
  *
  * The interleave is the classic branch-free bit-spread (the
  * "Interleave bits by Binary Magic Numbers" construction): five
  * mask-and-shift rounds widen each 32-bit input so its bits occupy the
  * even positions of a 64-bit word, then the two spreads OR together
  * offset by one. All plain shift/AND/OR Column ops — whole-stage
  * codegen'd, no UDF, usable directly in `repartitionByRange` +
  * `sortWithinPartitions` writer pipelines.
  */
object ZOrder {

  /** The 32-bit value x spread so bit i lands at position 2i. */
  def spread(x: Column): Column = {
    var v = x.cast("long").bitwiseAND(lit(0xFFFFFFFFL))
    v = (v.bitwiseOR(shiftleft(v, 16))).bitwiseAND(lit(0x0000FFFF0000FFFFL))
    v = (v.bitwiseOR(shiftleft(v, 8))).bitwiseAND(lit(0x00FF00FF00FF00FFL))
    v = (v.bitwiseOR(shiftleft(v, 4))).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
    v = (v.bitwiseOR(shiftleft(v, 2))).bitwiseAND(lit(0x3333333333333333L))
    v = (v.bitwiseOR(shiftleft(v, 1))).bitwiseAND(lit(0x5555555555555555L))
    v
  }

  /** Morton key of two non-negative 32-bit coordinates: a's bits on the
    * even positions, b's on the odd. The UNSIGNED order of the result is
    * the Z-curve walk of the (a, b) plane; b ≥ 2³¹ puts b's top bit at
    * position 63, so the SIGNED long order would visit the plane's top
    * half first — sort by [[zsort]], which remaps to signed order.
    */
  def zvalue(a: Column, b: Column): Column =
    spread(a).bitwiseOR(shiftleft(spread(b), 1))

  /** [[zvalue]] remapped so SIGNED long comparisons follow the unsigned
    * Z-curve order (flip the sign bit — the standard order-preserving
    * unsigned→signed bijection). Use this as the clustering sort key.
    */
  def zsort(a: Column, b: Column): Column =
    zvalue(a, b).bitwiseXOR(lit(Long.MinValue))

  /** Rewrite `df` into `numFiles` z-clustered files on (a, b): range
    * partitioning by the Morton key makes every output file a compact
    * Z-curve segment (tight min/max on both columns in its parquet
    * footer), sortWithinPartitions tightens per-ROW-GROUP stats inside
    * each file. The shuffle is the one-off layout cost every clustered
    * table pays at write time; reads amortize it forever.
    */
  def cluster(df: DataFrame, a: String, b: String,
              numFiles: Int): DataFrame = {
    val keyed = df.withColumn("__z", zsort(col(a), col(b)))
    keyed
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
