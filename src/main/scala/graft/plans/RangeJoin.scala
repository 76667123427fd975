package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join: probe rows matched to interval rows with
  * `start <= ts <= end`, WITHOUT the cartesian-product-then-filter plan
  * Spark's optimizer produces for a bare inequality join (BNLJ — the
  * classic corpus-scale killer for temporal containment queries).
  *
  * Strategy — composition first (brief's preference order (a)): bucketize
  * time into fixed-width buckets. Each probe row lands in exactly ONE
  * bucket (`floor(epoch/width)`); each interval row is exploded across
  * every bucket its `[start, end]` span covers (`sequence` of bucket ids
  * — monotone floor, so the probe's bucket is always among them). An
  * EQUI-join on the bucket id then admits only time-local pairs, and the
  * exact `BETWEEN` filter runs on the original microsecond timestamps.
  * Because a probe has one bucket, a qualifying (probe, interval) pair
  * meets exactly once — no post-join dedup, no double counting.
  *
  * Scale shape: shuffle is two hash exchanges on the bucket id (narrow
  * rows — AQE can broadcast a small interval side instead); join work is
  * Σ_b |probe_b|·|intervals_b|, i.e. proportional to TIME-LOCAL density,
  * not |probe|·|intervals|. `bucketSeconds` tunes the trade: buckets
  * wide relative to typical interval length keep the per-interval
  * explosion factor at ~2–3 rows, while the equi-key still prunes
  * everything not overlapping in time. Skewed hot buckets (load spikes)
  * are ordinary equi-join skew — AQE's skew-join split applies, unlike
  * a BNLJ which AQE cannot touch.
  *
  * An optional `keys` list adds equi-columns (e.g. user_id) to the join
  * key, for keyed containment joins.
  */
object RangeJoinApi {

  /** @param probe     rows carrying a point timestamp `tsCol`
    * @param intervals rows carrying `[startCol, endCol]` (inclusive)
    * @param keys      extra equi-join columns present on both sides
    * @param bucketSeconds bucket width; intervals explode into
    *                  `len/width + 1` rows — pick it near the typical
    *                  interval length
    */
  def intervalJoin(probe: DataFrame, intervals: DataFrame,
                   tsCol: String, startCol: String, endCol: String,
                   keys: Seq[String] = Nil,
                   bucketSeconds: Long = 3600L): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    def bkt(c: Column): Column =
      floor(unix_timestamp(c).cast("double") / bucketSeconds).cast("long")
    val p = probe.withColumn("__bkt", bkt(col(tsCol)))
    val iv = intervals
      .withColumn("__bkt",
        explode(sequence(bkt(col(startCol)), bkt(col(endCol)))))
    p.join(iv, Seq("__bkt") ++ keys)
      .filter(col(tsCol).between(col(startCol), col(endCol)))
      .drop("__bkt")
  }
}
