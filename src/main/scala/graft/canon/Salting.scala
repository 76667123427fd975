package graft.canon

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling operators for head entities (north star: "salted
  * broadcast joins and AQE skew-join handling for head entities").
  *
  * AQE's skew-join split handles most cases at runtime; these are the
  * explicit tools for the two shapes AQE can't fix:
  *  - a SHUFFLE AGGREGATION on a hot key (AQE cannot split one reducer
  *    key) → [[twoPhaseCount]];
  *  - a repeated join against a small/canonical map where one key
  *    dominates the probe side (e.g. every page mentions the same head
  *    entity) → [[saltedJoin]], which shards the hot rows across
  *    `salts` reducers by replicating the SMALL side.
  *
  * Salts are deterministic (hash of the whole row via a monotonic id is
  * NOT used — `spark_partition_id`-free, rerun-stable): the salt comes
  * from `xxhash64` of caller-chosen columns, so resumed/replayed runs
  * place rows identically (pipeline checkpoint contract).
  */
object Salting {

  /** Deterministic salt in [0, salts) from the given columns. */
  def saltCol(salts: Int, from: Column*): Column =
    pmod(xxhash64(from: _*), lit(salts.toLong)).cast("int")

  /** Equi-join `big ⋈ small` on `key`, sharding each key across `salts`
    * reducers: big rows get a deterministic salt from `saltFrom`, the
    * small side is replicated once per salt value. Result equals the
    * plain join (tested); the shuffle for any single key is spread over
    * `salts` partitions.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salts: Int, saltFrom: Seq[String]): DataFrame = {
    val salted = big.withColumn("__salt",
      saltCol(salts, saltFrom.map(col): _*))
    val replicated = small.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Hot-key-proof count: partial count per (key, salt) then final sum
    * per key — two small shuffles instead of one with a single giant
    * reducer key. Equivalent to `groupBy(key).count()` (tested).
    */
  def twoPhaseCount(df: DataFrame, key: String, salts: Int,
                    saltFrom: Seq[String]): DataFrame =
    df.withColumn("__salt", saltCol(salts, saltFrom.map(col): _*))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(key))
      .agg(sum("__partial").as("count"))
}
