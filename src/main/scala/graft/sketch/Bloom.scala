package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom filter — the mergeable MEMBERSHIP summary next to [[Kmv]]/
  * [[Hll]] (cardinality) and [[Cms]] (frequency): a fixed m-bit vector
  * with k hash functions answering "possibly present / definitely
  * absent". The curation use case is decontamination at 100 TB: build
  * the filter over the benchmark/eval corpus once (it is small), then
  * probe every training document with NO shuffle of the corpus — the
  * filter broadcasts, false positives are re-checked exactly, false
  * negatives are impossible, so no contaminated document survives.
  *
  * Spark-first shape: the filter is built RELATIONALLY — tokens explode
  * to k (word, bitmask) cells, then ONE hash aggregation
  * `groupBy(word).agg(bit_or(mask))`. bit_or is commutative/
  * associative/idempotent, so the filter is partitioning-, merge-order-
  * and duplicate-invariant by construction (two filters union by the
  * same bit_or), map-side combine bounds each task's shuffle write at
  * `words` longs — which is why the whole bit vector replays bit-exactly
  * in the DuckDB oracle (`sketch_bloom`), unlike Spark's built-in
  * `BloomFilterAggregate` whose serialized form is not engine-portable.
  *
  * Hashing: k independent FNV-1a-64 folds over `"i:" + token`
  * (the [[Cms]] row-salt convention, oracle-replayed via `fnvFoldSql`);
  * bit position = low log2(m) bits (unsigned mod, m a power of two).
  * Words are 32-bit so every mask and word value is an exact
  * non-negative BIGINT on both engines (no 1L<<63 sign pitfalls).
  */
object Bloom {

  /** m = 4096 bits, k = 4 hashes: ~1% false-positive rate at n ≈ 420
    * distinct members (n/m = 0.1) — sized for the synthetic vocabulary;
    * production decontamination picks m from the eval-set cardinality
    * ([[Kmv]]/[[Hll]] estimate it first). */
  val MBits = 4096
  val K = 4
  /** 32-bit words: position = word · 32 + bit. */
  val WordBits = 32
  val Words: Int = MBits / WordBits

  def bitPos(i: Int, tok: String): Int =
    (graft.mix.Mix.fnv1a(s"$i:$tok") & (MBits - 1)).toInt

  /** Column form of [[bitPos]] via the native codegen'd
    * [[graft.functions.FnvHash]] — the build stays inside whole-stage
    * codegen end-to-end. */
  def bitPosCol(i: Int, tok: Column): Column =
    graft.functions.FnvHash(concat(lit(s"$i:"), tok))
      .bitwiseAND(lit((MBits - 1).toLong)).cast("int")

  /** The filter as (word, bits) rows — ≤ [[Words]] rows, absent words
    * are all-zero. `bits` = OR of 2^(pos mod 32) over the k positions
    * of every member token. */
  def build(members: DataFrame, tokenCol: String = "token"): DataFrame =
    members
      .select(explode(array((0 until K).map(i =>
        bitPosCol(i, col(tokenCol))): _*)).as("pos"))
      .select((col("pos") / WordBits).cast("int").as("word"),
        expr(s"shiftleft(1L, pos % $WordBits)").as("mask"))
      .groupBy("word")
      .agg(expr("bit_or(mask)").as("bits"))

  /** Membership probe: for each probe token, `hits` = how many of its k
    * bits are set (k ⇒ possibly present, <k ⇒ definitely absent). The
    * filter side is ≤ [[Words]] rows — the join broadcasts, so probing
    * a 100 TB corpus is map-side work.
    */
  def probe(filter: DataFrame, probes: DataFrame,
            tokenCol: String = "token"): DataFrame = {
    val cells = probes.select(col(tokenCol).as("token"),
        posexplode(array((0 until K).map(i =>
          bitPosCol(i, col(tokenCol))): _*)).as(Seq("i", "pos")))
      .select(col("token"), (col("pos") / WordBits).cast("int").as("word"),
        expr(s"shiftleft(1L, pos % $WordBits)").as("mask"))
    cells.join(broadcast(filter), Seq("word"), "left_outer")
      .groupBy("token")
      .agg(sum(when(coalesce(col("bits"), lit(0L))
          .bitwiseAND(col("mask")) =!= 0L, 1L).otherwise(0L)).as("hits"))
      .select(col("token"), col("hits"),
        (col("hits") === K).cast("int").as("maybe_present"))
  }
}
