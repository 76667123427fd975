package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog cardinality sketch (Flajolet et al. 2007) — the fixed-size
  * counterpart of [[Kmv]]: m = 2^p registers of ~6 bits each estimate
  * distinct counts with ~1.04/sqrt(m) relative error, and the register
  * vector MERGES by pointwise max — the property that makes it the
  * standard distributed-cardinality summary (per-source vocabulary /
  * URL / entity counts at 100 TB where COUNT(DISTINCT) shuffles every
  * distinct value).
  *
  * Spark-first shape: no custom aggregation state at all — the register
  * vector is built RELATIONALLY as `groupBy(group, bucket).agg(max(rho))`.
  * Max is commutative/associative/idempotent, so the sketch is
  * partitioning-, merge-order- AND duplicate-invariant by construction;
  * map-side partial aggregation bounds each task's shuffle write at
  * `groups × m` one-byte registers regardless of corpus size. That
  * invariance is why the whole register vector replays bit-exactly in
  * the DuckDB oracle (`sketch_hll`) — unlike Spark's built-in
  * `approx_count_distinct` HLL++, whose registers are neither
  * inspectable nor engine-replayable.
  *
  * Hashing: the engine's FNV-1a-64 over UTF-16 code units finalized with
  * the splitmix64 avalanche ([[Kmv.tokenHash]], oracle-replayed
  * stage-per-CTE). bucket = low p bits (unsigned mod, power of two);
  * rho = trailing-zero count of the remaining 64-p bits, plus one —
  * computed branch-free as `bit_count((w & -w) - 1) + 1`, an
  * integer-exact identity both engines share (`bit_count` is exact on
  * BIGINT; no float log2 near power-of-two boundaries). Trailing zeros
  * of a uniform word are Geometric(1/2) exactly like the classic
  * leading-zero formulation, so the estimator theory carries unchanged
  * (the choice only permutes which hash values feed which register).
  *
  * The driver-checked output is the integer core: per group,
  * (n_regs, n_zero, sum_pow, checksum) where
  * `sum_pow = Σ_b 2^(FullExp - min(r_b, FullExp))` (zero registers
  * contribute the full 2^FullExp unit) is the harmonic-mean denominator
  * scaled to an exact BIGINT and `checksum = Σ_b (b+1)·r_b` pins
  * register placement. FullExp = 57 makes the sum structurally
  * overflow-free — the worst case (63 zero registers + one r = 1) is
  * 63·2^57 + 2^56 < 2^63; the clamp only loses registers with r > 57,
  * which need ≥ 2^57 distinct hashes to occur and stay pinned exactly
  * by the checksum anyway. The float estimate α_m·m²/Σ2^-r — one
  * double division over these exact integers — is covered by HllSpec
  * against exact cardinalities (the kg_entity_stats convention:
  * integer core oracled, float ScalaTested).
  */
object Hll {

  /** Register-index bits: m = 64 registers (±13% standard error) — small
    * enough that the oracle replays every register, large enough that
    * HllSpec's estimates mean out; production callers pick p per budget.
    */
  val P = 6
  val M: Int = 1 << P
  /** Suffix bits feeding rho: 64 - P. rho ∈ [1, WBits+1]. */
  val WBits: Int = 64 - P

  /** rho(h) = trailing zeros of the suffix word + 1 (WBits+1 when the
    * suffix is all zeros), as a codegen'd Column over a signed-long hash
    * column. `w & -w` isolates the lowest set bit; its predecessor is
    * the trailing-zero mask.
    */
  def rhoCol(h: Column): Column = {
    val w = shiftrightunsigned(h, P) // suffix word, < 2^58: non-negative
    when(w === 0L, lit(WBits + 1))
      .otherwise(bit_count(w.bitwiseAND(-w) - 1) + 1)
  }

  /** bucket(h) = low P bits — two's-complement low bits equal the
    * unsigned modulus for a power-of-two m. */
  def bucketCol(h: Column): Column = h.bitwiseAND(lit((M - 1).toLong))

  /** Present registers (group, b, r) with r = max rho — ≤ groups × m
    * rows; absent buckets mean register value 0. */
  def registers(docs: DataFrame, groupCol: String = "source",
                textCol: String = "text"): DataFrame =
    Kmv.tokenHashes(docs, groupCol, textCol)
      .select(col(groupCol), bucketCol(col("h")).as("b"),
        rhoCol(col("h")).as("rho"))
      .groupBy(col(groupCol), col("b"))
      .agg(max(col("rho")).as("r"))

  /** Fixed-point exponent for sum_pow: 2^(FullExp-r) stays summable in
    * one BIGINT across all m registers (see scaladoc overflow bound). */
  val FullExp = 57

  /** Per-group integer summary of the register vector (see scaladoc).
    * `sum_pow` totals 2^(FullExp-min(r,FullExp)) across ALL m
    * registers — present ones via the agg, zero ones as m - n_regs
    * whole 2^FullExp units — so one flipped register anywhere breaks
    * it (r > FullExp: see the checksum note in the scaladoc).
    */
  def summary(docs: DataFrame, groupCol: String = "source",
              textCol: String = "text"): DataFrame =
    registerSummary(registers(docs, groupCol, textCol), Seq(groupCol))

  /** The integer register-vector summary keyed by arbitrary columns —
    * shared by [[summary]] (key = source) and [[graft.canon.Anf]]
    * (key = node, radius). Input rows are present registers
    * (keys..., b, r); absent buckets mean register 0 and contribute a
    * whole 2^FullExp unit to sum_pow.
    */
  def registerSummary(regs: DataFrame, keys: Seq[String]): DataFrame = {
    val full = lit(1L << FullExp) // the r = 0 contribution
    regs.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_regs"),
        sum(expr(s"shiftleft(1L, cast($FullExp - least(r, $FullExp) as int))"))
          .as("present_pow"),
        sum((col("b") + 1) * col("r")).as("checksum"))
      .select(keys.map(col) ++ Seq(col("n_regs"),
        (lit(M.toLong) - col("n_regs")).as("n_zero"),
        (col("present_pow") + (lit(M.toLong) - col("n_regs")) * full)
          .as("sum_pow"),
        col("checksum")): _*)
  }

  /** α_64 (Flajolet et al., constants table for m = 64) — the ONE
    * definition shared by every estimator form (scalar, register-vector
    * and Column: [[graft.canon.Anf]]); a geometry change (P) must
    * change it here and nowhere else. */
  val Alpha = 0.709
  /** Small-range cutoff: linear counting below LinearCutoff·m. */
  val LinearCutoff = 2.5

  /** The classic estimate straight from a summary row's exact integers:
    * Σ 2^-r = sum_pow / 2^FullExp (lossless for r ≤ FullExp), zeros =
    * n_zero; small-range linear counting below 2.5m. Driver-side float
    * math — ScalaTested, never oracled.
    */
  def estimateFromSummary(nZero: Long, sumPow: Long): Double = {
    val s = sumPow.toDouble / (1L << FullExp).toDouble
    val raw = Alpha * M * M / s
    // StrictMath.log, not Math.log: Spark's Log Column (the Anf.estCol
    // twin) evaluates via StrictMath, and the two forms are asserted
    // bit-equal (AnfSpec)
    if (raw <= LinearCutoff * M && nZero > 0)
      M * StrictMath.log(M.toDouble / nZero)
    else raw
  }

  /** The classic HLL estimate from a full m-register vector (register 0
    * for absent buckets): α_m · m² / Σ 2^-r, with the small-range
    * linear-counting correction below 2.5m. Driver-side float math over
    * the sketch's exact integers — ScalaTested, not oracled.
    */
  def estimate(regs: Seq[Int]): Double = {
    require(regs.length == M, s"need $M registers, got ${regs.length}")
    val s = regs.map(r => math.pow(2.0, -r)).sum
    val raw = Alpha * M * M / s
    val zeros = regs.count(_ == 0)
    if (raw <= LinearCutoff * M && zeros > 0)
      M * StrictMath.log(M.toDouble / zeros)
    else raw
  }
}
