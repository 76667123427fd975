package graft.mix

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions.col

/** Deterministic data-mixture sampling — the "mixing weights" stage of
  * an LLM training-data pipeline (cf. The Pile / Gopher / LLaMA corpus
  * recipes): each source gets a target rate, documents are kept,
  * dropped, or replicated so the output corpus matches the recipe.
  *
  * Rates are expressed in basis points (10000 = 1.0) and may exceed
  * 10000: `n_copies = bp / 10000 + [u < bp % 10000]` where `u` is a
  * per-document uniform draw in [0, 10000). The draw is FNV-1a over the
  * doc_id's decimal string, reduced by UNSIGNED mod — a splittable,
  * seedless, engine-replayable decision: the same document gets the
  * same verdict on any cluster size, any partitioning, any engine (the
  * DuckDB oracle folds the identical hash in HUGEINT SQL). That
  * determinism is what makes a 100 TB sampling run resumable and
  * auditable — rerunning a failed partition reproduces its exact rows.
  *
  * Scale shape: the decision is a per-row kernel (no shuffle) — the
  * rate map is dictionary-sized and broadcast. The hash is a scalar
  * fold rather than a Column expression because FNV's wraparound
  * multiply overflows ANSI-mode Column arithmetic (Spark 4 default);
  * `xxhash64` would be codegen'd but has no closed-form SQL replay.
  * Materializing upsampled copies is a flatMap — output rows carry a
  * `copy` ordinal so downstream shuffles spread replicas of a hot doc
  * across partitions instead of stacking them.
  */
object Mix {

  /** Water-filling token-budget allocation: given per-source token
    * counts c_i and a budget B = ⌊total·num/den⌋, find the integer water
    * level L = max{x : Σ min(c_i, x) ≤ B} and allocate min(c_i, L) per
    * source — the "cap the biggest domains until the budget fits" recipe
    * step ([[DomainCap]] applies a GIVEN cap; this derives the cap FROM
    * the budget). All arithmetic is exact integer floor division, so the
    * level and allocations replay bit-for-bit in the oracle.
    *
    * Level derivation over sources sorted by (tokens, source): with
    * prefix sums P_k and m_k = n−k sources above the k-th kink,
    * F(c_k) = P_k + m_k·c_k is the fill at level c_k; the largest
    * feasible kink k (F(c_k) ≤ B) gives L = (B − P_k) div m_k (or c_n
    * when everything fits, or B div n when no kink fits).
    *
    * Scale shape: ONE corpus aggregate (map-side combined) reduces to
    * the DOMAIN-scale count table; the kink scan is a window over that
    * table (rows = |domains| ≪ corpus — a bounded single-partition sort,
    * NOT the corpus-wide funnel the skyline plan avoids) and the level
    * is a 1-row scalar broadcast back onto domain rows.
    */
  def waterFill(docs: DataFrame, budgetNum: Long = 1L,
      budgetDen: Long = 2L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = docs.select(col("source"),
        F.size(F.filter(F.split(col("text"), " "),
          t => t =!= "")).cast("long").as("n"))
      .groupBy("source").agg(F.sum("n").as("tokens"))
      .localCheckpoint() // domain-scale; reused by kinks + final join
    val agg = counts.agg(F.sum("tokens"), F.count(F.lit(1))).head()
    val total = agg.getLong(0)
    val n = agg.getLong(1)
    val b = total * budgetNum / budgetDen
    val w = Window.orderBy(col("tokens"), col("source"))
    val kinks = counts
      .withColumn("k", F.row_number().over(w).cast("long"))
      .withColumn("p", F.sum("tokens").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("m", F.lit(n) - col("k"))
      .filter(col("p") + col("m") * col("tokens") <= b) // F(c_k) ≤ B
    val level: Long = kinks
      .orderBy(F.desc("k")).limit(1)
      .select(col("tokens"), col("p"), col("m"))
      .collect().headOption match {
        case None => b / n // budget below the first kink
        case Some(r) =>
          if (r.getLong(2) == 0L) r.getLong(0) // total ≤ B: no cap binds
          else (b - r.getLong(1)) / r.getLong(2)
      }
    counts.select(col("source"), col("tokens"),
        F.least(col("tokens"), F.lit(level)).as("alloc"),
        (col("tokens") > level).cast("int").as("capped"),
        F.lit(level).as("water_level"))
      .orderBy("source")
  }

  /** FNV-1a over a string's UTF-16 code units — bit-parity with
    * [[graft.dedup.Dedup]]'s token hash and the oracle's HUGEINT fold.
    */
  def fnv1a(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) { h ^= s.charAt(i); h *= 0x100000001b3L; i += 1 }
    h
  }

  /** Copies a document contributes under rate `bp` basis points. */
  def copiesFor(docId: Long, bp: Int): Int = {
    val u = java.lang.Long.remainderUnsigned(fnv1a(docId.toString), 10000L)
    bp / 10000 + (if (u < bp % 10000) 1 else 0)
  }

  /** Deterministic shard assignment for training-data prep: shard =
    * unsigned FNV-1a(doc_id) mod nShards (power of two, so the modulus
    * is identical in the signed and unsigned domains), plus the full
    * hash as `sort_key`. Writing each shard ordered by (sort_key,
    * doc_id) yields a reproducible pseudorandom global permutation —
    * the "shuffle the corpus before training" step as a pure map + a
    * partitioned write, with NO global sort or single-reducer funnel;
    * at cluster scale this is `repartitionByRange(shard, sort_key)`
    * straight into the shard files.
    */
  def shardAssign(docs: DataFrame, nShards: Int): DataFrame = {
    require(nShards > 0 && (nShards & (nShards - 1)) == 0,
      "nShards must be a power of two")
    // splitmix64-finalized: raw FNV over consecutive decimal ids is
    // NOT avalanche-y (runs of consecutive ids survive the sort —
    // measured 1309/4095 preserved adjacencies), the same weakness
    // the KMV estimator hit; the shared mix fixes both. The hash runs
    // through the native MixHash expression, so the assignment is one
    // whole-stage-codegen'd projection (no typed mapPartitions —
    // MixSpec pins typed≡column parity and the kernel-free plan).
    val mask = (nShards - 1).toLong
    val h = graft.functions.MixHash(col("doc_id").cast("string"))
    docs.select(col("doc_id"), (h.bitwiseAND(F.lit(mask))).as("shard"),
      h.as("sort_key"))
  }

  /** Deterministic multi-epoch shuffle schedule: each epoch draws a
    * FRESH pseudorandom permutation (the training-data rule that data
    * order must differ across epochs, yet replay identically across
    * restarts and cluster sizes). Epoch e's key is
    * mix(doc_id ":" e) — the epoch is salted INTO the hash, not added
    * onto it, so epoch permutations are pairwise independent; shard =
    * key mod nShards and `pos` is the rank within (epoch, shard).
    *
    * Scale shape: a pure codegen'd projection plus ONE
    * (epoch, shard)-keyed window — shards bound each sort to
    * corpus/nShards rows, so there is no global sort; at cluster scale
    * this is `repartitionByRange` straight into per-epoch shard files
    * (same layout contract as [[shardAssign]]).
    */
  def epochSchedule(docs: DataFrame, epochs: Int, nShards: Int): DataFrame = {
    require(nShards > 0 && (nShards & (nShards - 1)) == 0,
      "nShards must be a power of two")
    require(epochs >= 1, "epochs >= 1")
    val mask = (nShards - 1).toLong
    val keyed = docs.select(col("doc_id"),
      F.explode(F.sequence(F.lit(0L), F.lit((epochs - 1).toLong)))
        .as("epoch"))
    val h = graft.functions.MixHash(F.concat(
      col("doc_id").cast("string"), F.lit(":"),
      col("epoch").cast("string")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("epoch"), col("shard"))
      .orderBy(col("sort_key"), col("doc_id"))
    keyed.select(col("epoch"), col("doc_id"),
        h.bitwiseAND(F.lit(mask)).as("shard"), h.as("sort_key"))
      .withColumn("pos", F.row_number().over(w).cast("long"))
  }

  /** Per-document mixture decisions: (doc_id, source, n_copies).
    * `n_copies` may be 0 (dropped), 1 (kept) or k ≥ 2 (upsampled).
    *
    * Fully codegen'd: the hash rides the native
    * [[graft.functions.FnvHash]] expression and the unsigned modulus
    * uses the identity remUnsigned(h, m) = ((h >>> 1) % m · 2 + (h & 1))
    * % m — every intermediate fits a signed long, so ANSI-mode Column
    * arithmetic never overflows; the rate map is a `typedLit` map
    * literal (dictionary-sized, inlined into the plan). Scalar parity
    * with [[copiesFor]] is pinned in MixSpec.
    */
  def mixture(docs: DataFrame, ratesBp: Map[String, Int],
              defaultBp: Int = 10000): DataFrame = {
    val bp = F.coalesce(
      F.element_at(F.typedLit(ratesBp), col("source")),
      F.lit(defaultBp)).cast("long")
    val h = graft.functions.FnvHash(col("doc_id").cast("string"))
    val u = (F.shiftrightunsigned(h, 1) % 10000L * 2L +
      h.bitwiseAND(F.lit(1L))) % 10000L
    // Column `/` is double division — `floor(...).cast(long)` keeps the
    // whole decision integral (bp is bounded by the recipe, well under
    // the 2^53 double-exact range)
    docs.select(col("doc_id"), col("source"),
      (F.floor(bp / F.lit(10000L)).cast("long") +
        F.when(u < bp % 10000L, 1L).otherwise(0L)).as("n_copies"))
  }

  /** Materialized mixture: input rows replicated per the decision, with
    * a `copy` ordinal (0-based). Upsampled replicas are distinct rows —
    * downstream repartitioning spreads them, so a heavily-upsampled
    * source cannot pin one partition.
    */
  def materialize(docs: DataFrame, ratesBp: Map[String, Int],
                  defaultBp: Int = 10000): DataFrame = {
    val decisions = mixture(docs, ratesBp, defaultBp)
      .filter(col("n_copies") > 0)
    docs.join(decisions.select("doc_id", "n_copies"), Seq("doc_id"))
      .withColumn("copy",
        F.explode(F.sequence(F.lit(0L), col("n_copies") - 1)))
      .drop("n_copies")
  }

  /** Deterministic per-group k-sample: the k documents with the
    * smallest avalanche hash of their id win (order by the SIGNED
    * hash — one total order both engines share — with doc_id as the
    * collision tiebreak). The stable "draw a heldout/eval slice"
    * primitive: re-running over a grown corpus keeps every surviving
    * doc's membership decision unchanged (a doc is displaced only by a
    * smaller hash arriving, never by reordering), unlike
    * `TABLESAMPLE`/`rand()` which reshuffle per run.
    *
    * Scale shape: rank = row_number over (group, hash) — the
    * InsertWindowGroupLimits rewrite (SPARK-37099) truncates every map
    * partition to k rows per group BEFORE the exchange
    * (WindowGroupLimitSpec proves the partial node on this exact
    * shape), so the shuffle carries ≈ groups × k × partitions rows,
    * never the corpus. [[graft.functions.MixHash]] (splitmix∘FNV)
    * rather than raw FNV: consecutive decimal ids must not
    * adjacency-bias the sample.
    */
  def sample(docs: DataFrame, k: Int,
             groupCol: String = "source"): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val h = graft.functions.MixHash(col("doc_id").cast("string"))
    docs.select(col(groupCol), col("doc_id"), h.as("h"))
      .withColumn("rank", F.row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(groupCol).orderBy(col("h"), col("doc_id"))))
      .filter(col("rank") <= k)
      .select(col(groupCol), col("doc_id"),
        col("rank").cast("long").as("rk"))
  }

  /** Exact integer square root as a Column: floor(√x) for
    * 0 ≤ x < 2^62. The float candidate from `sqrt` is within ±1 of the
    * truth; the two integer CASE adjustments then make the result
    * exact REGARDLESS of the engine's libm — the same belt-and-braces
    * trick both sides of the `mix_temperature` oracle replay. The
    * domain cap keeps `(s+1)²` inside a signed long (ANSI mode throws
    * on overflow).
    */
  def isqrt(x: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val s0 = F.floor(F.sqrt(x.cast("double"))).cast("long")
    val s1 = F.when(s0 * s0 > x, s0 - 1).otherwise(s0)
    F.when((s1 + 1) * (s1 + 1) <= x, s1 + 1).otherwise(s1)
  }

  /** Temperature-scaled mixture weights (the multilingual/multi-corpus
    * sampling recipe of mT5/XLM-R: p_i ∝ c_i^α with α = 1/2): per
    * source, basis points out of `totalBp` proportional to √(doc
    * count), in EXACT integer arithmetic — w_i = isqrt(c_i · 10^6)
    * (a 1000·√c fixed point), base share by floor division, and the
    * leftover `totalBp − Σ base` distributed by largest remainder
    * (source name as the deterministic tie-break). Σ bp == totalBp
    * ALWAYS (spec'd), and every decision replays bit-exactly in the
    * oracle — no float share ever materializes.
    *
    * Scale shape: one map-side-combined count per source, then all
    * arithmetic on the DICTIONARY-sized aggregate (the empty-frame
    * windows move ≤ |sources| rows to one task — the same
    * dictionary-scale pattern as the codebook/skew-stat steps). The
    * fixed point keeps c_i · 10^6 inside [[isqrt]]'s 2^62 domain for
    * any c_i ≤ 4.6 · 10^12 docs per source — past any real corpus.
    *
    * Output: (source, n_docs, w, bp), one row per source.
    */
  def temperatureBp(docs: DataFrame, totalBp: Long = 10000L,
                    groupCol: String = "source"): DataFrame = {
    require(totalBp > 0, s"totalBp must be positive: $totalBp")
    import org.apache.spark.sql.expressions.Window
    val all = Window.partitionBy()
    val counts = docs.groupBy(col(groupCol).as("source"))
      .agg(F.count(F.lit(1)).as("n_docs"))
      .withColumn("w", isqrt(col("n_docs") * F.lit(1000000L)))
    counts
      .withColumn("tw", F.sum("w").over(all))
      .withColumn("base", F.expr("w * " + totalBp + " div tw"))
      .withColumn("rem", (col("w") * totalBp) % col("tw"))
      .withColumn("deficit", F.lit(totalBp) - F.sum("base").over(all))
      .withColumn("rk", F.row_number().over(
        Window.orderBy(F.desc("rem"), col("source"))))
      .select(col("source"), col("n_docs"), col("w"),
        (col("base") +
          F.when(col("rk") <= col("deficit"), 1L).otherwise(0L)).as("bp"))
  }

  /** Per-source KL divergence from the corpus token distribution —
    * D(P_s ‖ Q) = Σ_t (c_st/n_s) · ln((c_st/n_s)/(C_t/N)) — the
    * domain-shift audit behind mixture tuning: a source whose unigram
    * distribution sits far from the blend is over/under-represented.
    *
    * Exactness: the log ratio decomposes into ln c_st + ln N − ln n_s
    * − ln C_t, every argument an INTEGER count, so the txt_entropy
    * micro-nat rule applies term-wise; each term multiplies an exact
    * count and the sum accumulates in DECIMAL(38,0) (c·4·lnM(N) terms
    * cross 2^63 at corpus scale). The readable double finishes from
    * identical integers (the q21_corr argument) — no float enters
    * before the last division.
    *
    * Scale shape: one (source, token) hash agg touches the corpus;
    * everything after is token-TYPE scale — a tok-keyed join against
    * the corpus marginals, a broadcast source-marginal join, one
    * source-keyed rollup. The scalar N rides the collocations
    * crossJoin(broadcast(1-row)) shape.
    */
  def klBySource(docs: DataFrame, textCol: String = "text",
                 groupCol: String = "source"): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.DecimalType
    val toks = filter(split(col(textCol), " "), w => w =!= "")
    val h = docs.select(col(groupCol).as("source"), explode(toks).as("tok"))
      .groupBy("source", "tok").agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val ns = h.groupBy("source")
      .agg(sum("c").as("n_s"), count(lit(1)).as("n_distinct"))
    val ct = h.groupBy("tok").agg(sum("c").as("ct"))
    val n = h.agg(sum("c").as("nn"))
    def lnM(x: org.apache.spark.sql.Column) =
      round(log(x) * 1e6).cast("long")
    h.join(ct, Seq("tok")).join(broadcast(ns), Seq("source"))
      .crossJoin(broadcast(n))
      .select(col("source"), col("n_s"), col("n_distinct"),
        (col("c").cast(DecimalType(38, 0)) *
          (lnM(col("c")) + lnM(col("nn")) - lnM(col("n_s")) -
            lnM(col("ct")))).as("term"))
      .groupBy("source", "n_s", "n_distinct")
      .agg(sum("term").as("s"))
      .select(col("source"), col("n_s").as("n_tokens"), col("n_distinct"),
        col("s").cast("long").as("kl_sum_micro"),
        (col("s").cast("double") /
          (col("n_s").cast("double") * lit(1e6))).as("kl"))
  }
}
