package graft.kgemb

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.FnvHash

/** Translation-based triple scoring (TransE, Bordes et al. 2013): a
  * triple (s, p, o) is plausible when emb(s) + emb(p) ≈ emb(o), scored
  * by the L1 distance ‖emb(s) + emb(p) − emb(o)‖₁. This module is the
  * SCORING side of the KG-embedding loop the engine already feeds —
  * deterministic walks emit positive pairs, the FNV sampler emits
  * corrupted negatives (kg_negatives), and this ranks both so the
  * margin (score_neg − score_pos) measures how separable the graph's
  * structure is before any gradient step.
  *
  * Trained float embeddings are not reproducible across engines, so the
  * embedding table here is a deterministic hash projection (the
  * feature-hashing trick, Weinberger et al. 2009): component d of
  * node/predicate x is
  *
  *   emb(x)[d] = (fnv1a(x '#' d) mod (2·Amp+1)) − Amp
  *
  * an integer in [−Amp, Amp]. Integer L1 sums are order- and
  * partitioning-invariant, so every score replays bit-exactly in the
  * DuckDB oracle (HUGEINT FNV fold + the same centering). The embedding
  * is computed INLINE as codegen'd Column expressions — at 10^12 triples
  * there is no materialized embedding table to join, shuffle, or skew:
  * scoring is a map over the triple scan.
  */
object KgEmbed {

  val Dim = 4
  val Amp = 500L // components in [-500, 500]
  private val Mod = 2 * Amp + 1

  /** emb(key)[d] as a Column, for a string Column key. */
  def embComponent(key: Column, d: Int): Column = {
    val h = FnvHash(concat(key, lit("#"), lit(d.toString)))
    // unsigned mod via the Mix.mixture identity (ANSI-safe longs)
    (shiftrightunsigned(h, 1) % Mod * 2 + h.bitwiseAND(lit(1L))) % Mod - Amp
  }

  /** ‖emb(s) + emb(p) − emb(o)‖₁ over [[Dim]] components — one codegen'd
    * projection, no joins. `p` is a literal predicate IRI.
    */
  def transeScore(s: Column, p: String, o: Column): Column =
    (0 until Dim).map { d =>
      abs(embComponent(s, d) + embComponent(lit(p), d) - embComponent(o, d))
    }.reduce(_ + _)

  /** DistMult bilinear score (Yang et al. 2015): Σ_d s_d·p_d·o_d — the
    * multiplicative counterpart of [[transeScore]] (higher = more
    * plausible, vs TransE's lower-distance-is-better). Per-component
    * magnitude ≤ Amp³ = 1.25·10^8, so the [[Dim]]-term sum stays far
    * inside a long and the integer products replay bit-exactly in the
    * oracle's HUGEINT arithmetic. Same plan shape: one codegen'd
    * projection over the triple scan, no embedding-table join.
    */
  def distmultScore(s: Column, p: String, o: Column): Column =
    (0 until Dim).map { d =>
      embComponent(s, d) * embComponent(lit(p), d) * embComponent(o, d)
    }.reduce(_ + _)

  /** ComplEx bilinear score (Trouillon et al. 2016): Re(Σ_d s_d · p_d ·
    * conj(o_d)) over complex-valued embeddings — the member of the
    * family that CAN model antisymmetric relations (DistMult's swap law
    * is broken by the conjugation). Component d uses hash dims 2d
    * (real) and 2d+1 (imaginary); the real part expands to
    *
    *   sr·pr·or + si·pr·oi + sr·pi·oi − si·pi·or
    *
    * four integer triple-products per dim, |term| ≤ Amp³, so the sum
    * stays far inside a long and replays bit-exactly in HUGEINT SQL.
    * Same zero-join plan shape as [[transeScore]]/[[distmultScore]].
    */
  def complexScore(s: Column, p: String, o: Column): Column =
    (0 until Dim).map { d =>
      val (sr, si) = (embComponent(s, 2 * d), embComponent(s, 2 * d + 1))
      val pCol = lit(p)
      val (pr, pi) = (embComponent(pCol, 2 * d), embComponent(pCol, 2 * d + 1))
      val (or_, oi) = (embComponent(o, 2 * d), embComponent(o, 2 * d + 1))
      sr * pr * or_ + si * pr * oi + sr * pi * oi - si * pi * or_
    }.reduce(_ + _)

  /** Margin used by [[transeGradUpdates]]: a violated pair satisfies
    * score_pos + Margin > score_neg (hinge-active region of
    * max(0, γ + score_pos − score_neg)). Scores sum Dim terms ≤ 3·Amp,
    * so γ = Amp sits in the distribution's active band.
    */
  val Margin = 500L

  private def signum(x: Column): Column =
    when(x > 0, lit(1L)).when(x < 0, lit(-1L)).otherwise(lit(0L))

  /** ONE deterministic TransE SGD step over the (s, o, o_neg) pair set
    * — the gradient-AGGREGATION shape that dominates distributed KG-
    * embedding training at 10^12 triples (per-triple subgradients are a
    * map; the update is one entity-keyed integer sum, map-side
    * combined; hot entities are exactly the PageRank-head keys AQE
    * already splits). For the hinge loss L = max(0, γ + score_pos −
    * score_neg) with L1 scores, the subgradient per dimension d is
    * sign-valued:
    *
    *   ∂L/∂s_d     = sign(s_d+p_d−o_d) − sign(s_d+p_d−o_neg_d)
    *   ∂L/∂o_d     = −sign(s_d+p_d−o_d)
    *   ∂L/∂o_neg_d = +sign(s_d+p_d−o_neg_d)
    *
    * applied only on violated pairs; updates are the NEGATED
    * subgradients at unit step (integer ±1 votes), summed per
    * (entity, d) — order/partitioning-invariant, bit-exact in the
    * oracle. Returns (entity, d, upd).
    */
  def transeGradUpdates(pairs: DataFrame, p: String): DataFrame = {
    // Round-6: the naive expression tree evaluates each per-role hash
    // component up to 6× per row (twice in the violation scores, up to
    // four times across the subgradient structs — ~72 FNV folds/row at
    // Dim=4). Factor them into ONE array per role, materialized by a
    // checkpoint BEFORE the filter: the barrier is what makes the
    // factoring stick — without it predicate pushdown inlines the array
    // aliases back into the filter and the tree gets BIGGER (A/B'd this
    // round: the unbarriered array form measured 2.5× slower). Past the
    // barrier the filter and every sign read the same 12 materialized
    // longs, so per-row hash work drops 6× and the integer arithmetic —
    // and the oracle's HUGEINT replay — is unchanged. The checkpointed
    // frame is (3 strings + 12 longs) per pair — fixed width, ∝ pairs,
    // the same bound the explode already carried.
    val withComps = pairs.select(col("s"), col("o"), col("o_neg"),
      array((0 until Dim).map(d => embComponent(col("s"), d)): _*)
        .as("sc"),
      array((0 until Dim).map(d => embComponent(col("o"), d)): _*)
        .as("oc"),
      array((0 until Dim).map(d => embComponent(col("o_neg"), d)): _*)
        .as("nc"))
      .localCheckpoint()
    val pc = (0 until Dim).map(d => embComponent(lit(p), d))
    def posDiff(d: Int) =
      element_at(col("sc"), d + 1) + pc(d) - element_at(col("oc"), d + 1)
    def negDiff(d: Int) =
      element_at(col("sc"), d + 1) + pc(d) - element_at(col("nc"), d + 1)
    val scorePos = (0 until Dim).map(d => abs(posDiff(d))).reduce(_ + _)
    val scoreNeg = (0 until Dim).map(d => abs(negDiff(d))).reduce(_ + _)
    val violated = withComps.filter(scorePos + lit(Margin) > scoreNeg)
    val updates = (0 until Dim).flatMap { d =>
      val posSign = signum(posDiff(d))
      val negSign = signum(negDiff(d))
      Seq(
        struct(col("s").as("entity"), lit(d.toLong).as("d"),
          (negSign - posSign).as("upd")),
        struct(col("o").as("entity"), lit(d.toLong).as("d"),
          posSign.as("upd")),
        struct(col("o_neg").as("entity"), lit(d.toLong).as("d"),
          (-negSign).as("upd")))
    }
    violated.select(explode(array(updates: _*)).as("u"))
      .groupBy(col("u.entity").as("entity"), col("u.d").as("d"))
      .agg(sum(col("u.upd")).as("upd"))
  }
}
