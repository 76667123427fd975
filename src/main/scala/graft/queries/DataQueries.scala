package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.ann.Similarity
import graft.mix.Pack
import graft.text.{Pii, TextAnalysis}
import graft.multimodal.Multimodal

/** Training-data pipeline operators as driver-checkable queries: dedup
  * tiers, similarity search, text analysis, multimodal plumbing. Oracles
  * recompute each result in DuckDB from the raw parquet (integer-exact
  * formulations; float-ranked variants are covered by ScalaTest instead).
  */
object DataQueries {

  /** Exact dedup survivor histogram per lang. */
  def ddExact(spark: SparkSession, dir: String): DataFrame =
    Dedup.exact(spark.read.parquet(s"$dir/documents.parquet"))
      .groupBy("lang").agg(count(lit(1)).as("n_docs"))
      .orderBy("lang")

  /** Exact duplicate clusters (doc → kept representative). */
  def ddExactClusters(spark: SparkSession, dir: String): DataFrame =
    Dedup.exactClusters(spark.read.parquet(s"$dir/documents.parquet"))
      .orderBy("doc_id")

  /** Benchmark decontamination: corpus docs sharing any 13-gram window
    * with the held-out benchmark slice (doc_id ≡ 3 mod 11). The oracle
    * replays the polynomial window hash in HUGEINT SQL and joins on it,
    * so even a 64-bit collision would match both sides.
    */
  def ddDecontam(spark: SparkSession, dir: String): DataFrame = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    Dedup.decontaminate(
      docs.filter(pmod(col("doc_id"), lit(11)) =!= 3),
      docs.filter(pmod(col("doc_id"), lit(11)) === 3))
      .orderBy("doc_id")
  }

  /** Unigram-Jaccard near-dup pairs within (lang, source) blocks. */
  def ddJaccard(spark: SparkSession, dir: String): DataFrame =
    Dedup.jaccardPairs(spark.read.parquet(s"$dir/documents.parquet"), 0.8)
      .select(col("a"), col("b"), col("inter").cast("long").as("inter"),
        col("uni").cast("long").as("uni"), col("jaccard"))
      .orderBy("a", "b")

  /** Corpus for the containment sweep: the FULL documents table plus
    * planted snippets — every 10th doc gets a twin (id + 2,000,000)
    * keeping its first ⌊2n/5⌋ (min 3) tokens. Every 3-gram SHINGLE of
    * a prefix snippet is a shingle of the original (the window never
    * crosses the cut), so snippet containment is exactly 1.0 while
    * shingle-Jaccard ≈ (2n/5−2)/(n−2) ≈ 0.4 — the quote/excerpt
    * regime the symmetric tiers structurally miss.
    */
  private[graft] def containCorpus(spark: SparkSession,
      dir: String): DataFrame = {
    val base = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    val toks = split(col("text"), " ")
    val planted = base.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 2000000L).as("doc_id"),
        array_join(slice(toks, lit(1),
          greatest(lit(3), (size(toks) * 2 / 5).cast("int"))), " ")
          .as("text"))
    base.union(planted)
  }

  /** Asymmetric containment pairs at ≥ 9/10 over the planted-snippet
    * corpus (see [[graft.dedup.Dedup.containmentPairs]] for the
    * lossless rarest-token prefix filter). ORACLED against the
    * quadratic unblocked truth — a hash match proves the prefix filter
    * loses nothing.
    */
  def ddContainment(spark: SparkSession, dir: String): DataFrame =
    Dedup.containmentPairs(containCorpus(spark, dir))
      .orderBy("a", "b")

  /** Corpus for the MinHash sweep: the FULL documents table plus planted
    * near-duplicates — every 20th doc gets a twin (id + 1,000,000) with
    * the last two tokens dropped, giving 3-gram Jaccard ≈ 0.95. This
    * replaces round 1's `doc_id < 100` slice: candidates are now ∝ true
    * near-dups, exactly the regime banding is built for.
    */
  private[graft] def minhashCorpus(spark: SparkSession, dir: String): DataFrame = {
    val base = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    val toks = split(col("text"), " ")
    val planted = base.filter(col("doc_id") % 20 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        array_join(slice(toks, lit(1), greatest(size(toks) - 2, lit(3))), " ")
          .as("text"))
    base.union(planted)
  }

  /** MinHash-LSH candidates over the full corpus (3-gram shingles,
    * 64 hashes × 16 bands), verified at exact 3-gram Jaccard ≥ 0.8.
    * ORACLED: the DuckDB side recomputes the TRUE ≥0.8 pair set with an
    * exact shared-shingle self-join — banding at these parameters has
    * miss probability (1-J⁴)¹⁶ < 1e-7 for J ≥ 0.9, so the LSH output
    * equals the exact set on this corpus (recall additionally asserted
    * in DedupSpec).
    */
  def ddMinhash(spark: SparkSession, dir: String): DataFrame =
    Dedup.minHashCandidates(minhashCorpus(spark, dir),
        n = 3, Dedup.MinHashParams(numHashes = 64, bands = 16, seed = 42L),
        verifyThreshold = 0.8)
      .select(col("a"), col("b"), col("jaccard"))
      .orderBy("a", "b")

  /** Near-dup CLUSTERS: connected components over the verified MinHash
    * pair graph, emitting (doc_id, keep_id) for every non-survivor —
    * dd_exact_clusters' convention lifted to the fuzzy tier (transitive
    * near-dup families collapse to their min-id member even when the
    * endpoints' direct Jaccard is below threshold). Plan: the banded
    * candidate tier (∝ dups) feeds the same large-star/small-star CC
    * the KG canonicalizer uses; no new shuffle shapes. Oracle: the
    * exact ≥0.8 pair truth + recursive symmetric closure.
    */
  def ddMinhashClusters(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.minHashCandidates(minhashCorpus(spark, dir),
        n = 3, Dedup.MinHashParams(numHashes = 64, bands = 16, seed = 42L),
        verifyThreshold = 0.8)
      .select(col("a"), col("b"))
    graft.canon.ConnectedComponents.run(pairs)
      .filter(col("node") =!= col("component"))
      .select(col("node").as("doc_id"), col("component").as("keep_id"))
      .orderBy("doc_id")
  }

  /** Quality-aware near-dup survivor selection — the curation decision
    * [[ddMinhashClusters]] deliberately defers: within each near-dup
    * family keep the member the quality model scores HIGHEST (ties to
    * the smallest id), not the arbitrary min id. Meaningful exactly at
    * the FUZZY tier: exact-dup clusters share text (and therefore
    * score), but near-dup members differ — the planted truncated twins
    * score differently from their originals, so the model genuinely
    * decides. Scale shape: the cluster table is ∝ dups (banded tier +
    * CC), classify's score is one in-row projection over the corpus
    * (no shuffle), the winner is one component-keyed struct-max
    * aggregate (max(score), ties to min id via the negated-id field) —
    * everything after the already-scale-shaped candidate tier runs at
    * RESULT scale. Oracle: the exact pair truth + closure + the
    * classify formula + a ROW_NUMBER argmax.
    */
  private[graft] def bestSurvivorClusters(corpus: DataFrame): DataFrame = {
    val pairs = Dedup.minHashCandidates(corpus,
        n = 3, Dedup.MinHashParams(numHashes = 64, bands = 16, seed = 42L),
        verifyThreshold = 0.8)
      .select(col("a"), col("b"))
    val cc = graft.canon.ConnectedComponents.run(pairs)
    val scores = TextAnalysis.classify(corpus)
      .select(col("doc_id").as("node"), col("score"))
    val best = cc.join(scores, Seq("node"))
      .groupBy("component")
      .agg(max(struct(col("score").as("s"),
        (-col("node")).as("negid"))).as("w"))
      .select(col("component"), (-col("w.negid")).as("keep_id"))
    cc.join(best, Seq("component"))
      .filter(col("node") =!= col("keep_id"))
      .select(col("node").as("doc_id"), col("keep_id"))
  }

  def ddNearBest(spark: SparkSession, dir: String): DataFrame =
    bestSurvivorClusters(minhashCorpus(spark, dir)).orderBy("doc_id")

  /** Fixed-weight integer quality classifier (see
    * [[graft.text.TextAnalysis.classify]]) — the model-based filtering
    * tier of the curation funnel; features, score and keep decision all
    * replay exactly (non-negative floor divisions + integer sums).
    */
  def txtClassify(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.classify(spark.read.parquet(s"$dir/documents.parquet"))
      .select(col("doc_id"), col("f_stop"), col("f_punct"), col("f_len"),
        col("f_mtl"), col("score"), col("keep"))
      .orderBy("doc_id")

  /** Flesch–Kincaid readability in integer micro-units (see
    * [[graft.text.TextAnalysis.readability]]) — exact word / sentence /
    * vowel-run counts, grade = two non-negative floor divisions + one
    * subtraction, so every row replays bit-for-bit.
    */
  def txtReadability(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.readability(spark.read.parquet(s"$dir/documents.parquet"))
      .orderBy("doc_id")

  /** Line-bearing corpus for the C4-style line dedup tier: the flat
    * synthetic texts are re-wrapped into 10-token lines, and every 7th
    * doc gets a boilerplate first line — the cross-document repeated-line
    * structure (nav chrome / banners) the tier exists to remove. Both
    * engines build the identical corpus.
    */
  private val BoilerplateLine = "subscribe to our newsletter for updates"
  private[graft] def linesCorpus(spark: SparkSession, dir: String): DataFrame = {
    // token array materialized BEFORE the transform: lambdas block CSE,
    // so an inline split would re-tokenize the doc per chunk slice —
    // O(tokens²/10) character work per row (the RelationMiner fix)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), split(col("text"), " ").as("__toks"))
    val toks = col("__toks")
    val nChunks = ceil(size(toks) / lit(10.0)).cast("int")
    val body = array_join(transform(sequence(lit(0), nChunks - 1),
      j => array_join(slice(toks, j * 10 + 1, lit(10)), " ")), "\n")
    val withBp = when(col("doc_id") % 7 === 0,
      concat(lit(BoilerplateLine + "\n"), body)).otherwise(body)
    docs.select(col("doc_id"), withBp.as("text"))
  }

  /** Line-level exact dedup (drop lines in ≥2 distinct docs, reassemble).
    * ORACLED: DuckDB replays the corpus construction, groups lines by
    * their TEXT (the engine keys on xxhash64 — identical result modulo a
    * 64-bit collision), and reassembles with string_agg ORDER BY pos.
    */
  def ddLines(spark: SparkSession, dir: String): DataFrame =
    Dedup.dedupLines(linesCorpus(spark, dir), minDocs = 2)
      .orderBy("doc_id")

  /** Winnowing-fingerprint overlap pairs (MOSS — see
    * [[graft.dedup.Dedup.winnowPairs]]): doc pairs sharing ≥2 window-min
    * 4-gram FNV fingerprints, stop-fingerprints capped at 50 docs.
    * ORACLED end-to-end: DuckDB re-hashes every 4-token gram with the
    * HUGEINT FNV fold, replays the w=4 window minima via a ROWS frame,
    * applies the same cap, and re-joins — fingerprint SELECTION (not
    * just the pair report) is hash-checked.
    */
  def ddWinnow(spark: SparkSession, dir: String): DataFrame =
    Dedup.winnowPairs(spark.read.parquet(s"$dir/documents.parquet"),
        k = 4, w = 4, minShared = 2, cap = 50)
      .orderBy("d1", "d2")

  /** SimHash fingerprints + per-lang collision stats (hamming-0 pairs are
    * exact-text or near-exact duplicates).
    */
  def ddSimhash(spark: SparkSession, dir: String): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val sh = docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, t) => (id, Dedup.simHash(t)) }
      .toDF("doc_id", "sim")
    sh.groupBy("sim").agg(count(lit(1)).as("n"), min("doc_id").as("first_doc"))
      .filter(col("n") > 1)
      .orderBy("sim")
  }

  /** Embedding-cosine near-dup corpus: embeddings plus planted twins —
    * every 40th vector gets a copy (id + 1,000,000) with component 0
    * scaled by 1.1f (cosine ≥ 0.999 vs the original; random 64-dim pairs
    * sit near 0). Both engines build the identical corpus: float
    * multiply is IEEE-identical cross-engine.
    */
  private[graft] def embedCorpus(spark: SparkSession, dir: String): DataFrame = {
    val base = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding")
    val planted = base.filter(col("vec_id") % 40 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        transform(col("embedding"),
          (x, i) => when(i === 0, x * lit(1.1f)).otherwise(x)).as("embedding"))
    base.union(planted)
  }

  /** Embedding-cosine near-dup pairs at cosine ≥ 0.99 (the dedup tier the
    * brief lists alongside minhash/simhash). LSH-bucketed candidates +
    * exact verify; ORACLED — the DuckDB side replays the same seeded
    * hyperplane bucketing and sequential-fold cosine, so spark/oracle
    * agree bit-for-bit by construction (recall on planted pairs asserted
    * in ScalaTest).
    */
  def ddEmbed(spark: SparkSession, dir: String): DataFrame =
    // nBits=11 (2048 buckets): ~10 vectors/bucket at sf0.1 keeps the
    // candidate join near-linear; twin recall stays ~1-4e-9 across the
    // 10 tables (cos 0.999 -> per-table P=0.855)
    Similarity.embeddingNearDupPairs(embedCorpus(spark, dir), 0.99, nBits = 11)
      .orderBy("a", "b")

  /** SemDedup-style semantic dedup over the planted-twin corpus:
    * √n-sampled coarse quantizer, within-cluster cosine ≥ 0.99 pairs,
    * min-id survivors (see [[graft.ann.Similarity.semanticDedup]] — the
    * oracle replays the full quantizer, the cluster-scoped pair search
    * and the recursive closure).
    */
  def ddSemantic(spark: SparkSession, dir: String): DataFrame =
    Similarity.semanticDedup(embedCorpus(spark, dir),
        centroidPred = col("vec_id") % 31 === 5, threshold = 0.99)
      .orderBy("vec_id")

  /** Robust per-source corpus audit: MAD outlier counts from TWO levels
    * of the keyed quantile sketch — med = sketch-P50 of doc token
    * counts, MAD = sketch-P50 of |v − med|, outliers = docs with
    * deviation > 3·MAD. The robust-statistics tier of corpus monitoring
    * (mean/stddev break under the heavy-tailed length distributions web
    * corpora actually have); both sketch levels are the ≤1024-bucket
    * integer histogram, the med/MAD joins are dictionary-sized
    * broadcasts, and every read-off is the bucket lower bound — all
    * integer, bit-exact in the oracle's bucket-arithmetic replay.
    */
  def sketchMad(spark: SparkSession, dir: String): DataFrame = {
    import graft.sketch.QuantileHist
    val v = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("v"))
      .localCheckpoint() // two sketch levels + the outlier agg share it
    val med = QuantileHist.quantilesByKey(v, "source", "v", Seq(50))
      .select(col("source"), col("lo").as("med"))
    val dev = v.join(broadcast(med), Seq("source"))
      .select(col("source"), abs(col("v") - col("med")).as("dev"))
      .localCheckpoint()
    val mad = QuantileHist.quantilesByKey(dev, "source", "dev", Seq(50))
      .select(col("source"), col("lo").as("mad"))
    dev.join(broadcast(mad), Seq("source"))
      .groupBy("source")
      .agg(count(lit(1)).as("n"),
        sum(when(col("dev") > lit(3L) * col("mad"), 1L).otherwise(0L))
          .as("n_outliers"))
      .join(med, Seq("source"))
      .join(mad, Seq("source"))
      .select(col("source"), col("n"), col("med"), col("mad"),
        col("n_outliers"))
      .orderBy("source")
  }

  /** Integer-exact nearest neighbor by quantized dot product. */
  def annTop1(spark: SparkSession, dir: String): DataFrame =
    Similarity.quantizedTop1(spark.read.parquet(s"$dir/embeddings.parquet"),
        col("vec_id") < 30)
      .orderBy("query_id")

  /** Brute-force cosine top-5. ORACLED despite float scoring: both
    * engines fold the dot product and norms LEFT-TO-RIGHT over the array
    * (Spark `aggregate`, DuckDB `list_reduce`) with float multiplies and
    * double accumulation, so the IEEE result is bitwise identical —
    * verified exact on the full sf0.01 pair set.
    */
  def annBruteTopk(spark: SparkSession, dir: String): DataFrame =
    Similarity.bruteForceTopK(spark.read.parquet(s"$dir/embeddings.parquet"),
        col("vec_id") % 50 === 0, k = 5)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("cand_id"), col("cos"))
      .orderBy("query_id", "rank")

  /** ColBERT-style MaxSim top-5 ([[graft.ann.Similarity.maxSimTopK]]):
    * 64-dim vectors read as 8 token slices of 8 dims, score = Σ_i max_j
    * dot(q_i, d_j). ORACLED despite float scoring: slice dots fold
    * left-to-right (float multiply, double accumulate — the
    * ann_brute_topk discipline), per-token maxima are order-free exact
    * doubles, and the outer sum adds them in token order on both
    * engines.
    */
  def annMaxsimTopk(spark: SparkSession, dir: String): DataFrame =
    Similarity.maxSimTopK(spark.read.parquet(s"$dir/embeddings.parquet"),
        col("vec_id") % 50 === 25, k = 5)
      .orderBy("query_id", "rank")

  /** Hybrid-retrieval fusion ([[graft.ann.Similarity.rrfFuse]], RRF —
    * Cormack et al. 2009): the exact-cosine top-20 and the MaxSim
    * late-interaction top-20 for the SAME query set fused by integer
    * reciprocal ranks, top-5 re-ranked. Both input rankings are the
    * already-oracled bitwise-exact scorers, so the fusion oracle
    * replays list A, list B and the fold end-to-end.
    */
  def annRrf(spark: SparkSession, dir: String): DataFrame = {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    Similarity.rrfFuse(
      Similarity.bruteForceTopK(emb, col("vec_id") % 50 === 0, k = 20),
      Similarity.maxSimTopK(emb, col("vec_id") % 50 === 0, k = 20),
      k = 5)
      .orderBy("query_id", "rank")
  }

  /** LSH-bucketed approximate top-5 (scale path). ORACLED: the seeded
    * hyperplane tables are embedded in the SQL as exact round-trip double
    * literals, so DuckDB replays bucketing, multi-probe and the
    * sequential-fold cosine bit-for-bit.
    */
  def annLshTopk(spark: SparkSession, dir: String): DataFrame =
    Similarity.lshTopK(spark.read.parquet(s"$dir/embeddings.parquet"),
        col("vec_id") % 50 === 0, k = 5)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("cand_id"), col("cos"))
      .orderBy("query_id", "rank")

  /** IVF-Flat approximate top-5 (the third ANN tier): coarse quantizer
    * by deterministic modular sampling (vec_id % 31 = 5 → C ≈ n/31),
    * nProbe = 4 lists scanned per query. ORACLED: assignment, probing and
    * rerank all use the sequential-fold cosine both engines compute
    * bit-identically; the oracle replays the full quantizer.
    */
  def annIvfTopk(spark: SparkSession, dir: String): DataFrame =
    Similarity.ivfTopK(spark.read.parquet(s"$dir/embeddings.parquet"),
        queryPred = col("vec_id") % 50 === 0,
        centroidPred = col("vec_id") % 31 === 5,
        k = 5, nProbe = 4)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("cand_id"), col("cos"))
      .orderBy("query_id", "rank")

  /** IVF-PQ top-k — the compressed-vector ANN tier
    * ([[graft.ann.Similarity.ivfPqTopK]]: coarse IVF lists, ADC scan
    * over m=8 one-byte codes, exact rerank of 32 survivors). The driver
    * query uses the SAMPLED sub-codebooks (iters = 0 — init slices, no
    * Lloyd's) so the ENTIRE pipeline replays in SQL: code assignment
    * (sub-space L2 argmin), per-query ADC dot/norm tables, the approx
    * ranking that picks the survivors, and the exact rerank. The
    * trained-codebook path is covered by IvfPqSpec (partitioning
    * invariance + recall).
    */
  def annPqTopk(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val cents = emb.filter(col("vec_id") % 31 === 5)
      .select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])]
      .collect().map { case (id, v) => (id, v.toArray) }.sortBy(_._1)
    val pq = Similarity.trainPq(emb, col("vec_id") % 40 === 3,
      m = 8, ksub = 8, iters = 0)
    Similarity.ivfPqTopK(emb, col("vec_id") % 50 === 0, cents, pq,
        k = 5, nProbe = 4, rerank = 32)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("cand_id"), col("cos"))
      .orderBy("query_id", "rank")
  }

  /** End-to-end curation funnel — the composition a training-data run
    * executes: quality gate (n_tokens ≥ 20, stopword_ratio > 0.02) →
    * exact dedup (keep smallest id per text) → near-dup removal (drop the
    * larger id of every unigram-Jaccard ≥ 0.8 pair within
    * (lang, source, length-bucket) blocks). One row per stage with doc
    * and whitespace-token counts, so any drift in any stage breaks the
    * hash.
    */
  def ddPipeline(spark: SparkSession, dir: String): DataFrame = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    // the four stage aggregates union into one plan with NO cross-branch
    // subtree reuse — materialize each funnel stage once or the quality
    // scan executes per branch (4×) and the dedup window 3×
    val q = TextAnalysis.quality(docs).localCheckpoint()
    val qual = q.filter(col("n_tokens") >= 20 && col("stopword_ratio") > 0.02)
    val exact = Dedup.exact(qual).localCheckpoint()
    val nearIds = Dedup.jaccardPairs(exact, 0.8).select(col("b")).distinct()
    val near = exact.join(nearIds, exact("doc_id") === nearIds("b"), "left_anti")
    def stage(id: Int, name: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("n_docs"),
          coalesce(sum("n_tokens"), lit(0L)).as("n_tokens"))
        .select(lit(id).as("stage_id"), lit(name).as("stage"),
          col("n_docs"), col("n_tokens"))
    stage(0, "raw", q)
      .unionAll(stage(1, "quality", qual))
      .unionAll(stage(2, "exact_dedup", exact))
      .unionAll(stage(3, "near_dedup", near))
      .orderBy("stage_id")
  }

  /** Text-quality features (integer counts + exact single divisions). */
  def txtQuality(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.quality(spark.read.parquet(s"$dir/documents.parquet"))
      .select(col("doc_id"), col("n_tokens"), col("n_punct"),
        col("n_stopwords"), col("mean_token_len"), col("stopword_ratio"))
      .orderBy("doc_id")

  /** Repetition quality signals (Gopher/C4 rules): distinct-token and
    * duplicate-bigram counts plus top-token share — the standard
    * boilerplate/spam drop signals for web-text curation.
    */
  def txtRepetition(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.repetition(spark.read.parquet(s"$dir/documents.parquet"))
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        col("top_token_n"), col("dup_bigram_n"),
        col("top_token_share"), col("dup_bigram_frac"))
      .orderBy("doc_id")

  /** Rolling-hash fingerprints: shared-window containment groups. */
  def txtFingerprint(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.fingerprints(
        spark.read.parquet(s"$dir/documents.parquet"), window = 5)
      .groupBy("fingerprint").agg(count(lit(1)).as("n"),
        min("doc_id").as("first_doc"))
      .filter(col("n") > 1)
      .orderBy("fingerprint")

  /** Deterministic source-mixing recipe keyed by source index mod 4:
    * upsample 2.25x / keep / half / fifth — covering replication,
    * passthrough and subsampling in one run. Per-source totals verify
    * every per-doc FNV draw against the oracle's HUGEINT fold.
    */
  def txtMix(spark: SparkSession, dir: String): DataFrame = {
    val ratesBp = (0 until 20).map { k =>
      s"src$k" -> (k % 4 match {
        case 0 => 22500
        case 1 => 10000
        case 2 => 5000
        case _ => 2000
      })
    }.toMap
    graft.mix.Mix.mixture(
        spark.read.parquet(s"$dir/documents.parquet"), ratesBp)
      .groupBy("source")
      .agg(count(lit(1)).as("n_total"), sum("n_copies").as("n_out"))
      .orderBy("source")
  }

  /** PII scrub: the synthetic corpus carries no PII, so plant it
    * deterministically from doc_id (the media table's synthesize-then-
    * verify pattern), then count + redact with [[graft.text.Pii]]. The
    * oracle replays both the injection and the regex passes in DuckDB's
    * RE2 — the patterns use only constructs with identical Java/RE2
    * semantics — and `red_len` hash-checks the replacement itself, not
    * just the counts. doc_id%7==3 plants NEAR-misses (double @, short
    * dotted number, 2-2 digit dash pair) that must NOT match.
    */
  def txtPii(spark: SparkSession, dir: String): DataFrame = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val d = col("doc_id")
    val injected = docs.withColumn("text", concat(col("text"),
      when(pmod(d, lit(7)) === 0,
        concat(lit(" mail user"), d.cast("string"), lit("@example.com now")))
      .when(pmod(d, lit(7)) === 1,
        concat(lit(" node 10."), pmod(d, lit(256)).cast("string"), lit(".0.1 up")))
      .when(pmod(d, lit(7)) === 2,
        concat(lit(" call 555-"), (lit(100) + pmod(d, lit(900))).cast("string"),
          lit("-"), (lit(1000) + pmod(d, lit(9000))).cast("string"), lit(" today")))
      .when(pmod(d, lit(7)) === 3, lit(" ping bad@@nope 999.9 12-34 x"))
      .otherwise(lit(""))))
    Pii.redact(Pii.detect(injected))
      .select(col("doc_id"), col("n_email"), col("n_ipv4"), col("n_phone"),
        length(col("text")).cast("long").as("red_len"))
      .orderBy("doc_id")
  }

  /** Sequence packing: per-shard GPT-style concat-and-chunk assignments
    * at seqLen=128 (integer-exact, window-summed per shard). The oracle
    * replays the cumulative sum and the div/mod arithmetic in DuckDB.
    */
  def txtPack(spark: SparkSession, dir: String): DataFrame =
    Pack.pack(spark.read.parquet(s"$dir/documents.parquet"), seqLen = 128)
      .withColumnRenamed("offset", "tok_offset")
      .orderBy("doc_id")

  /** Per-source distinct-token cardinality via the KMV sketch: bounded
    * mergeable state, integer estimator — the oracle replays the
    * splitmix-finalized FNV token hashes, ranks them unsigned, and
    * recomputes (k−1)·2^64 // kth in HUGEINT, so the ESTIMATE itself
    * (not just counts) is hash-checked bit-exactly. k=16 (not the
    * production default 64) so the sf0.01 per-source vocabulary (~31
    * distinct tokens) actually overflows the sketch and the estimator
    * branch — not just the exact-below-k path — is driver-gated.
    */
  def sketchDistinct(spark: SparkSession, dir: String): DataFrame =
    graft.sketch.Kmv.distinctSketch(
        spark.read.parquet(s"$dir/documents.parquet"), k = 16)
      .orderBy("source")

  /** Theta-style set operations between per-source KMV sketches:
    * union/intersection cardinality estimates (and exact match counts)
    * for every source pair — the cross-corpus overlap audit (shared
    * vocabulary between crawl slices) that exact COUNT(DISTINCT)
    * set-ops would shuffle the whole corpus for. k=16 as in
    * sketch_distinct so the estimator branch (not just the exact
    * below-k path) is driver-gated; the oracle replays the bottom-k
    * ranks, the union re-rank, theta, and both integer estimators.
    */
  def sketchTheta(spark: SparkSession, dir: String): DataFrame =
    graft.sketch.Kmv.thetaPairs(
        spark.read.parquet(s"$dir/documents.parquet"), k = 16)
      .orderBy("src_a", "src_b")

  /** Media table shared by the three mm_* queries — encoding ~n real
    * BMP/WAV/Y4M containers is the dominant cost, so synthesize once per
    * dir (size-1 LRU, same pattern as the ontology extraction cache).
    */
  private val mediaCache = new DirCache[DataFrame]
  private def media(spark: SparkSession, dir: String): DataFrame =
    mediaCache.get(spark, dir)(Multimodal.mediaTable(spark, dir).localCheckpoint())

  /** Multimodal: synthesize container bytes, batch-decode metadata —
    * oracle recomputes every field (incl. byte size) from doc_id alone,
    * proving the encode → binary column → mapPartitions decode loop.
    */
  def mmMeta(spark: SparkSession, dir: String): DataFrame =
    Multimodal.decodeMeta(media(spark, dir))
      .orderBy("doc_id")

  /** JPEG tier: synthesize a JFIF container per image doc_id (SOF0 for
    * odd ids, progressive SOF2 for even) and marker-walk the header
    * back out ([[graft.multimodal.Multimodal.decodeJpegInfo]]) — dims,
    * component count, baseline/progressive flag, segment census, byte
    * size. Oracle recomputes every field from doc_id via the container
    * closed forms, so a parser reading anything but the real SOF
    * segment hash-fails. Same mapPartitions batch shape as mm_meta.
    */
  def mmJpeg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id")).as[Long]
      .filter((id: Long) => id % 3 == 0)
      .mapPartitions(_.map { id =>
        val w = (64 + id % 64).toInt
        val h = (64 + (id / 2) % 64).toInt
        val bytes = Multimodal.encodeJpeg(w, h, progressive = id % 2 == 0)
        val info = Multimodal.decodeJpegInfo(bytes).get
        (id, info.width, info.height, info.channels, info.progressive,
          info.nSegments.toLong, bytes.length.toLong)
      })
      .toDF("doc_id", "width", "height", "channels", "progressive",
        "n_segments", "n_bytes")
      .orderBy("doc_id")
  }

  /** Multimodal: resize to a 96px longest side (integer floor scaling,
    * aspect preserved) and RE-ENCODE in the real container — the oracle
    * recomputes the resized dims AND the re-encoded byte size from the
    * BMP/Y4M container specs, so both the scale math and the encoder
    * round-trip are hash-checked. Audio rows (no spatial dims) pass
    * through unchanged.
    */
  def mmResize(spark: SparkSession, dir: String): DataFrame =
    Multimodal.resize(media(spark, dir), maxSide = 96)
      .select(col("doc_id"), col("width"), col("height"),
        length(col("media")).cast("long").as("n_bytes"))
      .orderBy("doc_id")

  /** Perceptual image hashes (dHash + aHash over decoded pixels) for the
    * media table's BMP/PNG rows. ORACLED: the pixel payloads are the
    * deterministic (x+y) mod 251 gradient, so DuckDB recomputes both
    * 64-bit hashes from doc_id alone via the container specs (BMP rows
    * are stored bottom-up — visual row y reads gradient offset h-1-y;
    * PNG rows are top-down), proving the decode → grid-sample → hash
    * path end-to-end. Near-dup mining over these hashes reuses the
    * SimHash hamming pigeonhole (MultimodalSpec plants resized twins).
    */
  def mmPhash(spark: SparkSession, dir: String): DataFrame =
    Multimodal.perceptualHashes(media(spark, dir))
      .orderBy("doc_id")

  /** Multimodal: per-image channel means + dark-pixel share from real
    * decoded pixels ([[graft.multimodal.Multimodal.colorStats]]) — the
    * brightness/exposure pre-filter tier. Oracle replays the gradient
    * payload closed form ((3x + c + row) mod 251) over a generate_series
    * pixel grid; stats are orientation-invariant so BMP bottom-up and
    * PNG top-down replay identically.
    */
  def mmColorstats(spark: SparkSession, dir: String): DataFrame =
    Multimodal.colorStats(media(spark, dir))
      .orderBy("doc_id")

  /** Multimodal: audio feature-extract + energy-delta fingerprint over
    * the WAV rows (the audio analogue of mm_phash). Oracle replays the
    * closed-form sawtooth payload: sample i = (i mod 4096) - 2048.
    */
  def mmAudioFp(spark: SparkSession, dir: String): DataFrame =
    Multimodal.audioFingerprint(media(spark, dir))
      .orderBy("doc_id")

  /** Multimodal: energy-threshold voice-activity segmentation over the
    * WAV rows (see [[graft.multimodal.Multimodal.vadSegments]]). Oracle
    * replays frame energies from the closed-form sawtooth payload and
    * the segment merge as gaps-and-islands.
    */
  def mmVad(spark: SparkSession, dir: String): DataFrame =
    Multimodal.vadSegments(media(spark, dir))
      .orderBy("doc_id")

  /** Corpus for soft dedup: the full documents table plus exact twins —
    * every 8th doc copied twice (ids + 3e6 and + 6e6), so cluster sizes
    * are 1 and 3 and the two weight levels (10000 / 3333 bp) both occur.
    */
  private[graft] def softDedupCorpus(spark: SparkSession,
      dir: String): DataFrame = {
    val base = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    def twin(off: Long) = base.filter(col("doc_id") % 8 === 0)
      .select((col("doc_id") + off).as("doc_id"), col("text"))
    base.union(twin(3000000L)).union(twin(6000000L))
  }

  /** Duplicate REWEIGHTING (SoftDeDup) over the planted-twin corpus —
    * the keep-everything alternative to dd_exact's removal (see
    * [[graft.dedup.Dedup.softDedupWeights]] for the narrow-projection
    * scale shape).
    */
  def ddSoftdedup(spark: SparkSession, dir: String): DataFrame =
    graft.dedup.Dedup.softDedupWeights(softDedupCorpus(spark, dir))
      .orderBy("doc_id")

  /** Per-source KL divergence from the corpus unigram distribution —
    * the domain-shift audit behind mixture tuning (see
    * [[graft.mix.Mix.klBySource]] for the term-wise micro-nat
    * decomposition and the token-type-scale plan).
    */
  def mixKl(spark: SparkSession, dir: String): DataFrame =
    graft.mix.Mix.klBySource(
        spark.read.parquet(s"$dir/documents.parquet"))
      .orderBy("source")

  /** JSONL source tier: documents → to_json lines → from_json parse —
    * the oracle is the source table itself, so a single mis-escaped
    * byte anywhere in the JSON round trip hash-fails (see
    * [[graft.sources.Jsonl]]; the real file write/read path and the
    * hostile-content suite are JsonlSpec's).
    */
  def srcJsonl(spark: SparkSession, dir: String): DataFrame =
    graft.sources.Jsonl.parseLines(
        graft.sources.Jsonl.encodeLines(
          spark.read.parquet(s"$dir/documents.parquet")))
      .orderBy("doc_id")

  /** CSV source tier: documents → to_csv records → from_csv parse —
    * identity oracle like src_jsonl, so one mis-quoted byte through RFC
    * 4180 doubling hash-fails (see [[graft.sources.Csv]]; the real
    * shard write/read path, empty-vs-null discipline and the
    * non-splittability trade are CsvSpec's).
    */
  def srcCsv(spark: SparkSession, dir: String): DataFrame =
    graft.sources.Csv.parseLines(
        graft.sources.Csv.encodeLines(
          spark.read.parquet(s"$dir/documents.parquet")))
      .orderBy("doc_id")

  /** TFRecord source tier: documents → 32-record CRC32C-framed TFRecord
    * files with tf.train.Example payloads → parse (both CRCs verified)
    * → decode — identity oracle, so one wrong varint / CRC / proto tag
    * byte hash-fails (see [[graft.sources.TfRecord]]; golden wire bytes
    * and the corruption suite are TfRecordSpec's). Same mapGroups batch
    * shape as src_warc: a shard's records live in one task, no
    * cross-partition state.
    */
  def srcTfrecord(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("lang"), col("source"), col("text"))
      .as[(Long, String, String, String)]
      .groupByKey(_._1 / 32)
      .mapGroups { (_, it) =>
        graft.sources.TfRecord.encodeFile(it.toSeq.sortBy(_._1)
          .map { case (id, l, s, t) =>
            graft.sources.TfRecord.encodeExample(id, l, s, t) })
      }
      .flatMap(graft.sources.TfRecord.parseFile(_)
        .map(graft.sources.TfRecord.decodeExample))
      .toDF("doc_id", "lang", "source", "text")
      .orderBy("doc_id")
  }

  /** ORC source tier: documents → real ORC shard files (zlib, bloom
    * filter on doc_id) → vectorized native read — identity oracle like
    * src_jsonl/src_csv, so one mis-encoded byte through the
    * writer/reader pair hash-fails (see [[graft.sources.Orc]]; the
    * pruning/pushdown plan laws and the native null≠empty discipline
    * are OrcSpec's). There is no in-plan `to_orc` expression, so this
    * tier goes through real files — the honest path, since stripe
    * layout IS what the tier is about.
    */
  def srcOrc(spark: SparkSession, dir: String): DataFrame = {
    // unique dir per invocation (round-6 advice): a fixed path keyed on
    // dir.hashCode raced concurrent/interleaved invocations — an
    // overwrite against a still-live read-back scan — and accumulated
    // at one address; createTempDirectory isolates each call and the
    // JVM-exit hook below reclaims the shards once the session ends
    val out = java.nio.file.Files
      .createTempDirectory("graft_src_orc_").toFile
    out.deleteOnExit()
    graft.sources.Orc.writeShards(
      spark.read.parquet(s"$dir/documents.parquet")
        .select("doc_id", "lang", "source", "text"), out.toString)
    graft.sources.Orc.readShards(spark, out.toString).orderBy("doc_id")
  }

  /** Arrow IPC source tier: documents → complete ARROW1-framed IPC
    * files (32-doc shards) → columnar decode — identity oracle like
    * src_tfrecord, so one wrong offset/validity-bit/UTF-8 byte in the
    * columnar layout hash-fails (see [[graft.sources.ArrowIpc]]; the
    * footer-seek framing laws and the no-per-batch-CRC trade vs
    * TFRecord are ArrowIpcSpec's). Same mapGroups batch shape as
    * src_warc/src_tfrecord: a shard's records live in one task.
    */
  def srcArrow(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("lang"), col("source"), col("text"))
      .as[(Long, String, String, String)]
      .groupByKey(_._1 / 32)
      .mapGroups { (_, it) =>
        graft.sources.ArrowIpc.encodeFile(it.toSeq.sortBy(_._1)
          .map { case (id, l, s, t) => graft.sources.ArrowIpc.Doc(id, l, s, t) })
      }
      .flatMap(graft.sources.ArrowIpc.decodeFile(_)
        .map(d => (d.doc_id, d.lang, d.source, d.text)))
      .toDF("doc_id", "lang", "source", "text")
      .orderBy("doc_id")
  }

  /** Incremental-ingest dedup: a RE-DELIVERED shard (doc_id ≥ 350 —
    * overlapping the corpus's < 400 range by 50 docs, the re-crawl /
    * re-shipped-shard scenario every ingestion pipeline hits) checked
    * against the EXISTING corpus through a broadcast Bloom filter
    * ([[graft.sketch.Bloom]]) — definitely-absent docs skip the exact
    * join entirely, only Bloom candidates (true dups + the ~1% fp tail)
    * reach the semi-join, so at 100 TB the verify stage's input is
    * ∝ dups, not ∝ batch. False negatives are impossible, so `is_dup`
    * is EXACT — the filter is purely a pruning layer, which is why the
    * oracle can state the truth as a plain semi-join while ALSO
    * replaying the filter bits (`bloom_candidate`) via the
    * sketch_bloom FNV machinery: candidate ⊇ dup is machine-checked on
    * every row.
    */
  def ddIncremental(spark: SparkSession, dir: String): DataFrame = {
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), sha2(col("text"), 256).as("h"))
    val corpus = d.filter(col("doc_id") < 400)
      .select(col("h").as("token")).distinct().localCheckpoint()
    val batch = d.filter(col("doc_id") >= 350)
    val filter = graft.sketch.Bloom.build(corpus)
    val probed = graft.sketch.Bloom
      .probe(filter, batch.select(col("h").as("token")).distinct())
    val verified = probed.filter(col("maybe_present") === 1)
      .join(corpus, Seq("token"), "left_semi")
      .select(col("token"), lit(1L).as("is_dup"))
    batch
      .join(probed.select(col("token").as("h"),
        col("maybe_present").cast("long").as("bloom_candidate")), "h")
      .join(verified.select(col("token").as("h"), col("is_dup")),
        Seq("h"), "left")
      .select(col("doc_id"), col("bloom_candidate"),
        coalesce(col("is_dup"), lit(0L)).as("is_dup"))
      .orderBy("doc_id")
  }

  /** Token-budget water-filling across sources
    * ([[graft.mix.Mix.waterFill]], budget = half the corpus tokens):
    * the integer water level and per-source allocations replay
    * bit-for-bit — the oracle re-derives the level from the same kink
    * scan over the domain-scale count table.
    */
  def mixBudget(spark: SparkSession, dir: String): DataFrame =
    graft.mix.Mix.waterFill(
      spark.read.parquet(s"$dir/documents.parquet"))

  /** GIF tier: a REAL LZW codec behind the same closed-form contract as
    * the other containers ([[graft.multimodal.Multimodal.encodeGif]]) —
    * per image doc the full GIF89a encode → parse → LZW decode runs in
    * one mapPartitions kernel (zero shuffles) and emits index-derived
    * stats. The (x+y) mod 251 payload means the oracle replays the
    * stats from a generate_series grid WITHOUT running LZW, while the
    * engine's values only match if the compressor/decompressor pair is
    * bit-correct — one wrong code width, clear, or KwKwK expansion
    * hash-fails. The codec's independent cross-check (JDK ImageIO
    * decodes our encoder's output pixel-identically) is GifSpec's.
    */
  def mmGif(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id")).as[Long]
      .filter((id: Long) => id % 4 == 1)
      .mapPartitions(_.map { id =>
        val w = (16 + id % 48).toInt
        val h = (16 + (id / 2) % 32).toInt
        val (dw, dh, idx) =
          Multimodal.decodeGifIndices(Multimodal.encodeGif(w, h))
            .getOrElse(sys.error(
              s"GIF round trip failed for doc $id (${w}x$h)"))
        var s = 0L; var g = 0L; var i = 0
        while (i < idx.length) {
          s += idx(i); g += (2 * idx(i)) % 256; i += 1
        }
        (id, dw.toLong, dh.toLong, s, g)
      })
      .toDF("doc_id", "width", "height", "idx_sum", "g_sum")
      .orderBy("doc_id")
  }

  /** Stride-scheduling mixture interleave
    * ([[graft.mix.Interleave.schedule]]): the global training order for
    * weighted source mixing WITHOUT a global sort — per-source ranks
    * from one source-keyed window, global positions from the exact
    * cross-multiplied closed form over the broadcast source
    * dictionary. The oracle derives the SAME order by a different
    * algorithm (LCM-scaled integer sort keys + global ROW_NUMBER), so
    * the closed form is machine-checked row-by-row.
    */
  def mixInterleave(spark: SparkSession, dir: String): DataFrame =
    graft.mix.Interleave.schedule(
        spark.read.parquet(s"$dir/documents.parquet"))
      .orderBy("doc_id")

  /** Priority sampling ([[graft.sketch.PrioritySample]], Duffield et
    * al. 2007): k=16 weighted draw by char mass with the max(w, τ)
    * unbiased subset-sum estimator — priorities are identical IEEE
    * doubles on both engines (same MixHash-derived ints, same
    * division), so the whole draw, τ, and every estimate replay
    * bit-for-bit.
    */
  def sketchPriority(spark: SparkSession, dir: String): DataFrame =
    graft.sketch.PrioritySample.sample(
        spark.read.parquet(s"$dir/documents.parquet"), k = 16)
      .orderBy("doc_id")

  /** Multimodal: frame sampling plumbing (video rows, stride 7). */
  def mmFrames(spark: SparkSession, dir: String): DataFrame =
    Multimodal.frameSample(media(spark, dir), stride = 7)
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"))
      .orderBy("doc_id", "frame_idx")

  /** Bigram-LM perplexity quality signal (CCNet-style): per-doc mean
    * −ln p over corpus-trained add-one bigram statistics. Integer
    * micro-nat quantization makes the score hash-exact across engines.
    */
  def txtPerplexity(spark: SparkSession, dir: String): DataFrame =
    graft.text.LangModel.bigramNll(
        spark.read.parquet(s"$dir/documents.parquet"))
      .orderBy("doc_id")

  /** Per-domain document cap (RefinedWeb-style "no host dominates the
    * corpus"): top 10 docs per source by (n_chars DESC, doc_id) via the
    * bounded map-side top-n Aggregator — the exchange carries ≤ tasks ×
    * domains × 10 16-byte keys, never corpus rows, so a Zipf-hot domain
    * cannot pin a reducer (see [[graft.mix.DomainCap]]).
    */
  def ddDomainCap(spark: SparkSession, dir: String): DataFrame =
    graft.mix.DomainCap.capKeys(
        spark.read.parquet(s"$dir/documents.parquet"), 10)
      .orderBy("source", "rk")

  /** Count-Min Sketch frequency estimates for the gazetteer tokens next
    * to their exact counts. The synthetic corpus vocabulary is small
    * enough that the 4×256 sketch happens to be collision-free here
    * (est == exact — itself a strong oracle: one miscounted cell
    * breaks the hash); the est > exact overestimate regime and the
    * one-sided guarantee are exercised by CmsSpec's 500-token long-tail
    * generator. The sketch is built relationally — one (row, bucket)
    * hash agg, matrix ≤ 4×256 — and replays bit-exactly in SQL because
    * CMS addition is commutative integer sums (see [[graft.sketch.Cms]]).
    */
  def sketchCms(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = spark.read.parquet(s"$dir/documents.parquet")
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "").as[String]
    val ents = graft.extract.Gazetteer.DefaultEntities.sorted
    val est = graft.sketch.Cms.estimates(toks, ents)
    val exact = toks.toDF("tok").filter(col("tok").isin(ents: _*))
      .groupBy(col("tok").as("token")).agg(count(lit(1)).as("exact"))
    est.join(exact, Seq("token"), "left_outer")
      .select(col("token"), col("est"),
        coalesce(col("exact"), lit(0L)).as("exact"))
      .orderBy("token")
  }

  /** Log-bucketed quantile sketch over per-doc token counts — corpus
    * length-distribution percentiles (p50/p90/p99) without a global
    * sort: one bounded histogram aggregation (≤1024 buckets regardless
    * of corpus size), quantiles read off cumulative counts in pure
    * integer arithmetic. The bucket function uses `bin()` (present
    * verbatim in Spark AND DuckDB), so the oracle replays the sketch
    * bit-exactly — see [[graft.sketch.QuantileHist]].
    */
  def sketchQuantile(spark: SparkSession, dir: String): DataFrame = {
    val v = spark.read.parquet(s"$dir/documents.parquet")
      .select(size(split(col("text"), " ")).cast("long").as("v"))
    graft.sketch.QuantileHist.quantiles(v, "v", Seq(50, 90, 99))
      .orderBy("q")
  }

  /** Per-source token-count percentiles — the keyed form of
    * sketch_quantile (per-domain / per-language distribution
    * monitoring). One map-side-combined (source, bucket) aggregation;
    * the cumulative walk partitions by source, so no task ever holds
    * more than one bounded histogram.
    */
  def sketchQuantileSrc(spark: SparkSession, dir: String): DataFrame = {
    val v = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("source"),
        size(split(col("text"), " ")).cast("long").as("v"))
    graft.sketch.QuantileHist.quantilesByKey(v, "source", "v",
        Seq(50, 90, 99))
      .orderBy("source", "q")
  }

  /** Per-doc top-5 tf-idf keywords (integer-proxy score, bounded
    * WindowGroupLimit shape — see [[TextAnalysis.keywords]]).
    */
  def txtKeywords(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.keywords(
        spark.read.parquet(s"$dir/documents.parquet"), topK = 5)
      .orderBy("doc_id", "rnk")

  /** Context-window chunking with overlap (64-token windows, 16-token
    * left context) — docs → training sequences, entirely in-row, zero
    * shuffles (see [[TextAnalysis.chunk]]). The oracle replays the
    * integer chunk arithmetic and every slice via
    * generate_series/list_slice.
    */
  def txtChunk(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.chunk(
        spark.read.parquet(s"$dir/documents.parquet"),
        window = 64, overlap = 16)
      .orderBy("doc_id", "chunk_idx")

  /** Per-source distinct-token cardinality via HyperLogLog — the
    * fixed-size counterpart of sketch_distinct's KMV. Driver-checks the
    * INTEGER CORE of the register vector: count of non-zero registers,
    * the exact harmonic-mean denominator Σ2^(57-r) (zero registers
    * included; see [[graft.sketch.Hll.FullExp]] for the overflow-free
    * scaling) and a placement checksum — one flipped register anywhere
    * breaks sum_pow or checksum. The oracle replays every register:
    * splitmix-finalized FNV hashes, bucket = low 6 bits, rho =
    * bit_count((w & -w) - 1) + 1 in integer arithmetic, MAX per bucket.
    * The float estimate over these integers is ScalaTested (HllSpec).
    */
  def sketchHll(spark: SparkSession, dir: String): DataFrame =
    graft.sketch.Hll.summary(
        spark.read.parquet(s"$dir/documents.parquet"))
      .orderBy("source")

  /** Bloom-filter decontamination probe: build the 4096-bit k=4 filter
    * over the eval slice's (doc_id ≡ 0 mod 50) distinct tokens, probe
    * the gazetteer vocabulary plus ten known-absent tokens. Output per
    * probe: set-bit hits (k ⇒ possibly present, <k ⇒ definitely
    * absent), the filter verdict, exact membership, and the filter's
    * total popcount (pins the whole bit vector). The oracle replays the
    * FNV bit positions and the BIT_OR word matrix bit-exactly; the
    * false-positive regime and no-false-negative law are BloomSpec'd.
    */
  def sketchBloom(spark: SparkSession, dir: String): DataFrame = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val members = docs.filter(pmod(col("doc_id"), lit(50)) === 0)
      .select(explode(filter(split(col("text"), " "), t => t =!= ""))
        .as("token"))
      .distinct()
      .localCheckpoint() // two consumers: filter build + exact membership
    val bloom = graft.sketch.Bloom.build(members).localCheckpoint()
    val probeToks = (graft.extract.Gazetteer.DefaultEntities.sorted ++
      (0 until 10).map(i => s"absent:$i")).toSeq
    import spark.implicits._
    val probes = probeToks.toDF("token")
    val popcount = bloom.agg(sum(bit_count(col("bits"))).as("bits_total"))
    graft.sketch.Bloom.probe(bloom, probes)
      .join(members.withColumn("exact_present", lit(1)), Seq("token"),
        "left_outer")
      .crossJoin(broadcast(popcount))
      .select(col("token"), col("hits"), col("maybe_present"),
        coalesce(col("exact_present"), lit(0)).as("exact_present"),
        col("bits_total"))
      .orderBy("token")
  }

  /** Per-source AMS F2 (self-join size / token concentration) sketch
    * next to the exact second moment. Every z_r — the whole linear
    * sketch state — replays bit-exactly in the oracle (FNV low-bit
    * signs, one integer sum per row); AMS's estimator law and
    * linear-merge property are AmsSpec'd.
    */
  def sketchAms(spark: SparkSession, dir: String): DataFrame = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val toks = docs.select(col("source"),
      explode(filter(split(col("text"), " "), t => t =!= "")).as("tok"))
    val exact = toks.groupBy("source", "tok")
      .agg(count(lit(1)).as("n"))
      .groupBy("source").agg(sum(col("n") * col("n")).as("exact_f2"))
    graft.sketch.Ams.sketch(docs)
      .join(exact, "source")
      .orderBy("source", "r")
  }

  /** BM25 ranked retrieval for the query {spark, vector, hash}: top 20
    * documents by the integer-exact BM25 core (see [[graft.text.Bm25]]).
    * The oracle replays tf/df/dl/(N, L) from the raw text and the exact
    * integer score — including the one micro-quantized ln — so the
    * RANKING itself is hash-checked.
    */
  def txtBm25(spark: SparkSession, dir: String): DataFrame =
    graft.text.Bm25.topk(spark.read.parquet(s"$dir/documents.parquet"),
      Bm25Terms, k = 20)

  private val Bm25Terms = Seq("spark", "vector", "hash")

  /** Canonical-URL dedup (crawl tier): deterministic messy variants of
    * each page URL (case/port/fragment/utm-param noise keyed on
    * doc_id%4, page id = doc_id/4) are normalized by [[UrlCanon]] and
    * collapsed; survivor = min doc_id per canonical URL.
    */
  def ddUrls(spark: SparkSession, dir: String): DataFrame = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val base = concat(lit("https://example.org/page/"),
      expr("doc_id div 4"))
    val baseUp = concat(lit("HTTPS://EXAMPLE.ORG:443/page/"),
      expr("doc_id div 4"))
    val url = when(pmod(col("doc_id"), lit(4)) === 0, base)
      .when(pmod(col("doc_id"), lit(4)) === 1,
        concat(baseUp, lit("?utm_source=feed&utm_campaign=x#frag")))
      .when(pmod(col("doc_id"), lit(4)) === 2,
        concat(base, lit("?b=2&a=1&utm_medium=email")))
      .otherwise(concat(base, lit("?a=1&b=2#sec2")))
    docs.select(col("doc_id"),
        graft.extract.UrlCanon.canonical(url).as("canonical_url"))
      .groupBy("canonical_url")
      .agg(min(col("doc_id")).as("survivor_doc"),
        count(lit(1)).as("n_variants"))
      .orderBy("canonical_url")
  }

  /** Exact-substring span dedup over a corpus with a planted two-sided
    * chorus (docs ≡ 0 mod 5 get a 20-token run prepended AND appended,
    * so multi-span merging is genuinely exercised) plus whatever
    * organic window duplication the corpus carries. Oracle replays the
    * polynomial window hash in HUGEINT SQL and the span merge with a
    * lag() window.
    */
  def ddSpans(spark: SparkSession, dir: String): DataFrame = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val planted = docs.select(col("doc_id"),
      when(pmod(col("doc_id"), lit(5)) === 0,
        concat(lit(SpanChorus + " "), col("text"), lit(" " + SpanChorus)))
        .otherwise(col("text")).as("text"))
    Dedup.duplicateSpans(planted, window = 13).orderBy("doc_id")
  }

  private val SpanChorus = "the quick brown fox jumps over the lazy dog " +
    "while the eager crawler indexes every page on the open web"

  /** Content-defined chunk dedup over the dd_spans planted corpus (the
    * chorus is longer than the ~64-char expected chunk, so its chunks
    * recur across every fifth doc): chunks from
    * [[graft.dedup.Dedup.cdcChunks]] (one typed projection, no
    * shuffle), then one (hash, len)-keyed agg — chunks shared by ≥ 2
    * docs with occurrence counts, the storage-dedup report. Oracle
    * refolds every 8-gram AND every chunk in HUGEINT and replays the
    * boundary split.
    */
  def ddCdc(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.select(col("doc_id"),
        when(pmod(col("doc_id"), lit(5)) === 0,
          concat(lit(SpanChorus + " "), col("text"), lit(" " + SpanChorus)))
          .otherwise(col("text")).as("text"))
      .as[(Long, String)]
      .flatMap { case (id, t) =>
        Dedup.cdcChunks(t).map { case (h, len) => (id, h, len.toLong) }
      }
      .toDF("doc_id", "chunk_hash", "chunk_len")
      .groupBy("chunk_hash", "chunk_len")
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occ"))
      .filter(col("n_docs") >= 2)
      .orderBy("chunk_hash", "chunk_len")
  }

  /** Deterministic 16-way shard assignment + pseudorandom sort key —
    * the global-shuffle/sharding step of training-data prep as a pure
    * map (no global sort); oracle replays the FNV fold.
    */
  def txtShard(spark: SparkSession, dir: String): DataFrame =
    graft.mix.Mix.shardAssign(
        spark.read.parquet(s"$dir/documents.parquet"), nShards = 16)
      .orderBy("doc_id")

  /** Deterministic 3-epoch shuffle schedule over 16 shards (see
    * [[graft.mix.Mix.epochSchedule]] — fresh permutation per epoch,
    * reproducible across restarts AND cluster sizes, no global sort).
    * Oracle replays the FNV fold over `doc_id ":" epoch`, the splitmix
    * finalizer chain, the power-of-two shard modulus and the
    * (epoch, shard)-ranked ROW_NUMBER.
    */
  def mixEpochs(spark: SparkSession, dir: String): DataFrame =
    graft.mix.Mix.epochSchedule(
        spark.read.parquet(s"$dir/documents.parquet"),
        epochs = 3, nShards = 16)
      .orderBy("epoch", "doc_id")

  /** Deterministic per-source 5-sample by avalanche-hash rank — the
    * stable heldout/eval draw (see [[graft.mix.Mix.sample]]; the
    * shuffle carries ≈ sources × k × partitions rows via
    * InsertWindowGroupLimits, never the corpus). Oracle replays the
    * mix chain per doc_id and the signed-order ROW_NUMBER.
    */
  def mixSample(spark: SparkSession, dir: String): DataFrame =
    graft.mix.Mix.sample(
        spark.read.parquet(s"$dir/documents.parquet"), k = 5)
      .orderBy("source", "rk")

  /** Per-document Shannon token entropy in deterministic micro-nats
    * (see [[graft.text.TextAnalysis.entropy]] — ln only over small
    * integer counts, scaled before the multiply, so every quantization
    * decision is engine-stable). Oracle replays histogram,
    * per-count quantization, integer sum and floor division.
    */
  def txtEntropy(spark: SparkSession, dir: String): DataFrame =
    graft.text.TextAnalysis.entropy(
        spark.read.parquet(s"$dir/documents.parquet"))
      .orderBy("doc_id")

  /** Exact heavy hitters (tokens with ≥ 1/30 of corpus mass) via the
    * two-pass Misra–Gries candidates + exact-recount shape (see
    * [[graft.sketch.HeavyHitters]] — pass 1 shuffles nothing, pass 2
    * aggregates candidate keys only; the output depends ONLY on the
    * data, so the oracle is the plain HAVING query).
    */
  def txtHeavyhitters(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = spark.read.parquet(s"$dir/documents.parquet")
      .select(explode(filter(split(col("text"), " "), w => w =!= ""))
        .as("tok"))
      .as[String]
    graft.sketch.HeavyHitters.exact(toks, k = 30)
      .orderBy(desc("c"), col("tok"))
  }

  /** Temperature-scaled mixture weights (p_i ∝ √c_i, the mT5/XLM-R
    * α = 1/2 recipe) in exact integer basis points with
    * largest-remainder rounding — see [[graft.mix.Mix.temperatureBp]].
    * Oracle replays isqrt fixed point, floor shares and the remainder
    * ranking.
    */
  def mixTemperature(spark: SparkSession, dir: String): DataFrame =
    graft.mix.Mix.temperatureBp(
        spark.read.parquet(s"$dir/documents.parquet"))
      .orderBy("source")

  /** Top-20 bigram collocations by Dunning's G² in micro-nats (see
    * [[graft.text.TextAnalysis.collocations]] — ln only over integer
    * counts, the txt_entropy quantization; bigrams explode in-row, the
    * marginals aggregate the checkpointed bigram-TYPE table). Oracle
    * replays the contingency table and all nine quantized terms.
    */
  def txtCollocations(spark: SparkSession, dir: String): DataFrame =
    graft.text.TextAnalysis.collocations(
      spark.read.parquet(s"$dir/documents.parquet"), topK = 20)

  /** WARC/1.0 round trip feeding the byte-identical extraction
    * invariant: pages serialize into Content-Length-framed records
    * (32 per archive — bounded groups, archive count grows with the
    * corpus), the archives parse back ([[graft.sources.Warc]]), and
    * [[graft.extract.ExtractMainText]] recovers `documents.text`
    * byte-for-byte — the oracle IS the source table, so a framing slip
    * of even one byte hash-fails. WARC-Date survives as a real
    * timestamp (ISO format + to_timestamp).
    */
  def srcWarc(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.pages.PageGen.pages(spark, dir)
      .select(col("doc_id"), col("url"),
        // ISO WARC-Date rendered engine-side (UTC session TZ) — a
        // DateTimeFormatter in the closure is not serializable
        date_format(col("warc_ts"), "yyyy-MM-dd'T'HH:mm:ss'Z'")
          .as("date_iso"),
        col("html"))
      .as[(Long, String, String, Array[Byte])]
      .groupByKey(_._1 / 32)
      .mapGroups { (_, it) =>
        graft.sources.Warc.encode(it.toSeq.sortBy(_._1)
          .map { case (_, url, iso, html) =>
            graft.sources.Warc.Rec(url, iso, html)
          })
      }
      .flatMap(graft.sources.Warc.parse(_)
        .map(r => (r.url, r.dateIso, r.payload)))
      .toDF("url", "date_iso", "html")
      .select(col("url"),
        to_timestamp(col("date_iso"), "yyyy-MM-dd'T'HH:mm:ss'Z'")
          .as("warc_ts"),
        graft.extract.ExtractMainText(col("html")).as("extracted"))
      .orderBy("url")
  }

  /** BPE tokenizer-training trace ([[graft.text.Bpe]], Sennrich et al.
    * 2016): the first 8 learned merge rules with their winning pair
    * counts. The corpus is touched ONCE (word-frequency aggregation,
    * map-side combine); every merge round then runs over the
    * vocab-scale symbol table with a 1-row argmax to the driver — the
    * algorithm's inherent sequential dependency, and the standard
    * corpus/vocab scale split (at 10^12 docs the word dict is orders
    * of magnitude smaller than the corpus, capped at `maxVocab` by
    * (freq DESC, word) like production trainer word dicts).
    * Determinism: pair ties break (count DESC, a, b) in code-point
    * order on both engines (Spark binary UTF8 asc ≡ DuckDB binary
    * collation).
    *
    * The oracle replays the ENTIRE training loop round-per-CTE: words
    * are wrapped per code point in sentinel chars (chr30/chr31 around
    * each symbol), so the merge-apply step becomes a plain
    * non-overlapping left-to-right `replace('⟨a⟩⟨b⟩' → '⟨ab⟩')` —
    * exactly Bpe.applyMergeOnce's scan order — and each round's pair
    * histogram re-derives by splitting the wrapped state. Words
    * containing either sentinel are excluded on BOTH sides (none occur
    * in the corpus; the guard keeps the wrapping unambiguous). The
    * 8 rounds assume ≥8 productive merges — guaranteed for any corpus
    * with ≥8 distinct repeated-pair merges (sf0.001 has thousands).
    */
  def txtBpe(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val wc = docs.select(explode(split(col("text"), "\\s+")).as("word"))
      .filter(col("word") =!= "" &&
        !col("word").contains("\u001e") && !col("word").contains("\u001f"))
      .groupBy("word").agg(count(lit(1)).as("n"))
    graft.text.Bpe.trainDetailedFromCounts(wc, numMerges = 8,
        maxVocab = 65536)
      .zipWithIndex
      .map { case ((a, b, c), i) => (i + 1L, a, b, c) }
      .toDF("merge_rank", "a", "b", "cnt")
  }

  /** Corpus BPE encoding — the inference half of txt_bpe: per-doc token
    * counts under the trained merge table. The expensive encode runs
    * ONCE PER WORD TYPE (vocab-scale typed map replaying the merges in
    * training order, [[graft.text.Bpe.encodeWordSequential]]); the
    * corpus is then touched by one explode → broadcast vocab join →
    * map-side-combined per-doc sum — at 10^12 docs the corpus never
    * shuffles wider than (doc_id, two longs). Oracle: the txt_bpe
    * round-per-CTE replay carries each word to the final round, token
    * count = symbol count of the terminal wrapped state.
    */
  def txtEncode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val wc = docs.select(explode(split(col("text"), "\\s+")).as("word"))
      .filter(col("word") =!= "" &&
        !col("word").contains("\u001e") && !col("word").contains("\u001f"))
      .groupBy("word").agg(count(lit(1)).as("n"))
      .localCheckpoint() // reused: trainer input + the encode pass
    val merges = graft.text.Bpe
      .trainDetailedFromCounts(wc, numMerges = 8, maxVocab = 65536)
      .map { case (a, b, _) => (a, b) }
    val wordTok = wc.orderBy(desc("n"), asc("word")).limit(65536)
      .select("word").as[String]
      .map(w => (w,
        graft.text.Bpe.encodeWordSequential(w, merges).length.toLong))
      .toDF("word", "ntok")
    val agg = docs
      .select(col("doc_id"), explode(split(col("text"), "\\s+")).as("word"))
      .join(broadcast(wordTok), "word")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum("ntok").as("n_bpe_tokens"))
    docs.select("doc_id").join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_bpe_tokens"), lit(0L)).as("n_bpe_tokens"))
      .orderBy("doc_id")
  }

  /** Integer k-means topic bucketing
    * ([[graft.text.TopicCluster.assign]], K = 4, 2 Lloyd's rounds over
    * 16-dim hashed token-count vectors): per-doc cluster + exact
    * squared distance. Oracle replays feature hashing (FNV mod 16 in
    * HUGEINT), both centroid updates (integer floor means, empty
    * clusters keep their centroid) and all three assignment stages
    * round-per-CTE in sparse relational form — dense-array and sparse
    * replays agree because every step is exact integers.
    */
  def txtCluster(spark: SparkSession, dir: String): DataFrame =
    graft.text.TopicCluster.assign(
      spark.read.parquet(s"$dir/documents.parquet"), rounds = 2)

  /** txt_cluster oracle: sparse replay of [[txtCluster]]. Round r:
    * assignment a_r under centroids c_{r-1} (argmin by (d2, j)), update
    * c_r = per-cluster integer floor mean with empty clusters keeping
    * c_{r-1}; output = assignment under the final centroids. */
  private def clusterOracleSql(rounds: Int): String = {
    val fold = fnvFoldSql("tok", "14695981039346656037")
    def asg(k: Int): String =
      s"""a$k AS (SELECT doc_id, j, d2,
         |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY d2, j) AS rn
         |  FROM (SELECT g.doc_id, c.j,
         |      SUM((COALESCE(dv.c, 0) - c.v) * (COALESCE(dv.c, 0) - c.v))
         |        AS d2
         |    FROM ids g CROSS JOIN c${k - 1} c
         |    LEFT JOIN dv ON dv.doc_id = g.doc_id AND dv.dim = c.dim
         |    GROUP BY 1, 2))""".stripMargin
    def upd(k: Int): String =
      s"""m$k AS (SELECT doc_id, j FROM a$k WHERE rn = 1),
         |n$k AS (SELECT j, COUNT(*) AS n FROM m$k GROUP BY 1),
         |s$k AS (SELECT m.j, d.dim, CAST(SUM(COALESCE(dv.c, 0)) AS BIGINT) AS s
         |  FROM m$k m CROSS JOIN dims d
         |  LEFT JOIN dv ON dv.doc_id = m.doc_id AND dv.dim = d.dim
         |  GROUP BY 1, 2),
         |c$k AS (SELECT c${k - 1}.j, c${k - 1}.dim,
         |    COALESCE(s$k.s // n$k.n, c${k - 1}.v) AS v
         |  FROM c${k - 1}
         |  LEFT JOIN s$k ON s$k.j = c${k - 1}.j AND s$k.dim = c${k - 1}.dim
         |  LEFT JOIN n$k ON n$k.j = c${k - 1}.j)""".stripMargin
    val body = (1 to rounds).map(k => s"${asg(k)},\n${upd(k)}")
      .mkString(",\n")
    s"""WITH tk AS (SELECT doc_id,
       |    unnest(list_filter(string_split(text, ' '), t -> t <> ''))
       |      AS tok
       |  FROM documents),
       |dv AS (SELECT doc_id, CAST(($fold) % 16 AS BIGINT) AS dim,
       |    CAST(COUNT(*) AS BIGINT) AS c
       |  FROM tk GROUP BY 1, 2),
       |ids AS (SELECT DISTINCT doc_id FROM dv),
       |dims AS (SELECT unnest(generate_series(0, 15)) AS dim),
       |init AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS j
       |  FROM ids ORDER BY doc_id LIMIT 4),
       |c0 AS (SELECT i.j, d.dim, COALESCE(dv.c, 0) AS v
       |  FROM init i CROSS JOIN dims d
       |  LEFT JOIN dv ON dv.doc_id = i.doc_id AND dv.dim = d.dim),
       |$body,
       |${asg(rounds + 1)}
       |SELECT doc_id, CAST(j AS BIGINT) AS cluster, CAST(d2 AS BIGINT) AS dist2
       |FROM a${rounds + 1} WHERE rn = 1 ORDER BY doc_id""".stripMargin
  }

  /** Language ID over the corpus ([[TextAnalysis.langId]] — the UDF-free
    * integer-exact scorer): per-doc predicted language + micro-score.
    * The oracle carries the ~650-row trigram profile as a VALUES literal
    * (generated from the same [[TextAnalysis.ProfileCounts]] constants)
    * and replays the explode → broadcast-join → integer-div → argmax
    * pipeline verbatim.
    */
  def txtLangid(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.langId(spark.read.parquet(s"$dir/documents.parquet"))
      .orderBy("doc_id")

  private def langidOracleSql: String = {
    val rows = TextAnalysis.ProfileCounts.toSeq.sortBy(_._1)
      .flatMap { case (lang, (m, np)) =>
        m.toSeq.sortBy(_._1).map { case (g, c) =>
          s"('$lang', '${g.replace("'", "''")}', $c, $np)"
        }
      }.mkString(",\n    ")
    s"""WITH prof(lang, gram, pc, nprof) AS (VALUES
       |    $rows),
       |pad AS (SELECT doc_id,
       |    ' ' || regexp_replace(lower(text), '[^\\p{L} ]', '', 'g') || ' '
       |      AS p FROM documents),
       |dg AS (SELECT doc_id, substr(p, i, 3) AS gram, COUNT(*) AS dc
       |  FROM pad, unnest(generate_series(1, length(p) - 2)) AS g(i)
       |  GROUP BY 1, 2),
       |sc AS (SELECT doc_id, lang,
       |    SUM(pc * dc) * 1000000 // nprof AS score_micro
       |  FROM dg JOIN prof USING (gram) GROUP BY doc_id, lang, nprof),
       |best AS (SELECT doc_id, lang, score_micro,
       |    ROW_NUMBER() OVER (PARTITION BY doc_id
       |      ORDER BY score_micro DESC, lang) AS rn
       |  FROM sc)
       |SELECT d.doc_id, COALESCE(b.lang, 'und') AS lang_pred,
       |  CAST(COALESCE(b.score_micro, 0) AS BIGINT) AS score_micro
       |FROM documents d
       |LEFT JOIN (SELECT * FROM best WHERE rn = 1) b USING (doc_id)
       |ORDER BY doc_id""".stripMargin
  }

  /** Shared txt_bpe / txt_encode training-replay CTE chain: capped
    * vocab `wc`, sentinel-wrapped `r0`, and per-round split → weighted
    * pair histogram → (cnt DESC, a, b) argmax → LTR non-overlapping
    * replace. Rounds carry the WORD so encode-side consumers can join
    * the final symbol state back to the corpus. */
  private def bpeRoundsCte(numMerges: Int, maxVocab: Int): String = {
    val rounds = (1 to numMerges).map { k =>
      s"""s$k AS (SELECT string_split(substr(st, 2, length(st) - 2),
         |    chr(31)||chr(30)) AS syms, n FROM r${k - 1}),
         |p$k AS (SELECT syms[i] AS a, syms[i+1] AS b, SUM(n) AS cnt
         |  FROM s$k, unnest(generate_series(1, len(syms) - 1)) AS g(i)
         |  GROUP BY 1, 2),
         |m$k AS (SELECT a, b, cnt FROM p$k ORDER BY cnt DESC, a, b LIMIT 1),
         |r$k AS (SELECT word, replace(st,
         |    chr(30)||a||chr(31)||chr(30)||b||chr(31),
         |    chr(30)||a||b||chr(31)) AS st, n FROM r${k - 1}, m$k)"""
        .stripMargin
    }.mkString(",\n")
    s"""wc AS (
       |  SELECT word, COUNT(*) AS n FROM (
       |    SELECT unnest(regexp_split_to_array(text, '\\s+')) AS word
       |    FROM documents) t
       |  WHERE word <> '' AND word NOT LIKE '%'||chr(30)||'%'
       |    AND word NOT LIKE '%'||chr(31)||'%'
       |  GROUP BY word ORDER BY n DESC, word LIMIT $maxVocab),
       |r0 AS (SELECT word, regexp_replace(word, '(.)',
       |    chr(30)||'\\1'||chr(31), 'g') AS st, n FROM wc),
       |$rounds""".stripMargin
  }

  /** txt_bpe oracle: the training replay's per-round winning pairs. */
  private def bpeOracleSql(numMerges: Int, maxVocab: Int): String = {
    val sel = (1 to numMerges).map { k =>
      s"  SELECT CAST($k AS BIGINT) AS merge_rank, a, b," +
        s" CAST(cnt AS BIGINT) AS cnt FROM m$k"
    }.mkString("\n  UNION ALL\n")
    s"""WITH ${bpeRoundsCte(numMerges, maxVocab)}
       |SELECT merge_rank, a, b, cnt FROM (
       |$sel)
       |ORDER BY merge_rank""".stripMargin
  }

  /** txt_encode oracle: symbol counts read off the final round state
    * (len of the split wrapped string = tokens per word TYPE), joined
    * back to the exploded corpus; docs with no vocab words read 0. */
  private def bpeEncodeOracleSql(numMerges: Int, maxVocab: Int): String =
    s"""WITH ${bpeRoundsCte(numMerges, maxVocab)},
       |wordtok AS (SELECT word,
       |    len(string_split(substr(st, 2, length(st) - 2),
       |      chr(31)||chr(30))) AS ntok FROM r$numMerges),
       |dw AS (SELECT doc_id,
       |    unnest(regexp_split_to_array(text, '\\s+')) AS word
       |  FROM documents),
       |agg AS (SELECT doc_id, COUNT(*) AS n_words, SUM(ntok) AS ntoks
       |  FROM dw JOIN wordtok USING (word) GROUP BY doc_id)
       |SELECT d.doc_id, CAST(COALESCE(a.n_words, 0) AS BIGINT) AS n_words,
       |  CAST(COALESCE(a.ntoks, 0) AS BIGINT) AS n_bpe_tokens
       |FROM documents d LEFT JOIN agg a USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "txt_bpe" -> txtBpe,
    "txt_encode" -> txtEncode,
    "txt_cluster" -> txtCluster,
    "txt_langid" -> txtLangid,
    "mix_sample" -> mixSample,
    "mix_temperature" -> mixTemperature,
    "txt_entropy" -> txtEntropy,
    "txt_heavyhitters" -> txtHeavyhitters,
    "txt_collocations" -> txtCollocations,
    "src_warc" -> srcWarc,
    "dd_cdc" -> ddCdc,
    "dd_exact" -> ddExact,
    "dd_exact_clusters" -> ddExactClusters,
    "dd_decontam" -> ddDecontam,
    "dd_urls" -> ddUrls,
    "dd_spans" -> ddSpans,
    "dd_domain_cap" -> ddDomainCap,
    "txt_perplexity" -> txtPerplexity,
    "txt_shard" -> txtShard,
    "mix_epochs" -> mixEpochs,
    "dd_jaccard" -> ddJaccard,
    "dd_containment" -> ddContainment,
    "dd_lines" -> ddLines,
    "dd_winnow" -> ddWinnow,
    "dd_minhash" -> ddMinhash,
    "dd_minhash_clusters" -> ddMinhashClusters,
    "dd_near_best" -> ddNearBest,
    "dd_simhash" -> ddSimhash,
    "dd_embed" -> ddEmbed,
    "dd_semantic" -> ddSemantic,
    "ann_top1" -> annTop1,
    "ann_brute_topk" -> annBruteTopk,
    "ann_rrf" -> annRrf,
    "ann_maxsim_topk" -> annMaxsimTopk,
    "ann_lsh_topk" -> annLshTopk,
    "ann_ivf_topk" -> annIvfTopk,
    "ann_pq_topk" -> annPqTopk,
    "dd_pipeline" -> ddPipeline,
    "txt_quality" -> txtQuality,
    "txt_classify" -> txtClassify,
    "txt_readability" -> txtReadability,
    "txt_repetition" -> txtRepetition,
    "txt_fingerprint" -> txtFingerprint,
    "txt_mix" -> txtMix,
    "txt_pii" -> txtPii,
    "txt_pack" -> txtPack,
    "sketch_distinct" -> sketchDistinct,
    "sketch_theta" -> sketchTheta,
    "sketch_cms" -> sketchCms,
    "sketch_hll" -> sketchHll,
    "sketch_bloom" -> sketchBloom,
    "sketch_ams" -> sketchAms,
    "sketch_quantile" -> sketchQuantile,
    "sketch_quantile_src" -> sketchQuantileSrc,
    "sketch_mad" -> sketchMad,
    "sketch_priority" -> sketchPriority,
    "txt_keywords" -> txtKeywords,
    "txt_chunk" -> txtChunk,
    "txt_bm25" -> txtBm25,
    "mm_meta" -> mmMeta,
    "mm_jpeg" -> mmJpeg,
    "mm_resize" -> mmResize,
    "mm_frames" -> mmFrames,
    "mm_phash" -> mmPhash,
    "mm_colorstats" -> mmColorstats,
    "mm_audio_fp" -> mmAudioFp,
    "mm_vad" -> mmVad,
    "dd_softdedup" -> ddSoftdedup,
    "mix_kl" -> mixKl,
    "src_jsonl" -> srcJsonl,
    "src_csv" -> srcCsv,
    "src_orc" -> srcOrc,
    "src_arrow" -> srcArrow,
    "src_tfrecord" -> srcTfrecord,
    "dd_incremental" -> ddIncremental,
    "mix_budget" -> mixBudget,
    "mix_interleave" -> mixInterleave,
    "mm_gif" -> mmGif
  )

  /** QuantileHist.bucket in DuckDB SQL (HdrHistogram-style log bucket,
    * 16 sub-buckets). */
  private def qBucketSql(v: String): String =
    s"""CASE WHEN $v < 32 THEN $v
       |  ELSE (length(bin($v)) - 1) * 16
       |     + (($v >> (length(bin($v)) - 1 - 4)) & 15) END""".stripMargin

  /** QuantileHist.bounds(...)._1 (inclusive lower bound) in DuckDB SQL. */
  private def qLoSql(b: String): String =
    s"""CASE WHEN $b < 32 THEN $b
       |  ELSE (CAST(1 AS BIGINT) << CAST($b // 16 AS INT))
       |     + ($b % 16) * (CAST(1 AS BIGINT) << CAST($b // 16 - 4 AS INT))
       |END""".stripMargin

  /** One keyed sketch-P50 level in SQL: values CTE `src` with columns
    * (source, v) → per-source P50 bucket lower bound as column `p50`. */
  private def sketchP50Sql(src: String): String =
    s"""SELECT source, ${qLoSql("bucket")} AS p50 FROM (
       |  SELECT source, bucket, cnt,
       |    SUM(cnt) OVER (PARTITION BY source ORDER BY bucket) AS cum,
       |    SUM(cnt) OVER (PARTITION BY source) AS total
       |  FROM (SELECT source, ${qBucketSql("v")} AS bucket,
       |        CAST(COUNT(*) AS BIGINT) AS cnt
       |        FROM $src GROUP BY 1, 2))
       |WHERE (cum - cnt) * 100 < 50 * total AND 50 * total <= cum * 100"""
      .stripMargin

  // ---- FNV-1a in DuckDB SQL -------------------------------------------
  // The engine's rolling hashes (TextAnalysis.polyHash, Dedup.fnv1a) are
  // 64-bit wraparound folds; DuckDB has no wraparound BIGINT, so the
  // oracle folds in HUGEINT mod 2^64 with a signed<->unsigned bridge for
  // the xor step. Byte-exact vs the JVM (prototype-verified).
  private val Two63 = "9223372036854775808"
  private val Two64 = "18446744073709551616"

  /** HUGEINT expression: fold FNV-1a over the chars of `strExpr`,
    * starting from unsigned `initUnsigned`. `private[queries]` so
    * KgQueries' oracles (kg_negatives) can replay the same fold. */
  private[queries] def fnvFoldSql(strExpr: String,
      initUnsigned: String): String = {
    val hSigned =
      s"CAST(h - (CASE WHEN h >= CAST('$Two63' AS HUGEINT) THEN CAST('$Two64' AS HUGEINT) ELSE 0 END) AS BIGINT)"
    val x = s"xor($hSigned, CAST(c AS BIGINT))"
    val xUnsigned =
      s"(CASE WHEN $x < 0 THEN CAST($x AS HUGEINT) + CAST('$Two64' AS HUGEINT) ELSE CAST($x AS HUGEINT) END)"
    s"list_reduce(list_prepend(CAST('$initUnsigned' AS HUGEINT), " +
      s"list_transform(generate_series(1, length($strExpr)), " +
      s"i -> CAST(unicode(($strExpr)[i]) AS HUGEINT))), " +
      s"(h, c) -> (($xUnsigned * 1099511628211) % CAST('$Two64' AS HUGEINT)))"
  }

  /** One unsigned splitmix64 stage `hu XOR (hu >>> s)` where `d` = 2^s
    * as a decimal literal: logical shift = unsigned `//` quotient, xor
    * on the BIGINT reinterpretations, result back to unsigned HUGEINT.
    */
  /** `(hu * c) mod 2^64` for a full-width 64-bit constant via 32-bit
    * halves — the direct product of two ~2^64 values overflows DuckDB's
    * signed INT128: (hi·2^32+lo)·c ≡ lo·c + ((hi·c) mod 2^32)·2^32.
    */
  private[queries] def mulSql(hu: String, c: String): String = {
    val C = s"CAST('$c' AS HUGEINT)"
    s"((($hu % 4294967296) * $C + (($hu // 4294967296) * $C % 4294967296)" +
      s" * 4294967296) % CAST('$Two64' AS HUGEINT))"
  }

  private[queries] def xorShrSql(hu: String, d: String): String = {
    val x = s"xor(${signedSql(hu)}, ${signedSql(s"($hu // $d)")})"
    s"(CASE WHEN $x < 0 THEN CAST($x AS HUGEINT) + CAST('$Two64' AS HUGEINT)" +
      s" ELSE CAST($x AS HUGEINT) END)"
  }

  /** BIGINT reinterpretation of an unsigned HUGEINT column.
    * `private[queries]` so KgQueries' hash-rank oracles (kg_egosample)
    * can finish the same splitmix chain. */
  private[queries] def signedSql(hu: String): String =
    s"CAST($hu - (CASE WHEN $hu >= CAST('$Two63' AS HUGEINT) THEN CAST('$Two64' AS HUGEINT) ELSE 0 END) AS BIGINT)"

  /** Sequential-fold cosine, mirroring Similarity.dot/norm exactly:
    * per-element float multiply, double accumulation in index order.
    */
  private def cosineFoldSql(a: String, b: String): String = {
    def fold(products: String) =
      s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), $products), (acc, x) -> acc + x)"
    val dot = fold(s"list_transform(generate_series(1, len($a)), i -> CAST($a[i] * $b[i] AS DOUBLE))")
    val na = fold(s"list_transform(generate_series(1, len($a)), i -> CAST($a[i] * $a[i] AS DOUBLE))")
    val nb = fold(s"list_transform(generate_series(1, len($b)), i -> CAST($b[i] * $b[i] AS DOUBLE))")
    s"$dot / (sqrt($na) * sqrt($nb))"
  }

  /** The exact hyperplane tables lshTopK uses (same code path, same
    * seed), as a DuckDB VALUES list: (tbl, bit, 64-double plane).
    * Double.toString is shortest-round-trip, so DuckDB parses back the
    * identical IEEE doubles.
    */
  private def lshPlanesSql(nBits: Int = 7): String = {
    val rows = for {
      t <- 0 until 10
      planes = Similarity.hyperplanes(64, nBits, 42L + 1000L * t)
      b <- 0 until nBits
    } yield s"($t, $b, [${planes(b).mkString(", ")}])"
    s"planes(tbl, bit, p) AS (SELECT * FROM (VALUES ${rows.mkString(",\n  ")}) v(tbl, bit, p))"
  }

  /** Sequential double fold of embedding·plane (Spark promotes the float
    * element to double BEFORE the multiply here, unlike the float·float
    * cosine products). */
  private def projFoldSql(v: String, p: String): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
      s"list_transform(generate_series(1, len($v)), i -> CAST($v[i] AS DOUBLE) * $p[i])), " +
      s"(acc, x) -> acc + x)"

  /** `x·lnq(x)` (micro-nat quantized, 0 at x ≤ 0) in DuckDB SQL — the
    * txt_entropy/txt_collocations shared term. */
  private def sLnSql(x: String): String =
    s"CASE WHEN ($x) > 0 THEN ($x) * " +
      s"CAST(ROUND(ln($x) * 1e6) AS BIGINT) ELSE 0 END"

  /** Squared-L2 fold matching `pqNearestStatic`: FLOAT subtraction
    * (pinned with an explicit cast — the exact float diff fits a
    * double, so CAST(a−b AS FLOAT) ≡ the JVM's float subtraction
    * regardless of DuckDB's internal promotion), then double square and
    * sequential double accumulation. */
  private def l2FoldSql(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
      s"list_transform(generate_series(1, len($b)), i -> " +
      s"CAST(CAST(($a)[i] - ($b)[i] AS FLOAT) AS DOUBLE) * " +
      s"CAST(CAST(($a)[i] - ($b)[i] AS FLOAT) AS DOUBLE))), " +
      s"(acc, x) -> acc + x)"

  /** double(a)·double(b) product fold — the ADC table convention
    * (`x.toDouble * y` in the kernel: both operands promoted BEFORE the
    * multiply, unlike cosineFoldSql's float·float products). */
  private def dotDDFoldSql(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
      s"list_transform(generate_series(1, len($b)), i -> " +
      s"CAST(($a)[i] AS DOUBLE) * CAST(($b)[i] AS DOUBLE))), " +
      s"(acc, x) -> acc + x)"

  val oracles: Map[String, String] = Map(
    // full training-loop replay: wrap → (pairs → argmax → replace)×8
    "txt_bpe" -> bpeOracleSql(8, 65536),
    "txt_encode" -> bpeEncodeOracleSql(8, 65536),
    "txt_cluster" -> clusterOracleSql(2),
    // profile VALUES + explode/join/div/argmax replay
    "txt_langid" -> langidOracleSql,
    // contingency table from in-row bigrams, nine quantized c·ln(c)
    // terms, deterministic (g2 DESC, a, b) top-20 — mirrors
    // TextAnalysis.collocations
    "txt_collocations" -> {
      s"""WITH tk AS (SELECT
         |    list_filter(string_split(text, ' '), t -> t <> '') AS w
         |  FROM documents),
         |bi AS (SELECT w[i] AS a, w[i + 1] AS b
         |  FROM (SELECT w, unnest(range(1, len(w))) AS i
         |        FROM tk WHERE len(w) >= 2)),
         |bc AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS k11
         |  FROM bi GROUP BY a, b),
         |r AS (SELECT a, CAST(SUM(k11) AS BIGINT) AS ra FROM bc GROUP BY a),
         |c AS (SELECT b, CAST(SUM(k11) AS BIGINT) AS cb FROM bc GROUP BY b),
         |n AS (SELECT CAST(SUM(k11) AS BIGINT) AS n FROM bc),
         |j AS (SELECT bc.a, bc.b, k11, ra, cb, n.n
         |  FROM bc JOIN r ON bc.a = r.a JOIN c ON bc.b = c.b CROSS JOIN n)
         |SELECT a, b, k11,
         |  CAST(2 * (${sLnSql("k11")} + ${sLnSql("ra - k11")}
         |    + ${sLnSql("cb - k11")} + ${sLnSql("n - ra - cb + k11")}
         |    - ${sLnSql("ra")} - ${sLnSql("n - ra")}
         |    - ${sLnSql("cb")} - ${sLnSql("n - cb")}
         |    + ${sLnSql("n")}) AS BIGINT) AS g2_micro
         |FROM j ORDER BY g2_micro DESC, a, b LIMIT 20""".stripMargin
    },
    // full CDC replay: every 8-gram FNV-folded in HUGEINT, boundary
    // hits (unsigned mod 64) sorted per doc, chunk substrings rebuilt
    // and refolded, signed-bridged, (hash, len)-keyed rollup
    "dd_cdc" -> {
      // the position column must NOT be named `i`: fnvFoldSql's
      // list_transform lambda binds `i` and would shadow it
      val gramFold = fnvFoldSql("substr(text, CAST(pos AS INT), 8)",
        "14695981039346656037")
      val chunkFold = fnvFoldSql("chunk", "14695981039346656037")
      s"""WITH pl AS (SELECT doc_id,
         |    CASE WHEN doc_id % 5 = 0
         |      THEN '$SpanChorus ' || text || ' $SpanChorus'
         |      ELSE text END AS text
         |  FROM documents),
         |g AS (SELECT doc_id, pos, $gramFold AS h
         |  FROM (SELECT doc_id, text,
         |          unnest(range(1, length(text) - 6)) AS pos
         |        FROM pl WHERE length(text) >= 8)),
         |hits AS (SELECT doc_id, CAST(pos + 7 AS BIGINT) AS e
         |  FROM g WHERE h % 64 = 0),
         |bl AS (SELECT p.doc_id, COALESCE(b.es, []::BIGINT[]) AS es,
         |    CAST(length(p.text) AS BIGINT) AS n, p.text
         |  FROM pl p LEFT JOIN (SELECT doc_id, list_sort(list(e)) AS es
         |    FROM hits GROUP BY doc_id) b USING (doc_id)),
         |se AS (SELECT doc_id, text,
         |    CASE WHEN k = 1 THEN 1 ELSE es[CAST(k - 1 AS INT)] + 1 END
         |      AS s,
         |    CASE WHEN k <= len(es) THEN es[CAST(k AS INT)] ELSE n END
         |      AS e
         |  FROM (SELECT doc_id, text, n, es,
         |          unnest(range(1, len(es) + 2)) AS k
         |        FROM bl)),
         |ch AS (SELECT doc_id,
         |    substr(text, CAST(s AS INT), CAST(e - s + 1 AS INT)) AS chunk
         |  FROM se WHERE e >= s),
         |ck AS (SELECT doc_id, $chunkFold AS hu,
         |    CAST(length(chunk) AS BIGINT) AS chunk_len
         |  FROM ch),
         |sg AS (SELECT doc_id, ${signedSql("hu")} AS chunk_hash, chunk_len
         |  FROM ck)
         |SELECT chunk_hash, chunk_len,
         |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
         |  CAST(COUNT(*) AS BIGINT) AS n_occ
         |FROM sg GROUP BY 1, 2 HAVING COUNT(DISTINCT doc_id) >= 2
         |ORDER BY chunk_hash, chunk_len""".stripMargin
    },
    // the oracle IS the source table: url/ts closed forms + the text
    // the WARC->html->extract loop must recover byte-identically
    "src_warc" ->
      """SELECT 'https://example.org/doc/' || doc_id AS url,
        |  TIMESTAMP '2024-01-01 00:00:00'
        |    + to_seconds(CAST((doc_id * 9973) % 2678400 AS BIGINT))
        |    AS warc_ts,
        |  text AS extracted
        |FROM documents ORDER BY url""".stripMargin,
    // the plain exact HAVING query — the two-pass MG stage is a pure
    // optimization whose candidate superset never changes the answer
    "txt_heavyhitters" ->
      """WITH tk AS (SELECT
        |    unnest(list_filter(string_split(text, ' '), t -> t <> ''))
        |      AS tok
        |  FROM documents),
        |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_tokens FROM tk),
        |ht AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM tk GROUP BY tok)
        |SELECT ht.tok, ht.c, n.n_tokens FROM ht, n
        |WHERE ht.c * 30 >= n.n_tokens ORDER BY ht.c DESC, ht.tok""".stripMargin,
    // isqrt fixed point (float candidate + two exact CASE adjustments),
    // floor shares, largest-remainder ranking — mirrors Mix.temperatureBp
    "mix_temperature" ->
      """WITH cs AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
        |  FROM documents GROUP BY source),
        |s0 AS (SELECT source, n_docs, n_docs * 1000000 AS x,
        |    CAST(FLOOR(SQRT(CAST(n_docs * 1000000 AS DOUBLE))) AS BIGINT)
        |      AS s
        |  FROM cs),
        |s1 AS (SELECT source, n_docs, x,
        |    CASE WHEN s * s > x THEN s - 1 ELSE s END AS s FROM s0),
        |wv AS (SELECT source, n_docs,
        |    CASE WHEN (s + 1) * (s + 1) <= x THEN s + 1 ELSE s END AS w
        |  FROM s1),
        |ag AS (SELECT source, n_docs, w, SUM(w) OVER () AS tw FROM wv),
        |bs AS (SELECT source, n_docs, w,
        |    w * 10000 // tw AS base, (w * 10000) % tw AS rem,
        |    10000 - SUM(w * 10000 // tw) OVER () AS deficit,
        |    ROW_NUMBER() OVER (ORDER BY (w * 10000) % tw DESC, source)
        |      AS rk
        |  FROM ag)
        |SELECT source, n_docs, w,
        |  CAST(base + CASE WHEN rk <= deficit THEN 1 ELSE 0 END AS BIGINT)
        |    AS bp
        |FROM bs ORDER BY source""".stripMargin,
    // the mix chain over the decimal doc_id, ranked in the SIGNED
    // 64-bit order Spark's orderBy(h) uses, doc_id tiebreak
    "mix_sample" ->
      s"""WITH h0 AS (SELECT source, doc_id,
         |    ${fnvFoldSql("CAST(doc_id AS VARCHAR)", "14695981039346656037")} AS hu
         |  FROM documents),
         |m1 AS (SELECT source, doc_id, ${xorShrSql("hu", "1073741824")} AS hu FROM h0),
         |m2 AS (SELECT source, doc_id, ${mulSql("hu", "13787848793156543929")} AS hu FROM m1),
         |m3 AS (SELECT source, doc_id, ${xorShrSql("hu", "134217728")} AS hu FROM m2),
         |m4 AS (SELECT source, doc_id, ${mulSql("hu", "10723151780598845931")} AS hu FROM m3),
         |m5 AS (SELECT source, doc_id, ${xorShrSql("hu", "2147483648")} AS hu FROM m4),
         |hh AS (SELECT source, doc_id, ${signedSql("hu")} AS h FROM m5),
         |fin AS (SELECT source, doc_id,
         |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY h, doc_id)
         |      AS rn
         |  FROM hh)
         |SELECT source, doc_id, CAST(rn AS BIGINT) AS rk
         |FROM fin WHERE rn <= 5 ORDER BY source, rk""".stripMargin,
    // the splitmix chain (mix_sample machinery) -> pmod u -> IEEE
    // priority w/u -> global top-17 rank -> tau = the 17th priority ->
    // max(w, tau) estimator; every double identical on both engines
    "sketch_priority" ->
      s"""WITH h0 AS (SELECT doc_id, n_chars,
         |    ${fnvFoldSql("CAST(doc_id AS VARCHAR)", "14695981039346656037")} AS hu
         |  FROM documents),
         |m1 AS (SELECT doc_id, n_chars, ${xorShrSql("hu", "1073741824")} AS hu FROM h0),
         |m2 AS (SELECT doc_id, n_chars, ${mulSql("hu", "13787848793156543929")} AS hu FROM m1),
         |m3 AS (SELECT doc_id, n_chars, ${xorShrSql("hu", "134217728")} AS hu FROM m2),
         |m4 AS (SELECT doc_id, n_chars, ${mulSql("hu", "10723151780598845931")} AS hu FROM m3),
         |m5 AS (SELECT doc_id, n_chars, ${xorShrSql("hu", "2147483648")} AS hu FROM m4),
         |hh AS (SELECT doc_id, n_chars, ${signedSql("hu")} AS h FROM m5),
         |pr AS (SELECT doc_id, GREATEST(1, n_chars) AS w,
         |    CAST(GREATEST(1, n_chars) AS DOUBLE)
         |      / ((h % 2147483647 + 2147483647) % 2147483647 + 1) AS pri
         |  FROM hh),
         |rk AS (SELECT doc_id, w, pri,
         |    ROW_NUMBER() OVER (ORDER BY pri DESC, doc_id) AS rn FROM pr),
         |tv AS (SELECT COALESCE(
         |    (SELECT pri FROM rk WHERE rn = 17), 0.0) AS tau)
         |SELECT r.doc_id, CAST(r.w AS BIGINT) AS w,
         |  GREATEST(CAST(r.w AS DOUBLE), t.tau) AS est_w, t.tau AS tau
         |FROM rk r, tv t WHERE r.rn <= 16 ORDER BY r.doc_id""".stripMargin,
    // per-doc token histogram -> per-count micro-nat quantization ->
    // exact integer sum -> floor division, mirroring TextAnalysis.entropy
    "txt_entropy" ->
      """WITH tk AS (SELECT doc_id,
        |    unnest(list_filter(string_split(text, ' '), t -> t <> ''))
        |      AS tok
        |  FROM documents),
        |tf AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM tk GROUP BY 1, 2),
        |ag AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
        |    CAST(COUNT(*) AS BIGINT) AS n_distinct,
        |    CAST(SUM(c * CAST(ROUND(ln(c) * 1e6) AS BIGINT)) AS BIGINT)
        |      AS s_micro
        |  FROM tf GROUP BY doc_id)
        |SELECT doc_id, n_tokens, n_distinct,
        |  CAST(CAST(ROUND(ln(n_tokens) * 1e6) AS BIGINT)
        |    - s_micro // n_tokens AS BIGINT) AS entropy_micro
        |FROM ag ORDER BY doc_id""".stripMargin,
    // log-bucketed quantile sketch replayed bit-exactly: the bucket
    // function (bin()-derived msb + 4 mantissa bits), the cumulative
    // walk and the bound formulas are all integer — see QuantileHist
    "sketch_quantile" ->
      """WITH v AS (SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS v
        |  FROM documents),
        |b AS (SELECT CASE WHEN v < 32 THEN v
        |  ELSE (length(bin(v)) - 1) * 16
        |     + ((v >> (length(bin(v)) - 1 - 4)) & 15) END AS bucket FROM v),
        |h AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS cnt FROM b
        |  GROUP BY bucket),
        |c AS (SELECT bucket, cnt, SUM(cnt) OVER (ORDER BY bucket) AS cum,
        |  SUM(cnt) OVER () AS total FROM h)
        |SELECT q.q, c.bucket,
        |  CASE WHEN c.bucket < 32 THEN c.bucket
        |    ELSE (CAST(1 AS BIGINT) << CAST(c.bucket // 16 AS INT))
        |       + (c.bucket % 16)
        |         * (CAST(1 AS BIGINT) << CAST(c.bucket // 16 - 4 AS INT))
        |  END AS lo,
        |  CASE WHEN c.bucket < 32 THEN c.bucket
        |    ELSE (CAST(1 AS BIGINT) << CAST(c.bucket // 16 AS INT))
        |       + ((c.bucket % 16) + 1)
        |         * (CAST(1 AS BIGINT) << CAST(c.bucket // 16 - 4 AS INT)) - 1
        |  END AS hi
        |FROM c JOIN (VALUES (50), (90), (99)) q(q)
        |  ON (c.cum - c.cnt) * 100 < q.q * c.total
        | AND q.q * c.total <= c.cum * 100
        |ORDER BY q.q""".stripMargin,
    // keyed quantile sketch: identical bucket/bound formulas, windows
    // partitioned by source
    "sketch_quantile_src" ->
      """WITH v AS (SELECT source,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS v
        |  FROM documents),
        |b AS (SELECT source, CASE WHEN v < 32 THEN v
        |  ELSE (length(bin(v)) - 1) * 16
        |     + ((v >> (length(bin(v)) - 1 - 4)) & 15) END AS bucket FROM v),
        |h AS (SELECT source, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM b GROUP BY source, bucket),
        |c AS (SELECT source, bucket, cnt,
        |  SUM(cnt) OVER (PARTITION BY source ORDER BY bucket) AS cum,
        |  SUM(cnt) OVER (PARTITION BY source) AS total FROM h)
        |SELECT c.source, q.q, c.bucket,
        |  CASE WHEN c.bucket < 32 THEN c.bucket
        |    ELSE (CAST(1 AS BIGINT) << CAST(c.bucket // 16 AS INT))
        |       + (c.bucket % 16)
        |         * (CAST(1 AS BIGINT) << CAST(c.bucket // 16 - 4 AS INT))
        |  END AS lo,
        |  CASE WHEN c.bucket < 32 THEN c.bucket
        |    ELSE (CAST(1 AS BIGINT) << CAST(c.bucket // 16 AS INT))
        |       + ((c.bucket % 16) + 1)
        |         * (CAST(1 AS BIGINT) << CAST(c.bucket // 16 - 4 AS INT)) - 1
        |  END AS hi
        |FROM c JOIN (VALUES (50), (90), (99)) q(q)
        |  ON (c.cum - c.cnt) * 100 < q.q * c.total
        | AND q.q * c.total <= c.cum * 100
        |ORDER BY c.source, q.q""".stripMargin,
    // two sketch levels replayed with the identical bucket arithmetic;
    // outliers = dev > 3·MAD on the exact deviations
    "sketch_mad" ->
      s"""WITH v AS (SELECT source,
         |  CAST(len(string_split(text, ' ')) AS BIGINT) AS v
         |  FROM documents),
         |med AS (SELECT source, p50 AS med FROM (${sketchP50Sql("v")})),
         |dev AS (SELECT v.source, abs(v.v - m.med) AS v
         |  FROM v JOIN med m ON v.source = m.source),
         |mad AS (SELECT source, p50 AS mad FROM (${sketchP50Sql("dev")})),
         |agg AS (SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(SUM(CASE WHEN d.v > 3 * md.mad THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_outliers
         |  FROM dev d JOIN mad md ON d.source = md.source
         |  GROUP BY d.source)
         |SELECT a.source, a.n, m.med, md.mad, a.n_outliers
         |FROM agg a JOIN med m ON a.source = m.source
         |JOIN mad md ON a.source = md.source
         |ORDER BY a.source""".stripMargin,
    // tf-idf keywords: integer-proxy score and total-order tie-break
    // replayed verbatim; ROW_NUMBER is BIGINT on both sides
    "txt_keywords" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |  FROM documents),
        |t AS (SELECT doc_id, term FROM toks WHERE term <> ''),
        |tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM t
        |  GROUP BY doc_id, term),
        |df AS (SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
        |  FROM t GROUP BY term),
        |s AS (SELECT tf.doc_id, tf.term, (tf.tf * 1000000) // df.df AS score
        |  FROM tf JOIN df USING (term)),
        |r AS (SELECT doc_id, term, score, ROW_NUMBER() OVER (
        |  PARTITION BY doc_id ORDER BY score DESC, term) AS rnk FROM s)
        |SELECT doc_id, term, CAST(score AS BIGINT) AS score, rnk FROM r
        |WHERE rnk <= 5 ORDER BY doc_id, rnk""".stripMargin,
    // chunk arithmetic + slices replayed: stride 48 = 64 - 16,
    // nChunks = 1 if n<=64 else ceil((n-64)/48)+1 in integer math;
    // list_slice is 1-based inclusive ≡ Spark slice(arr, start, 64)
    "txt_chunk" ->
      """WITH t AS (SELECT doc_id,
        |  list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents),
        |s AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n,
        |  CASE WHEN len(toks) <= 64 THEN 1
        |       ELSE ((len(toks) - 64) + 47) // 48 + 1 END AS nc FROM t),
        |c AS (SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx, toks, n
        |  FROM s, unnest(generate_series(0, nc - 1)) AS g(i))
        |SELECT doc_id, chunk_idx,
        |  CAST(chunk_idx * 48 AS BIGINT) AS start,
        |  array_to_string(list_slice(toks, chunk_idx * 48 + 1,
        |    chunk_idx * 48 + 64), ' ') AS chunk,
        |  CAST(LEAST(64, n - chunk_idx * 48) AS BIGINT) AS n_toks
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,
    // bigram add-one LM: identical integer micro-nat quantization on
    // both sides (one ln per distinct bigram over exact integer counts),
    // so sums/averages are integer-exact across engines
    "txt_perplexity" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |pos AS (SELECT doc_id, unnest(w) AS w1 FROM toks),
        |uni AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1 FROM pos GROUP BY w1),
        |v AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM uni),
        |bi AS (SELECT doc_id, w[i] AS w1, w[i+1] AS w2
        |       FROM toks, unnest(generate_series(1, len(w)-1)) AS g(i)),
        |docbi AS (SELECT doc_id, w1, w2, CAST(COUNT(*) AS BIGINT) AS n FROM bi GROUP BY ALL),
        |c2 AS (SELECT w1, w2, CAST(SUM(n) AS BIGINT) AS c2 FROM docbi GROUP BY ALL),
        |term AS (SELECT c2.w1, c2.w2,
        |   CAST(round((ln(u.c1 + v.v) - ln(c2.c2 + 1)) * 1000000) AS BIGINT) AS t
        |   FROM c2 JOIN uni u ON u.w1 = c2.w1 CROSS JOIN v)
        |SELECT d.doc_id, CAST(SUM(d.n) AS BIGINT) AS n_bigrams,
        |  CAST(SUM(d.n * t.t) AS BIGINT) AS nll_micro,
        |  CAST(SUM(d.n * t.t) // (SUM(d.n) * 1000) AS BIGINT) AS nll_milli_avg
        |FROM docbi d JOIN term t ON t.w1 = d.w1 AND t.w2 = d.w2
        |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin,
    // same regex pipeline as UrlCanon.canonical; COALESCE bridges
    // DuckDB's NULL for array_to_string([]) vs Spark's '' for array_join
    // window replay of the bounded-aggregator cap (same survivor set by
    // the deterministic (n_chars DESC, doc_id) order)
    "dd_domain_cap" ->
      """WITH r AS (SELECT source, doc_id, n_chars,
        |  ROW_NUMBER() OVER (PARTITION BY source
        |    ORDER BY n_chars DESC, doc_id) AS rk FROM documents)
        |SELECT source, doc_id, n_chars, CAST(rk AS BIGINT) AS rk
        |FROM r WHERE rk <= 10 ORDER BY source, rk""".stripMargin,
    "dd_urls" ->
      """WITH u AS (SELECT doc_id,
        |  CASE WHEN doc_id % 4 = 0 THEN 'https://example.org/page/' || (doc_id // 4)
        |       WHEN doc_id % 4 = 1 THEN 'HTTPS://EXAMPLE.ORG:443/page/' || (doc_id // 4) || '?utm_source=feed&utm_campaign=x#frag'
        |       WHEN doc_id % 4 = 2 THEN 'https://example.org/page/' || (doc_id // 4) || '?b=2&a=1&utm_medium=email'
        |       ELSE 'https://example.org/page/' || (doc_id // 4) || '?a=1&b=2#sec2' END AS url
        |  FROM documents),
        |c AS (SELECT doc_id, regexp_replace(url, '#.*$', '') AS nofrag FROM u),
        |p AS (SELECT doc_id,
        |  lower(regexp_extract(nofrag, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
        |  regexp_replace(nofrag, '^[A-Za-z][A-Za-z0-9+.-]*://', '') AS rest FROM c),
        |qq AS (SELECT doc_id, scheme,
        |  lower(regexp_extract(rest, '^([^/?]*)', 1)) AS hostport,
        |  regexp_replace(rest, '^[^/?]*', '') AS pathq FROM p),
        |r AS (SELECT doc_id, scheme,
        |  CASE WHEN scheme = 'https' THEN regexp_replace(hostport, ':443$', '')
        |       WHEN scheme = 'http' THEN regexp_replace(hostport, ':80$', '')
        |       ELSE hostport END AS host,
        |  CASE WHEN regexp_extract(pathq, '^([^?]*)', 1) = '' THEN '/'
        |       ELSE regexp_extract(pathq, '^([^?]*)', 1) END AS path,
        |  COALESCE(array_to_string(list_sort(list_filter(string_split(regexp_extract(pathq, '\?(.*)$', 1), '&'),
        |    x -> x <> '' AND NOT starts_with(x, 'utm_'))), '&'), '') AS qs
        |  FROM qq),
        |canon AS (SELECT doc_id,
        |  scheme || '://' || host || path || CASE WHEN qs = '' THEN '' ELSE '?' || qs END AS canonical_url FROM r)
        |SELECT canonical_url, MIN(doc_id) AS survivor_doc, CAST(COUNT(*) AS BIGINT) AS n_variants
        |FROM canon GROUP BY 1 ORDER BY 1""".stripMargin,
    // exact-substring spans: window hash replayed via fnvFoldSql, span
    // merge via lag() — identical gap semantics to the aggregate() fold
    "dd_spans" ->
      s"""WITH planted AS (SELECT doc_id,
         |  CASE WHEN doc_id % 5 = 0 THEN '$SpanChorus' || ' ' || text || ' ' || '$SpanChorus'
         |       ELSE text END AS text
         |  FROM documents),
         |toks AS (SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), t -> t <> '') AS w FROM planted),
         |wins AS (SELECT doc_id, i AS pos, len(w) AS n_tokens,
         |    array_to_string(list_slice(w, i, i + 12), ' ') || ' ' AS s
         |  FROM toks, unnest(generate_series(1, len(w) - 12)) AS t(i) WHERE len(w) >= 13),
         |hashes AS (SELECT doc_id, pos, n_tokens, ${fnvFoldSql("s", "1469598103934665603")} AS hu FROM wins),
         |dup AS (SELECT hu FROM hashes GROUP BY hu HAVING MIN(doc_id) <> MAX(doc_id)),
         |dw AS (SELECT h.doc_id, h.pos, h.n_tokens FROM hashes h JOIN dup d ON h.hu = d.hu),
         |lagd AS (SELECT doc_id, pos, n_tokens, lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev FROM dw)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_dup_windows,
         |  CAST(SUM(CASE WHEN prev IS NULL OR pos - prev > 13 THEN 1 ELSE 0 END) AS BIGINT) AS n_spans,
         |  CAST(SUM(CASE WHEN prev IS NULL THEN 13 ELSE LEAST(13, pos - prev) END) AS BIGINT) AS dup_tokens,
         |  CAST(MIN(n_tokens) AS BIGINT) AS n_tokens
         |FROM lagd GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // shard assignment: FNV fold replayed, unsigned mod 16 (= signed
    // bitmask for a power of two), signed bridge for the sort key
    "mix_epochs" ->
      s"""WITH de AS (SELECT doc_id, CAST(e AS BIGINT) AS epoch
         |  FROM documents, unnest(generate_series(0, 2)) t(e)),
         |h0 AS (SELECT doc_id, epoch,
         |    ${fnvFoldSql("CAST(doc_id AS VARCHAR) || ':' || CAST(epoch AS VARCHAR)",
              "14695981039346656037")} AS hu
         |  FROM de),
         |m1 AS (SELECT doc_id, epoch, ${xorShrSql("hu", "1073741824")} AS hu FROM h0),
         |m2 AS (SELECT doc_id, epoch, ${mulSql("hu", "13787848793156543929")} AS hu FROM m1),
         |m3 AS (SELECT doc_id, epoch, ${xorShrSql("hu", "134217728")} AS hu FROM m2),
         |m4 AS (SELECT doc_id, epoch, ${mulSql("hu", "10723151780598845931")} AS hu FROM m3),
         |h AS (SELECT doc_id, epoch, ${xorShrSql("hu", "2147483648")} AS hu FROM m4),
         |k AS (SELECT epoch, doc_id, CAST(hu % 16 AS BIGINT) AS shard,
         |    CAST(${signedSql("hu")} AS BIGINT) AS sort_key
         |  FROM h)
         |SELECT epoch, doc_id, shard, sort_key,
         |  ROW_NUMBER() OVER (PARTITION BY epoch, shard
         |    ORDER BY sort_key, doc_id) AS pos
         |FROM k ORDER BY epoch, doc_id""".stripMargin,
    "txt_shard" ->
      s"""WITH h0 AS (SELECT doc_id,
         |    ${fnvFoldSql("CAST(doc_id AS VARCHAR)", "14695981039346656037")} AS hu
         |  FROM documents),
         |m1 AS (SELECT doc_id, ${xorShrSql("hu", "1073741824")} AS hu FROM h0),
         |m2 AS (SELECT doc_id, ${mulSql("hu", "13787848793156543929")} AS hu FROM m1),
         |m3 AS (SELECT doc_id, ${xorShrSql("hu", "134217728")} AS hu FROM m2),
         |m4 AS (SELECT doc_id, ${mulSql("hu", "10723151780598845931")} AS hu FROM m3),
         |h AS (SELECT doc_id, ${xorShrSql("hu", "2147483648")} AS hu FROM m4)
         |SELECT doc_id, CAST(hu % 16 AS BIGINT) AS shard,
         |  CAST(${signedSql("hu")} AS BIGINT) AS sort_key
         |FROM h ORDER BY doc_id""".stripMargin,
    "dd_embed" ->
      s"""WITH ${lshPlanesSql(11)},
         |corpus AS (
         |  SELECT vec_id, embedding FROM embeddings
         |  UNION ALL
         |  SELECT vec_id + 1000000,
         |    list_transform(generate_series(1, len(embedding)),
         |      i -> CASE WHEN i = 1
         |        THEN CAST(embedding[i] * CAST(1.1 AS FLOAT) AS FLOAT)
         |        ELSE embedding[i] END)
         |  FROM embeddings WHERE vec_id % 40 = 0),
         |buckets AS (
         |  SELECT c.vec_id, pl.tbl,
         |    CAST(SUM(CASE WHEN ${projFoldSql("c.embedding", "pl.p")} >= 0
         |      THEN (1 << pl.bit) ELSE 0 END) AS INTEGER) AS bucket
         |  FROM corpus c CROSS JOIN planes pl
         |  GROUP BY c.vec_id, pl.tbl),
         |cand AS (
         |  SELECT DISTINCT l.vec_id AS a, r.vec_id AS b
         |  FROM buckets l JOIN buckets r
         |    ON l.tbl = r.tbl AND l.bucket = r.bucket
         |  WHERE l.vec_id < r.vec_id),
         |scored AS (
         |  SELECT cand.a, cand.b,
         |    ${cosineFoldSql("ea.embedding", "eb.embedding")} AS cos
         |  FROM cand
         |  JOIN corpus ea ON ea.vec_id = cand.a
         |  JOIN corpus eb ON eb.vec_id = cand.b)
         |SELECT a, b, cos FROM scored WHERE cos >= 0.99
         |ORDER BY a, b""".stripMargin,
    "ann_lsh_topk" ->
      s"""WITH ${lshPlanesSql()},
         |e AS (SELECT vec_id, embedding FROM embeddings),
         |buckets AS (
         |  SELECT e.vec_id, pl.tbl,
         |    CAST(SUM(CASE WHEN ${projFoldSql("e.embedding", "pl.p")} >= 0
         |      THEN (1 << pl.bit) ELSE 0 END) AS INTEGER) AS bucket
         |  FROM e CROSS JOIN planes pl
         |  GROUP BY e.vec_id, pl.tbl),
         |qc AS (
         |  SELECT b.vec_id AS query_id, b.tbl, xor(b.bucket, pr.p) AS bucket
         |  FROM buckets b,
         |    (VALUES (0), (1), (2), (4), (8), (16), (32), (64)) pr(p)
         |  WHERE b.vec_id % 50 = 0),
         |cand AS (
         |  SELECT DISTINCT q.query_id, c.vec_id AS cand_id
         |  FROM qc q JOIN buckets c ON c.tbl = q.tbl AND c.bucket = q.bucket
         |  WHERE c.vec_id <> q.query_id),
         |scored AS (
         |  SELECT cand.query_id, cand.cand_id,
         |    ${cosineFoldSql("qe.embedding", "ce.embedding")} AS cos
         |  FROM cand
         |  JOIN e qe ON qe.vec_id = cand.query_id
         |  JOIN e ce ON ce.vec_id = cand.cand_id),
         |ranked AS (SELECT query_id, cand_id, cos,
         |  ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, cand_id) AS rank
         |  FROM scored)
         |SELECT query_id, CAST(rank AS BIGINT) AS rank, cand_id, cos
         |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    // replays the full IVF quantizer: one shared cosine CTE feeds both
    // the assignment argmax and the query probes (the Spark loop computes
    // the identical folds), then exact rerank within probed lists
    // full IVF-PQ replay: sampled sub-codebooks (init slices), per-code
    // sub-space L2 argmin, coarse assignment + probes, per-(query, code)
    // ADC dot/norm table entries summed in subspace order, the approx
    // ranking that picks the 32 survivors, exact-cosine rerank
    "ann_pq_topk" ->
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
         |init AS (SELECT vec_id, embedding AS v FROM e
         |  WHERE vec_id % 40 = 3 ORDER BY vec_id LIMIT 8),
         |books AS (SELECT g.s,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY g.s ORDER BY vec_id) - 1
         |      AS BIGINT) AS j,
         |    v[g.s * 8 + 1 : g.s * 8 + 8] AS bk
         |  FROM init, (SELECT unnest(range(0, 8)) AS s) g),
         |l2 AS (SELECT e.vec_id, b.s, b.j,
         |    ${l2FoldSql("e.embedding[b.s * 8 + 1 : b.s * 8 + 8]", "b.bk")}
         |      AS d
         |  FROM e CROSS JOIN books b),
         |codes AS (SELECT vec_id, s, j FROM (
         |    SELECT vec_id, s, j, ROW_NUMBER() OVER (
         |      PARTITION BY vec_id, s ORDER BY d, j) AS rn FROM l2)
         |  WHERE rn = 1),
         |cent AS (SELECT vec_id AS cent_id, embedding AS cv FROM e
         |  WHERE vec_id % 31 = 5),
         |ac AS (SELECT e.vec_id, c.cent_id,
         |    ${cosineFoldSql("e.embedding", "c.cv")} AS cos
         |  FROM e CROSS JOIN cent c),
         |assign AS (SELECT vec_id AS cand_id, cent_id FROM (
         |    SELECT vec_id, cent_id, ROW_NUMBER() OVER (
         |      PARTITION BY vec_id ORDER BY cos DESC, cent_id) AS rn
         |    FROM ac) WHERE rn = 1),
         |q AS (SELECT vec_id AS query_id, embedding AS qv FROM e
         |  WHERE vec_id % 50 = 0),
         |probes AS (SELECT query_id, cent_id FROM (
         |    SELECT q.query_id, c.cent_id, ROW_NUMBER() OVER (
         |      PARTITION BY q.query_id
         |      ORDER BY ${cosineFoldSql("q.qv", "c.cv")} DESC, c.cent_id)
         |      AS rn
         |    FROM q CROSS JOIN cent c) WHERE rn <= 4),
         |cand AS (SELECT p.query_id, a.cand_id
         |  FROM probes p JOIN assign a USING (cent_id)
         |  WHERE p.query_id <> a.cand_id),
         |qn AS (SELECT query_id, sqrt(${dotDDFoldSql("qv", "qv")})
         |    AS qnorm FROM q),
         |adcterm AS (SELECT cd.query_id, cd.cand_id, ck.s,
         |    ${dotDDFoldSql("q.qv[ck.s * 8 + 1 : ck.s * 8 + 8]", "b.bk")}
         |      AS dt,
         |    ${dotDDFoldSql("b.bk", "b.bk")} AS nt
         |  FROM cand cd
         |  JOIN codes ck ON ck.vec_id = cd.cand_id
         |  JOIN books b ON b.s = ck.s AND b.j = ck.j
         |  JOIN q ON q.query_id = cd.query_id),
         |adc AS (SELECT query_id, cand_id,
         |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list(dt ORDER BY s)), (acc, x) -> acc + x) AS dot,
         |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list(nt ORDER BY s)), (acc, x) -> acc + x) AS rnorm
         |  FROM adcterm GROUP BY query_id, cand_id),
         |appr AS (SELECT adc.query_id, cand_id,
         |    adc.dot / (qn.qnorm * sqrt(adc.rnorm)) AS approx
         |  FROM adc JOIN qn USING (query_id)),
         |surv AS (SELECT query_id, cand_id FROM (
         |    SELECT query_id, cand_id, ROW_NUMBER() OVER (
         |      PARTITION BY query_id ORDER BY approx DESC, cand_id) AS rn
         |    FROM appr) WHERE rn <= 32),
         |fin AS (SELECT s.query_id, s.cand_id,
         |    ${cosineFoldSql("qe.embedding", "ce.embedding")} AS cos
         |  FROM surv s JOIN e qe ON qe.vec_id = s.query_id
         |  JOIN e ce ON ce.vec_id = s.cand_id)
         |SELECT query_id, rank, cand_id, cos FROM (
         |  SELECT query_id, cand_id, cos, CAST(ROW_NUMBER() OVER (
         |    PARTITION BY query_id ORDER BY cos DESC, cand_id) AS BIGINT)
         |    AS rank
         |  FROM fin) WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin,
    "ann_ivf_topk" ->
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
         |cent AS (SELECT vec_id AS cent_id, embedding AS cv FROM e
         |  WHERE vec_id % 31 = 5),
         |ac AS (
         |  SELECT e.vec_id, c.cent_id,
         |    ${cosineFoldSql("e.embedding", "c.cv")} AS cos
         |  FROM e CROSS JOIN cent c),
         |assign AS (
         |  SELECT vec_id AS cand_id, cent_id FROM (
         |    SELECT vec_id, cent_id,
         |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, cent_id) AS rn
         |    FROM ac) t WHERE rn = 1),
         |probes AS (
         |  SELECT vec_id AS query_id, cent_id FROM (
         |    SELECT vec_id, cent_id,
         |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, cent_id) AS rn
         |    FROM ac WHERE vec_id % 50 = 0) t WHERE rn <= 4),
         |cand AS (
         |  SELECT p.query_id, a.cand_id
         |  FROM probes p JOIN assign a ON a.cent_id = p.cent_id
         |  WHERE a.cand_id <> p.query_id),
         |scored AS (
         |  SELECT cand.query_id, cand.cand_id,
         |    ${cosineFoldSql("qe.embedding", "ce.embedding")} AS cos
         |  FROM cand JOIN e qe ON qe.vec_id = cand.query_id
         |            JOIN e ce ON ce.vec_id = cand.cand_id),
         |ranked AS (SELECT query_id, cand_id, cos,
         |  ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, cand_id) AS rank
         |  FROM scored)
         |SELECT query_id, CAST(rank AS BIGINT) AS rank, cand_id, cos
         |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    // the funnel replays each stage on the unblocked truth: the Spark
    // side's length-bucket blocking is provably lossless at J >= 0.8
    "dd_pipeline" ->
      """WITH q AS (
        |  SELECT doc_id, lang, source, text,
        |    CASE WHEN length(trim(text)) = 0 THEN 0
        |         ELSE CAST(length(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) END AS n_tokens,
        |    CASE WHEN length(trim(text)) = 0 THEN 0.0
        |         ELSE CAST(length(list_filter(string_split_regex(trim(text), '\s+'),
        |      w -> list_contains(['the','a','an','and','or','of','to','in','is','it'], w))) AS DOUBLE)
        |          / length(regexp_split_to_array(trim(text), '\s+')) END AS stopword_ratio
        |  FROM documents),
        |qual AS (SELECT * FROM q WHERE n_tokens >= 20 AND stopword_ratio > 0.02),
        |exact AS (
        |  SELECT * FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        |    FROM qual) t WHERE rn = 1),
        |tok AS (SELECT DISTINCT doc_id, lang, source, unnest(string_split(text, ' ')) AS w
        |  FROM exact),
        |sizes AS (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id),
        |pairs AS (
        |  SELECT a.doc_id AS a, b.doc_id AS b, COUNT(*) AS inter
        |  FROM tok a JOIN tok b ON a.w = b.w AND a.lang = b.lang
        |    AND a.source = b.source AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |dropped AS (
        |  SELECT DISTINCT p.b FROM pairs p
        |  JOIN sizes sa ON p.a = sa.doc_id JOIN sizes sb ON p.b = sb.doc_id
        |  WHERE CAST(p.inter AS DOUBLE) / (sa.n + sb.n - p.inter) >= 0.8),
        |near AS (SELECT * FROM exact WHERE doc_id NOT IN (SELECT b FROM dropped)),
        |f AS (
        |  SELECT 0 AS stage_id, 'raw' AS stage, COUNT(*) AS n_docs,
        |    COALESCE(SUM(n_tokens), 0) AS n_tokens FROM q
        |  UNION ALL SELECT 1, 'quality', COUNT(*), COALESCE(SUM(n_tokens), 0) FROM qual
        |  UNION ALL SELECT 2, 'exact_dedup', COUNT(*), COALESCE(SUM(n_tokens), 0) FROM exact
        |  UNION ALL SELECT 3, 'near_dedup', COUNT(*), COALESCE(SUM(n_tokens), 0) FROM near)
        |SELECT CAST(stage_id AS INTEGER) AS stage_id, stage,
        |  CAST(n_docs AS BIGINT) AS n_docs, CAST(n_tokens AS BIGINT) AS n_tokens
        |FROM f ORDER BY stage_id""".stripMargin,
    "ann_brute_topk" ->
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
         |pairs AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
         |         q.embedding AS qv, c.embedding AS cv
         |  FROM e q JOIN e c ON q.vec_id <> c.vec_id
         |  WHERE q.vec_id % 50 = 0),
         |scored AS (SELECT query_id, cand_id,
         |  ${cosineFoldSql("qv", "cv")} AS cos FROM pairs),
         |ranked AS (SELECT query_id, cand_id, cos,
         |  ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, cand_id) AS rank
         |  FROM scored)
         |SELECT query_id, CAST(rank AS BIGINT) AS rank, cand_id, cos
         |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    // RRF: both input rankings replayed with their own proven-exact
    // folds (cosine + MaxSim), then the integer reciprocal-rank sum
    // and the re-rank — ranks are ints so // ≡ div everywhere
    "ann_rrf" -> {
      val dot = "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
        "list_transform(generate_series(1, 8), t -> " +
        "CAST(q.qv[(i-1)*8+t] * e.embedding[(j-1)*8+t] AS DOUBLE))), " +
        "(acc, x) -> acc + x)"
      s"""WITH e0 AS (SELECT vec_id, embedding FROM embeddings),
         |pairs AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
         |         q.embedding AS qv, c.embedding AS cv
         |  FROM e0 q JOIN e0 c ON q.vec_id <> c.vec_id
         |  WHERE q.vec_id % 50 = 0),
         |scored AS (SELECT query_id, cand_id,
         |  ${cosineFoldSql("qv", "cv")} AS cos FROM pairs),
         |a AS (SELECT query_id, cand_id, rank FROM (
         |  SELECT query_id, cand_id,
         |    ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY cos DESC, cand_id) AS rank
         |  FROM scored) WHERE rank <= 20),
         |qm AS (SELECT vec_id AS qid, embedding AS qv
         |  FROM embeddings WHERE vec_id % 50 = 0),
         |pm AS (SELECT q.qid, e.vec_id AS cid,
         |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |    list_transform(generate_series(1, 8), i ->
         |      list_max(list_transform(generate_series(1, 8), j -> $dot)))),
         |    (acc, x) -> acc + x) AS s
         |  FROM qm q, embeddings e WHERE e.vec_id <> q.qid),
         |b AS (SELECT qid AS query_id, cid AS cand_id, rank FROM (
         |  SELECT qid, cid,
         |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY s DESC, cid)
         |      AS rank
         |  FROM pm) WHERE rank <= 20),
         |f AS (SELECT COALESCE(a.query_id, b.query_id) AS qid,
         |    COALESCE(a.cand_id, b.cand_id) AS cid,
         |    COALESCE(1000000 // (60 + a.rank), 0)
         |      + COALESCE(1000000 // (60 + b.rank), 0) AS s
         |  FROM a FULL OUTER JOIN b
         |    ON a.query_id = b.query_id AND a.cand_id = b.cand_id),
         |r AS (SELECT qid, cid, s,
         |    ROW_NUMBER() OVER (PARTITION BY qid
         |      ORDER BY s DESC, cid) AS rk
         |  FROM f)
         |SELECT qid AS query_id, CAST(rk AS BIGINT) AS rank,
         |  cid AS cand_id, CAST(s AS BIGINT) AS rrf_micro
         |FROM r WHERE rk <= 5 ORDER BY query_id, rank""".stripMargin
    },
    // MaxSim: slice dots via the cosineFoldSql float-product/double-fold
    // discipline, list_max per query token (order-free exact doubles),
    // outer list_reduce sums maxima in token order — both engines
    // bitwise identical
    "ann_maxsim_topk" -> {
      val dot = "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
        "list_transform(generate_series(1, 8), t -> " +
        "CAST(q.qv[(i-1)*8+t] * e.embedding[(j-1)*8+t] AS DOUBLE))), " +
        "(acc, x) -> acc + x)"
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qv
         |  FROM embeddings WHERE vec_id % 50 = 25),
         |p AS (SELECT q.qid, e.vec_id AS cid,
         |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |    list_transform(generate_series(1, 8), i ->
         |      list_max(list_transform(generate_series(1, 8), j -> $dot)))),
         |    (acc, x) -> acc + x) AS s
         |  FROM q, embeddings e WHERE e.vec_id <> q.qid),
         |r AS (SELECT qid, cid, s,
         |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY s DESC, cid) AS rk
         |  FROM p)
         |SELECT qid AS query_id, CAST(rk AS BIGINT) AS rank,
         |  cid AS cand_id, s AS maxsim
         |FROM r WHERE rk <= 5 ORDER BY query_id, rank""".stripMargin
    },
    // mixture sampling: per-doc FNV-1a(doc_id string) folded in HUGEINT,
    // unsigned mod 10000 vs the recipe's basis-point rate; source group
    // = numeric suffix mod 4 (22500/10000/5000/2000 bp)
    "txt_mix" ->
      s"""WITH r AS (
         |  SELECT doc_id, source,
         |    CASE CAST(substring(source, 4) AS INTEGER) % 4
         |      WHEN 0 THEN 22500 WHEN 1 THEN 10000
         |      WHEN 2 THEN 5000 ELSE 2000 END AS bp
         |  FROM documents),
         |h AS (SELECT doc_id, source, bp,
         |    ${fnvFoldSql("CAST(doc_id AS VARCHAR)", "14695981039346656037")} AS hu
         |  FROM r),
         |c AS (SELECT source,
         |    (bp // 10000) + CASE WHEN (hu % 10000) < (bp % 10000)
         |      THEN 1 ELSE 0 END AS nc
         |  FROM h)
         |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_total,
         |  CAST(SUM(nc) AS BIGINT) AS n_out
         |FROM c GROUP BY source ORDER BY source""".stripMargin,
    // PII: replay the deterministic injection, then Java-parity RE2
    // counts + the 3-pass redaction; red_len checks the rewrite bytes
    "txt_pii" ->
      s"""WITH inj AS (
         |  SELECT doc_id, text || CASE doc_id % 7
         |    WHEN 0 THEN ' mail user' || CAST(doc_id AS VARCHAR) || '@example.com now'
         |    WHEN 1 THEN ' node 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.1 up'
         |    WHEN 2 THEN ' call 555-' || CAST(100 + doc_id % 900 AS VARCHAR)
         |      || '-' || CAST(1000 + doc_id % 9000 AS VARCHAR) || ' today'
         |    WHEN 3 THEN ' ping bad@@nope 999.9 12-34 x'
         |    ELSE '' END AS t
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(length(regexp_extract_all(t, '${Pii.EmailRe}')) AS BIGINT) AS n_email,
         |  CAST(length(regexp_extract_all(t, '${Pii.Ipv4Re}')) AS BIGINT) AS n_ipv4,
         |  CAST(length(regexp_extract_all(t, '${Pii.PhoneRe}')) AS BIGINT) AS n_phone,
         |  CAST(length(regexp_replace(regexp_replace(regexp_replace(t,
         |    '${Pii.EmailRe}', '${Pii.EmailTag}', 'g'),
         |    '${Pii.Ipv4Re}', '${Pii.IpTag}', 'g'),
         |    '${Pii.PhoneRe}', '${Pii.PhoneTag}', 'g')) AS BIGINT) AS red_len
         |FROM inj ORDER BY doc_id""".stripMargin,
    // packing: cumulative token sum per shard, integer div/mod at L=128
    "txt_pack" ->
      """WITH t AS (
        |  SELECT doc_id, source AS shard,
        |    CASE WHEN length(trim(text)) = 0 THEN 0
        |      ELSE CAST(length(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
        |    END AS n_tok
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, shard, n_tok,
        |    CAST(SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |  FROM t WHERE n_tok > 0)
        |SELECT doc_id, shard, n_tok,
        |  CAST((cum - n_tok) // 128 AS BIGINT) AS seq_first,
        |  CAST((cum - 1) // 128 AS BIGINT) AS seq_last,
        |  CAST((cum - n_tok) % 128 AS BIGINT) AS tok_offset
        |FROM c ORDER BY doc_id""".stripMargin,
    // KMV: distinct splitmix64-finalized FNV token hashes ranked
    // unsigned (one CTE per mix stage: xor-shift = xor with the
    // unsigned // 2^s quotient, multiply = mod-2^64 HUGEINT product);
    // the full CMS matrix replayed: per-occurrence FNV("r:"||tok) % 256
    // folds, (r, b) GROUP BY, min-over-rows point lookups
    "sketch_cms" -> {
      val entList = graft.extract.Gazetteer.DefaultEntities.sorted
        .map(e => s"'$e'").mkString("[", ", ", "]")
      s"""WITH tk AS (
         |  SELECT unnest(list_filter(string_split(text, ' '),
         |    t -> t <> '')) AS tok
         |  FROM documents),
         |rws AS (SELECT unnest([0, 1, 2, 3]) AS r),
         |hb AS (SELECT r,
         |    CAST((${fnvFoldSql("(CAST(r AS VARCHAR) || ':' || tok)", "14695981039346656037")}) % 256 AS BIGINT) AS b
         |  FROM tk CROSS JOIN rws),
         |mat AS (SELECT r, b, CAST(COUNT(*) AS BIGINT) AS n
         |  FROM hb GROUP BY r, b),
         |q AS (SELECT unnest($entList) AS token),
         |qb AS (SELECT token, r,
         |    CAST((${fnvFoldSql("(CAST(r AS VARCHAR) || ':' || token)", "14695981039346656037")}) % 256 AS BIGINT) AS b
         |  FROM q CROSS JOIN rws),
         |est AS (SELECT token, MIN(COALESCE(m.n, 0)) AS est
         |  FROM qb LEFT JOIN mat m ON m.r = qb.r AND m.b = qb.b
         |  GROUP BY token),
         |ex AS (SELECT tok AS token, CAST(COUNT(*) AS BIGINT) AS exact
         |  FROM tk GROUP BY tok)
         |SELECT est.token, est.est, COALESCE(ex.exact, 0) AS exact
         |FROM est LEFT JOIN ex ON est.token = ex.token
         |ORDER BY est.token""".stripMargin
    },
    // the k-th minimum and the integer estimator (k-1)*2^64 // kth
    // replayed exactly
    "sketch_distinct" ->
      s"""WITH tk AS (
         |  SELECT source, unnest(list_filter(string_split(text, ' '),
         |    t -> t <> '')) AS tok
         |  FROM documents),
         |h0 AS (SELECT DISTINCT source,
         |    ${fnvFoldSql("tok", "14695981039346656037")} AS hu
         |  FROM tk),
         |m1 AS (SELECT source, ${xorShrSql("hu", "1073741824")} AS hu FROM h0),
         |m2 AS (SELECT source, ${mulSql("hu", "13787848793156543929")} AS hu FROM m1),
         |m3 AS (SELECT source, ${xorShrSql("hu", "134217728")} AS hu FROM m2),
         |m4 AS (SELECT source, ${mulSql("hu", "10723151780598845931")} AS hu FROM m3),
         |h AS (SELECT source, ${xorShrSql("hu", "2147483648")} AS hu FROM m4),
         |r AS (SELECT source, hu,
         |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY hu) AS rk,
         |    COUNT(*) OVER (PARTITION BY source) AS n_h
         |  FROM h),
         |kk AS (SELECT source, MIN(n_h) AS n_h,
         |    MAX(CASE WHEN rk = 16 THEN hu END) AS kth
         |  FROM r GROUP BY source)
         |SELECT source,
         |  CAST(LEAST(n_h, 16) AS BIGINT) AS n_min,
         |  CAST(COALESCE(${signedSql("kth")}, 0) AS BIGINT) AS kth_min,
         |  CAST(CASE WHEN n_h < 16 THEN n_h
         |    ELSE LEAST(CAST('15' AS HUGEINT) * CAST('$Two64' AS HUGEINT) // kth,
         |      CAST('9223372036854775807' AS HUGEINT)) END AS BIGINT)
         |    AS est_distinct
         |FROM kk ORDER BY source""".stripMargin,
    // theta set-ops replay: per-source bottom-16 hash sets (same mix
    // chain as sketch_distinct), pair union re-ranked for theta, match
    // count via membership in BOTH sketches, then the two integer
    // estimators — est_union = 15·2^64 // theta (clamped), est_int =
    // n_match·est_union // 16 — recomputed in HUGEINT
    "sketch_theta" ->
      s"""WITH tk AS (
         |  SELECT source, unnest(list_filter(string_split(text, ' '),
         |    t -> t <> '')) AS tok
         |  FROM documents),
         |h0 AS (SELECT DISTINCT source,
         |    ${fnvFoldSql("tok", "14695981039346656037")} AS hu
         |  FROM tk),
         |m1 AS (SELECT source, ${xorShrSql("hu", "1073741824")} AS hu FROM h0),
         |m2 AS (SELECT source, ${mulSql("hu", "13787848793156543929")} AS hu FROM m1),
         |m3 AS (SELECT source, ${xorShrSql("hu", "134217728")} AS hu FROM m2),
         |m4 AS (SELECT source, ${mulSql("hu", "10723151780598845931")} AS hu FROM m3),
         |h AS (SELECT source, ${xorShrSql("hu", "2147483648")} AS hu FROM m4),
         |sk AS (SELECT source, hu FROM (
         |    SELECT source, hu,
         |      ROW_NUMBER() OVER (PARTITION BY source ORDER BY hu) AS rk
         |    FROM h) WHERE rk <= 16),
         |srcs AS (SELECT DISTINCT source FROM sk),
         |prs AS (SELECT s1.source AS sa, s2.source AS sb
         |  FROM srcs s1 JOIN srcs s2 ON s1.source < s2.source),
         |uh AS (SELECT DISTINCT p.sa, p.sb, s.hu
         |  FROM prs p JOIN sk s ON s.source = p.sa OR s.source = p.sb),
         |uu AS (SELECT sa, sb, hu,
         |    ROW_NUMBER() OVER (PARTITION BY sa, sb ORDER BY hu) AS rk
         |  FROM uh),
         |un AS (SELECT sa, sb, hu, rk FROM uu WHERE rk <= 16),
         |th AS (SELECT sa, sb, COUNT(*) AS n_union,
         |    MAX(CASE WHEN rk = 16 THEN hu END) AS theta
         |  FROM un GROUP BY sa, sb),
         |mt AS (SELECT u.sa, u.sb, COUNT(*) AS m
         |  FROM un u
         |  JOIN sk x ON x.source = u.sa AND x.hu = u.hu
         |  JOIN sk y ON y.source = u.sb AND y.hu = u.hu
         |  GROUP BY u.sa, u.sb),
         |est AS (SELECT t.sa, t.sb, t.n_union, t.theta,
         |    COALESCE(m.m, 0) AS n_match,
         |    CASE WHEN t.theta IS NULL THEN CAST(t.n_union AS HUGEINT)
         |      ELSE LEAST(CAST('15' AS HUGEINT) * CAST('$Two64' AS HUGEINT) // t.theta,
         |        CAST('9223372036854775807' AS HUGEINT)) END AS est_u
         |  FROM th t LEFT JOIN mt m ON m.sa = t.sa AND m.sb = t.sb)
         |SELECT sa AS src_a, sb AS src_b,
         |  CAST(n_union AS BIGINT) AS n_union,
         |  CAST(COALESCE(${signedSql("theta")}, 0) AS BIGINT) AS kth_union,
         |  CAST(est_u AS BIGINT) AS est_union,
         |  CAST(n_match AS BIGINT) AS n_match,
         |  CAST(CASE WHEN theta IS NULL THEN CAST(n_match AS HUGEINT)
         |    ELSE CAST(n_match AS HUGEINT) * est_u // 16 END AS BIGINT)
         |    AS est_intersect
         |FROM est ORDER BY src_a, src_b""".stripMargin,
    // every HLL register replayed: same mix chain as sketch_distinct,
    // bucket = hu % 64, rho = bit_count((w & -w) - 1) + 1 on the
    // BIGINT suffix word, MAX per (source, bucket); then the exact
    // integer summary (Σ2^(59-r) incl. zero registers, placement
    // checksum)
    "sketch_hll" ->
      s"""WITH tk AS (
         |  SELECT source, unnest(list_filter(string_split(text, ' '),
         |    t -> t <> '')) AS tok
         |  FROM documents),
         |h0 AS (SELECT DISTINCT source,
         |    ${fnvFoldSql("tok", "14695981039346656037")} AS hu
         |  FROM tk),
         |m1 AS (SELECT source, ${xorShrSql("hu", "1073741824")} AS hu FROM h0),
         |m2 AS (SELECT source, ${mulSql("hu", "13787848793156543929")} AS hu FROM m1),
         |m3 AS (SELECT source, ${xorShrSql("hu", "134217728")} AS hu FROM m2),
         |m4 AS (SELECT source, ${mulSql("hu", "10723151780598845931")} AS hu FROM m3),
         |h AS (SELECT source, ${xorShrSql("hu", "2147483648")} AS hu FROM m4),
         |rb AS (SELECT source, CAST(hu % 64 AS BIGINT) AS b,
         |    CAST(hu // 64 AS BIGINT) AS w FROM h),
         |reg AS (SELECT source, b,
         |    MAX(CASE WHEN w = 0 THEN 59
         |        ELSE bit_count((w & -w) - 1) + 1 END) AS r
         |  FROM rb GROUP BY source, b)
         |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_regs,
         |  CAST(64 - COUNT(*) AS BIGINT) AS n_zero,
         |  CAST(SUM(CAST(1 AS BIGINT) << CAST(57 - LEAST(r, 57) AS INT))
         |    + (64 - COUNT(*)) * (CAST(1 AS BIGINT) << 57) AS BIGINT) AS sum_pow,
         |  CAST(SUM((b + 1) * r) AS BIGINT) AS checksum
         |FROM reg GROUP BY source ORDER BY source""".stripMargin,
    // the full Bloom word matrix replayed: FNV("i:"||token) % 4096 bit
    // positions, BIT_OR per 32-bit word, per-probe hit counts + the
    // global popcount
    "sketch_bloom" -> {
      val probeList = (graft.extract.Gazetteer.DefaultEntities.sorted ++
        (0 until 10).map(i => s"absent:$i"))
        .map(t => s"'$t'").mkString("[", ", ", "]")
      s"""WITH mem AS (
         |  SELECT DISTINCT unnest(list_filter(string_split(text, ' '),
         |    t -> t <> '')) AS token
         |  FROM documents WHERE doc_id % 50 = 0),
         |rws AS (SELECT unnest([0, 1, 2, 3]) AS r),
         |mb AS (SELECT CAST((${fnvFoldSql("(CAST(r AS VARCHAR) || ':' || token)", "14695981039346656037")}) % 4096 AS BIGINT) AS pos
         |  FROM mem CROSS JOIN rws),
         |wrds AS (SELECT CAST(pos // 32 AS INT) AS word,
         |    CAST(BIT_OR(CAST(1 AS BIGINT) << CAST(pos % 32 AS INT)) AS BIGINT) AS bits
         |  FROM mb GROUP BY 1),
         |pc AS (SELECT CAST(SUM(bit_count(bits)) AS BIGINT) AS bits_total FROM wrds),
         |q AS (SELECT unnest($probeList) AS token),
         |qb AS (SELECT token,
         |    CAST((${fnvFoldSql("(CAST(r AS VARCHAR) || ':' || token)", "14695981039346656037")}) % 4096 AS BIGINT) AS pos
         |  FROM q CROSS JOIN rws),
         |hits AS (SELECT token,
         |    CAST(SUM(CASE WHEN (w.bits & (CAST(1 AS BIGINT) << CAST(qb.pos % 32 AS INT))) <> 0
         |      THEN 1 ELSE 0 END) AS BIGINT) AS hits
         |  FROM qb LEFT JOIN wrds w ON w.word = CAST(qb.pos // 32 AS INT)
         |  GROUP BY token)
         |SELECT h.token, h.hits,
         |  CAST(CASE WHEN h.hits = 4 THEN 1 ELSE 0 END AS INT) AS maybe_present,
         |  CAST(CASE WHEN m.token IS NOT NULL THEN 1 ELSE 0 END AS INT) AS exact_present,
         |  pc.bits_total
         |FROM hits h LEFT JOIN mem m ON m.token = h.token CROSS JOIN pc
         |ORDER BY h.token""".stripMargin
    },
    // water level re-derived from the identical kink scan: largest k
    // with P_k + (n-k)*c_k <= B, then L = (B - P_k) // (n - k)
    "mix_budget" ->
      """WITH c AS (SELECT source,
        |    CAST(SUM(len(list_filter(string_split(text, ' '),
        |      t -> t <> ''))) AS BIGINT) AS tokens
        |  FROM documents GROUP BY 1),
        |b AS (SELECT CAST(SUM(tokens) // 2 AS BIGINT) AS b,
        |    CAST(COUNT(*) AS BIGINT) AS n FROM c),
        |kk AS (SELECT source, tokens,
        |    CAST(ROW_NUMBER() OVER (ORDER BY tokens, source) AS BIGINT) AS k,
        |    CAST(SUM(tokens) OVER (ORDER BY tokens, source
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS p
        |  FROM c),
        |f AS (SELECT kk.*, b.n - kk.k AS m FROM kk, b
        |  WHERE kk.p + (b.n - kk.k) * kk.tokens <= b.b),
        |lvl AS (SELECT CASE
        |    WHEN NOT EXISTS (SELECT 1 FROM f)
        |      THEN (SELECT b // n FROM b)
        |    ELSE (SELECT CASE WHEN f.m = 0 THEN f.tokens
        |                 ELSE (b.b - f.p) // f.m END
        |          FROM f, b ORDER BY f.k DESC LIMIT 1)
        |  END AS L)
        |SELECT c.source, c.tokens,
        |  CAST(LEAST(c.tokens, lvl.L) AS BIGINT) AS alloc,
        |  CAST(c.tokens > lvl.L AS INT) AS capped,
        |  CAST(lvl.L AS BIGINT) AS water_level
        |FROM c, lvl ORDER BY source""".stripMargin,
    // index stats replayed from the (x+y) mod 251 grid closed form —
    // no LZW on the oracle side; the engine's numbers only agree if
    // the real compress/decompress round trip is bit-correct
    "mm_gif" ->
      """WITH m AS (SELECT doc_id,
        |    CAST(16 + doc_id % 48 AS INTEGER) AS w,
        |    CAST(16 + (doc_id // 2) % 32 AS INTEGER) AS h
        |  FROM documents WHERE doc_id % 4 = 1),
        |px AS (SELECT m.doc_id, m.w, m.h, (xs.x + ys.y) % 251 AS i
        |  FROM m,
        |    unnest(generate_series(0, m.w - 1)) xs(x),
        |    unnest(generate_series(0, m.h - 1)) ys(y))
        |SELECT doc_id, CAST(w AS BIGINT) AS width,
        |  CAST(h AS BIGINT) AS height,
        |  CAST(SUM(i) AS BIGINT) AS idx_sum,
        |  CAST(SUM((2 * i) % 256) AS BIGINT) AS g_sum
        |FROM px GROUP BY doc_id, w, h ORDER BY doc_id""".stripMargin,
    // DIFFERENT algorithm than the engine: the stride order stated as
    // an exact global sort — key (r+1)*(60//w) (60 = lcm(1..5), so the
    // virtual time scales to an exact integer), ties by source, global
    // ROW_NUMBER = position; the engine's per-row closed form must
    // reproduce it row-for-row or the hash compare fails
    "mix_interleave" ->
      """WITH r AS (SELECT doc_id, source,
        |    CAST(length(source) % 5 + 1 AS BIGINT) AS w,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY source
        |      ORDER BY doc_id) - 1 AS BIGINT) AS r
        |  FROM documents)
        |SELECT doc_id, source, r,
        |  CAST(ROW_NUMBER() OVER (ORDER BY (r + 1) * (60 // w), source)
        |    - 1 AS BIGINT) AS pos
        |FROM r ORDER BY doc_id""".stripMargin,
    // batch-vs-corpus dedup: is_dup = the exact semi-join truth;
    // bloom_candidate = the 4096-bit/4-hash filter replayed bit-exactly
    // (the sketch_bloom machinery over sha256 tokens) — candidate ⊇ dup
    // holds on every row or the hash compare fails
    "dd_incremental" ->
      s"""WITH d AS (SELECT doc_id, sha256(text) AS h FROM documents),
         |corpus AS (SELECT DISTINCT h FROM d WHERE doc_id < 400),
         |batch AS (SELECT doc_id, h FROM d WHERE doc_id >= 350),
         |rws AS (SELECT unnest([0, 1, 2, 3]) AS r),
         |mb AS (SELECT CAST((${fnvFoldSql("(CAST(r AS VARCHAR) || ':' || h)", "14695981039346656037")}) % 4096 AS BIGINT) AS pos
         |  FROM corpus CROSS JOIN rws),
         |wrds AS (SELECT CAST(pos // 32 AS INT) AS word,
         |    CAST(BIT_OR(CAST(1 AS BIGINT) << CAST(pos % 32 AS INT)) AS BIGINT) AS bits
         |  FROM mb GROUP BY 1),
         |bq AS (SELECT DISTINCT h FROM batch),
         |qb AS (SELECT h,
         |    CAST((${fnvFoldSql("(CAST(r AS VARCHAR) || ':' || h)", "14695981039346656037")}) % 4096 AS BIGINT) AS pos
         |  FROM bq CROSS JOIN rws),
         |hits AS (SELECT h,
         |    CAST(SUM(CASE WHEN (w.bits & (CAST(1 AS BIGINT) << CAST(qb.pos % 32 AS INT))) <> 0
         |      THEN 1 ELSE 0 END) AS BIGINT) AS hits
         |  FROM qb LEFT JOIN wrds w ON w.word = CAST(qb.pos // 32 AS INT)
         |  GROUP BY h)
         |SELECT b.doc_id,
         |  CAST(CASE WHEN t.hits = 4 THEN 1 ELSE 0 END AS BIGINT)
         |    AS bloom_candidate,
         |  CAST(CASE WHEN c.h IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
         |    AS is_dup
         |FROM batch b JOIN hits t ON t.h = b.h
         |LEFT JOIN corpus c ON c.h = b.h
         |ORDER BY b.doc_id""".stripMargin,
    // the whole AMS linear sketch replayed: FNV("r:"||tok) low-bit
    // signs, one integer sum per estimator row, squared; exact F2
    // alongside
    "sketch_ams" ->
      s"""WITH tk AS (
         |  SELECT source, unnest(list_filter(string_split(text, ' '),
         |    t -> t <> '')) AS tok
         |  FROM documents),
         |rws AS (SELECT unnest([0, 1, 2, 3]) AS r),
         |sg AS (SELECT source, r,
         |    CAST(1 - 2 * ((${fnvFoldSql("(CAST(r AS VARCHAR) || ':' || tok)", "14695981039346656037")}) % 2) AS BIGINT) AS s
         |  FROM tk CROSS JOIN rws),
         |zz AS (SELECT source, CAST(r AS INT) AS r,
         |    CAST(SUM(s) AS BIGINT) AS z
         |  FROM sg GROUP BY source, r),
         |ex AS (SELECT source, CAST(SUM(n * n) AS BIGINT) AS exact_f2
         |  FROM (SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS n
         |        FROM tk GROUP BY source, tok) GROUP BY source)
         |SELECT zz.source, zz.r, zz.z, zz.z * zz.z AS x, ex.exact_f2
         |FROM zz JOIN ex ON ex.source = zz.source
         |ORDER BY zz.source, zz.r""".stripMargin,
    // exact integer BM25 replay: tf/df/dl/(N, L) from the raw text, the
    // one micro-quantized ln over integer-derived doubles, floor-div
    // per-term scores, summed and top-20 ranked
    "txt_bm25" ->
      """WITH toks AS (SELECT doc_id,
        |    list_filter(string_split(text, ' '), t -> t <> '') AS w
        |  FROM documents),
        |dls AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl FROM toks),
        |sc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(dl) AS BIGINT) AS l FROM dls),
        |tf AS (SELECT doc_id, t, CAST(COUNT(*) AS BIGINT) AS tf
        |  FROM (SELECT doc_id, unnest(w) AS t FROM toks)
        |  WHERE t IN ('hash', 'spark', 'vector') GROUP BY doc_id, t),
        |df AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY t),
        |idf AS (SELECT t,
        |    CAST(round(ln(1 + (CAST(sc.n AS DOUBLE) - df + 0.5)
        |      / (CAST(df AS DOUBLE) + 0.5)) * 1000000) AS BIGINT) AS idf
        |  FROM df CROSS JOIN sc),
        |s AS (SELECT tf.doc_id,
        |    (idf.idf * 22 * tf.tf * sc.l)
        |      // (10 * tf.tf * sc.l + 3 * sc.l + 9 * d.dl * sc.n) AS s
        |  FROM tf JOIN idf ON idf.t = tf.t
        |  JOIN dls d ON d.doc_id = tf.doc_id CROSS JOIN sc)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms,
        |  CAST(SUM(s) AS BIGINT) AS score_micro
        |FROM s GROUP BY doc_id
        |ORDER BY score_micro DESC, doc_id LIMIT 20""".stripMargin,
    // window strings mirror polyHash exactly: each token followed by one
    // space (incl. trailing), init = the engine's basis constant
    "txt_fingerprint" ->
      s"""WITH toks AS (
         |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'),
         |    t -> t <> '') AS w
         |  FROM documents),
         |wins AS (
         |  SELECT doc_id, array_to_string(list_slice(w, i, i + 4), ' ') || ' ' AS s
         |  FROM toks, unnest(generate_series(1, len(w) - 4)) AS t(i)
         |  WHERE len(w) >= 5
         |  UNION ALL
         |  SELECT doc_id, array_to_string(w, ' ') || ' '
         |  FROM toks WHERE len(w) < 5 AND len(w) > 0),
         |hashes AS (SELECT doc_id, ${fnvFoldSql("s", "1469598103934665603")} AS hu
         |  FROM wins),
         |fp AS (SELECT doc_id, MIN(${signedSql("hu")}) AS fingerprint
         |  FROM hashes GROUP BY doc_id
         |  UNION ALL
         |  SELECT doc_id, CAST(0 AS BIGINT) FROM toks WHERE len(w) = 0)
         |SELECT fingerprint, COUNT(*) AS n, MIN(doc_id) AS first_doc
         |FROM fp GROUP BY fingerprint HAVING COUNT(*) > 1
         |ORDER BY fingerprint""".stripMargin,
    // 64-bit simhash: per-token FNV-1a (Dedup's basis), bit votes summed
    // per position, sign bit reassembled to match the JVM long
    "dd_simhash" ->
      s"""WITH RECURSIVE pow2(i, v) AS (
         |  SELECT 0, CAST(1 AS HUGEINT)
         |  UNION ALL SELECT i + 1, v * 2 FROM pow2 WHERE i < 63),
         |toks AS (
         |  SELECT doc_id, unnest(list_filter(string_split(text, ' '),
         |    t -> t <> '')) AS tok
         |  FROM documents),
         |hashes AS (SELECT doc_id, ${fnvFoldSql("tok", "14695981039346656037")} AS hu
         |  FROM toks),
         |votes AS (
         |  SELECT h.doc_id, p.i,
         |    SUM(CASE WHEN (h.hu // p.v) % 2 = 1 THEN 1 ELSE -1 END) AS v
         |  FROM hashes h CROSS JOIN pow2 p
         |  GROUP BY h.doc_id, p.i),
         |sims AS (
         |  SELECT v2.doc_id, CAST(SUM(CASE WHEN v2.v > 0 THEN
         |      CASE WHEN v2.i = 63 THEN CAST('-$Two63' AS BIGINT)
         |           ELSE CAST(p.v AS BIGINT) END
         |    ELSE 0 END) AS BIGINT) AS sim
         |  FROM votes v2 JOIN pow2 p ON p.i = v2.i
         |  GROUP BY v2.doc_id)
         |SELECT sim, COUNT(*) AS n, MIN(doc_id) AS first_doc
         |FROM sims GROUP BY sim HAVING COUNT(*) > 1
         |ORDER BY sim""".stripMargin,
    "dd_exact" ->
      """SELECT lang, COUNT(*) AS n_docs FROM (
        |  SELECT lang, ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        |  FROM documents) t
        |WHERE rn = 1 GROUP BY lang ORDER BY lang""".stripMargin,
    "dd_exact_clusters" ->
      """SELECT doc_id, keep_id FROM (
        |  SELECT doc_id, MIN(doc_id) OVER (PARTITION BY text) AS keep_id
        |  FROM documents) t
        |WHERE doc_id <> keep_id ORDER BY doc_id""".stripMargin,
    // 13-gram decontamination: window strings mirror polyHash (token +
    // trailing space per token), hash replayed via the FNV fold so the
    // join key is identical to the engine's 64-bit window hash
    "dd_decontam" ->
      s"""WITH toks AS (
         |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'),
         |    t -> t <> '') AS w
         |  FROM documents),
         |wins AS (
         |  SELECT doc_id, array_to_string(list_slice(w, i, i + 12), ' ') || ' ' AS s
         |  FROM toks, unnest(generate_series(1, len(w) - 12)) AS t(i)
         |  WHERE len(w) >= 13
         |  UNION ALL
         |  SELECT doc_id, array_to_string(w, ' ') || ' '
         |  FROM toks WHERE len(w) < 13 AND len(w) > 0),
         |hashes AS (SELECT doc_id, ${fnvFoldSql("s", "1469598103934665603")} AS hu
         |  FROM wins),
         |bench AS (SELECT DISTINCT hu FROM hashes WHERE doc_id % 11 = 3),
         |nw AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_windows
         |  FROM hashes WHERE doc_id % 11 <> 3 GROUP BY doc_id),
         |hits AS (SELECT h.doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits
         |  FROM hashes h JOIN bench b ON h.hu = b.hu
         |  WHERE h.doc_id % 11 <> 3 GROUP BY h.doc_id)
         |SELECT h.doc_id, h.n_hits, n.n_windows
         |FROM hits h JOIN nw n ON h.doc_id = n.doc_id
         |ORDER BY h.doc_id""".stripMargin,
    "dd_jaccard" ->
      """WITH tok AS (
        |  SELECT DISTINCT doc_id, lang, source, unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        |sizes AS (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id),
        |pairs AS (
        |  SELECT a.doc_id AS a, b.doc_id AS b, CAST(COUNT(*) AS BIGINT) AS inter
        |  FROM tok a JOIN tok b ON a.w = b.w AND a.lang = b.lang
        |    AND a.source = b.source AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT p.a, p.b, p.inter,
        |  CAST(sa.n + sb.n - p.inter AS BIGINT) AS uni,
        |  CAST(p.inter AS DOUBLE) / (sa.n + sb.n - p.inter) AS jaccard
        |FROM pairs p JOIN sizes sa ON p.a = sa.doc_id
        |JOIN sizes sb ON p.b = sb.doc_id
        |WHERE CAST(p.inter AS DOUBLE) / (sa.n + sb.n - p.inter) >= 0.8
        |ORDER BY a, b""".stripMargin,
    // quadratic unblocked truth over the planted-snippet corpus —
    // a hash match proves the rarest-token prefix filter is lossless.
    // Word 3-grams only: the sandbox corpus is entirely spaced, so the
    // engine's CJK char-trigram route never fires here; that branch is
    // covered by ContainmentSpec's planted CJK snippet instead.
    "dd_containment" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 2000000, array_to_string(
        |    list_slice(w, 1, greatest(3, (2 * len(w)) // 5)), ' ')
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w
        |        FROM documents WHERE doc_id % 10 = 0)),
        |toks AS (SELECT doc_id, string_split(text, ' ') AS w
        |  FROM corpus),
        |tok AS (SELECT DISTINCT doc_id,
        |    array_to_string(list_slice(w, i, i + 2), ' ') AS g
        |  FROM toks, unnest(generate_series(1,
        |    greatest(1, len(w) - 2))) t(i)),
        |sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM tok GROUP BY doc_id),
        |pairs AS (SELECT a.doc_id AS a, b.doc_id AS b,
        |    CAST(COUNT(*) AS BIGINT) AS inter
        |  FROM tok a JOIN tok b ON a.g = b.g AND a.doc_id <> b.doc_id
        |  GROUP BY 1, 2)
        |SELECT p.a, p.b, p.inter, sa.n AS n_a,
        |  CAST(p.inter AS DOUBLE) / sa.n AS containment
        |FROM pairs p JOIN sizes sa ON p.a = sa.doc_id
        |JOIN sizes sb ON p.b = sb.doc_id
        |WHERE (sa.n < sb.n OR (sa.n = sb.n AND p.a < p.b))
        |  AND p.inter * 10 >= sa.n * 9
        |ORDER BY a, b""".stripMargin,
    "dd_lines" ->
      s"""WITH toks AS (
         |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |body AS (
         |  SELECT doc_id, array_to_string(list_transform(
         |    generate_series(0, CAST(ceil(len(w) / 10.0) AS INTEGER) - 1),
         |    j -> array_to_string(list_slice(w, j * 10 + 1, j * 10 + 10), ' ')),
         |    chr(10)) AS t
         |  FROM toks),
         |corpus AS (
         |  SELECT doc_id, CASE WHEN doc_id % 7 = 0
         |    THEN '$BoilerplateLine' || chr(10) || t ELSE t END AS text
         |  FROM body),
         |ls AS (SELECT doc_id, string_split(text, chr(10)) AS a FROM corpus),
         |lines AS (
         |  SELECT doc_id, a[i] AS line, i AS pos
         |  FROM ls, unnest(generate_series(1, len(a))) t(i)),
         |hot AS (
         |  SELECT line FROM lines WHERE trim(line) <> ''
         |  GROUP BY line
         |  HAVING COUNT(DISTINCT doc_id) >= 2),
         |kept AS (
         |  SELECT * FROM lines WHERE line NOT IN (SELECT line FROM hot)),
         |agg AS (
         |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
         |    string_agg(line, chr(10) ORDER BY pos) AS text
         |  FROM kept GROUP BY doc_id),
         |tot AS (SELECT doc_id, CAST(len(a) AS BIGINT) AS n_lines FROM ls)
         |SELECT t.doc_id, COALESCE(a.n_kept, 0) AS n_kept,
         |  t.n_lines - COALESCE(a.n_kept, 0) AS n_dropped,
         |  COALESCE(a.text, '') AS text
         |FROM tot t LEFT JOIN agg a USING (doc_id)
         |ORDER BY t.doc_id""".stripMargin,
    // winnowing replay: 4-gram FNV (HUGEINT fold, signed for the MIN),
    // w=4 window minima via a ROWS frame over full windows only
    // (GREATEST(m-3,1) keeps the single global window for short docs),
    // stop-fingerprint cap, pair re-join
    "dd_winnow" ->
      s"""WITH tks AS (
         |  SELECT doc_id, list_filter(string_split(text, ' '),
         |    t -> t <> '') AS tk
         |  FROM documents),
         |tok AS (SELECT doc_id, tk FROM tks WHERE len(tk) >= 4),
         |gr AS (SELECT doc_id, i,
         |    array_to_string(list_slice(tk, i, i + 3), ' ') AS g
         |  FROM tok, unnest(generate_series(1, len(tk) - 3)) t(i)),
         |hu AS (SELECT doc_id, i,
         |    ${fnvFoldSql("g", "14695981039346656037")} AS h FROM gr),
         |hs AS (SELECT doc_id, i, ${signedSql("h")} AS h FROM hu),
         |wm AS (SELECT doc_id, i,
         |    MIN(h) OVER (PARTITION BY doc_id ORDER BY i
         |      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS mh,
         |    COUNT(*) OVER (PARTITION BY doc_id) AS m
         |  FROM hs),
         |fp AS (SELECT DISTINCT doc_id, mh AS fp FROM wm
         |  WHERE i <= GREATEST(m - 3, 1)),
         |keep AS (SELECT fp FROM fp GROUP BY fp HAVING COUNT(*) <= 50),
         |fpd AS (SELECT doc_id, fp FROM fp
         |  WHERE fp IN (SELECT fp FROM keep))
         |SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS shared
         |FROM fpd a JOIN fpd b ON a.fp = b.fp AND a.doc_id < b.doc_id
         |GROUP BY 1, 2 HAVING COUNT(*) >= 2
         |ORDER BY d1, d2""".stripMargin,
    "dd_minhash" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000,
        |    array_to_string(list_slice(string_split(text, ' '), 1,
        |      greatest(len(string_split(text, ' ')) - 2, 3)), ' ')
        |  FROM documents WHERE doc_id % 20 = 0),
        |toks AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS w
        |  FROM corpus),
        |sh AS (
        |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
        |  FROM toks, unnest(generate_series(1, len(w) - 2)) AS t(i)
        |  WHERE len(w) >= 3
        |  UNION
        |  SELECT doc_id, array_to_string(w, ' ') FROM toks WHERE len(w) < 3),
        |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        |pairs AS (
        |  SELECT a.doc_id AS a, b.doc_id AS b, COUNT(*) AS inter
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT p.a, p.b,
        |  CAST(p.inter AS DOUBLE) / (sa.n + sb.n - p.inter) AS jaccard
        |FROM pairs p JOIN sizes sa ON p.a = sa.doc_id
        |JOIN sizes sb ON p.b = sb.doc_id
        |WHERE CAST(p.inter AS DOUBLE) / (sa.n + sb.n - p.inter) >= 0.8
        |ORDER BY a, b""".stripMargin,
    // full quantizer replay (the ann_ivf pattern) + cluster-scoped pair
    // search + recursive closure — cluster scope is SemDedup's defining
    // approximation, so the oracle replays it rather than global truth
    "dd_semantic" ->
      s"""WITH RECURSIVE corpus AS (
         |  SELECT vec_id, embedding FROM embeddings
         |  UNION ALL
         |  SELECT vec_id + 1000000,
         |    list_transform(generate_series(1, len(embedding)),
         |      i -> CASE WHEN i = 1
         |        THEN CAST(embedding[i] * CAST(1.1 AS FLOAT) AS FLOAT)
         |        ELSE embedding[i] END)
         |  FROM embeddings WHERE vec_id % 40 = 0),
         |cent AS (SELECT vec_id AS cent_id, embedding AS cv FROM corpus
         |  WHERE vec_id % 31 = 5),
         |ac AS (
         |  SELECT e.vec_id, c.cent_id,
         |    ${cosineFoldSql("e.embedding", "c.cv")} AS cos
         |  FROM corpus e CROSS JOIN cent c),
         |assign AS (
         |  SELECT vec_id, cent_id FROM (
         |    SELECT vec_id, cent_id,
         |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, cent_id) AS rn
         |    FROM ac) t WHERE rn = 1),
         |cand AS (
         |  SELECT x.vec_id AS a, y.vec_id AS b
         |  FROM assign x JOIN assign y
         |    ON x.cent_id = y.cent_id AND x.vec_id < y.vec_id),
         |sel AS (
         |  SELECT c.a, c.b
         |  FROM cand c JOIN corpus ea ON ea.vec_id = c.a
         |              JOIN corpus eb ON eb.vec_id = c.b
         |  WHERE ${cosineFoldSql("ea.embedding", "eb.embedding")} >= 0.99),
         |und AS (SELECT a, b FROM sel UNION SELECT b, a FROM sel),
         |reach(n, x) AS (
         |  SELECT a, a FROM und
         |  UNION
         |  SELECT r.n, u.b FROM reach r JOIN und u ON r.x = u.a),
         |comp AS (SELECT n AS vec_id, MIN(x) AS keep_id FROM reach GROUP BY n)
         |SELECT vec_id, keep_id FROM comp WHERE vec_id <> keep_id
         |ORDER BY vec_id""".stripMargin,
    // the exact pair truth + closure, then the classify score formula
    // and a (score DESC, id) argmax picks each family's survivor
    "dd_near_best" ->
      """WITH RECURSIVE corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000,
        |    array_to_string(list_slice(string_split(text, ' '), 1,
        |      greatest(len(string_split(text, ' ')) - 2, 3)), ' ')
        |  FROM documents WHERE doc_id % 20 = 0),
        |toks AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS w
        |  FROM corpus),
        |sh AS (
        |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
        |  FROM toks, unnest(generate_series(1, len(w) - 2)) AS t(i)
        |  WHERE len(w) >= 3
        |  UNION
        |  SELECT doc_id, array_to_string(w, ' ') FROM toks WHERE len(w) < 3),
        |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        |pairs AS (
        |  SELECT a.doc_id AS a, b.doc_id AS b, COUNT(*) AS inter
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |sel AS (
        |  SELECT p.a, p.b
        |  FROM pairs p JOIN sizes sa ON p.a = sa.doc_id
        |  JOIN sizes sb ON p.b = sb.doc_id
        |  WHERE CAST(p.inter AS DOUBLE) / (sa.n + sb.n - p.inter) >= 0.8),
        |und AS (SELECT a, b FROM sel UNION SELECT b, a FROM sel),
        |reach(n, x) AS (
        |  SELECT a, a FROM und
        |  UNION
        |  SELECT r.n, u.b FROM reach r JOIN und u ON r.x = u.a),
        |cmp AS (SELECT n AS doc_id, MIN(x) AS cl FROM reach GROUP BY n),
        |feat AS (SELECT doc_id,
        |    CAST(length(text) AS BIGINT) AS n_chars,
        |    CASE WHEN length(trim(text)) = 0 THEN CAST(0 AS BIGINT)
        |         ELSE CAST(length(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) END AS n_tokens,
        |    CAST(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS BIGINT) AS n_punct,
        |    CAST(length(list_filter(string_split_regex(trim(text), '\s+'),
        |      w -> list_contains(['the','a','an','and','or','of','to','in','is','it'], w))) AS BIGINT) AS n_stopwords
        |  FROM corpus),
        |sc AS (SELECT doc_id,
        |    3 * (CASE WHEN n_tokens > 0 THEN (1000000 * n_stopwords) // n_tokens ELSE 0 END)
        |    - 4 * (CASE WHEN n_chars > 0 THEN (1000000 * n_punct) // n_chars ELSE 0 END)
        |    + 2 * least(CAST(1000000 AS BIGINT), (1000000 * n_tokens) // 400)
        |    + (CASE WHEN n_tokens > 0 THEN (1000000 * (n_chars - n_tokens + 1)) // (6 * n_tokens) ELSE 0 END)
        |    - 1500000 AS score
        |  FROM feat),
        |best AS (SELECT cl, doc_id AS keep_id FROM (
        |    SELECT c.cl, c.doc_id,
        |      ROW_NUMBER() OVER (PARTITION BY c.cl
        |        ORDER BY s.score DESC, c.doc_id) AS rn
        |    FROM cmp c JOIN sc s USING (doc_id)) WHERE rn = 1)
        |SELECT c.doc_id, b.keep_id FROM cmp c JOIN best b USING (cl)
        |WHERE c.doc_id <> b.keep_id ORDER BY doc_id""".stripMargin,
    // the exact >=0.8 pair truth (dd_minhash's oracle) + recursive
    // symmetric closure with MIN-label read-off
    "dd_minhash_clusters" ->
      """WITH RECURSIVE corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000,
        |    array_to_string(list_slice(string_split(text, ' '), 1,
        |      greatest(len(string_split(text, ' ')) - 2, 3)), ' ')
        |  FROM documents WHERE doc_id % 20 = 0),
        |toks AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS w
        |  FROM corpus),
        |sh AS (
        |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
        |  FROM toks, unnest(generate_series(1, len(w) - 2)) AS t(i)
        |  WHERE len(w) >= 3
        |  UNION
        |  SELECT doc_id, array_to_string(w, ' ') FROM toks WHERE len(w) < 3),
        |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        |pairs AS (
        |  SELECT a.doc_id AS a, b.doc_id AS b, COUNT(*) AS inter
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |sel AS (
        |  SELECT p.a, p.b
        |  FROM pairs p JOIN sizes sa ON p.a = sa.doc_id
        |  JOIN sizes sb ON p.b = sb.doc_id
        |  WHERE CAST(p.inter AS DOUBLE) / (sa.n + sb.n - p.inter) >= 0.8),
        |und AS (SELECT a, b FROM sel UNION SELECT b, a FROM sel),
        |reach(n, x) AS (
        |  SELECT a, a FROM und
        |  UNION
        |  SELECT r.n, u.b FROM reach r JOIN und u ON r.x = u.a),
        |comp AS (SELECT n AS doc_id, MIN(x) AS keep_id FROM reach GROUP BY n)
        |SELECT doc_id, keep_id FROM comp WHERE doc_id <> keep_id
        |ORDER BY doc_id""".stripMargin,
    // feature micro-ratios are NON-NEGATIVE floor divisions (Spark div ≡
    // DuckDB // there); the score is a pure integer sum so sign-division
    // semantics never diverge
    "txt_classify" ->
      """WITH f AS (SELECT doc_id,
        |  CAST(length(text) AS BIGINT) AS n_chars,
        |  CASE WHEN length(trim(text)) = 0 THEN CAST(0 AS BIGINT)
        |       ELSE CAST(length(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) END AS n_tokens,
        |  CAST(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS BIGINT) AS n_punct,
        |  CAST(length(list_filter(string_split_regex(trim(text), '\s+'),
        |    w -> list_contains(['the','a','an','and','or','of','to','in','is','it'], w))) AS BIGINT) AS n_stopwords
        |  FROM documents),
        |g AS (SELECT doc_id,
        |  CASE WHEN n_tokens > 0 THEN CAST((1000000 * n_stopwords) // n_tokens AS BIGINT)
        |       ELSE CAST(0 AS BIGINT) END AS f_stop,
        |  CASE WHEN n_chars > 0 THEN CAST((1000000 * n_punct) // n_chars AS BIGINT)
        |       ELSE CAST(0 AS BIGINT) END AS f_punct,
        |  least(CAST(1000000 AS BIGINT),
        |        CAST((1000000 * n_tokens) // 400 AS BIGINT)) AS f_len,
        |  CASE WHEN n_tokens > 0
        |       THEN CAST((1000000 * (n_chars - n_tokens + 1)) // (6 * n_tokens) AS BIGINT)
        |       ELSE CAST(0 AS BIGINT) END AS f_mtl
        |  FROM f)
        |SELECT doc_id, f_stop, f_punct, f_len, f_mtl,
        |  3 * f_stop - 4 * f_punct + 2 * f_len + f_mtl - 1500000 AS score,
        |  (3 * f_stop - 4 * f_punct + 2 * f_len + f_mtl - 1500000) >= 0 AS keep
        |FROM g ORDER BY doc_id""".stripMargin,
    "ann_top1" ->
      """WITH v AS (
        |  SELECT vec_id, CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000) AS BIGINT) AS q,
        |         generate_subscripts(embedding, 1) AS i
        |  FROM embeddings),
        |dots AS (
        |  SELECT a.vec_id AS query_id, b.vec_id AS cand_id,
        |         CAST(SUM(a.q * b.q) AS BIGINT) AS dp
        |  FROM v a JOIN v b ON a.i = b.i AND a.vec_id <> b.vec_id
        |  WHERE a.vec_id < 30 GROUP BY 1, 2),
        |ranked AS (
        |  SELECT query_id, cand_id, dp,
        |         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dp DESC, cand_id) AS rn
        |  FROM dots)
        |SELECT query_id, cand_id, dp FROM ranked WHERE rn = 1 ORDER BY query_id""".stripMargin,
    "txt_repetition" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\s+'), t -> t <> '') AS w
        |  FROM documents),
        |base AS (
        |  SELECT doc_id, w, CAST(len(w) AS BIGINT) AS n_tokens,
        |    CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct,
        |    CAST(greatest(len(w) - 1, 0) AS BIGINT) AS n_bigrams,
        |    CAST(CASE WHEN len(w) < 2 THEN 0
        |      ELSE len(list_distinct(list_transform(
        |        generate_series(1, len(w) - 1), i -> w[i] || ' ' || w[i + 1])))
        |    END AS BIGINT) AS n_distinct_bigrams
        |  FROM toks),
        |top AS (
        |  SELECT doc_id, CAST(MAX(c) AS BIGINT) AS top_token_n FROM (
        |    SELECT doc_id, t, COUNT(*) AS c
        |    FROM (SELECT doc_id, unnest(w) AS t FROM toks)
        |    GROUP BY doc_id, t)
        |  GROUP BY doc_id)
        |SELECT b.doc_id, b.n_tokens, b.n_distinct,
        |  COALESCE(top.top_token_n, 0) AS top_token_n,
        |  b.n_bigrams - b.n_distinct_bigrams AS dup_bigram_n,
        |  CASE WHEN b.n_tokens > 0
        |    THEN CAST(COALESCE(top.top_token_n, 0) AS DOUBLE) / b.n_tokens
        |    ELSE 0.0 END AS top_token_share,
        |  CASE WHEN b.n_bigrams > 0
        |    THEN CAST(b.n_bigrams - b.n_distinct_bigrams AS DOUBLE) / b.n_bigrams
        |    ELSE 0.0 END AS dup_bigram_frac
        |FROM base b LEFT JOIN top ON b.doc_id = top.doc_id
        |ORDER BY b.doc_id""".stripMargin,
    "txt_quality" ->
      """SELECT doc_id,
        |  CASE WHEN length(trim(text)) = 0 THEN 0
        |       ELSE CAST(length(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) END AS n_tokens,
        |  CAST(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS BIGINT) AS n_punct,
        |  CAST(length(list_filter(string_split_regex(trim(text), '\s+'),
        |    w -> list_contains(['the','a','an','and','or','of','to','in','is','it'], w))) AS BIGINT) AS n_stopwords,
        |  CASE WHEN length(trim(text)) = 0 THEN 0.0
        |       ELSE CAST(length(text) - length(regexp_split_to_array(trim(text), '\s+')) + 1 AS DOUBLE)
        |            / length(regexp_split_to_array(trim(text), '\s+')) END AS mean_token_len,
        |  CASE WHEN length(trim(text)) = 0 THEN 0.0
        |       ELSE CAST(length(list_filter(string_split_regex(trim(text), '\s+'),
        |    w -> list_contains(['the','a','an','and','or','of','to','in','is','it'], w))) AS DOUBLE)
        |            / length(regexp_split_to_array(trim(text), '\s+')) END AS stopword_ratio
        |FROM documents ORDER BY doc_id""".stripMargin,
    // exact integer counts; both floor divisions non-negative so Spark
    // `div` ≡ DuckDB `//`; the grade's only negative step is the final
    // subtraction — bit-replayable on both engines
    "txt_readability" ->
      """WITH c AS (SELECT doc_id,
        |  CASE WHEN length(trim(text)) = 0 THEN 0
        |       ELSE CAST(length(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) END AS n_words,
        |  GREATEST(CAST(1 AS BIGINT),
        |    CAST(length(regexp_extract_all(text, '[.!?]+')) AS BIGINT)) AS n_sents,
        |  CAST(length(regexp_extract_all(text, '[aeiouyAEIOUY]+')) AS BIGINT) AS n_syll
        |  FROM documents)
        |SELECT doc_id, n_words, n_sents, n_syll,
        |  CASE WHEN n_words > 0
        |       THEN (390000 * n_words) // n_sents
        |            + (11800000 * n_syll) // n_words - 15590000
        |       ELSE 0 END AS fk_micro
        |FROM c ORDER BY doc_id""".stripMargin,
    // the oracle recomputes width/height/sample-rate/file-size from the
    // CONTAINER SPECS — BMP's 54-byte headers + 4-byte-padded 24bpp rows,
    // WAV's 44-byte RIFF/fmt/data framing + 16-bit mono payload, Y4M's
    // ASCII stream header + FRAME-delimited C444 planes — while the Spark
    // side parses the actual bytes, so any header-math drift breaks the hash
    // JFIF closed forms: dims from doc_id, 3 YCbCr components, SOF2 iff
    // even id, 5 header segments (APP0/DQT/SOF/DHT/SOS), size
    // 146 + w*h//16 (the encodeJpeg constant JpegSpec pins)
    "mm_jpeg" ->
      """SELECT doc_id,
        |  CAST(64 + doc_id % 64 AS INTEGER) AS width,
        |  CAST(64 + (doc_id // 2) % 64 AS INTEGER) AS height,
        |  CAST(3 AS INTEGER) AS channels,
        |  (doc_id % 2 = 0) AS progressive,
        |  CAST(5 AS BIGINT) AS n_segments,
        |  CAST(146 + ((64 + doc_id % 64) * (64 + (doc_id // 2) % 64)) // 16
        |    AS BIGINT) AS n_bytes
        |FROM documents WHERE doc_id % 3 = 0 ORDER BY doc_id""".stripMargin,
    "mm_meta" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |    CAST(64 + doc_id % 64 AS INTEGER) AS w,
        |    CAST(64 + (doc_id // 2) % 64 AS INTEGER) AS h,
        |    CAST(1 + doc_id % 30 AS INTEGER) AS f
        |  FROM documents)
        |SELECT doc_id, kind,
        |  CAST(CASE kind WHEN 'audio' THEN 0 ELSE w END AS INTEGER) AS width,
        |  CAST(CASE kind WHEN 'audio' THEN 0 ELSE h END AS INTEGER) AS height,
        |  CAST(CASE kind WHEN 'audio' THEN 1 ELSE 3 END AS INTEGER) AS channels,
        |  CAST(CASE kind WHEN 'image' THEN 1 WHEN 'audio' THEN 0 ELSE f END AS INTEGER) AS n_frames,
        |  CAST(CASE kind WHEN 'audio' THEN 16000 ELSE 0 END AS INTEGER) AS sample_rate,
        |  CAST(CASE
        |    -- PNG (every 6th doc): sig 8 + IHDR 25 + IEND 12 + IDAT chunk of
        |    -- zlib-STORED blocks: raw = h*(1+3w), total 63 + raw + 5*ceil(raw/65535)
        |    WHEN kind = 'image' AND doc_id % 6 = 0
        |      THEN 63 + h * (1 + 3 * w) + 5 * ((h * (1 + 3 * w) + 65534) // 65535)
        |    WHEN kind = 'image' THEN 54 + h * (((3 * w + 3) // 4) * 4)
        |    WHEN kind = 'audio' THEN 44 + (8000 + doc_id % 11 * 1200) * 2
        |    ELSE length('YUV4MPEG2 W' || CAST(w AS VARCHAR) || ' H' ||
        |         CAST(h AS VARCHAR) || ' F25:1 Ip A1:1 C444') + 1
        |         + f * (6 + w * h * 3)
        |  END AS BIGINT) AS n_bytes,
        |  TRUE AS decoded
        |FROM m ORDER BY doc_id""".stripMargin,
    // resized dims: integer floor scale to longest side 96, then the SAME
    // container-size formulas as mm_meta evaluated at the new dims; audio
    // (width/height 0 in its Meta) is never scaled
    "mm_resize" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |    CAST(64 + doc_id % 64 AS INTEGER) AS w,
        |    CAST(64 + (doc_id // 2) % 64 AS INTEGER) AS h,
        |    CAST(1 + doc_id % 30 AS INTEGER) AS f
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, kind, f,
        |    CASE WHEN kind = 'audio' THEN 0
        |         WHEN greatest(w, h) <= 96 THEN w
        |         ELSE w * 96 // greatest(w, h) END AS w2,
        |    CASE WHEN kind = 'audio' THEN 0
        |         WHEN greatest(w, h) <= 96 THEN h
        |         ELSE h * 96 // greatest(w, h) END AS h2
        |  FROM m)
        |SELECT doc_id, CAST(w2 AS INTEGER) AS width, CAST(h2 AS INTEGER) AS height,
        |  CAST(CASE
        |    WHEN kind = 'image' AND doc_id % 6 = 0
        |      THEN 63 + h2 * (1 + 3 * w2) + 5 * ((h2 * (1 + 3 * w2) + 65534) // 65535)
        |    WHEN kind = 'image' THEN 54 + h2 * (((3 * w2 + 3) // 4) * 4)
        |    WHEN kind = 'audio' THEN 44 + (8000 + doc_id % 11 * 1200) * 2
        |    ELSE length('YUV4MPEG2 W' || CAST(w2 AS VARCHAR) || ' H' ||
        |         CAST(h2 AS VARCHAR) || ' F25:1 Ip A1:1 C444') + 1
        |         + f * (6 + w2 * h2 * 3)
        |  END AS BIGINT) AS n_bytes
        |FROM r ORDER BY doc_id""".stripMargin,
    // dHash/aHash replayed from the gradient payload: BMP rows store
    // bottom-up (visual row y = gradient offset h-1-y), PNG top-down;
    // gray = ((b)%251+(b+1)%251+(b+2)%251)//3 at grid sample points,
    // signed-64 reassembly as in dd_simhash
    "mm_phash" ->
      """WITH RECURSIVE pow2(i, v) AS (
        |  SELECT 0, CAST(1 AS HUGEINT)
        |  UNION ALL SELECT i + 1, v * 2 FROM pow2 WHERE i < 63),
        |m AS (
        |  SELECT doc_id, CAST(64 + doc_id % 64 AS INTEGER) AS w,
        |    CAST(64 + (doc_id // 2) % 64 AS INTEGER) AS h,
        |    (doc_id % 6 = 0) AS is_png
        |  FROM documents WHERE doc_id % 3 = 0),
        |grid AS (SELECT gy, gx FROM unnest(generate_series(0, 7)) t1(gy),
        |                            unnest(generate_series(0, 8)) t2(gx)),
        |gp AS (
        |  SELECT m.doc_id, grid.gy, grid.gx,
        |    3 * (grid.gx * m.w // 9) AS bx,
        |    CASE WHEN m.is_png THEN grid.gy * m.h // 8
        |         ELSE m.h - 1 - (grid.gy * m.h // 8) END AS py
        |  FROM m CROSS JOIN grid),
        |g AS (
        |  SELECT doc_id, gy, gx,
        |    (((bx + py) % 251 + (bx + py + 1) % 251 + (bx + py + 2) % 251) // 3) AS gray
        |  FROM gp),
        |d AS (
        |  SELECT a.doc_id, a.gy * 8 + a.gx AS bit, (b.gray > a.gray) AS flag
        |  FROM g a JOIN g b ON b.doc_id = a.doc_id AND b.gy = a.gy
        |    AND b.gx = a.gx + 1
        |  WHERE a.gx < 8),
        |mu AS (SELECT doc_id, SUM(gray) // 64 AS mu FROM g WHERE gx < 8 GROUP BY doc_id),
        |ab AS (
        |  SELECT g.doc_id, g.gy * 8 + g.gx AS bit, (g.gray > mu.mu) AS flag
        |  FROM g JOIN mu USING (doc_id) WHERE g.gx < 8),
        |dh AS (
        |  SELECT d.doc_id, CAST(SUM(CASE WHEN flag THEN
        |      CASE WHEN bit = 63 THEN CAST('-9223372036854775808' AS BIGINT)
        |           ELSE CAST(p.v AS BIGINT) END ELSE 0 END) AS BIGINT) AS dhash
        |  FROM d JOIN pow2 p ON p.i = d.bit GROUP BY d.doc_id),
        |ah AS (
        |  SELECT ab.doc_id, CAST(SUM(CASE WHEN flag THEN
        |      CASE WHEN bit = 63 THEN CAST('-9223372036854775808' AS BIGINT)
        |           ELSE CAST(p.v AS BIGINT) END ELSE 0 END) AS BIGINT) AS ahash
        |  FROM ab JOIN pow2 p ON p.i = ab.bit GROUP BY ab.doc_id)
        |SELECT m.doc_id, dh.dhash, ah.ahash
        |FROM m JOIN dh ON dh.doc_id = m.doc_id JOIN ah ON ah.doc_id = m.doc_id
        |ORDER BY m.doc_id""".stripMargin,
    // gradient payload closed form: byte j of file row r = (j+r) mod 251;
    // channel c at pixel (x, y) = (3x+c+row) mod 251 — sums run over all
    // rows, so BMP's bottom-up storage needs no flip here
    "mm_colorstats" ->
      """WITH m AS (
        |  SELECT doc_id, CAST(64 + doc_id % 64 AS INTEGER) AS w,
        |    CAST(64 + (doc_id // 2) % 64 AS INTEGER) AS h
        |  FROM documents WHERE doc_id % 3 = 0),
        |px AS (
        |  SELECT m.doc_id, m.w, m.h,
        |    (3 * xs.x + ys.y) % 251 AS r,
        |    (3 * xs.x + 1 + ys.y) % 251 AS g,
        |    (3 * xs.x + 2 + ys.y) % 251 AS b
        |  FROM m,
        |    unnest(generate_series(0, m.w - 1)) xs(x),
        |    unnest(generate_series(0, m.h - 1)) ys(y)),
        |ag AS (
        |  SELECT doc_id, w, h, SUM(r) AS sr, SUM(g) AS sg, SUM(b) AS sb,
        |    SUM(CASE WHEN (r + g + b) // 3 < 64 THEN 1 ELSE 0 END) AS dark
        |  FROM px GROUP BY 1, 2, 3)
        |SELECT doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
        |  CAST(sr // (w * h) AS BIGINT) AS mean_r,
        |  CAST(sg // (w * h) AS BIGINT) AS mean_g,
        |  CAST(sb // (w * h) AS BIGINT) AS mean_b,
        |  CAST(10000 * dark // (w * h) AS BIGINT) AS dark_bp
        |FROM ag ORDER BY doc_id""".stripMargin,
    "mm_frames" ->
      """WITH m AS (
        |  SELECT doc_id, CAST(1 + doc_id % 30 AS INTEGER) AS n_frames
        |  FROM documents WHERE doc_id % 3 = 2)
        |SELECT doc_id, CAST(unnest(generate_series(0, n_frames - 1, 7)) AS BIGINT) AS frame_idx
        |FROM m ORDER BY doc_id, frame_idx""".stripMargin,
    // energy-delta fingerprint replayed from the sawtooth payload:
    // sample i = (i mod 4096) - 2048, windows of 1024 (last partial),
    // bit w-1 = [e_w > e_{w-1}]; fp stays below bit 63, no sign bridge
    "mm_audio_fp" ->
      """WITH a AS (
        |  SELECT doc_id, CAST(8000 + doc_id % 11 * 1200 AS BIGINT) AS n
        |  FROM documents WHERE doc_id % 3 = 1),
        |e AS (
        |  SELECT doc_id, i // 1024 AS w, SUM(abs((i % 4096) - 2048)) AS en
        |  FROM a, unnest(generate_series(0, n - 1)) t(i)
        |  GROUP BY doc_id, i // 1024),
        |d AS (
        |  SELECT doc_id, w, en,
        |    LAG(en) OVER (PARTITION BY doc_id ORDER BY w) AS pe
        |  FROM e)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_windows,
        |  CAST(COALESCE(SUM(CASE WHEN pe IS NOT NULL AND en > pe AND w <= 63
        |    THEN CAST(1 AS BIGINT) << CAST(w - 1 AS INTEGER) ELSE 0 END), 0)
        |    AS BIGINT) AS fp
        |FROM d GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // frame energies from the sawtooth closed form (the mm_audio_fp
    // trick at frame=256), threshold 256*1024 = the mean |sample|,
    // segments as gaps-and-islands over the active frame index
    "mm_vad" ->
      """WITH a AS (
        |  SELECT doc_id, CAST(8000 + doc_id % 11 * 1200 AS BIGINT) AS n
        |  FROM documents WHERE doc_id % 3 = 1),
        |e AS (
        |  SELECT doc_id, i // 256 AS f, SUM(abs((i % 4096) - 2048)) AS en
        |  FROM a, unnest(generate_series(0, n - 1)) t(i)
        |  GROUP BY doc_id, i // 256),
        |nf AS (
        |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_frames,
        |    CAST(SUM(CASE WHEN en > 262144 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_active
        |  FROM e GROUP BY doc_id),
        |isl AS (
        |  SELECT doc_id, f,
        |    f - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY f) AS g
        |  FROM e WHERE en > 262144),
        |seg AS (SELECT doc_id, g, CAST(COUNT(*) AS BIGINT) AS len
        |  FROM isl GROUP BY doc_id, g),
        |sg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_segments,
        |  CAST(MAX(len) AS BIGINT) AS longest
        |  FROM seg GROUP BY doc_id)
        |SELECT nf.doc_id, nf.n_frames, nf.n_active,
        |  CAST(COALESCE(sg.n_segments, 0) AS BIGINT) AS n_segments,
        |  CAST(COALESCE(sg.longest, 0) AS BIGINT) AS longest
        |FROM nf LEFT JOIN sg ON sg.doc_id = nf.doc_id
        |ORDER BY nf.doc_id""".stripMargin,
    // the twin-planting replayed inline; weight = floor basis points
    "dd_softdedup" ->
      """WITH c AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 3000000, text FROM documents
        |    WHERE doc_id % 8 = 0
        |  UNION ALL SELECT doc_id + 6000000, text FROM documents
        |    WHERE doc_id % 8 = 0),
        |s AS (SELECT text, CAST(COUNT(*) AS BIGINT) AS cluster_size
        |  FROM c GROUP BY text)
        |SELECT c.doc_id, s.cluster_size,
        |  CAST(10000 // s.cluster_size AS BIGINT) AS weight_bp
        |FROM c JOIN s USING (text) ORDER BY doc_id""".stripMargin,
    // identity oracle: the JSON round trip must reproduce the table
    "src_jsonl" ->
      """SELECT doc_id, lang, source, text FROM documents
        |ORDER BY doc_id""".stripMargin,
    // identity oracle: the CSV round trip must reproduce the table
    "src_csv" ->
      """SELECT doc_id, lang, source, text FROM documents
        |ORDER BY doc_id""".stripMargin,
    // identity oracle: the ORC file round trip must reproduce the table
    "src_orc" ->
      """SELECT doc_id, lang, source, text FROM documents
        |ORDER BY doc_id""".stripMargin,
    // identity oracle: the Arrow IPC round trip must reproduce the
    // table through the columnar offsets/validity/footer layout
    "src_arrow" ->
      """SELECT doc_id, lang, source, text FROM documents
        |ORDER BY doc_id""".stripMargin,
    // identity oracle: the TFRecord/Example round trip must reproduce
    // the table through framing CRCs and proto wire format
    "src_tfrecord" ->
      """SELECT doc_id, lang, source, text FROM documents
        |ORDER BY doc_id""".stripMargin,
    // per-term ln over integer counts only (micro-nat rule), HUGEINT
    // accumulation, double finished from identical integers
    "mix_kl" ->
      """WITH tk AS (SELECT source,
        |    unnest(list_filter(string_split(text, ' '), t -> t <> ''))
        |      AS tok
        |  FROM documents),
        |h AS (SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM tk GROUP BY 1, 2),
        |ns AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n_s,
        |  CAST(COUNT(*) AS BIGINT) AS n_distinct FROM h GROUP BY source),
        |ct AS (SELECT tok, CAST(SUM(c) AS BIGINT) AS ct FROM h
        |  GROUP BY tok),
        |n AS (SELECT CAST(SUM(c) AS BIGINT) AS nn FROM h),
        |terms AS (SELECT h.source, ns.n_s, ns.n_distinct,
        |    CAST(h.c AS HUGEINT) *
        |      (CAST(ROUND(ln(h.c) * 1e6) AS BIGINT)
        |       + CAST(ROUND(ln(n.nn) * 1e6) AS BIGINT)
        |       - CAST(ROUND(ln(ns.n_s) * 1e6) AS BIGINT)
        |       - CAST(ROUND(ln(ct.ct) * 1e6) AS BIGINT)) AS term
        |  FROM h JOIN ct USING (tok) JOIN ns USING (source) CROSS JOIN n)
        |SELECT source, n_s AS n_tokens, n_distinct,
        |  CAST(SUM(term) AS BIGINT) AS kl_sum_micro,
        |  CAST(SUM(term) AS DOUBLE) / (CAST(n_s AS DOUBLE) * 1000000.0)
        |    AS kl
        |FROM terms GROUP BY source, n_s, n_distinct
        |ORDER BY source""".stripMargin
  )
}
