package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deduplication operators for large-scale training-data pipelines.
  *
  * Four tiers, by cost and fuzziness:
  *  - exact (hash-groupBy),
  *  - unigram/n-gram Jaccard within blocking groups,
  *  - MinHash + LSH banding (near-dup candidates without O(n²)),
  *  - SimHash (64-bit fingerprints, hamming-distance candidates).
  *
  * Scale design: every tier avoids the quadratic pair join on the full
  * corpus — exact dedup is one shuffle on the content hash; Jaccard only
  * compares within blocking groups; MinHash pairs come from band-bucket
  * joins (candidates ∝ true near-dups, not n²); SimHash buckets on 16-bit
  * chunks (pigeonhole: hamming ≤ 3 ⇒ one of 4 chunks equal).
  */
object Dedup {

  /** Exact dedup: keep the smallest id per identical text.
    *
    * Scale shape (round-4 verdict #1): the winner-per-hash decision is an
    * AGGREGATE over `(sha2(text), id)` — sha2 is computed map-side and the
    * partial min combines before the exchange, so the dedup shuffle
    * carries ~40-byte (hash, id) rows, never the text. Survivors are then
    * kept with a left-semi join on the id: at sandbox scale the survivor
    * id set broadcasts (corpus side shuffles nothing); at 100 TB the doc
    * table's bucketed-by-doc_id layout makes the semi join co-located
    * (BucketingSpec / DedupPlanSpec: 0 exchanges on the corpus side).
    * The previous window formulation shuffled every full row — text
    * included — through the sha2-keyed exchange.
    */
  def exact(docs: DataFrame, idCol: String = "doc_id",
            textCol: String = "text"): DataFrame = {
    val keep = docs
      .groupBy(sha2(col(textCol), 256).as("__h"))
      .agg(min(col(idCol)).as(idCol))
      .select(col(idCol))
    docs.join(keep, Seq(idCol), "left_semi")
  }

  /** Duplicate-cluster table: (doc_id, keep_id) for every doc whose text
    * has an earlier twin.
    */
  def exactClusters(docs: DataFrame, idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    val w = Window.partitionBy(sha2(col(textCol), 256)).orderBy(col(idCol))
    docs.select(col(idCol), min(col(idCol)).over(w).as("keep_id"))
      .filter(col(idCol) =!= col("keep_id"))
  }

  /** Soft dedup: REWEIGHT duplicates instead of dropping them — each doc
    * gets sampling weight ∝ 1/|its exact-duplicate cluster| (in basis
    * points, floor division, so a 3-cluster's members carry 3333 bp
    * each). The SoftDeDup insight (Xue et al. 2024, ACL): hard removal
    * discards the frequency signal entirely, reweighting preserves the
    * corpus distribution while bounding any one text's influence — the
    * curation knob BETWEEN keep-all and [[exact]].
    *
    * Scale shape: same discipline as [[exact]] — the corpus text never
    * crosses an exchange. One narrow (hash, id) projection feeds both
    * the cluster-size aggregate (40-byte rows, map-side combined) and
    * the size join-back; output is (id, size, weight), never the row.
    */
  def softDedupWeights(docs: DataFrame, idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame = {
    val h = docs.select(col(idCol), sha2(col(textCol), 256).as("__h"))
    val sizes = h.groupBy(col("__h")).agg(count(lit(1)).as("cluster_size"))
    h.join(sizes, Seq("__h"))
      .select(col(idCol), col("cluster_size"),
        expr("CAST(10000 AS BIGINT) div cluster_size").as("weight_bp"))
  }

  private def isCjkCol(t: Column): Column =
    graft.text.TextAnalysis.isCjkCol(t)

  /** Distinct-token set per doc as a sorted array — whitespace unigrams
    * for space-delimited text, single characters for CJK/Thai rows
    * (content-routed; see the CJK routing note above).
    */
  def tokenSets(docs: DataFrame, idCol: String = "doc_id",
                textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val words = split(t, " ")
    val chars = filter(split(regexp_replace(t,
        graft.text.TextAnalysis.WhitespaceClass + "+", ""), ""),
      c => length(c) > 0)
    docs.select(col(idCol),
      array_sort(array_distinct(when(isCjkCol(t), chars).otherwise(words)))
        .as("tokens"))
  }

  /** Length bucket for Jaccard blocking: floor(ln n / ln(1/t)). Two docs
    * with J ≥ t satisfy min(n)/max(n) ≥ t (inter ≤ min, union ≥ max), so
    * their buckets differ by AT MOST 1 — joining each doc into its own
    * and the next bucket is lossless for the threshold while bounding a
    * skewed (lang, source) block to near-equal-length pairs (round-1
    * verdict: the bare (lang, source) key is quadratic at corpus scale).
    */
  private def lengthBucket(n: Column, threshold: Double): Column =
    floor(log(n.cast("double")) / math.log(1.0 / threshold)).cast("int")

  /** Unigram-Jaccard near-dup pairs within blocking groups
    * (lang, source, length-bucket ±1). Entirely relational:
    * `array_intersect`/`array_union` sizes, integer-exact, one division
    * at the end. The full-corpus cross join never happens, and within a
    * hot (lang, source) block only near-equal-length docs pair.
    */
  def jaccardPairs(docs: DataFrame, threshold: Double): DataFrame =
    jaccardCandidates(docs, threshold)
      .filter(col("jaccard") >= threshold)
      .select("a", "b", "inter", "uni", "jaccard")

  /** Candidate pairs (pre-threshold) — exposed so tests can assert the
    * blocking bound directly.
    *
    * Formulation note (round-3 measured): an inverted-index variant
    * (post tokens under the block key, count shared tokens with a
    * token-equality join) was benchmarked and is ~40% SLOWER here —
    * Σ df² narrow rows + a multi-key aggregation + an extra shuffle lose
    * to one join with codegen'd in-row array intersects while the length
    * bands keep block pairs bounded (147 k pairs at sf0.1). Either
    * formulation is quadratic inside a stopword-dense block at corpus
    * scale — that regime belongs to the MinHash+LSH tier; this tier is
    * the exact within-block path.
    */
  def jaccardCandidates(docs: DataFrame, threshold: Double): DataFrame = {
    require(threshold > 0 && threshold < 1, "threshold must be in (0,1)")
    // Tokens ship through the block-join shuffle TWICE (round-3 verdict
    // #6): hash each token to int64 first (xxhash64 — codegen'd builtin),
    // so the exchange carries 8-byte elements instead of full strings
    // (~2.6x fewer shuffle bytes, BENCH.md §plan-audit). Intersection /
    // union sizes over the hashed sets equal the string-set sizes except
    // under a 64-bit collision INSIDE one pair's union (P ≈ |union|²/2^64
    // ≈ 1e-11 per pair at 10k-token pages) — the same dispensation the
    // MinHash tier's FNV base hash already carries.
    // CJK routing (content-based, see note above): unspaced rows tokenize
    // to character BIGRAMS (unigram chars over a small alphabet make
    // unrelated docs look similar); spaced rows keep word unigrams, so
    // existing corpora/oracles are untouched.
    val toks = docs.select(col("doc_id"), col("lang"), col("source"),
        hashedTokenArray(col("text")).as("tokens"))
      .withColumn("bkt", lengthBucket(size(col("tokens")), threshold))
    // each side emits {bkt, bkt+1}: buckets intersect ⟺ |Δbkt| ≤ 1
    val emitted = toks.select(col("doc_id"), col("lang"), col("source"),
      col("tokens"), explode(array(col("bkt"), col("bkt") + 1)).as("key"))
    val a = emitted.select(col("lang"), col("source"), col("key"),
      col("doc_id").as("a"), col("tokens").as("ta"))
    val b = emitted.select(col("lang"), col("source"), col("key"),
      col("doc_id").as("b"), col("tokens").as("tb"))
    a.join(b, Seq("lang", "source", "key"))
      .filter(col("a") < col("b"))
      .withColumn("inter", size(array_intersect(col("ta"), col("tb"))))
      .withColumn("uni", size(array_union(col("ta"), col("tb"))))
      .withColumn("jaccard", col("inter").cast("double") / col("uni"))
      .select("a", "b", "inter", "uni", "jaccard")
      .dropDuplicates("a", "b") // adjacent buckets can meet at 2 keys
  }

  /** Sorted distinct xxhash64'd unigram array for a text column — the
    * 8-byte-element token-set representation the Jaccard and containment
    * tiers ship through their shuffles (round-3 verdict #6: hashed
    * elements ≈ 2.6× fewer exchange bytes than strings; collision odds
    * INSIDE one pair's union ≈ |union|²/2^64). CJK-routed to character
    * bigrams (content-based — see the routing note below).
    */
  private def hashedTokenArray(t: Column): Column = {
    val wordHashes = transform(split(t, " "), w => xxhash64(w))
    val squeezed = regexp_replace(t,
      graft.text.TextAnalysis.WhitespaceClass + "+", "")
    val charBigramHashes = when(length(squeezed) < 2,
        array(xxhash64(squeezed)))
      .otherwise(transform(sequence(lit(1), length(squeezed) - 1),
        i => xxhash64(squeezed.substr(i, lit(2)))))
    array_sort(array_distinct(
      when(isCjkCol(t), charBigramHashes).otherwise(wordHashes)))
  }

  /** Asymmetric containment near-dup pairs: C(a→b) = |Sa ∩ Sb| / |Sa| ≥
    * num/den over distinct 3-GRAM SHINGLE sets, reported for the
    * SMALLER side contained in the larger (ties: a < b) — the tier
    * Jaccard structurally misses (a snippet fully inside a page has
    * J ≈ |snippet|/|page| but containment 1.0; RefinedWeb/CCNet-style
    * curation deduplicates exactly these quote/excerpt/superset
    * relations). Shingles, not unigrams: over a bounded vocabulary
    * unigram-set containment is trivially dense (measured 76 k of
    * 151 k possible pairs ≥ 0.9 on the sandbox corpus vs 81 at 3-gram
    * granularity) — word order is the signal that distinguishes a
    * quote from a bag-of-words coincidence.
    *
    * Candidate generation is PREFIX FILTERING (Chaudhuri et al. 2006's
    * SSJoin family): rank each doc's tokens by global document
    * frequency ascending (ties by token hash) and emit only its
    * n − ⌈num·n/den⌉ + 1 RAREST tokens into the probe — if b really
    * contains ≥ num/den of a's tokens it misses at most n − ⌈num·n/den⌉
    * of them, so at least one prefix token of a lands in b
    * (pigeonhole — the filter is lossless, which the unblocked-truth
    * oracle proves end-to-end). The prefix threshold is computed in
    * EXACT integer arithmetic: ⌈num·n/den⌉ = (num·n + den − 1) div den;
    * the float form 1−t under-sizes the prefix at integral multiples
    * (0.09999…·20 floors to 1, not 2) and silently drops true pairs.
    *
    * Scale shape: one (token)-keyed df agg and one per-doc window rank —
    * both ∝ corpus token count at fixed width; the probe joins the
    * SHORT prefix side against the full inverted index, so candidates
    * are bounded by Σ_prefix df(token) — and rarest-first ranking
    * minimizes exactly that sum (stopword postings never join the
    * prefix side). Verification ships token arrays only for candidate
    * pairs. Nothing is ever corpus × corpus.
    */
  def containmentPairs(docs: DataFrame, num: Int = 9,
      den: Int = 10): DataFrame = {
    // materialize the token array / squeezed text BEFORE the gram
    // lambdas: higher-order functions block CSE, so an inline split
    // would re-tokenize the document per element (the RelationMiner /
    // linesCorpus O(tokens²) lesson)
    val t = col("text")
    val pre = docs.select(col("doc_id"), t, split(t, " ").as("w"),
      regexp_replace(t,
        graft.text.TextAnalysis.WhitespaceClass + "+", "").as("sq"))
    val wordGrams = transform(
      sequence(lit(1), greatest(lit(1), size(col("w")) - 2)),
      i => xxhash64(array_join(slice(col("w"), i, lit(3)), " ")))
    // CJK route: character trigrams over the squeezed text (the word
    // path yields one gram for unspaced scripts — same routing rationale
    // as the Jaccard/MinHash tiers)
    val charGrams = when(length(col("sq")) < 3, array(xxhash64(col("sq"))))
      .otherwise(transform(sequence(lit(1), length(col("sq")) - 2),
        i => xxhash64(col("sq").substr(i, lit(3)))))
    val toks = pre.select(col("doc_id"),
        array_sort(array_distinct(
          when(isCjkCol(t), charGrams).otherwise(wordGrams)))
          .as("tokens"))
      .withColumn("n", size(col("tokens")).cast("long"))
      .localCheckpoint() // feeds df agg, prefix rank, and both verify sides
    val tokRows = toks.select(col("doc_id"), col("n"),
      explode(col("tokens")).as("tok"))
    val dfreq = tokRows.groupBy("tok").agg(count(lit(1)).as("df"))
    val pref = tokRows.join(dfreq, Seq("tok"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
          .orderBy(col("df"), col("tok"))))
      .filter(col("rn") <=
        expr(s"n - ((n * $num + ${den - 1}) div $den) + 1"))
      .select(col("doc_id").as("a"), col("tok"))
    val index = tokRows.select(col("doc_id").as("b"), col("tok"))
    val cand = pref.join(index, Seq("tok"))
      .filter(col("a") =!= col("b"))
      .select("a", "b").distinct()
    val ta = toks.select(col("doc_id").as("a"), col("tokens").as("tka"),
      col("n").as("n_a"))
    val tb = toks.select(col("doc_id").as("b"), col("tokens").as("tkb"),
      col("n").as("n_b"))
    cand.join(ta, Seq("a")).join(tb, Seq("b"))
      .filter(col("n_a") < col("n_b") ||
        (col("n_a") === col("n_b") && col("a") < col("b")))
      .withColumn("inter",
        size(array_intersect(col("tka"), col("tkb"))).cast("long"))
      .filter(col("inter") * den >= col("n_a") * num)
      .select(col("a"), col("b"), col("inter"), col("n_a"),
        (col("inter").cast("double") / col("n_a")).as("containment"))
  }

  /** Word n-gram shingles (n consecutive tokens, distinct). */
  def shingles(text: String, n: Int): Set[String] = {
    val toks = text.split(" ").filter(_.nonEmpty)
    if (toks.length < n) Set(toks.mkString(" "))
    else toks.sliding(n).map(_.mkString(" ")).toSet
  }

  // ---- CJK routing (round-4 verdict #5) ------------------------------
  // Whitespace tokenization yields ONE token for unspaced scripts
  // (zh/ja/th/ko), silently collapsing near-dup recall there. Texts whose
  // non-space codepoints are ≥30% CJK/Thai route to character n-gram
  // shingles instead. Routing is content-based (not the lang column), so
  // space-delimited corpora — including every oracle row — take the word
  // path unchanged.

  /** ≥30% of non-space codepoints in CJK/Thai blocks (shared predicate:
    * [[graft.text.TextAnalysis.isCjkText]]).
    */
  def isCjkText(s: String): Boolean = graft.text.TextAnalysis.isCjkText(s)

  /** Character n-gram shingles over the whitespace-squeezed text (the CJK
    * route: characters are the token unit for unspaced scripts).
    * Windows are CODE POINTS, matching the Column tier's substr/length
    * semantics — UTF-16-unit sliding would split supplementary-plane
    * surrogate pairs and diverge from the relational path (round-5
    * review). Squeeze uses the shared Unicode White_Space class.
    */
  def charShingles(text: String, n: Int): Set[String] = {
    val cps = {
      val b = Array.newBuilder[Int]
      var i = 0
      while (i < text.length) {
        val cp = text.codePointAt(i)
        if (!graft.text.TextAnalysis.isWhitespaceCp(cp)) b += cp
        i += Character.charCount(cp)
      }
      b.result()
    }
    if (cps.length < n) Set(new String(cps, 0, cps.length))
    else (0 to cps.length - n).iterator
      .map(i => new String(cps, i, n)).toSet
  }

  /** Shingle set with content-based routing: word n-grams for
    * space-delimited text, character n-grams for CJK/Thai.
    */
  def shinglesAuto(text: String, n: Int): Set[String] =
    if (isCjkText(text)) charShingles(text, n) else shingles(text, n)

  /** Exact n-gram Jaccard of two texts (the brute-force oracle used by
    * tests; routing-aware so the CJK tier verifies like it bands).
    */
  def ngramJaccard(a: String, b: String, n: Int): Double = {
    val (sa, sb) = (shinglesAuto(a, n), shinglesAuto(b, n))
    if (sa.isEmpty && sb.isEmpty) 1.0
    else (sa & sb).size.toDouble / (sa | sb).size
  }

  /** Per-doc shingle hashes: sorted distinct FNV-1a of each shingle —
    * 8-byte elements, computed in ONE pass per document, feeding BOTH the
    * MinHash signature and the candidate-verify stage (round-4 verdict
    * #2: the verify previously re-shingled full texts per candidate
    * PAIR through a two-text UDF).
    */
  def shingleHashes(text: String, n: Int): Array[Long] = {
    val sh = shinglesAuto(text, n)
    val out = new Array[Long](sh.size)
    var i = 0
    for (s <- sh) { out(i) = fnv1a(s); i += 1 }
    java.util.Arrays.sort(out)
    // distinct in place (fnv collisions inside one doc just merge)
    var w = 0
    var r = 0
    while (r < out.length) {
      if (w == 0 || out(r) != out(w - 1)) { out(w) = out(r); w += 1 }
      r += 1
    }
    if (w == out.length) out else java.util.Arrays.copyOf(out, w)
  }

  // ---- MinHash + LSH -------------------------------------------------

  /** Deterministic universal-hash family h_i(x) = (a_i·x + b_i) mod p,
    * seeded — same signatures on every executor/run.
    */
  final case class MinHashParams(numHashes: Int, bands: Int, seed: Long) {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand: Int = numHashes / bands
    private val p = 2305843009213693951L // 2^61 - 1 (Mersenne prime)
    // materialized once per executor (was a def: regenerating 64 Random
    // draws per DOCUMENT — pure waste on a corpus-scale scan)
    @transient private[dedup] lazy val coeffs: Array[(Long, Long)] = {
      val rnd = new scala.util.Random(seed)
      Array.fill(numHashes)((math.abs(rnd.nextLong()) % (p - 1) + 1,
        math.abs(rnd.nextLong()) % p))
    }
    private[dedup] def prime: Long = p
  }

  /** MinHash signature of a shingle set (base hash: 64-bit FNV-1a of the
    * shingle string — deterministic, platform-independent).
    */
  def minHashSignature(sh: Set[String], params: MinHashParams): Array[Long] =
    minHashSignatureFromHashes(sh.iterator.map(fnv1a).toArray, params)

  /** [[minHashSignature]] over precomputed base hashes (the one-pass
    * [[shingleHashes]] output), so shingling never runs twice per doc.
    */
  def minHashSignatureFromHashes(hs: Array[Long],
                                 params: MinHashParams): Array[Long] = {
    val cs = params.coeffs
    val p = params.prime
    val sig = Array.fill(params.numHashes)(Long.MaxValue)
    for (h <- hs) {
      val x = h & Long.MaxValue
      var i = 0
      while (i < cs.length) {
        // (a*x + b) mod p without overflow: Math.multiplyHigh-free route —
        // use BigInt-free 128-bit-ish reduction via doubling is costly;
        // x < 2^63, a < p < 2^61: multiply in unsigned 128 via Math.multiplyHigh
        val a = cs(i)._1; val b = cs(i)._2
        val hi = Math.multiplyHigh(a, x)
        val lo = a * x
        // reduce (hi*2^64 + lo) mod p, p = 2^61-1: 2^64 ≡ 8 (mod p)
        val r = (Math.floorMod(hi, p) * 8 + Math.floorMod(lo, p) + b) % p
        if (r < sig(i)) sig(i) = r
        i += 1
      }
    }
    sig
  }

  private def fnv1a(s: String): Long = fnv1aRange(s, 0, s.length)

  /** FNV-1a over s[from, until) without materializing a substring —
    * identical hash to `fnv1a(s.substring(from, until))` (round-6: the
    * CDC scan below hashes EVERY gram-length window, so the substring
    * form allocated one short-lived String per input character).
    */
  private def fnv1aRange(s: String, from: Int, until: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    while (i < until) { h ^= s.charAt(i); h *= 0x100000001b3L; i += 1 }
    h
  }

  /** Content-defined chunking (the LBFS/rsync/casync boundary rule):
    * hash every `gram`-char window; a window whose FNV is ≡ 0 mod
    * `maskMod` ends a chunk at its last char. Boundaries are decided by
    * CONTENT, not offsets, so an insertion early in a document only
    * re-chunks its neighbourhood — every later chunk keeps its identity
    * (the property that makes chunk-level storage dedup work; CdcSpec's
    * prefix-shift law). Expected chunk length ≈ maskMod chars. Returns
    * (chunkHash, chunkLen) per chunk in order; empty text → no chunks.
    *
    * Deterministic and local: a pure per-document scalar kernel — at
    * corpus scale it runs inside one typed projection, no shuffle, and
    * the cross-doc dedup that follows keys on the 16-byte
    * (hash, len) pair, never the text.
    */
  def cdcChunks(text: String, gram: Int = 8,
                maskMod: Long = 64L): Seq[(Long, Int)] = {
    if (text == null || text.isEmpty) return Nil
    val n = text.length
    val out = scala.collection.mutable.ArrayBuffer[(Long, Int)]()
    var start = 0
    var i = 0
    while (i + gram <= n) {
      // windowed FNV computed in place (round-6): the substring form
      // allocated one 8-char String per position — pure GC pressure on
      // the hot path; hashes are bit-identical
      val h = fnv1aRange(text, i, i + gram)
      if (java.lang.Long.remainderUnsigned(h, maskMod) == 0L) {
        val end = i + gram // exclusive
        out += ((fnv1aRange(text, start, end), end - start))
        start = end
      }
      i += 1
    }
    if (start < n) out += ((fnv1aRange(text, start, n), n - start))
    out.toSeq
  }

  /** `(doc_id, sh, sig)` — per-doc shingle hash array + MinHash signature
    * in ONE typed pass per document (the shingle scan is the dominant
    * cost; signature derives from the same hashes).
    */
  private[dedup] def shingleSigTable(docs: DataFrame, n: Int,
                                     params: MinHashParams): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val hs = shingleHashes(text, n)
        (id, hs, minHashSignatureFromHashes(hs, params))
      }
      .toDF("doc_id", "sh", "sig")
  }

  /** Banding join over a [[shingleSigTable]]: bucket key = the band's
    * signature SLICE itself (exact equality classes): a 32-bit
    * hash(slice) key saves shuffle bytes but admits Murmur3 collisions —
    * false candidates that inflate the candidate metric and diverge from
    * the streaming tier, which keys exactly (round-4 pass-3 review).
    * rowsPerBand longs per key is still small.
    */
  private def bandPairs(sigs: DataFrame, params: MinHashParams): DataFrame = {
    val bands = sigs.select(col("doc_id"), posexplode(
        expr(s"transform(sequence(0, ${params.bands - 1}), " +
          s"b -> slice(sig, b * ${params.rowsPerBand} + 1, ${params.rowsPerBand}))")))
      .toDF("doc_id", "band", "bucket")
    val l = bands.select(col("band"), col("bucket"), col("doc_id").as("a"))
    val r = bands.select(col("band"), col("bucket"), col("doc_id").as("b"))
    l.join(r, Seq("band", "bucket"))
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()
  }

  /** Pre-verify candidate pairs from LSH banding alone — exposed so the
    * scale-stress bench can report candidate totals (∝ true dups, the
    * never-quadratic property) separately from verified pairs. The heavy
    * signature computation runs in a typed map (one pass per doc); the
    * bucket join shuffles only (band, bucketHash) keys.
    */
  def minHashCandidatePairs(docs: DataFrame, n: Int,
                            params: MinHashParams): DataFrame =
    bandPairs(shingleSigTable(docs, n, params), params)

  /** Banded candidates verified at exact shingle Jaccard. The verify is
    * ARRAY-based (round-4 verdict #2): each doc's shingle-hash array is
    * computed once (same pass as its signature, materialized via
    * localCheckpoint so banding and verify share it), candidates join the
    * two 8-byte-element arrays and score with codegen'd
    * `array_intersect`/`array_union` sizes — no texts re-shuffled per
    * pair, no per-pair re-shingling, no UDF. Intersection/union sizes
    * over the hashed sets equal string-set sizes except under a 64-bit
    * FNV collision inside one pair's union (P ≈ |union|²/2^64) — the
    * dispensation the signature's base hash already carries.
    */
  def minHashCandidates(docs: DataFrame, n: Int, params: MinHashParams,
                        verifyThreshold: Double): DataFrame = {
    val tbl = shingleSigTable(docs, n, params).localCheckpoint()
    val cand = bandPairs(tbl, params)
    val sh = tbl.select(col("doc_id"), col("sh"))
    cand
      .join(sh.toDF("a", "sha"), Seq("a"))
      .join(sh.toDF("b", "shb"), Seq("b"))
      .withColumn("inter", size(array_intersect(col("sha"), col("shb"))))
      .withColumn("uni", size(array_union(col("sha"), col("shb"))))
      .withColumn("jaccard", col("inter").cast("double") / col("uni"))
      .filter(col("jaccard") >= verifyThreshold)
      .select("a", "b", "jaccard")
  }

  // ---- Line-level exact dedup (C4/RefinedWeb boilerplate removal) ----

  /** Drop every line whose content appears in ≥ `minDocs` DISTINCT
    * documents (navigation chrome, cookie banners, license footers — the
    * standard C4/RefinedWeb curation tier between document-exact and
    * near-dup), then reassemble the surviving lines in order. Documents
    * whose lines are all boilerplate survive with empty text (the
    * downstream quality gate drops them — stage separation kept).
    *
    * BLANK lines are exempt: a paragraph separator shared by two docs is
    * structure, not boilerplate — dropping it would strip every
    * paragraph break in the corpus (C4/RefinedWeb exclude trivial lines
    * for the same reason; round-5 review).
    *
    * Scale shape: the hot-line table is found from narrow
    * `(xxhash64(line), doc_id)` rows — map-side combined count-distinct,
    * never the line text — and is ∝ REPEATED lines (boilerplate), a tiny
    * fraction of the corpus, so the anti-join broadcasts. Reassembly
    * shuffles the surviving lines once keyed by doc_id; over the
    * bucketed-by-doc_id layout (BucketingSpec) even that is co-located.
    * Line identity is the 64-bit xxhash (the Jaccard tier's
    * dispensation: a cross-doc collision needs P ≈ n²/2^64).
    */
  def dedupLines(docs: DataFrame, minDocs: Int = 2,
                 idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame = {
    require(minDocs >= 2, "minDocs < 2 would drop every line")
    val lines = docs
      .select(col(idCol), posexplode(split(col(textCol), "\n")))
      .toDF(idCol, "pos", "line")
      .withColumn("h", xxhash64(col("line")))
    // hot set is ∝ repeated lines — usually tiny, but a boilerplate-heavy
    // corpus can make it arbitrarily large: broadcast only under a row
    // guard (an unconditional broadcast hint would OOM the driver at
    // 100 TB), else fall back to a shuffled anti-join and let AQE plan it
    val hot = lines.filter(trim(col("line")) =!= "")
      .groupBy("h")
      .agg(countDistinct(col(idCol)).as("nd"))
      .filter(col("nd") >= minDocs)
      .select("h")
      .localCheckpoint()
    val hotSide =
      if (hot.count() <= 4000000L) broadcast(hot) else hot
    val kept = lines.join(hotSide, Seq("h"), "left_anti")
    val reassembled = kept.groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_kept"),
        array_join(transform(array_sort(collect_list(struct(col("pos"),
          col("line")))), x => x.getField("line")), "\n").as("text"))
    docs.select(col(idCol),
        (size(split(col(textCol), "\n"))).cast("long").as("n_lines"))
      .join(reassembled, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("n_lines") - coalesce(col("n_kept"), lit(0L))).as("n_dropped"),
        coalesce(col("text"), lit("")).as(textCol))
  }

  // ---- SimHash -------------------------------------------------------

  /** 64-bit SimHash over token FNV hashes. */
  def simHash(text: String): Long = {
    val v = new Array[Int](64)
    for (tok <- text.split(" ") if tok.nonEmpty) {
      val h = fnv1a(tok)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) v(i) += 1 else v(i) -= 1
        i += 1
      }
    }
    var out = 0L
    var i = 0
    while (i < 64) { if (v(i) > 0) out |= (1L << i); i += 1 }
    out
  }

  /** SimHash near-dup pairs with hamming distance ≤ maxDist, found by
    * pigeonhole bucketing on 16-bit chunks (maxDist ≤ 3 ⇒ some chunk
    * equal) — no quadratic join.
    */
  def simHashPairs(docs: DataFrame, maxDist: Int = 3,
                   hotBucketCap: Int = 4096): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val sh = docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, t) => (id, simHash(t)) }
      .toDF("doc_id", "sim")
    simHashPairsFromSims(sh, maxDist, hotBucketCap)
  }

  /** [[simHashPairs]] over precomputed fingerprints `(doc_id, sim)` —
    * split out so the hot-bucket guard can be tested with planted
    * fingerprints (forcing a 16-bit chunk collision through real text
    * would take ~65 k tries per doc).
    */
  def simHashPairsFromSims(sh: DataFrame, maxDist: Int = 3,
                           hotBucketCap: Int = 4096): DataFrame =
    simHashCandidates(sh, hotBucketCap)
      .withColumn("dist", bit_count(col("simA").bitwiseXOR(col("simB"))))
      .filter(col("dist") <= maxDist)
      .select("a", "b", "dist").distinct()

  /** Candidate pairs before the hamming filter, with the hot-bucket
    * guard (round-3 verdict #4: a degenerate chunk value — boilerplate
    * or near-empty docs — made the within-bucket join quadratic, the one
    * unbounded-bucket join left in the dedup family).
    *
    * Buckets over `hotBucketCap` members are sub-split by a SECOND
    * pigeonhole that stays recall-exact for hamming ≤ 3: the remaining
    * 48 bits (the three other chunks) are cut into four 12-bit
    * sub-chunks; a pair at distance ≤ 3 has ≤ 3 differing bits there, so
    * at least one sub-chunk is equal. Within a hot 16-bit bucket a
    * random non-dup pair now needs a further 12-bit collision
    * (2^-16 → 2^-28 pair mass); docs collapsing even there share 28+
    * fingerprint bits and are near-dups by construction, keeping the
    * tier's contract: candidates ∝ true near-dups.
    */
  private[dedup] def simHashCandidates(sh: DataFrame,
                                       hotBucketCap: Int): DataFrame = {
    val chunks = sh.select(col("doc_id"), col("sim"), posexplode(array(
      (0 until 4).map(i =>
        shiftrightunsigned(col("sim"), i * 16).bitwiseAND(lit(0xffffL)).cast("int")): _*)))
      .toDF("doc_id", "sim", "chunk", "value")
    // per-bucket sizes (map-side combined); materialized once — four
    // downstream branches (cold l/r, hot l/r) otherwise re-run the
    // fingerprint map per branch
    val counts = chunks.groupBy("chunk", "value").agg(count(lit(1)).as("n"))
    val tagged = chunks.join(counts, Seq("chunk", "value")).localCheckpoint()

    def pairsOn(df: DataFrame, keys: Seq[String]): DataFrame = {
      val l = df.select((keys.map(col) :+ col("doc_id").as("a")
        :+ col("sim").as("simA")): _*)
      val r = df.select((keys.map(col) :+ col("doc_id").as("b")
        :+ col("sim").as("simB")): _*)
      l.join(r, keys).filter(col("a") < col("b"))
        .select("a", "b", "simA", "simB")
    }

    val cold = pairsOn(tagged.filter(col("n") <= hotBucketCap),
      Seq("chunk", "value"))

    // hot rows: 48 remaining bits (sim minus the bucket's own chunk),
    // then four 12-bit sub-chunks. chunk=3 guard: a Java shift of 64 is
    // a shift of 0, so the high part must be forced to zero there.
    val hot = tagged.filter(col("n") > hotBucketCap)
      .withColumn("rest", expr(
        """(CASE WHEN chunk = 3 THEN 0L
          |      ELSE shiftleft(shiftrightunsigned(sim, (chunk + 1) * 16), chunk * 16) END)
          | | (sim & (shiftleft(1L, chunk * 16) - 1))""".stripMargin))
      .select(col("doc_id"), col("sim"), col("chunk"), col("value"),
        posexplode(array((0 until 4).map(j =>
          shiftrightunsigned(col("rest"), j * 12)
            .bitwiseAND(lit(0xfffL)).cast("int")): _*)))
      .toDF("doc_id", "sim", "chunk", "value", "sub", "subValue")
    val hotPairs = pairsOn(hot, Seq("chunk", "value", "sub", "subValue"))

    cold.union(hotPairs).distinct()
  }

  // ---- Benchmark decontamination -------------------------------------

  /** Benchmark decontamination (GPT-3 appendix C / The Pile style):
    * flag corpus documents sharing any token `window`-gram with a
    * held-out benchmark set, so eval questions never leak into training
    * data. Window identity is [[graft.text.TextAnalysis.windowHashes]]'s
    * 64-bit polynomial roll (docs shorter than `window` hash whole);
    * returns one row per CONTAMINATED doc: (doc_id, n_hits, n_windows)
    * where n_hits counts corpus windows (with multiplicity) present in
    * the benchmark's window set.
    *
    * Scale shape: the benchmark is tiny by definition (an eval suite,
    * not a corpus), so its distinct window hashes collect to the driver
    * and broadcast as a sorted array — the corpus side is then ONE
    * mapPartitions scan with per-doc binary-search counting: zero
    * shuffles over the corpus, no explode of corpus windows. A row
    * guard (`maxBenchWindows`) refuses pathological benchmark sizes
    * rather than silently OOMing the driver — at that point the caller
    * should explode + join instead (the [[dedupLines]] fallback shape).
    */
  /** Exact-substring span dedup (Lee et al. 2022, "Deduplicating
    * Training Data Makes Language Models Better", re-expressed at fixed
    * token-window granularity): a window of `window` tokens is
    * *duplicated* when its polynomial hash occurs in ≥ 2 DISTINCT docs;
    * per doc, the duplicated windows are merged into maximal spans
    * (touching/overlapping windows coalesce) and reported as
    * (doc_id, n_dup_windows, n_spans, dup_tokens, n_tokens) — the
    * inputs a removal pass needs (which token ranges to cut, how much
    * of the doc they cover).
    *
    * Scale shape — the paper's suffix-array pass as two hash shuffles:
    *  1. one corpus-keyed shuffle of NARROW (hash, doc, pos) rows into
    *     a groupBy(hash); cross-doc duplication is detected with
    *     `min(doc) ≠ max(doc)` (no countDistinct sketch/expansion);
    *  2. a co-partitioned self-join of the window stream against the
    *     surviving dup hashes (both sides already hash-partitioned on
    *     `h` from step 1 — AQE reuses the exchange);
    *  3. span merging is per-doc local: sorted positions fold through
    *     ONE `aggregate` higher-order function (codegen'd, no window
    *     sort): spans split where the gap exceeds `window`, union
    *     length adds `min(window, gap)` per step.
    * Nothing driver-side, nothing quadratic; dup volume ∝ actual
    * duplication, not corpus².
    *
    * Join regime is adaptive (observed in the executed plan): when the
    * surviving dup-hash set is small, AQE broadcasts it (costs a second
    * window scan, saves the join shuffle — the better trade); at high
    * duplication it falls back to a sort-merge join where both sides'
    * h-keyed exchanges share one scan via ReusedExchange.
    */
  def duplicateSpans(docs: DataFrame, window: Int = 13): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val wins = docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, t) =>
          val toks = t.split("\\s+").filter(_.nonEmpty)
          graft.text.TextAnalysis.windowHashesPos(t, window)
            .map { case (p, h) => (id, p, h, toks.length.toLong) }
        }
      }
      .toDF("doc_id", "pos", "h", "n_tokens")
    val dupH = wins.groupBy("h")
      .agg(min(col("doc_id")).as("d1"), max(col("doc_id")).as("d2"))
      .filter(col("d1") =!= col("d2"))
      .select("h")
    val w = window
    wins.join(dupH, Seq("h"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_dup_windows"),
        sort_array(collect_list(col("pos"))).as("ps"),
        min(col("n_tokens")).as("n_tokens"))
      .select(col("doc_id"), col("n_dup_windows"),
        expr(
          s"""aggregate(ps,
             |  struct(CAST(0 AS BIGINT) AS spans, CAST(0 AS BIGINT) AS toks,
             |         CAST(-$w - 1 AS BIGINT) AS prev),
             |  (acc, p) -> struct(
             |    acc.spans + IF(p - acc.prev > $w, CAST(1 AS BIGINT), CAST(0 AS BIGINT)),
             |    acc.toks + LEAST(CAST($w AS BIGINT), CAST(p AS BIGINT) - acc.prev),
             |    CAST(p AS BIGINT)),
             |  acc -> acc)""".stripMargin).as("m"),
        col("n_tokens"))
      .select(col("doc_id"), col("n_dup_windows"),
        col("m.spans").as("n_spans"), col("m.toks").as("dup_tokens"),
        col("n_tokens"))
  }

  def decontaminate(corpus: DataFrame, benchmark: DataFrame,
                    window: Int = 13,
                    maxBenchWindows: Long = 50000000L): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val benchHashes = benchmark.select(col("text")).as[String]
      .flatMap(t => graft.text.TextAnalysis.windowHashes(t, window))
      .distinct()
    val n = benchHashes.count()
    require(n <= maxBenchWindows,
      s"benchmark has $n distinct windows > $maxBenchWindows; " +
        "use an explode+join decontamination pass for corpus-sized benchmarks")
    val sorted = benchHashes.collect().sorted
    val bc = spark.sparkContext.broadcast(sorted)
    corpus.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val hs = bc.value
        it.flatMap { case (id, t) =>
          val ws = graft.text.TextAnalysis.windowHashes(t, window)
          val hits = ws.count(h => java.util.Arrays.binarySearch(hs, h) >= 0)
          if (hits > 0) Some((id, hits.toLong, ws.length.toLong)) else None
        }
      }
      .toDF("doc_id", "n_hits", "n_windows")
  }

  // ---- Winnowing fingerprints (MOSS) ---------------------------------

  /** Winnowing fingerprints per document (Schleimer, Wilkerson & Aiken,
    * SIGMOD 2003 — the MOSS algorithm): hash every k-token gram, slide a
    * w-window over the hash sequence, keep each window's MINIMUM hash.
    * The guarantee: any shared token run of ≥ k+w−1 tokens yields at
    * least one shared fingerprint, at expected density 2/(w+1) — a
    * sparse, position-robust alternative to the exact-substring tier
    * (`dd_spans`) when only overlap DETECTION is needed, not spans.
    *
    * All in-row Column kernels: the token array is materialized BEFORE
    * the gram lambdas (higher-order functions block CSE — the
    * RelationMiner re-split lesson), gram hashes use the native
    * [[graft.functions.FnvHash]] expression (codegen'd, oracle-replayed
    * via `fnvFoldSql`), window minima via `slice`+`array_min` over the
    * bounded hash array. Docs with fewer grams than w collapse to one
    * global-min fingerprint (the txt_fingerprint semantics). Tokens
    * split on spaces — unspaced CJK text yields few tokens and hence
    * one coarse fingerprint; route such corpora through the char-gram
    * shingle tiers (`shinglesAuto`) instead.
    *
    * Returns (idCol, fp): distinct signed-long fingerprints per doc.
    */
  def winnowed(docs: DataFrame, idCol: String = "doc_id",
               textCol: String = "text", k: Int = 4,
               w: Int = 4): DataFrame = {
    val toksDf = docs.select(col(idCol),
      filter(split(col(textCol), " "), t => t =!= "").as("tk"))
      .filter(size(col("tk")) >= k)
    val gramsDf = toksDf.select(col(idCol),
      transform(sequence(lit(1), size(col("tk")) - (k - 1)),
        i => graft.functions.FnvHash(
          array_join(slice(col("tk"), i, lit(k)), " "))).as("h"))
    val minsCol = when(size(col("h")) <= w, array(array_min(col("h"))))
      .otherwise(transform(sequence(lit(1), size(col("h")) - (w - 1)),
        i => array_min(slice(col("h"), i, lit(w)))))
    gramsDf.select(col(idCol), explode(array_distinct(minsCol)).as("fp"))
  }

  /** Document pairs sharing ≥ `minShared` winnowing fingerprints, the
    * MOSS overlap report. Scale shape: one fingerprint-keyed
    * aggregation drops "stop fingerprints" seen in more than `cap`
    * docs (boilerplate grams — the unbounded-bucket guard, same role
    * as the SimHash hot-bucket cap), then the pair join fans out at
    * most cap per fingerprint, so candidates stay ∝ true overlaps —
    * never corpus². Returns (d1, d2, shared) with d1 < d2.
    */
  def winnowPairs(docs: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text", k: Int = 4, w: Int = 4,
                  minShared: Int = 2, cap: Int = 50): DataFrame = {
    val fps = winnowed(docs, idCol, textCol, k, w).localCheckpoint()
    val keep = fps.groupBy("fp").agg(count(lit(1)).as("n"))
      .filter(col("n") <= cap).select(col("fp"))
    val fpd = fps.join(keep, Seq("fp"), "left_semi")
    fpd.alias("x").join(fpd.alias("y"),
        col("x.fp") === col("y.fp") &&
          col(s"x.$idCol") < col(s"y.$idCol"))
      .groupBy(col(s"x.$idCol").as("d1"), col(s"y.$idCol").as("d2"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }
}
