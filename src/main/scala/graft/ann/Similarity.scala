package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths:
  *  - brute-force cosine top-k (the exactness baseline): query-set ×
  *    corpus join with the dot product as a `zip_with`/`aggregate` Column
  *    expression — stays in codegen, no UDF;
  *  - LSH-bucketed (random signed hyperplanes): each vector hashes to a
  *    `nBits` signature; search compares only within the query's bucket
  *    and its 1-bit-flip neighbors — at 10^9 vectors this replaces the
  *    O(|Q|·n) scan with O(|Q|·n/2^bits·(bits+1)) while recall stays
  *    high for near-neighbors (tested against brute force).
  *
  * The quantized integer variant (`dotQuantized`) exists for
  * oracle-exactness: int arithmetic is associative, so a DuckDB oracle
  * can replay it bit-for-bit, unlike float dot products.
  */
object Similarity {

  /** Codegen'd float dot product of two array<float/double> columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Quantized integer dot product: round(x*1000) per component —
    * associative integer sums, cross-engine exact.
    */
  def dotQuantized(a: Column, b: Column): Column =
    aggregate(zip_with(a, b,
        (x, y) => round(x.cast("double") * 1000).cast("long") *
          round(y.cast("double") * 1000).cast("long")),
      lit(0L), (acc, x) => acc + x)

  /** Partition-local bounded top-k buffers per query, merged by a final
    * window over parts·k·|Q| rows — the scale shape for an exact scan:
    * the |Q|×n pair set is never materialized and the only sort ranks
    * k·parts rows per query. The query batch is broadcast (query batches
    * are bounded by contract; corpus-scale "query sets" belong in
    * [[lshTopK]]/[[ivfTopK]]). Per-pair arithmetic is the identical IEEE
    * fold the Column [[cosine]] computes, so results are bit-equal to
    * the former join+window formulation (and to the DuckDB oracle).
    */
  private def scanTopK(emb: DataFrame, queryPred: Column, k: Int,
                       score: (Array[Float], Array[Float]) => Double)
      : DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val qs: Array[(Long, Array[Float])] =
      emb.filter(queryPred).select(col("vec_id"), col("embedding"))
        .as[(Long, Seq[Float])].collect().map { case (id, v) => (id, v.toArray) }
    val bcQ = spark.sparkContext.broadcast(qs)
    val local = emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])]
      .mapPartitions { it =>
        val queries = bcQ.value
        // per query: parallel arrays of the current top-k (cos desc,
        // id asc), insertion-sorted — k and |Q| are small by contract
        val ids = Array.fill(queries.length)(new Array[Long](k))
        val cs = Array.fill(queries.length)(new Array[Double](k))
        val ns = new Array[Int](queries.length)
        it.foreach { case (cid, v) =>
          val cv = v.toArray
          var qi = 0
          while (qi < queries.length) {
            val (qid, qv) = queries(qi)
            if (qid != cid) {
              val c = score(qv, cv)
              val n = ns(qi)
              val better = n < k || c > cs(qi)(n - 1) ||
                (c == cs(qi)(n - 1) && cid < ids(qi)(n - 1))
              if (better) {
                var pos = if (n < k) n else k - 1
                while (pos > 0 && (c > cs(qi)(pos - 1) ||
                    (c == cs(qi)(pos - 1) && cid < ids(qi)(pos - 1)))) {
                  cs(qi)(pos) = cs(qi)(pos - 1); ids(qi)(pos) = ids(qi)(pos - 1)
                  pos -= 1
                }
                cs(qi)(pos) = c; ids(qi)(pos) = cid
                if (n < k) ns(qi) = n + 1
              }
            }
            qi += 1
          }
        }
        (0 until queries.length).iterator.flatMap { qi =>
          (0 until ns(qi)).iterator.map { j =>
            (queries(qi)._1, ids(qi)(j), cs(qi)(j))
          }
        }
      }.toDF("query_id", "cand_id", "cos")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("cand_id"))
    local.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Brute-force cosine top-k: for each query vector (filtered by
    * `queryPred`), the k nearest corpus vectors (excluding itself).
    * Deterministic tiebreak on candidate id.
    */
  def bruteForceTopK(emb: DataFrame, queryPred: Column, k: Int): DataFrame =
    scanTopK(emb, queryPred, k, { (a, b) =>
      var d = 0.0; var na = 0.0; var nb = 0.0
      val n = math.min(a.length, b.length)
      var i = 0
      while (i < n) {
        d += (a(i) * b(i)).toDouble
        na += (a(i) * a(i)).toDouble; nb += (b(i) * b(i)).toDouble
        i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }).select("query_id", "rank", "cand_id", "cos")

  /** ColBERT-style late-interaction MaxSim (Khattab & Zaharia 2020)
    * over multi-vector documents: each 64-dim embedding is read as m=8
    * contiguous 8-dim token slices, and score(q, d) = Σ_i max_j
    * dot(q_i, d_j) — every query token matches its best document token.
    * Slice dots follow the [[bruteForceTopK]] IEEE discipline (float
    * multiplies, double accumulation in index order) and the outer sum
    * adds the per-token maxima in token order, so the score is bitwise
    * replayable; max over exact doubles is order-free. The raw-dot form
    * is ColBERT's kernel on pre-normalized token embeddings, minus the
    * per-slice norm divisions (and their zero-slice NaN hazard).
    *
    * Scale shape: the broadcast-query partition-local bounded top-k
    * scan (the brute baseline); production scale routes per-token
    * candidates through the LSH/IVF tiers above and exact-MaxSim
    * reranks the union — the same candidate-then-rerank split as
    * ann_pq_topk.
    */
  def maxSimTopK(emb: DataFrame, queryPred: Column, k: Int,
      m: Int = 8): DataFrame =
    scanTopK(emb, queryPred, k, { (a, b) =>
      val sub = math.min(a.length, b.length) / m
      var total = 0.0
      var i = 0
      while (i < m) {
        var best = Double.NegativeInfinity
        var j = 0
        while (j < m) {
          var d = 0.0
          var t = 0
          while (t < sub) {
            d += (a(i * sub + t) * b(j * sub + t)).toDouble
            t += 1
          }
          if (d > best) best = d
          j += 1
        }
        total += best
        i += 1
      }
      total
    }).select(col("query_id"), col("rank").cast("long").as("rank"),
      col("cand_id"), col("cos").as("maxsim"))

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009)
    * of two ranked retrieval lists — THE standard hybrid-retrieval
    * combiner (sparse BM25 + dense cosine in every production RAG
    * stack): score(q, d) = Σ_lists 1e6 div (c + rank_l(q, d)), docs
    * absent from a list contribute 0, re-rank by (score DESC, cand
    * ASC). Rank-based, so the two scorers' incomparable score scales
    * never touch — exactly why RRF beats score interpolation without
    * calibration — and INTEGER-exact by the micro-unit floor division
    * (ranks are ints; the engine's `div` ≡ the oracle's `//`).
    *
    * Scale shape: rank lists are |Q|·k rows (retrieval output, not
    * corpus), so the full-outer join + per-query window run at result
    * scale; the corpus was only touched by the upstream retrieval
    * tiers, each already scale-shaped. Window top-k plans as
    * InsertWindowGroupLimits (partial truncation before the exchange).
    */
  def rrfFuse(a: DataFrame, b: DataFrame, k: Int, c: Int = 60)
      : DataFrame = {
    val ra = a.select(col("query_id"), col("cand_id"),
      col("rank").cast("long").as("rank_a"))
    val rb = b.select(col("query_id"), col("cand_id"),
      col("rank").cast("long").as("rank_b"))
    val fused = ra.join(rb, Seq("query_id", "cand_id"), "full_outer")
      .withColumn("rrf_micro",
        coalesce(expr(s"1000000 div ($c + rank_a)"), lit(0L)) +
          coalesce(expr(s"1000000 div ($c + rank_b)"), lit(0L)))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_micro").desc, col("cand_id"))
    fused.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("cand_id"),
        col("rrf_micro"))
  }

  /** Integer-exact top-1 by quantized dot product (oracle-checkable):
    * round(x·1000) per component, associative Long sums.
    */
  def quantizedTop1(emb: DataFrame, queryPred: Column): DataFrame = {
    // HALF_UP (away from zero), matching Spark round() and DuckDB round()
    // — math.rint's half-to-even would drift on exact .5 products
    def q1000(x: Float): Long = {
      val v = x.toDouble * 1000
      (if (v >= 0) math.floor(v + 0.5) else math.ceil(v - 0.5)).toLong
    }
    scanTopK(emb, queryPred, 1, { (a, b) =>
      var s = 0L
      val n = math.min(a.length, b.length)
      var i = 0
      while (i < n) { s += q1000(a(i)) * q1000(b(i)); i += 1 }
      // Long carried in the Double channel: |dp| ≪ 2^53, exact
      s.toDouble
    }).select(col("query_id"), col("cand_id"), col("cos").cast("long").as("dp"))
  }

  /** (table, bucket, vec_id) rows from a typed per-partition projection
    * loop. The Column formulation (an `array` of numTables×nBits nested
    * `aggregate` folds) exceeds whole-stage-codegen limits above ~70
    * expressions and falls back to interpreted evaluation; the loop does
    * the SAME IEEE arithmetic (float element promoted to double, double
    * accumulation in index order — what the DuckDB oracle replays) at
    * memory-bandwidth speed.
    */
  def lshBucketsTyped(emb: DataFrame, nBits: Int, numTables: Int,
                      seed: Long, dim: Int = 64): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val tables: Array[Array[Array[Double]]] = (0 until numTables)
      .map(t => hyperplanes(dim, nBits, seed + 1000L * t)).toArray
    val bcT = spark.sparkContext.broadcast(tables)
    emb.select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])]
      .mapPartitions { it =>
        val ts = bcT.value
        it.flatMap { case (id, v) =>
          val arr = v.toArray
          Iterator.tabulate(ts.length) { t =>
            val planes = ts(t)
            var bucket = 0
            var b = 0
            while (b < planes.length) {
              val pl = planes(b)
              var acc = 0.0
              var i = 0
              // embeddings shorter than `dim` project onto the prefix
              // (implicit zero-padding) instead of throwing AIOOBE
              val n = math.min(arr.length, pl.length)
              while (i < n) { acc += arr(i).toDouble * pl(i); i += 1 }
              if (acc >= 0) bucket |= (1 << b)
              b += 1
            }
            (t, bucket, id)
          }
        }
      }.toDF("table", "bucket", "vec_id")
  }

  /** Embedding-cosine near-duplicate PAIRS (the dedup flavor of ANN:
    * symmetric, thresholded, corpus×corpus): candidates are same-bucket
    * pairs in ANY of the hyperplane tables (no probes — near-dups at
    * cosine ≥ ~0.95 collide with overwhelming probability across 10
    * tables), verified by exact sequential-fold cosine. Never quadratic:
    * the join is bucket-blocked, candidates ∝ true near-dups.
    */
  def embeddingNearDupPairs(emb: DataFrame, threshold: Double,
                            nBits: Int = 7, numTables: Int = 10,
                            seed: Long = 42L): DataFrame = {
    val buckets = lshBucketsTyped(emb, nBits, numTables, seed)
    val l = buckets.select(col("table"), col("bucket"), col("vec_id").as("a"))
    val r = buckets.select(col("table"), col("bucket"), col("vec_id").as("b"))
    val cand = l.join(r, Seq("table", "bucket"))
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()
    val e = emb.select(col("vec_id"), col("embedding"))
    cand
      .join(e.select(col("vec_id").as("a"), col("embedding").as("va")), Seq("a"))
      .join(e.select(col("vec_id").as("b"), col("embedding").as("vb")), Seq("b"))
      .withColumn("cos", cosine(col("va"), col("vb")))
      .filter(col("cos") >= threshold)
      .select("a", "b", "cos")
  }

  /** SemDedup-style cluster-scoped semantic dedup (Abbas et al. 2023):
    * partition the embedding space with a coarse quantizer, find
    * within-CLUSTER cosine near-dup pairs, collapse their transitive
    * families to the min-id survivor. The defining approximation is the
    * cluster scope — cross-cluster near-dups are out of reach BY THE
    * METHOD, so the oracle replays the same cluster-scoped semantics
    * (the recall/cost trade the paper measures; LSH-scoped recall lives
    * in [[embeddingNearDupPairs]]).
    *
    * Scale shape: centroids are a deterministic modular sample (C ~ √n,
    * broadcast, same rationale as [[ivfTopK]]); assignment is the same
    * per-partition argmax (no n×C shuffle); the candidate join is keyed
    * by cent_id over (cent_id, id)-width rows — within-list pairs are
    * SemDedup's intrinsic (n/C choose 2)·C cost, embeddings join on
    * AFTER candidate generation (∝ candidates, never corpus²); survivors
    * via the canonicalizer's large-star/small-star CC.
    *
    * Returns (vec_id, keep_id) for every pruned non-survivor.
    */
  def semanticDedup(emb: DataFrame, centroidPred: Column,
                    threshold: Double): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val cents: Array[(Long, Array[Float])] =
      emb.filter(centroidPred).select(col("vec_id"), col("embedding"))
        .as[(Long, Seq[Float])].collect()
        .map { case (id, v) => (id, v.toArray) }
        .sortBy(_._1)
    require(cents.nonEmpty, "semanticDedup: centroidPred selected no rows")
    val bcC = spark.sparkContext.broadcast(cents)
    // ties → lower cent_id (cents id-sorted, strict > keeps the first),
    // the ROW_NUMBER(cos DESC, cent_id) order the oracle replays
    val asg = emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])]
      .mapPartitions { it =>
        val cs = bcC.value
        it.map { case (id, v) =>
          val arr = v.toArray
          var bestId = cs(0)._1
          var bestCos = Double.NegativeInfinity
          var i = 0
          while (i < cs.length) {
            val c = centCosStatic(arr, cs(i)._2)
            if (c > bestCos) { bestCos = c; bestId = cs(i)._1 }
            i += 1
          }
          (id, bestId)
        }
      }.toDF("vec_id", "cent_id")
    val cand = asg.select(col("cent_id"), col("vec_id").as("a"))
      .join(asg.select(col("cent_id"), col("vec_id").as("b")), Seq("cent_id"))
      .filter(col("a") < col("b"))
      .select("a", "b")
    val e = emb.select(col("vec_id"), col("embedding"))
    val pairs = cand
      .join(e.select(col("vec_id").as("a"), col("embedding").as("va")),
        Seq("a"))
      .join(e.select(col("vec_id").as("b"), col("embedding").as("vb")),
        Seq("b"))
      .filter(cosine(col("va"), col("vb")) >= threshold)
      .select("a", "b")
    graft.canon.ConnectedComponents.run(pairs)
      .filter(col("node") =!= col("component"))
      .select(col("node").as("vec_id"), col("component").as("keep_id"))
  }

  /** IVF-Flat approximate top-k — the third ANN tier next to brute force
    * and hyperplane LSH. A coarse quantizer partitions the corpus into
    * inverted lists (every vector assigned to its nearest centroid); a
    * query probes its `nProbe` nearest centroids and exact-reranks only
    * those lists, scanning ≈ nProbe/C of the corpus. Centroids are drawn
    * by deterministic modular sampling (`centroidPred`) rather than
    * k-means: sampled codebooks are a standard supported init (recall is
    * a few points lower than trained ones at equal C), keep the operator
    * fully deterministic for the cross-engine oracle, and exercise the
    * identical list/probe plumbing a trained codebook would use. At scale
    * C grows ~√n, centroids stay broadcast-sized, and assignment is a
    * per-partition argmax loop — no n×C shuffle anywhere; the only
    * shuffle is the candidate join keyed by cent_id (lists ~n/C rows,
    * AQE splits stragglers).
    *
    * Float multiply + double accumulation in index order, matching
    * [[cosine]] and the DuckDB `list_reduce` replay bit-for-bit.
    */
  def ivfTopK(emb: DataFrame, queryPred: Column, centroidPred: Column,
              k: Int, nProbe: Int = 4): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    // dictionary-sized collect (C ~ √n by construction), like hyperplanes
    val cents: Array[(Long, Array[Float])] =
      emb.filter(centroidPred).select(col("vec_id"), col("embedding"))
        .as[(Long, Seq[Float])].collect().map { case (id, v) => (id, v.toArray) }
        .sortBy(_._1)
    if (cents.isEmpty) return emptyTopK(emb, "ivfTopK: centroidPred")
    ivfTopKWithCodebook(emb, queryPred, cents, k, nProbe)
  }

  /** Empty-codebook contract shared by both IVF tiers: empty corpus →
    * empty result (matches the join formulation); an empty selection on
    * a NON-empty corpus is a caller error that would otherwise fail
    * opaquely inside the assignment loop.
    */
  private def emptyTopK(emb: DataFrame, caller: String): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    require(emb.isEmpty,
      s"$caller selected no rows from a non-empty corpus")
    Seq.empty[(Long, Int, Long, Double)]
      .toDF("query_id", "rank", "cand_id", "cos")
  }

  /** IVF-Flat with a TRAINED codebook: deterministic Lloyd's k-means over
    * the sampled init, then the identical list/probe plumbing (round-3
    * verdict #7 — `ivfTopK`'s scaladoc names the trained codebook as the
    * production knob). Same signature family as [[ivfTopK]] with the
    * sampled centroids as iteration 0, so `iters = 0` degenerates to the
    * sampled path exactly (modulo centroid ids, which become 0..C-1).
    */
  def ivfTopKTrained(emb: DataFrame, queryPred: Column, initPred: Column,
                     k: Int, nProbe: Int = 4, iters: Int = 5): DataFrame = {
    val cents = trainCodebook(emb, initPred, iters)
    if (cents.isEmpty) return emptyTopK(emb, "ivfTopKTrained: initPred")
    ivfTopKWithCodebook(emb, queryPred, cents, k, nProbe)
  }

  /** Deterministic Lloyd's k-means codebook (cosine assignment, per-list
    * component means). Determinism without sacrificing parallelism:
    *  - init = the `initPred` sample sorted by vec_id (seeded, like the
    *    sampled tier);
    *  - assignment = per-partition argmax against broadcast centroids
    *    (ties → lower centroid id), the same kernel the probe path uses;
    *  - update = per-partition PARTIAL component sums QUANTIZED to
    *    1/2^20 (integer partials are associative, so the reduced mean is
    *    identical under any partitioning/order — float partial sums
    *    would make the codebook depend on scheduling); partials are
    *    C×partitions rows, collected and combined on the driver.
    * Empty lists keep their previous centroid (standard Lloyd's).
    */
  def trainCodebook(emb: DataFrame, initPred: Column,
                    iters: Int): Array[(Long, Array[Float])] = {
    val spark = emb.sparkSession
    import spark.implicits._
    val Q = 1 << 20
    var cents: Array[Array[Float]] =
      emb.filter(initPred).select(col("vec_id"), col("embedding"))
        .as[(Long, Seq[Float])].collect().sortBy(_._1).map(_._2.toArray)
    if (cents.isEmpty) return Array.empty
    val data = emb.select(col("embedding")).as[Seq[Float]]
    for (_ <- 0 until iters) {
      val bcC = spark.sparkContext.broadcast(cents)
      val partials = data.mapPartitions { it =>
        val cs = bcC.value
        val dim = cs.map(_.length).max
        val sums = Array.fill(cs.length)(new Array[Long](dim))
        val counts = new Array[Long](cs.length)
        it.foreach { v =>
          val arr = v.toArray
          var best = 0; var bestCos = Double.NegativeInfinity
          var ci = 0
          while (ci < cs.length) {
            val c = centCosStatic(arr, cs(ci))
            if (c > bestCos) { bestCos = c; best = ci }
            ci += 1
          }
          counts(best) += 1
          val s = sums(best)
          var i = 0
          val n = math.min(arr.length, dim)
          while (i < n) { s(i) += math.round(arr(i).toDouble * Q); i += 1 }
        }
        Iterator.tabulate(cs.length)(ci => (ci, sums(ci), counts(ci)))
      }.collect()
      val dim = cents.map(_.length).max
      val sums = Array.fill(cents.length)(new Array[Long](dim))
      val counts = new Array[Long](cents.length)
      for ((ci, s, n) <- partials) {
        counts(ci) += n
        var i = 0
        while (i < s.length) { sums(ci)(i) += s(i); i += 1 }
      }
      cents = Array.tabulate(cents.length) { ci =>
        if (counts(ci) == 0) cents(ci)
        else Array.tabulate(dim)(i =>
          (sums(ci)(i).toDouble / counts(ci) / Q).toFloat)
      }
    }
    cents.zipWithIndex.map { case (c, i) => (i.toLong, c) }
  }

  /** [[ivfTopK]]'s list/probe plumbing over an explicit codebook —
    * shared by the sampled and trained tiers. Centroid ids only key the
    * inverted lists; candidates are always real corpus vectors.
    */
  def ivfTopKWithCodebook(emb: DataFrame, queryPred: Column,
                          cents: Array[(Long, Array[Float])],
                          k: Int, nProbe: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    require(cents.nonEmpty, "ivfTopKWithCodebook: empty codebook")
    val bcC = spark.sparkContext.broadcast(cents)

    /** Top-m centroid ids by (cos desc, cent_id asc) — the same order the
      * oracle's ROW_NUMBER uses. */
    def nearest(arr: Array[Float], m: Int): Array[Long] = {
      val cs = bcC.value
      cs.map { case (id, c) => (centCosStatic(arr, c), id) }
        .sortBy { case (cos, id) => (-cos, id) }
        .take(m).map(_._2)
    }

    val assigned = emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])]
      .mapPartitions(_.map { case (id, v) => (nearest(v.toArray, 1)(0), id) })
      .toDF("cent_id", "cand_id")
    val probes = emb.filter(queryPred).select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])]
      .mapPartitions(_.flatMap { case (id, v) =>
        nearest(v.toArray, nProbe).map(c => (id, c)) })
      .toDF("query_id", "cent_id")

    // assignment is unique per vector and probes are distinct per query,
    // so (query_id, cand_id) needs no dedup
    val e = emb.select(col("vec_id"), col("embedding"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("cand_id"))
    probes.join(assigned, Seq("cent_id"))
      .filter(col("query_id") =!= col("cand_id"))
      .select("query_id", "cand_id")
      .join(e.select(col("vec_id").as("query_id"), col("embedding").as("qv")),
        Seq("query_id"))
      .join(e.select(col("vec_id").as("cand_id"), col("embedding").as("cv")),
        Seq("cand_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "cand_id", "cos")
  }

  // ---- IVF-PQ (round-5 verdict #7) -----------------------------------
  // At 10^9+ vectors the corpus floats dominate executor memory and scan
  // bandwidth: product quantization stores each vector as m sub-space
  // code bytes (m ≪ 4·dim), the probe scan scores candidates against
  // per-query ADC lookup tables over those codes, and only the top
  // `rerank` survivors read their full vectors for exact cosine.
  // Training reuses the integer-quantized Lloyd's discipline of
  // [[trainCodebook]] (associative Long partials → the codebook is
  // partitioning-invariant), with L2 assignment per sub-space (the PQ
  // standard: codes minimize reconstruction error, not angle).

  /** m sub-space codebooks, each ksub × dsub floats. */
  final case class PqCodebook(m: Int, dsub: Int,
                              books: Array[Array[Array[Float]]]) {
    def ksub: Int = books(0).length
    /** floats-per-vector / codes-per-vector storage ratio (4-byte floats
      * vs 1 code ≤ 1 byte when ksub ≤ 256). */
    def compressionRatio: Double = (m * dsub * 4.0) / m
  }

  /** Deterministic PQ training: init = the `initPred` sample's sub-slices
    * (sorted by vec_id, capped at `ksub`), then `iters` Lloyd's rounds
    * over ALL sub-spaces in one corpus pass per round. L2 assignment,
    * ties → lower code id; update via 1/2^20-quantized Long partials.
    */
  def trainPq(emb: DataFrame, initPred: Column, m: Int, ksub: Int = 256,
              iters: Int = 5): PqCodebook = {
    val spark = emb.sparkSession
    import spark.implicits._
    val Q = 1 << 20
    val init: Array[Array[Float]] =
      emb.filter(initPred).select(col("vec_id"), col("embedding"))
        .as[(Long, Seq[Float])].collect().sortBy(_._1)
        .take(ksub).map(_._2.toArray)
    require(init.nonEmpty, "trainPq: initPred selected no rows")
    val dim = init.map(_.length).max
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    val dsub = dim / m
    var books: Array[Array[Array[Float]]] = Array.tabulate(m) { s =>
      init.map(v => java.util.Arrays.copyOfRange(
        java.util.Arrays.copyOf(v, dim), s * dsub, (s + 1) * dsub))
    }
    val data = emb.select(col("embedding")).as[Seq[Float]]
    for (_ <- 0 until iters) {
      val bcB = spark.sparkContext.broadcast(books)
      val partials = data.mapPartitions { it =>
        val bs = bcB.value
        val k = bs(0).length
        val sums = Array.fill(m, k)(new Array[Long](dsub))
        val counts = Array.fill(m)(new Array[Long](k))
        it.foreach { v =>
          val arr = java.util.Arrays.copyOf(v.toArray, dim)
          var s = 0
          while (s < m) {
            val best = pqNearestStatic(arr, s * dsub, bs(s))
            counts(s)(best) += 1
            val acc = sums(s)(best)
            var i = 0
            while (i < dsub) {
              acc(i) += math.round(arr(s * dsub + i).toDouble * Q); i += 1
            }
            s += 1
          }
        }
        Iterator.tabulate(m)(s => (s, sums(s), counts(s)))
      }.collect()
      val k = books(0).length
      val sums = Array.fill(m, k)(new Array[Long](dsub))
      val counts = Array.fill(m)(new Array[Long](k))
      for ((s, ss, cc) <- partials; j <- 0 until k) {
        counts(s)(j) += cc(j)
        var i = 0
        while (i < dsub) { sums(s)(j)(i) += ss(j)(i); i += 1 }
      }
      books = Array.tabulate(m, k) { (s, j) =>
        if (counts(s)(j) == 0) books(s)(j)
        else Array.tabulate(dsub)(i =>
          (sums(s)(j)(i).toDouble / counts(s)(j) / Q).toFloat)
      }
    }
    PqCodebook(m, dsub, books)
  }

  /** Squared-L2 nearest code in one sub-space (ties → lower id). */
  private def pqNearestStatic(arr: Array[Float], off: Int,
                              book: Array[Array[Float]]): Int = {
    var best = 0; var bestD = Double.MaxValue
    var j = 0
    while (j < book.length) {
      val c = book(j)
      var d = 0.0; var i = 0
      while (i < c.length) {
        val diff = (arr(off + i) - c(i)).toDouble; d += diff * diff; i += 1
      }
      if (d < bestD) { bestD = d; best = j }
      j += 1
    }
    best
  }

  /** `(vec_id, codes)` — each corpus vector as m code ids (int array in
    * the relational form; 1 byte each at ksub ≤ 256 in storage terms).
    */
  def pqCodes(emb: DataFrame, pq: PqCodebook): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val bcB = spark.sparkContext.broadcast(pq.books)
    val dim = pq.m * pq.dsub
    emb.select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])]
      .mapPartitions { it =>
        val bs = bcB.value
        it.map { case (id, v) =>
          val arr = java.util.Arrays.copyOf(v.toArray, dim)
          (id, Array.tabulate(bs.length)(s =>
            pqNearestStatic(arr, s * bs(s)(0).length, bs(s))))
        }
      }.toDF("vec_id", "codes")
  }

  /** IVF-PQ top-k: IVF lists from `cents` (the coarse quantizer), PQ
    * codes for the in-list scan (ADC: per-query dot tables + the global
    * reconstruction-norm table approximate cos(q, recon(c))), exact
    * cosine rerank of the top `rerank` survivors from full vectors. The
    * probe scan touches only (cent_id, cand_id, m codes) rows — the
    * corpus float payload is read for |Q|·rerank rows, not per candidate.
    *
    * Query-batch contract: like [[bruteForceTopK]]'s scan, the QUERY set
    * is collected and broadcast (ADC tables are per-query lookup arrays
    * built on the executors), so `queryPred` must select a bounded batch
    * — the CORPUS side is what scales to 10^9+. A corpus-scale
    * "all-pairs" workload belongs to [[embeddingNearDupPairs]].
    */
  def ivfPqTopK(emb: DataFrame, queryPred: Column,
                cents: Array[(Long, Array[Float])], pq: PqCodebook,
                k: Int, nProbe: Int = 4, rerank: Int = 32): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    require(cents.nonEmpty, "ivfPqTopK: empty codebook")
    val bcC = spark.sparkContext.broadcast(cents)
    val bcB = spark.sparkContext.broadcast(pq.books)
    val dim = pq.m * pq.dsub

    val assigned = emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])]
      .mapPartitions { it =>
        val cs = bcC.value; val bs = bcB.value
        it.map { case (id, v) =>
          val arr = v.toArray
          var best = 0L; var bestCos = Double.NegativeInfinity
          cs.foreach { case (cid, c) =>
            val cc = centCosStatic(arr, c)
            if (cc > bestCos || (cc == bestCos && cid < best)) {
              bestCos = cc; best = cid
            }
          }
          val padded = java.util.Arrays.copyOf(arr, dim)
          (best, id, Array.tabulate(bs.length)(s =>
            pqNearestStatic(padded, s * bs(s)(0).length, bs(s))))
        }
      }.toDF("cent_id", "cand_id", "codes")

    // per-query ADC tables: dot[s][j] = q_s · book[s][j] (double fold),
    // plus the query's norm; the global norm table ||book[s][j]||² is
    // query-independent
    val queries: Array[(Long, Array[Float])] =
      emb.filter(queryPred).select(col("vec_id"), col("embedding"))
        .as[(Long, Seq[Float])].collect().map { case (id, v) => (id, v.toArray) }
    val probeRows = queries.flatMap { case (qid, qv) =>
      val cs = bcC.value
      cs.map { case (cid, c) => (centCosStatic(qv, c), cid) }
        .sortBy { case (cos, id) => (-cos, id) }
        .take(nProbe).map { case (_, cid) => (qid, cid) }
    }.toSeq
    val probes = spark.createDataFrame(
      spark.sparkContext.parallelize(probeRows.map(p =>
        org.apache.spark.sql.Row(p._1, p._2)), 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("query_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("cent_id",
          org.apache.spark.sql.types.LongType))))
    val bcQ = spark.sparkContext.broadcast(queries.toMap)

    val approx = broadcast(probes).join(assigned, Seq("cent_id"))
      .filter(col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"), col("codes"))
      .as[(Long, Long, Seq[Int])]
      .mapPartitions { it =>
        val bs = bcB.value
        val qs = bcQ.value
        // ADC tables built lazily once per (partition, query)
        val tables = scala.collection.mutable.HashMap
          .empty[Long, (Array[Array[Double]], Double)]
        val normTab: Array[Array[Double]] = bs.map(_.map { c =>
          var s = 0.0; var i = 0
          while (i < c.length) { s += c(i).toDouble * c(i); i += 1 }
          s
        })
        it.map { case (qid, cid, codes) =>
          val (dotTab, qNorm) = tables.getOrElseUpdate(qid, {
            val qv = java.util.Arrays.copyOf(qs(qid), bs.length * bs(0)(0).length)
            val dt = Array.tabulate(bs.length) { s =>
              bs(s).map { c =>
                var acc = 0.0; var i = 0
                while (i < c.length) {
                  acc += qv(s * c.length + i).toDouble * c(i); i += 1
                }
                acc
              }
            }
            var nq = 0.0; var i = 0
            while (i < qs(qid).length) {
              nq += qs(qid)(i).toDouble * qs(qid)(i); i += 1
            }
            (dt, math.sqrt(nq))
          })
          var dot = 0.0; var rn = 0.0
          var s = 0
          while (s < codes.length) {
            dot += dotTab(s)(codes(s)); rn += normTab(s)(codes(s)); s += 1
          }
          (qid, cid, dot / (qNorm * math.sqrt(rn)))
        }
      }.toDF("query_id", "cand_id", "approx")

    val wA = Window.partitionBy(col("query_id"))
      .orderBy(col("approx").desc, col("cand_id"))
    val survivors = approx.withColumn("r", row_number().over(wA))
      .filter(col("r") <= rerank).select("query_id", "cand_id")

    val e = emb.select(col("vec_id"), col("embedding"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("cand_id"))
    survivors
      .join(e.select(col("vec_id").as("query_id"), col("embedding").as("qv")),
        Seq("query_id"))
      .join(e.select(col("vec_id").as("cand_id"), col("embedding").as("cv")),
        Seq("cand_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "cand_id", "cos")
  }

  /** cos(v, centroid), IEEE-identical to [[cosine]]: float·float
    * products, sequential double accumulation. Shared by assignment,
    * probing and k-means training so all three agree exactly.
    */
  private def centCosStatic(arr: Array[Float], c: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    val n = math.min(arr.length, c.length)
    var i = 0
    while (i < n) {
      dot += (arr(i) * c(i)).toDouble
      na += (arr(i) * arr(i)).toDouble
      nb += (c(i) * c(i)).toDouble
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Deterministic random hyperplanes (seeded), broadcast as literals. */
  def hyperplanes(dim: Int, nBits: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nBits)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Signed-hyperplane LSH signature as a Column (int bucket id). */
  def lshBucket(v: Column, planes: Array[Array[Double]]): Column = {
    val bits = planes.zipWithIndex.map { case (p, i) =>
      val proj = aggregate(zip_with(v, typedLit(p.toSeq), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1 << i)).otherwise(lit(0))
    }
    bits.reduce(_ + _)
  }

  /** Multi-table LSH approximate top-k: `numTables` independent
    * hyperplane tables, candidates = same bucket ∪ 1-bit neighbor buckets
    * per table (multi-probe), union'd and ranked by exact cosine. Table
    * count trades recall against scanned fraction — the standard knob when
    * the corpus has weak cluster structure (random-ish embeddings): miss
    * probability decays exponentially in `numTables` while the scan stays
    * ~numTables·probes/2^nBits of the corpus, sublinear once n ≫ 2^nBits.
    */
  def lshTopK(emb: DataFrame, queryPred: Column, k: Int, nBits: Int = 7,
              numTables: Int = 10, seed: Long = 42L): DataFrame = {
    // checkpoint: the signature table feeds BOTH the candidate side and
    // the query-probe side of the bucket join — without it the typed
    // 10-table projection pass runs twice (round-6; the Hits/kCore
    // reuse rationale: ReuseExchange does not fire across renamed
    // branches)
    val buckets = lshBucketsTyped(emb, nBits, numTables, seed)
      .localCheckpoint()
    val c = buckets.select(col("table"), col("bucket"),
      col("vec_id").as("cand_id"))
    val queryIds = emb.filter(queryPred).select(col("vec_id").as("query_id"))
    val q = buckets.join(queryIds,
        buckets("vec_id") === queryIds("query_id"))
      .withColumn("probe", explode(array(
        lit(0) +: (0 until nBits).map(i => lit(1 << i)): _*)))
      .select(col("query_id"), col("table"),
        col("bucket").bitwiseXOR(col("probe")).as("bucket"))
    val e = emb.select(col("vec_id"), col("embedding"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("cand_id"))
    q.join(c, Seq("table", "bucket"))
      .filter(col("query_id") =!= col("cand_id"))
      .select("query_id", "cand_id").distinct()
      .join(e.select(col("vec_id").as("query_id"), col("embedding").as("qv")),
        Seq("query_id"))
      .join(e.select(col("vec_id").as("cand_id"), col("embedding").as("cv")),
        Seq("cand_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "cand_id", "cos")
  }
}
