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

  /** Brute-force cosine top-k: for each query vector (filtered by
    * `queryPred`), the k nearest corpus vectors (excluding itself).
    * Deterministic tiebreak on candidate id.
    */
  def bruteForceTopK(emb: DataFrame, queryPred: Column, k: Int): DataFrame = {
    val q = emb.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val c = emb.select(col("vec_id").as("cand_id"), col("embedding").as("cv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("cand_id"))
    q.join(c, col("query_id") =!= col("cand_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "cand_id", "cos")
  }

  /** Integer-exact top-1 by quantized dot product (oracle-checkable). */
  def quantizedTop1(emb: DataFrame, queryPred: Column): DataFrame = {
    val q = emb.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val c = emb.select(col("vec_id").as("cand_id"), col("embedding").as("cv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("dp").desc, col("cand_id"))
    q.join(c, col("query_id") =!= col("cand_id"))
      .withColumn("dp", dotQuantized(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") === 1)
      .select("query_id", "cand_id", "dp")
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
    val dim = 64
    val tables = (0 until numTables).map(t => hyperplanes(dim, nBits, seed + 1000L * t))
    val withBuckets = emb.withColumn("buckets",
      array(tables.map(p => lshBucket(col("embedding"), p)): _*))
    val sides = withBuckets
      .select(col("vec_id"), col("embedding"), posexplode(col("buckets")))
      .toDF("vec_id", "embedding", "table", "bucket")
    val l = sides.select(col("table"), col("bucket"), col("vec_id").as("a"),
      col("embedding").as("va"))
    val r = sides.select(col("table"), col("bucket"), col("vec_id").as("b"),
      col("embedding").as("vb"))
    l.join(r, Seq("table", "bucket"))
      .filter(col("a") < col("b"))
      .select("a", "b", "va", "vb").distinct()
      .withColumn("cos", cosine(col("va"), col("vb")))
      .filter(col("cos") >= threshold)
      .select("a", "b", "cos")
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
    val dim = 64
    val tables = (0 until numTables)
      .map(t => hyperplanes(dim, nBits, seed + 1000L * t))
    val bucketCols = array(tables.map(p => lshBucket(col("embedding"), p)): _*)
    val withBuckets = emb.withColumn("buckets", bucketCols)
    val c = withBuckets.select(col("vec_id").as("cand_id"),
        col("embedding").as("cv"), posexplode(col("buckets")))
      .withColumnRenamed("pos", "table").withColumnRenamed("col", "bucket")
    val q = withBuckets.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        posexplode(col("buckets")))
      .withColumnRenamed("pos", "table").withColumnRenamed("col", "bucket0")
      .withColumn("probe", explode(array(
        lit(0) +: (0 until nBits).map(i => lit(1 << i)): _*)))
      .select(col("query_id"), col("qv"), col("table"),
        col("bucket0").bitwiseXOR(col("probe")).as("bucket"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("cand_id"))
    q.join(c, Seq("table", "bucket"))
      .filter(col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"), col("qv"), col("cv"))
      .distinct()
      .withColumn("cos", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "cand_id", "cos")
  }
}
