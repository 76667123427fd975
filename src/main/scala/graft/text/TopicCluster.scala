package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic integer k-means topic bucketing — the corpus-curation
  * step that splits a web crawl into coarse topic shards for mixture
  * control (cluster-then-reweight, cf. DoReMi-style domain discovery):
  * documents become 16-dim hashed token-count vectors (feature
  * hashing: dim = FNV-1a(token) mod 16, value = token count — exact
  * integers), and Lloyd's iterations run with integer floor-division
  * centroid updates, so every assignment and every centroid replays
  * bit-for-bit on any partitioning and any engine (the same
  * determinism contract as [[Bpe]] training and the IVF codebook).
  *
  * Ties break to the lowest centroid id; an emptied cluster keeps its
  * previous centroid (both pinned by spec and oracle). Initial
  * centroids are the K smallest doc_ids' vectors — deterministic and
  * replayable, where a production run would seed with k-means++ over a
  * hash-stable sample ([[graft.mix.Mix.sample]]).
  *
  * Scale shape: ONE corpus aggregate builds the (doc, 16-int) feature
  * table (map-side combined, then localCheckpointed and reused by every
  * round); each round is an IN-ROW assignment against the broadcast
  * K×16 centroid literals (zero shuffle) plus one narrow centroid
  * aggregate (K·16 longs to the driver — the k-means sequential
  * dependency, same as the BPE argmax). The corpus never shuffles.
  */
object TopicCluster {

  val Dims = 16
  val K = 4

  /** (doc_id, vec: Array[Long] of 16 hashed token counts). */
  def features(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .select(col("doc_id"), graft.functions.FnvHash(col("tok"))
        .bitwiseAND(lit(15L)).cast("int").as("dim"))
      .groupBy("doc_id", "dim").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(map_from_entries(collect_list(struct(col("dim"), col("c"))))
        .as("m"))
      .select(col("doc_id"), expr(
        s"transform(sequence(0, ${Dims - 1}), " +
          "i -> coalesce(element_at(m, i), CAST(0 AS BIGINT)))").as("vec"))

  private def dist2(vec: Column, cent: Array[Long]): Column =
    expr(s"aggregate(zip_with(vec, array(${cent.mkString(",")}), " +
      "(a, b) -> (a - b) * (a - b)), CAST(0 AS BIGINT), (acc, x) -> acc + x)")

  /** (doc_id, cluster, dist2) after `rounds` Lloyd's iterations. */
  def assign(docs: DataFrame, rounds: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val f = features(docs).localCheckpoint()
    var cents: Array[Array[Long]] = f.orderBy("doc_id").limit(K)
      .select("vec").as[Seq[Long]].collect().map(_.toArray)
    def assigned: DataFrame = {
      val pairs = cents.zipWithIndex.map { case (c, j) =>
        struct(dist2(col("vec"), c).as("d2"), lit(j).as("j")) }
      f.withColumn("best", array_min(array(pairs: _*)))
        .select(col("doc_id"), col("vec"),
          col("best.j").as("cluster"), col("best.d2").as("dist2"))
    }
    for (_ <- 1 to rounds) {
      val aggs = Seq(count(lit(1)).as("n")) ++
        (0 until Dims).map(i =>
          sum(element_at(col("vec"), i + 1)).as(s"s$i"))
      val sums = assigned.groupBy("cluster")
        .agg(aggs.head, aggs.tail: _*)
        .collect()
      val next = cents.clone()
      for (r <- sums) {
        val j = r.getInt(0)
        val n = r.getLong(1)
        next(j) = (0 until Dims).map(i => r.getLong(2 + i) / n).toArray
      } // clusters absent from `sums` keep their previous centroid
      cents = next
    }
    assigned.select(col("doc_id"), col("cluster").cast("long").as("cluster"),
        col("dist2"))
      .orderBy("doc_id")
  }
}
