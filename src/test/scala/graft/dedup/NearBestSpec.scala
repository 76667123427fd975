package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Quality-aware near-dup survivor laws: a planted cluster where the
  * HIGHER id wins on quality (so the operator provably differs from
  * min-id selection), families identical to dd_minhash_clusters'
  * grouping with only the representative changed, and a full argmax
  * replay over the real planted corpus.
  */
class NearBestSpec extends SparkSpec {
  import spark.implicits._

  test("planted cluster: the cleaner, higher-id twin survives") {
    // 1 = prose polluted with punctuation soup (classify's f_punct
    // penalty), 2 = the clean near-dup (> 0.8 shingle Jaccard), 9 =
    // unrelated
    // 40 DISTINCT tokens → 38 distinct shingles shared; each suffix
    // adds ~4, so J ≈ 38/46 ≈ 0.83 ≥ 0.8 and the pair clusters
    val base = (1 to 40).map(i =>
      if (i % 4 == 0) "the" else s"tok$i").mkString(" ")
    val corpus = Seq(
      (1L, base + " !!!! #### $$$$"),
      (2L, base + " extra tail"),
      (9L, "completely different text about nothing at all"))
      .toDF("doc_id", "text")
    val got = graft.queries.DataQueries.bestSurvivorClusters(corpus)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 2L)),
      s"doc 1 must lose to the cleaner doc 2: ${got.toSeq}")
  }

  test("families ≡ dd_minhash_clusters' grouping; survivor = the " +
      "(score DESC, id) argmax, replayed") {
    val dir = "/root/testdata/sf0.001"
    val corpus = graft.queries.DataQueries.minhashCorpus(spark, dir)
    val scores = graft.text.TextAnalysis.classify(corpus)
      .select("doc_id", "score")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // families from the min-id variant (survivor = cluster label)
    val minClusters = graft.queries.DataQueries
      .ddMinhashClusters(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val families = minClusters.groupBy(_._2)
      .map { case (k, v) => (v.map(_._1).toSet + k) }.toSet
    assert(families.nonEmpty)
    val got = graft.queries.DataQueries.ddNearBest(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val gotFamilies = got.groupBy(_._2)
      .map { case (k, v) => (v.map(_._1).toSet + k) }.toSet
    assert(gotFamilies == families, "grouping must be identical")
    // each family's keep = argmax (score DESC, id ASC)
    for (fam <- families) {
      val keep = fam.toSeq.sortBy(id => (-scores(id), id)).head
      val keeps = got.filter(p => fam(p._1)).map(_._2).distinct
      assert(keeps.toSeq == Seq(keep), s"family $fam expected $keep")
    }
  }
}
