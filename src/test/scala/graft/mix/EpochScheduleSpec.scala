package graft.mix

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Epoch shuffle schedule: per-epoch permutations, pairwise epoch
  * independence, shard-local rank contiguity, determinism across
  * partitionings, and scalar hash parity.
  */
class EpochScheduleSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = (0L until 2048L).toDF("doc_id")

  test("each epoch is a full permutation and epochs differ pairwise") {
    val out = Mix.epochSchedule(docs, epochs = 3, nShards = 16)
      .select("epoch", "doc_id", "sort_key")
      .as[(Long, Long, Long)].collect()
    val byEpoch = out.groupBy(_._1).view.mapValues(
      _.sortBy(r => (r._3, r._2)).map(_._2).toSeq).toMap
    assert(byEpoch.keySet == Set(0L, 1L, 2L))
    byEpoch.values.foreach(p => assert(p.sorted == (0L until 2048L)))
    // fresh permutation per epoch: pairwise agreement of the hash order
    // is chance-level, not structural
    for (a <- 0L to 2L; b <- (a + 1) to 2L) {
      val same = byEpoch(a).zip(byEpoch(b)).count { case (x, y) => x == y }
      assert(same < 16, s"epochs $a/$b agree on $same of 2048 positions")
    }
  }

  test("pos is contiguous 1..n within every (epoch, shard)") {
    val bad = Mix.epochSchedule(docs, epochs = 2, nShards = 8)
      .groupBy("epoch", "shard")
      .agg(count(lit(1)).as("n"), min("pos").as("lo"), max("pos").as("hi"),
        countDistinct("pos").as("d"))
      .filter(col("lo") =!= 1L || col("hi") =!= col("n") ||
        col("d") =!= col("n"))
      .count()
    assert(bad == 0L)
  }

  test("schedule is deterministic and partitioning-invariant") {
    val a = Mix.epochSchedule(docs.repartition(7), 3, 16)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val b = Mix.epochSchedule(docs.coalesce(1), 3, 16)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(a == b)
  }

  test("sort_key ≡ scalar mix(fnv1a(id:epoch)); shard = key & mask") {
    val out = Mix.epochSchedule((0L until 256L).toDF("doc_id"), 2, 16)
      .select("epoch", "doc_id", "shard", "sort_key")
      .as[(Long, Long, Long, Long)].collect()
    out.foreach { case (e, id, shard, key) =>
      val h = graft.sketch.Kmv.mix(Mix.fnv1a(s"$id:$e"))
      assert(key == h && shard == (h & 15L), s"id=$id epoch=$e")
    }
  }

  test("contract: epochs ≥ 1, power-of-two shards") {
    intercept[IllegalArgumentException](Mix.epochSchedule(docs, 0, 16))
    intercept[IllegalArgumentException](Mix.epochSchedule(docs, 2, 12))
  }
}
