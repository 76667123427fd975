package graft.mix

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Shard assignment: determinism, partitioning invariance, balance, and
  * the power-of-two contract.
  */
class ShardSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = (0L until 4096L).toDF("doc_id")

  test("assignment is deterministic and partitioning-invariant") {
    val a = Mix.shardAssign(docs.repartition(7), 16)
      .as[(Long, Long, Long)].collect().toSet
    val b = Mix.shardAssign(docs.coalesce(1), 16)
      .as[(Long, Long, Long)].collect().toSet
    assert(a == b)
    assert(a.forall { case (id, s, h) =>
      h == graft.sketch.Kmv.mix(Mix.fnv1a(id.toString)) && s == (h & 15L) })
  }

  test("shards are balanced (hash-uniform within 3x of fair share)") {
    val counts = Mix.shardAssign(docs, 16).groupBy("shard").count()
      .as[(Long, Long)].collect().toMap
    assert(counts.size == 16)
    val fair = 4096.0 / 16
    assert(counts.values.forall(n => n > fair / 3 && n < fair * 3), counts)
  }

  test("sort_key orders a reproducible pseudorandom permutation") {
    val perm = Mix.shardAssign(docs, 16)
      .orderBy("sort_key", "doc_id").select("doc_id")
      .as[Long].collect().toSeq
    assert(perm.sorted == (0L until 4096L))
    assert(perm != (0L until 4096L)) // actually permuted
    // runs of consecutive ids don't survive the hash ordering
    val consecutive = perm.sliding(2).count { case Seq(a, b) => b == a + 1 }
    assert(consecutive < 100, s"$consecutive consecutive pairs")
  }

  test("non-power-of-two shard counts are rejected") {
    intercept[IllegalArgumentException](Mix.shardAssign(docs, 12))
  }

  test("column MixHash path ≡ scalar Kmv.mix(fnv1a) and kernel-free") {
    val docs = (0L until 512L).toDF("doc_id")
    val out = Mix.shardAssign(docs, 16)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    out.foreach { case (id, shard, key) =>
      val h = graft.sketch.Kmv.mix(Mix.fnv1a(id.toString))
      assert(key == h && shard == (h & 15L), s"id=$id")
    }
    val plan = Mix.shardAssign(docs, 16)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("DeserializeToObject") &&
      !plan.contains("MapPartitions"),
      s"typed kernel leaked into shardAssign:\n$plan")
  }
}
