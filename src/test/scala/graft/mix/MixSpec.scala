package graft.mix

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MixSpec extends SparkSpec {
  import spark.implicits._

  private def docsDf(n: Int, source: String = "s") =
    (0 until n).map(i => (i.toLong, source, s"text $i"))
      .toDF("doc_id", "source", "text")

  test("copiesFor: integer part always granted, fraction hash-gated") {
    // bp = 25000 → 2 or 3 copies; bp = 10000 → exactly 1; bp = 0 → 0
    (0L to 200L).foreach { id =>
      val c25 = Mix.copiesFor(id, 25000)
      assert(c25 == 2 || c25 == 3)
      assert(Mix.copiesFor(id, 10000) == 1)
      assert(Mix.copiesFor(id, 0) == 0)
      assert(Mix.copiesFor(id, 20000) == 2) // exact integer rate
    }
  }

  test("sampled fraction approaches the rate") {
    val n = 4000
    val kept = (0 until n).count(i => Mix.copiesFor(i.toLong, 5000) == 1)
    // FNV uniform draw: 50% ± a few points at n=4000
    assert(math.abs(kept.toDouble / n - 0.5) < 0.05, s"kept=$kept")
  }

  test("mixture decisions deterministic and partitioning-invariant") {
    val docs = docsDf(500)
    val a = Mix.mixture(docs.repartition(1), Map("s" -> 7500))
      .collect().map(r => (r.getLong(0), r.getLong(2))).sorted.toSeq
    val b = Mix.mixture(docs.repartition(17), Map("s" -> 7500))
      .collect().map(r => (r.getLong(0), r.getLong(2))).sorted.toSeq
    assert(a == b)
    assert(a.forall { case (_, c) => c == 0L || c == 1L })
  }

  test("unknown source falls back to defaultBp") {
    val docs = docsDf(10, source = "unlisted")
    val out = Mix.mixture(docs, Map("other" -> 0), defaultBp = 10000)
    assert(out.agg(sum("n_copies")).head.getLong(0) == 10L)
  }

  test("materialize replicates rows with copy ordinals, drops zeros") {
    val docs = docsDf(200)
    val out = Mix.materialize(docs, Map("s" -> 22500)).cache()
    val perDoc = out.groupBy("doc_id").agg(count(lit(1)).as("n"),
      max("copy").as("mx")).collect()
    assert(perDoc.forall(r => r.getLong(1) == r.getLong(2) + 1))
    assert(perDoc.forall(r => r.getLong(1) == 2L || r.getLong(1) == 3L))
    val expected = (0 until 200).map(i => Mix.copiesFor(i.toLong, 22500)).sum
    assert(out.count() == expected)
    // original columns survive
    assert(out.columns.toSet == Set("doc_id", "source", "text", "copy"))
    out.unpersist()
  }

  test("decision hash matches the oracle's unsigned-mod convention") {
    // remainderUnsigned of a negative long differs from % — pin it
    val h = Mix.fnv1a(123456789L.toString)
    val u = java.lang.Long.remainderUnsigned(h, 10000L)
    assert(u >= 0 && u < 10000)
    val big = BigInt(h) + (if (h < 0) BigInt(2).pow(64) else BigInt(0))
    assert(u == (big mod BigInt(10000)).toLong)
  }

  test("columnar mixture ≡ scalar copiesFor; plan is kernel-free") {
    val docs = (0L until 400L).map(i => (i, s"src${i % 4}"))
      .toDF("doc_id", "source")
    val rates = Map("src0" -> 0, "src1" -> 5000, "src2" -> 23456)
    val got = Mix.mixture(docs, rates, defaultBp = 10000)
      .as[(Long, String, Long)].collect().sortBy(_._1)
    got.foreach { case (id, src, n) =>
      assert(n == Mix.copiesFor(id, rates.getOrElse(src, 10000)).toLong,
        s"id=$id src=$src")
    }
    val plan = Mix.mixture(docs, rates).queryExecution.executedPlan.toString
    assert(!plan.contains("DeserializeToObject") &&
      !plan.contains("MapPartitions"),
      s"typed kernel leaked into mixture:\n$plan")
  }
}
