package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def docsDf(rows: Seq[(Long, String, String, String)]) =
    rows.toDF("doc_id", "text", "lang", "source")

  test("exact dedup keeps min id per duplicate text") {
    val docs = docsDf(Seq(
      (1L, "a b c", "en", "s"), (2L, "a b c", "en", "s"),
      (3L, "x y", "en", "s"), (4L, "a b c", "de", "s")))
    val kept = Dedup.exact(docs).select("doc_id").collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(1L, 3L))
    val clusters = Dedup.exactClusters(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(clusters == Map(2L -> 1L, 4L -> 1L))
  }

  test("unigram jaccard pairs within blocks") {
    val docs = docsDf(Seq(
      (1L, "a b c d e", "en", "s"), (2L, "a b c d f", "en", "s"),
      (3L, "a b c d e", "de", "s"), // different block — never paired
      (4L, "z q", "en", "s")))
    val pairs = Dedup.jaccardPairs(docs, 0.5).collect()
    assert(pairs.length == 1)
    val p = pairs.head
    assert(p.getAs[Long]("a") == 1L && p.getAs[Long]("b") == 2L)
    assert(p.getAs[Int]("inter") == 4 && p.getAs[Int]("uni") == 6)
  }

  test("3-gram jaccard matches hand computation") {
    assert(Dedup.ngramJaccard("a b c d", "a b c d", 3) == 1.0)
    // shingles: {a b c, b c d} vs {a b c, b c x} → 1/3
    assert(math.abs(Dedup.ngramJaccard("a b c d", "a b c x", 3) - 1.0 / 3) < 1e-12)
    assert(Dedup.ngramJaccard("a b", "c d", 3) == 0.0) // short-text fallback
  }

  test("minhash signature similarity estimates jaccard (law of large hashes)") {
    val params = Dedup.MinHashParams(256, 32, 42L)
    val sa = Dedup.shingles("a b c d e f g h", 1)
    val sb = Dedup.shingles("a b c d e f x y", 1)
    val trueJ = (sa & sb).size.toDouble / (sa | sb).size
    val (ha, hb) = (Dedup.minHashSignature(sa, params), Dedup.minHashSignature(sb, params))
    val est = ha.zip(hb).count { case (x, y) => x == y }.toDouble / ha.length
    assert(math.abs(est - trueJ) < 0.15, s"est $est vs true $trueJ")
  }

  test("minhash LSH finds the planted near-duplicates and skips far pairs") {
    val base = (0 until 30).map(i => s"w$i").mkString(" ")
    val nearDup = (0 until 30).map(i => if (i == 7) "zz" else s"w$i").mkString(" ")
    val far = (100 until 130).map(i => s"w$i").mkString(" ")
    val docs = docsDf(Seq(
      (1L, base, "en", "s"), (2L, nearDup, "en", "s"), (3L, far, "en", "s")))
    val found = Dedup.minHashCandidates(docs, n = 1,
        Dedup.MinHashParams(64, 16, 42L), verifyThreshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found == Set((1L, 2L)))
  }

  test("simhash: near-identical texts within small hamming distance, far texts not") {
    val base = (0 until 50).map(i => s"word$i").mkString(" ")
    val oneOff = base.replace("word25", "other")
    val far = (200 until 250).map(i => s"word$i").mkString(" ")
    val d1 = java.lang.Long.bitCount(Dedup.simHash(base) ^ Dedup.simHash(oneOff))
    val d2 = java.lang.Long.bitCount(Dedup.simHash(base) ^ Dedup.simHash(far))
    assert(d1 < d2, s"near $d1 should be < far $d2")
    assert(d1 <= 12)
  }

  test("simhash pair mining finds hamming-close pairs via chunk buckets") {
    val base = (0 until 60).map(i => s"word$i").mkString(" ")
    val oneOff = base.replace("word31", "changed")
    val docs = docsDf(Seq((1L, base, "en", "s"), (2L, oneOff, "en", "s"),
      (3L, (500 until 560).map(i => s"q$i").mkString(" "), "en", "s")))
    val dist = java.lang.Long.bitCount(Dedup.simHash(base) ^ Dedup.simHash(oneOff))
    val pairs = Dedup.simHashPairs(docs, maxDist = math.max(3, dist))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    if (dist <= 48) // pigeonhole over 4 chunks guarantees bucket hit only ≤3;
      assert(pairs.contains((1L, 2L)) || dist > 3)
  }
}
