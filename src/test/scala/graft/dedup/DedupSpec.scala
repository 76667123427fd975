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

/** Round-2 additions: full-corpus minhash entry + length-bucketed
  * Jaccard blocking (verdict items 5 and 10).
  */
class DedupScaleSpec extends graft.SparkSpec {
  import spark.implicits._

  test("dd_minhash entry: full corpus, recall = 1.0 on planted near-dups") {
    val dir = "/root/testdata/sf0.001"
    val result = graft.queries.DataQueries.ddMinhash(spark, dir).collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"))).toSet
    // every planted twin pair (k, k+1000000) with jaccard >= 0.8 must be
    // found; recompute the expectation with the exact per-pair jaccard
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    val planted = docs.keys.filter(_ % 20 == 0).flatMap { k =>
      val toks = docs(k).split(" ")
      val twin = toks.take(math.max(toks.length - 2, 3)).mkString(" ")
      val j = Dedup.ngramJaccard(docs(k), twin, 3)
      if (j >= 0.8) Some((k, k + 1000000L)) else None
    }.toSet
    assert(planted.nonEmpty, "fixture must plant at least one near-dup")
    val found = planted.intersect(result)
    assert(found == planted,
      s"LSH missed ${(planted -- found).size} of ${planted.size} planted pairs")
  }

  test("jaccard length-bucket blocking: lossless at threshold, bounds skew") {
    // skewed block: 40 short + 40 long docs, same (lang, source)
    val short = (0L until 40L).map(i => (i, s"tok$i a b c d", "en", "s"))
    val long = (100L until 140L).map(i =>
      (i, (0 until 400).map(t => s"w${i}_$t").mkString(" "), "en", "s"))
    // plus one true near-dup pair among the long docs
    val dup = Seq((500L, (0 until 400).map(t => s"w${100L}_$t").mkString(" ")
      + " extra", "en", "s"))
    val docs = (short ++ long ++ dup).toDF("doc_id", "text", "lang", "source")

    val candidates = Dedup.jaccardCandidates(docs, 0.8)
    val nCand = candidates.count()
    // old (lang, source)-only blocking would consider all 81*80/2 = 3240
    // pairs; the length bucket keeps shorts and longs apart
    assert(nCand < 3240 / 2, s"blocking did not bound the block: $nCand")
    assert(!candidates.collect().exists(r =>
      r.getAs[Long]("a") < 40 && r.getAs[Long]("b") >= 100),
      "short docs must never pair with 400-token docs")

    // losslessness: the thresholded result equals brute force over the block
    val pairs = Dedup.jaccardPairs(docs, 0.8).collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"))).toSet
    val all = (short ++ long ++ dup).map(x => (x._1, x._2))
    val brute = (for {
      (ia, ta) <- all; (ib, tb) <- all if ia < ib
      j = Dedup.ngramJaccard(ta, tb, 1)
      if j >= 0.8
    } yield (ia, ib)).toSet
    assert(pairs == brute)
    assert(brute.contains((100L, 500L))) // the planted pair survives
  }
}

/** Round-3 verdict #4: the SimHash chunk join must stay bounded when a
  * degenerate 16-bit chunk value collapses many non-dup docs into one
  * bucket (boilerplate/near-empty pages at corpus scale).
  */
class SimHashHotBucketSpec extends graft.SparkSpec {
  import org.apache.spark.sql.functions._

  private val rnd = new scala.util.Random(7)

  // 10k fingerprints sharing chunk0 = 0x1234 but otherwise random: a
  // degenerate hot bucket whose members are NOT near-dups...
  private lazy val planted: Seq[(Long, Long)] = {
    val base = (0 until 10000).map { i =>
      (i.toLong, (rnd.nextLong() << 16) | 0x1234L)
    }
    // ...plus 5 true near-dup pairs (flip ≤ 3 bits of a twin)
    val twins = (0 until 5).map { k =>
      val (id, sim) = base(k * 1000)
      (100000L + k, sim ^ (1L << (20 + k)) ^ (1L << 40))
    }
    base ++ twins
  }

  private def bruteForce(maxDist: Int): Set[(Long, Long)] = {
    val arr = planted.toArray
    val out = Set.newBuilder[(Long, Long)]
    for (i <- arr.indices; j <- (i + 1) until arr.length) {
      val d = java.lang.Long.bitCount(arr(i)._2 ^ arr(j)._2)
      if (d <= maxDist) {
        val (a, b) = (arr(i)._1, arr(j)._1)
        out += (if (a < b) (a, b) else (b, a))
      }
    }
    out.result()
  }

  test("hot-bucket sub-split: candidates bounded, recall exact") {
    import spark.implicits._
    val sh = planted.toDF("doc_id", "sim")
    // guard ON (cap 1000 << 10k bucket): candidate volume collapses from
    // ~50M (quadratic bucket) to the 12-bit-collision mass
    val nCand = Dedup.simHashCandidates(sh, hotBucketCap = 1000).count()
    assert(nCand < 2000000L, s"candidates not bounded: $nCand")
    // recall is exact vs brute force — the sub-split loses no pair
    val got = Dedup.simHashPairsFromSims(sh, maxDist = 3, hotBucketCap = 1000)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = bruteForce(3)
    assert(want.nonEmpty, "test must plant at least one true pair")
    assert(got == want)
  }

  test("guarded and unguarded paths agree on an unskewed corpus") {
    import spark.implicits._
    val sh = planted.take(500).toDF("doc_id", "sim")
    def run(cap: Int) =
      Dedup.simHashPairsFromSims(sh, maxDist = 3, hotBucketCap = cap)
        .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(run(1) == run(Int.MaxValue)) // every bucket hot vs none hot
  }
}
