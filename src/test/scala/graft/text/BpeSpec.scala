package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BPE training vs an independent single-machine reference trainer
  * (same tie-break contract), plus encode/round-trip properties.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Naive reference BPE trainer over a word-frequency map. */
  private def trainRef(wc: Map[String, Long],
      numMerges: Int): Seq[(String, String)] = {
    var vocab: Map[Seq[String], Long] = wc.map { case (w, n) =>
      Bpe.codePoints(w) -> n
    }
    val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var done = false
    while (merges.length < numMerges && !done) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      for ((syms, n) <- vocab; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) =
          counts.getOrElse((syms(i), syms(i + 1)), 0L) + n
      if (counts.isEmpty) done = true
      else {
        // tie-break in CODE-POINT order — Spark's binary UTF8 `asc`,
        // not Java's UTF-16 compareTo (they diverge beyond the BMP)
        val cp = graft.model.CodePoint.ordering
        implicit val pairOrd: Ordering[((String, String), Long)] =
          Ordering.by[((String, String), Long), Long](-_._2)
            .orElse(Ordering.by[((String, String), Long), String](_._1._1)(cp))
            .orElse(Ordering.by[((String, String), Long), String](_._1._2)(cp))
        val (pair, _) = counts.toSeq.min
        merges += pair
        vocab = vocab.groupMapReduce(
          { case (syms, _) => Bpe.applyMergeOnce(syms, pair._1, pair._2) })(
          _._2)(_ + _)
      }
    }
    merges.toSeq
  }

  private val corpus = Seq.fill(5)("low").mkString(" ") + " " +
    Seq.fill(2)("lower").mkString(" ") + " " +
    Seq.fill(6)("newest").mkString(" ") + " " +
    Seq.fill(3)("widest").mkString(" ")
  private lazy val docsDf = Seq((0L, corpus)).toDF("doc_id", "text")
  private val wc = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L,
    "widest" -> 3L)

  test("distributed training matches the reference trainer") {
    val got = Bpe.train(docsDf, numMerges = 8)
    assert(got == trainRef(wc, 8))
    // Sennrich example shape: the first merge is the most frequent pair
    // — 'es' (newest 6 + widest 3 = 9)
    assert(got.head == ("e", "s"))
  }

  test("training is partitioning-invariant") {
    val spread = Seq("low low low newest newest newest",
      "low low newest newest widest",
      "lower lower newest newest widest widest")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text").repartition(3)
    val a = Bpe.train(spread, 6)
    val b = Bpe.train(spread.coalesce(1), 6)
    assert(a == b)
  }

  test("encode round-trips and token counts shrink as merges grow") {
    val merges = Bpe.train(docsDf, 8)
    val ranks = merges.zipWithIndex.toMap
    for (w <- wc.keys)
      assert(Bpe.encodeWord(w, ranks).mkString == w)
    val n0 = Bpe.tokenCounts(docsDf, Nil)
      .as[(Long, Long)].collect().head._2
    val n8 = Bpe.tokenCounts(docsDf, merges)
      .as[(Long, Long)].collect().head._2
    assert(n0 == corpus.split(" ").map(_.length).sum) // chars w/o merges
    assert(n8 < n0)
  }

  test("trainDetailed trace: same merges, exact winning counts, " +
      "non-increasing (merging can only shrink the max pair count)") {
    val got = Bpe.trainDetailed(docsDf, 8)
    assert(got.map(t => (t._1, t._2)) == trainRef(wc, 8))
    // first winner 'es' = newest(6) + widest(3) = 9, second 'est' = 9
    assert(got.head == ("e", "s", 9L))
    assert(got(1) == ("es", "t", 9L))
    val counts = got.map(_._3)
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
  }

  test("encode applies merges by rank priority") {
    // ranks: ('a','b') before ('b','c'): "abc" → ["ab", "c"]
    val ranks = Map(("a", "b") -> 0, ("b", "c") -> 1)
    assert(Bpe.encodeWord("abc", ranks) == Seq("ab", "c"))
    // reversed priority → ["a", "bc"]
    val ranks2 = Map(("a", "b") -> 1, ("b", "c") -> 0)
    assert(Bpe.encodeWord("abc", ranks2) == Seq("a", "bc"))
  }

  test("tie-break is code-point order, not UTF-16 order") {
    // ('😀','a') and ('￿','b') both count 2 — UTF-16 order would
    // pick the emoji pair (surrogate \uD83D < ￿); code-point order
    // (U+1F600 > U+FFFF) must pick the ￿ pair, matching Spark's
    // binary string sort AND the reference trainer's comparator
    val docs = Seq((0L, "😀a 😀a ￿b ￿b")).toDF("doc_id", "text")
    val got = Bpe.train(docs, 1)
    assert(got == Seq(("￿", "b")))
    assert(got == trainRef(Map("😀a" -> 2L, "￿b" -> 2L), 1))
  }

  test("sequential (training-order) encode: round-trips, agrees with " +
      "the priority encoder on the trained vocab, equals the trainer's " +
      "terminal vocab state") {
    val merges = Bpe.train(docsDf, 8)
    val ranks = merges.zipWithIndex.toMap
    for (w <- wc.keys) {
      val seq = Bpe.encodeWordSequential(w, merges)
      assert(seq.mkString == w) // lossless
      assert(seq == Bpe.encodeWord(w, ranks)) // priority agreement
    }
    // zero merges = code points
    assert(Bpe.encodeWordSequential("widest", Nil).length == 6)
    // more merges never lengthen a word's encoding
    for (w <- wc.keys; k <- 0 to merges.length)
      assert(Bpe.encodeWordSequential(w, merges.take(k)).length >=
        Bpe.encodeWordSequential(w, merges).length)
  }

  test("driver-side merge loop ≡ distributed fallback: identical trace " +
      "(merges, winning counts) on the real corpus vocab and on the " +
      "beyond-BMP tie fixture") {
    val wc1 = Bpe.wordCounts(docsDf)
    assert(Bpe.trainDetailedFromCounts(wc1, 8, 65536) ==
      Bpe.trainDetailedDistributed(wc1, 8, 65536))
    val wc2 = Bpe.wordCounts(
      Seq((0L, "😀a 😀a ￿b ￿b")).toDF("doc_id", "text"))
    assert(Bpe.trainDetailedFromCounts(wc2, 3, 65536) ==
      Bpe.trainDetailedDistributed(wc2, 3, 65536))
  }

  test("supplementary-plane code points survive") {
    val s = "😀😀x" // 😀😀x
    val docs = Seq((0L, s + " " + s)).toDF("doc_id", "text")
    val m = Bpe.train(docs, 2)
    val ranks = m.zipWithIndex.toMap
    assert(Bpe.encodeWord(s, ranks).mkString == s)
  }
}
