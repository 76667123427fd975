package graft.text

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training and encoding (Sennrich et al.
  * 2016), Spark-native: the corpus is touched ONCE (word-frequency
  * aggregation with map-side combine); every merge iteration then runs
  * over the vocab-scale symbol table, never the corpus. This is the
  * standard scale split — at 10^12 documents the word-frequency table is
  * orders of magnitude smaller than the corpus, and `maxVocab` caps it
  * (top-N by frequency, deterministic tie-break) the way production
  * tokenizer trainers truncate their word dicts.
  *
  * Determinism: pair selection breaks count ties lexicographically
  * (code-point order on both symbols), so training is reproducible
  * across partitionings and cluster sizes — the property every other
  * deterministic id in this repo maintains.
  *
  * Symbols are Unicode code points (not UTF-16 chars), so
  * supplementary-plane text round-trips.
  */
object Bpe {

  type Merge = (String, String)

  /** One corpus pass: whitespace word frequencies. */
  def wordCounts(docs: DataFrame): DataFrame =
    docs.select(explode(split(col("text"), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("n"))

  private[text] def codePoints(w: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.toSeq
  }

  /** Merge every non-overlapping (a, b) occurrence, scanning left to
    * right — the classic BPE apply step.
    */
  private[text] def applyMergeOnce(syms: Seq[String], a: String,
      b: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += a + b; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  /** Train `numMerges` merges. Each round: adjacent-pair weighted counts
    * over the symbol table (one small shuffle), a 1-row argmax to the
    * driver (the algorithm's inherent sequential dependency), and a map
    * applying the merge. The symbol table is localCheckpointed per round
    * so lineage stays O(1) across rounds.
    */
  def train(docs: DataFrame, numMerges: Int,
      maxVocab: Int = 1000000): Seq[Merge] =
    trainDetailed(docs, numMerges, maxVocab).map { case (a, b, _) => (a, b) }

  /** [[train]] plus each round's winning pair count — the full training
    * trace the `txt_bpe` driver oracle replays round-per-CTE in SQL.
    */
  def trainDetailed(docs: DataFrame, numMerges: Int,
      maxVocab: Int = 1000000): Seq[(String, String, Long)] =
    trainDetailedFromCounts(wordCounts(docs), numMerges, maxVocab)

  /** Unicode code-point comparison — identical to Spark's binary
    * UTF8String ordering (and DuckDB varchar order): UTF-8 byte order
    * equals code-point order, whereas Java's `String.compareTo` is
    * UTF-16 code-UNIT order, which ranks supplementary-plane characters
    * below some BMP characters. The driver-side merge loop must break
    * count ties exactly the way the old `orderBy(asc("a"), asc("b"))`
    * Spark job did, so it compares code points.
    */
  private[text] def cpCompare(x: String, y: String): Int = {
    var i = 0
    var j = 0
    while (i < x.length && j < y.length) {
      val cx = x.codePointAt(i)
      val cy = y.codePointAt(j)
      if (cx != cy) return Integer.compare(cx, cy)
      i += Character.charCount(cx)
      j += Character.charCount(cy)
    }
    Integer.compare(x.length - i, y.length - j)
  }

  /** [[trainDetailed]] over a caller-built (word, n) frequency table —
    * the driver query pre-filters words there (sentinel guard) so the
    * SQL replay's wrapped-string representation stays unambiguous.
    *
    * Round-6: after the cap the word table is ≤ `maxVocab` rows by
    * construction, so the merge loop runs DRIVER-SIDE over the
    * collected table (the classic trainer shape) — one Spark job total
    * instead of one shuffle job + one checkpoint job PER merge. At a
    * production 50k-merge vocabulary the old shape paid 100k job
    * round-trips of pure latency regardless of cluster size; the new
    * one pays one capped collect (bounded by `maxVocab`, the same bound
    * the old per-round shuffle carried). Pair counts are the identical
    * integer sums and ties break by the identical (cnt DESC, a ASC,
    * b ASC) code-point order, so the training trace — which the
    * txt_bpe oracle replays round-per-CTE — is byte-identical
    * (BpeSpec pins driver ≡ distributed on the real corpus vocab).
    * Caps beyond `spark.graft.bpe.localThreshold` (default 2,000,000
    * rows) fall back to the distributed per-round loop.
    */
  def trainDetailedFromCounts(wc: DataFrame, numMerges: Int,
      maxVocab: Int = 1000000): Seq[(String, String, Long)] = {
    val spark = wc.sparkSession
    val localThreshold = spark.conf
      .getOption("spark.graft.bpe.localThreshold").map(_.toInt)
      .getOrElse(2000000)
    if (maxVocab > localThreshold)
      return trainDetailedDistributed(wc, numMerges, maxVocab)
    import spark.implicits._
    val words: Array[(Array[String], Long)] = wc
      .orderBy(desc("n"), asc("word")).limit(maxVocab)
      .as[(String, Long)]
      .collect()
      .map { case (w, n) => (codePoints(w).toArray, n) }
    val syms: Array[Array[String]] = words.map(_._1)
    val merges = scala.collection.mutable.ArrayBuffer[(String, String, Long)]()
    var done = false
    while (merges.length < numMerges && !done) {
      val counts = new java.util.HashMap[(String, String), Long]()
      var wi = 0
      while (wi < syms.length) {
        val s = syms(wi)
        val n = words(wi)._2
        var i = 0
        while (i + 1 < s.length) {
          counts.merge((s(i), s(i + 1)), n, (x, y) => x + y)
          i += 1
        }
        wi += 1
      }
      if (counts.isEmpty) done = true
      else {
        var bestA: String = null
        var bestB: String = null
        var bestC = Long.MinValue
        counts.forEach { (p, c) =>
          val better = c > bestC || (c == bestC && {
            val ca = cpCompare(p._1, bestA)
            ca < 0 || (ca == 0 && cpCompare(p._2, bestB) < 0)
          })
          if (better) { bestA = p._1; bestB = p._2; bestC = c }
        }
        merges += ((bestA, bestB, bestC))
        wi = 0
        while (wi < syms.length) {
          syms(wi) = applyMergeOnce(syms(wi), bestA, bestB).toArray
          wi += 1
        }
      }
    }
    merges.toSeq
  }

  /** The pre-round-6 distributed merge loop — one vocab-scale Spark job
    * per merge. Kept as the overflow fallback for caps too large to
    * collect; byte-identical trace to the driver-side loop (same
    * integer pair sums, same code-point tie-break).
    */
  private[text] def trainDetailedDistributed(wc: DataFrame, numMerges: Int,
      maxVocab: Int): Seq[(String, String, Long)] = {
    val spark = wc.sparkSession
    import spark.implicits._
    var vocab: Dataset[(Seq[String], Long)] = wc
      .orderBy(desc("n"), asc("word")).limit(maxVocab)
      .as[(String, Long)]
      .map { case (w, n) => (codePoints(w), n) }
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer[(String, String, Long)]()
    var done = false
    while (merges.length < numMerges && !done) {
      val top = vocab.flatMap { case (syms, n) =>
          if (syms.length < 2) Iterator.empty
          else syms.iterator.zip(syms.iterator.drop(1)).map(p => (p._1, p._2, n))
        }
        .toDF("a", "b", "n")
        .groupBy("a", "b").agg(sum(col("n")).as("cnt"))
        .orderBy(desc("cnt"), asc("a"), asc("b"))
        .limit(1)
        .as[(String, String, Long)]
        .collect()
      top.headOption match {
        case None => done = true
        case Some((a, b, cnt)) =>
          merges += ((a, b, cnt))
          vocab = vocab
            .map { case (syms, n) => (applyMergeOnce(syms, a, b), n) }
            .localCheckpoint()
      }
    }
    merges.toSeq
  }

  /** Encode one word with trained merges: repeatedly apply the
    * lowest-rank applicable merge (rank = training order).
    */
  def encodeWord(word: String, ranks: Map[Merge, Int]): Seq[String] = {
    var syms = codePoints(word)
    var continue = syms.length >= 2
    while (continue) {
      var best = Int.MaxValue
      var bestPair: Merge = null
      var i = 0
      while (i + 1 < syms.length) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < best) { best = r; bestPair = (syms(i), syms(i + 1)) }
        i += 1
      }
      if (bestPair == null) continue = false
      else syms = applyMergeOnce(syms, bestPair._1, bestPair._2)
    }
    syms
  }

  /** Encode one word by replaying the merge table in TRAINING order —
    * one non-overlapping LTR pass per merge, i.e. exactly the state the
    * trainer's vocab reached after its last round (and what the
    * `txt_encode` oracle's round-per-CTE replay computes). Agrees with
    * the priority encoder [[encodeWord]] unless a later merge's output
    * string collides with an earlier merge's input pair — impossible
    * for merges trained on this vocab because training applied each
    * merge exhaustively at creation (BpeSpec pins agreement on the real
    * corpus vocab).
    */
  def encodeWordSequential(word: String, merges: Seq[Merge]): Seq[String] = {
    var syms = codePoints(word)
    merges.foreach { case (a, b) => syms = applyMergeOnce(syms, a, b) }
    syms
  }

  /** Per-doc BPE token counts under a trained merge table (broadcast to
    * executors; one corpus map pass, no shuffle).
    */
  def tokenCounts(docs: DataFrame, merges: Seq[Merge]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(
      merges.zipWithIndex.toMap)
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val ranks = bc.value
        it.map { case (id, t) =>
          val n = t.split("\\s+").filter(_.nonEmpty)
            .map(w => encodeWord(w, ranks).length.toLong).sum
          (id, n)
        }
      }
      .toDF("doc_id", "n_bpe_tokens")
  }
}
