package graft.extract

import scala.collection.mutable

/** Aho-Corasick gazetteer trie for batched mention detection (north star:
  * "mapPartitions-hosted Aho-Corasick gazetteer trie").
  *
  * Built once on the driver from the (small) gazetteer, broadcast to
  * executors, applied per partition — the text corpus is scanned in a
  * single pass per document regardless of dictionary size, so at 100 TB
  * the cost is one streaming pass with zero shuffle until the mention
  * table is aggregated.
  *
  * Matches are emitted only at word boundaries (the char before/after the
  * span is not a letter/digit), which makes mention counts equal to
  * whitespace-token counts for single-word entries — the property the
  * DuckDB oracle of `kg_mentions` checks.
  */
final class Gazetteer private (
    goto: Array[mutable.LongMap[Int]], // node -> (char -> node)
    fail: Array[Int],
    out: Array[List[String]], // entity ids emitted at this node
    val entityList: Seq[String] // the dictionary this trie was built from
) extends Serializable {

  final case class Match(entity: String, begin: Int, end: Int)

  def findAll(text: String): List[Match] = {
    val res = mutable.ListBuffer[Match]()
    var state = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i).toLong
      while (state != 0 && !goto(state).contains(c)) state = fail(state)
      state = goto(state).getOrElse(c, 0)
      if (out(state).nonEmpty) {
        for (ent <- out(state)) {
          val begin = i + 1 - ent.length
          val beforeOk = begin == 0 || !Character.isLetterOrDigit(text.charAt(begin - 1))
          val afterOk = i + 1 >= text.length || !Character.isLetterOrDigit(text.charAt(i + 1))
          if (beforeOk && afterOk) res += Match(ent, begin, i + 1)
        }
      }
      i += 1
    }
    res.toList
  }

  /** Non-overlapping per-entity counts (word-boundary matches).
    * Allocation-light hot path: counts accumulate into a small HashMap
    * without materializing Match objects — at web scale the scan runs
    * hundreds of thousands of times per task, so per-match garbage
    * directly costs memory bandwidth.
    */
  def countMatches(text: String): collection.Map[String, Int] = {
    val counts = new scala.collection.mutable.HashMap[String, Int]()
    var state = 0
    var i = 0
    val n = text.length
    while (i < n) {
      val c = text.charAt(i).toLong
      while (state != 0 && !goto(state).contains(c)) state = fail(state)
      state = goto(state).getOrElse(c, 0)
      var outs = out(state)
      while (outs.nonEmpty) {
        val ent = outs.head
        val begin = i + 1 - ent.length
        val beforeOk = begin == 0 || !Character.isLetterOrDigit(text.charAt(begin - 1))
        val afterOk = i + 1 >= n || !Character.isLetterOrDigit(text.charAt(i + 1))
        if (beforeOk && afterOk)
          counts.update(ent, counts.getOrElse(ent, 0) + 1)
        outs = outs.tail
      }
      i += 1
    }
    counts
  }
}

object Gazetteer {
  /** Build the trie + BFS failure links (classic Aho-Corasick). */
  def apply(entries: Seq[String]): Gazetteer = {
    val goto = mutable.ArrayBuffer(mutable.LongMap[Int]())
    val outB = mutable.ArrayBuffer[List[String]](Nil)
    for (word <- entries.distinct if word.nonEmpty) {
      var node = 0
      for (c <- word) {
        val next = goto(node).getOrElse(c.toLong, {
          goto += mutable.LongMap[Int]()
          outB += Nil
          val id = goto.size - 1
          goto(node)(c.toLong) = id
          id
        })
        node = next
      }
      outB(node) = word :: outB(node)
    }
    val fail = Array.fill(goto.size)(0)
    val queue = mutable.Queue[Int]()
    for ((_, child) <- goto(0)) queue += child
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      for ((c, v) <- goto(u)) {
        queue += v
        var f = fail(u)
        while (f != 0 && !goto(f).contains(c)) f = fail(f)
        fail(v) = goto(f).getOrElse(c, 0)
        if (fail(v) != v) outB(v) = outB(v) ++ outB(fail(v))
      }
    }
    new Gazetteer(goto.map(m => m).toArray, fail, outB.toArray,
      entries.distinct.filter(_.nonEmpty))
  }

  /** The fixed demo gazetteer over the synthetic corpus vocabulary —
    * multi-char terms only, none a substring of another, so word-boundary
    * Aho-Corasick counts equal whitespace-token counts (oracle-checkable).
    */
  val DefaultEntities: Seq[String] = Seq(
    "spark", "join", "window", "stream", "customer", "vector", "hash",
    "merge", "batch", "filter")
}
