package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Context-window chunking laws: chunk-count arithmetic at the exact
  * boundaries, full token coverage, the overlap contract between
  * consecutive chunks, loss-free reconstruction, and the degenerate
  * empty-document case.
  */
class ChunkSpec extends SparkSpec {
  import spark.implicits._

  private val W = 8
  private val O = 2
  private val S = W - O // stride 6

  private def doc(n: Int) = (0 until n).map(i => s"t$i").mkString(" ")

  private def chunksOf(n: Int): Array[(Long, Long, String, Long)] =
    TextAnalysis.chunk(Seq((0L, doc(n))).toDF("doc_id", "text"), W, O)
      .orderBy("chunk_idx")
      .select("chunk_idx", "start", "chunk", "n_toks")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3)))

  test("chunk count at the boundaries") {
    // n ≤ W → 1; then one more chunk per started stride
    assert(chunksOf(1).length == 1)
    assert(chunksOf(W).length == 1)
    assert(chunksOf(W + 1).length == 2)
    assert(chunksOf(W + S).length == 2)
    assert(chunksOf(W + S + 1).length == 3)
  }

  test("every token is covered and consecutive chunks overlap by O") {
    val n = 3 * W + 5
    val cs = chunksOf(n)
    val covered = cs.flatMap { case (_, start, chunk, _) =>
      val toks = chunk.split(" ")
      toks.indices.map(i => start.toInt + i)
    }.toSet
    assert(covered == (0 until n).toSet)
    cs.sliding(2).foreach {
      case Array((_, s1, c1, _), (_, s2, c2, _)) =>
        val t1 = c1.split(" ").zipWithIndex.map { case (t, i) =>
          (s1.toInt + i, t) }.toMap
        val t2 = c2.split(" ").zipWithIndex.map { case (t, i) =>
          (s2.toInt + i, t) }.toMap
        val shared = t1.keySet intersect t2.keySet
        // full interior chunks share exactly the O-token overlap
        if (c2.split(" ").length == W) assert(shared.size == O)
        shared.foreach(k => assert(t1(k) == t2(k)))
      case _ => ()
    }
  }

  test("reconstruction: chunk 0 + de-overlapped tails = the document") {
    val n = 4 * W
    val cs = chunksOf(n)
    val rebuilt = cs.head._3 +: cs.tail.map { case (_, _, c, _) =>
      c.split(" ").drop(O).mkString(" ") }
    assert(rebuilt.mkString(" ") == doc(n))
  }

  test("n_toks is the real token count of each chunk") {
    chunksOf(2 * W + 3).foreach { case (_, _, chunk, nToks) =>
      assert(chunk.split(" ").count(_.nonEmpty) == nToks)
    }
  }

  test("empty document yields one empty chunk") {
    val cs = TextAnalysis.chunk(
      Seq((7L, "")).toDF("doc_id", "text"), W, O).collect()
    assert(cs.length == 1)
    assert(cs.head.getAs[String]("chunk") == "")
    assert(cs.head.getAs[Long]("n_toks") == 0L)
  }

  test("plan is shuffle-free: no exchange anywhere") {
    val docs = Seq((1L, doc(100)), (2L, doc(7))).toDF("doc_id", "text")
    val plan = TextAnalysis.chunk(docs, W, O)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
