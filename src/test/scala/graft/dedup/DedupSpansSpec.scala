package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Exact-substring span semantics on a hand-built corpus: cross-doc-only
  * detection, interval merging (overlap / touching / gap), short-doc
  * exclusion, and removal accounting.
  */
class DedupSpansSpec extends SparkSpec {
  import spark.implicits._

  private val W = 5

  private def run(docs: Seq[(Long, String)]) =
    Dedup.duplicateSpans(docs.toDF("doc_id", "text"), window = W)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq

  private def words(r: Range, tag: String = "w") =
    r.map(i => s"$tag$i").mkString(" ")

  test("shared run yields one merged span covering exactly the run") {
    // docs share tokens s0..s9 (10 tokens) in otherwise-unique text
    val shared = words(0 until 10, "s")
    val a = 0L -> (words(0 until 8, "a") + " " + shared + " " + words(8 until 16, "a"))
    val b = 1L -> (words(0 until 8, "b") + " " + shared + " " + words(8 until 16, "b"))
    val got = run(Seq(a, b))
    // shared windows: start positions 9..14 (6 windows of 5 over 10
    // shared tokens at offset 8) — one span of 10 tokens in each doc
    assert(got == Seq((0L, 6L, 1L, 10L, 26L), (1L, 6L, 1L, 10L, 26L)))
  }

  test("two separated shared runs stay two spans; touching runs merge") {
    val s1 = words(0 until 6, "s")
    val s2 = words(0 until 6, "z")
    // gap of W+3 unique tokens between the runs → two spans
    val mk = (tag: String) =>
      s1 + " " + words(0 until (W + 3), tag) + " " + s2
    val got = run(Seq(0L -> mk("a"), 1L -> mk("b")))
    // each run: 2 windows (6 tokens, W=5); spans: 2; dup 12 of 20 tokens
    assert(got == Seq((0L, 4L, 2L, 12L, 20L), (1L, 4L, 2L, 12L, 20L)))
    // with the runs adjacent, it is ONE 12-token shared run
    val adj = (tag: String) => s1 + " " + s2 + " " + words(0 until 4, tag)
    val got2 = run(Seq(0L -> adj("a"), 1L -> adj("b")))
    assert(got2 == Seq((0L, 8L, 1L, 12L, 16L), (1L, 8L, 1L, 12L, 16L)))
  }

  test("within-doc repetition alone is NOT flagged (cross-doc rule)") {
    val rep = words(0 until W, "r")
    val doc = 0L -> (rep + " " + rep + " " + rep)
    val other = 1L -> words(0 until 20, "u")
    assert(run(Seq(doc, other)).isEmpty)
  }

  test("docs shorter than the window are ignored") {
    val t = words(0 until (W - 1))
    assert(run(Seq(0L -> t, 1L -> t)).isEmpty)
    // ...even when the same short text also appears inside a long doc
    val long0 = 2L -> (t + " " + words(0 until 10, "x"))
    assert(run(Seq(0L -> t, long0)).isEmpty)
  }

  test("identical docs are fully covered: dup_tokens == n_tokens") {
    val t = words(0 until 12)
    val got = run(Seq(0L -> t, 1L -> t, 2L -> words(0 until 9, "q")))
    assert(got == Seq(
      (0L, 8L, 1L, 12L, 12L), (1L, 8L, 1L, 12L, 12L)))
  }
}
