package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Line-level exact dedup (C4/RefinedWeb boilerplate removal): lines in
  * ≥ minDocs distinct docs are dropped everywhere, survivors reassemble
  * in order, fully-boilerplate docs survive with empty text.
  */
class DedupLinesSpec extends SparkSpec {
  import spark.implicits._

  test("repeated lines drop, unique lines keep their order") {
    val docs = Seq(
      (1L, "alpha beta\ncookie banner\ngamma delta"),
      (2L, "cookie banner\nepsilon zeta"),
      (3L, "cookie banner"), // all-boilerplate doc
      (4L, "eta theta\niota kappa"),
      // same line TWICE in one doc only: countDistinct(doc)=1 — kept
      (5L, "solo line\nsolo line")
    ).toDF("doc_id", "text")
    val out = Dedup.dedupLines(docs, minDocs = 2).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    assert(out(1L) == ((2L, 1L, "alpha beta\ngamma delta")))
    assert(out(2L) == ((1L, 1L, "epsilon zeta")))
    assert(out(3L) == ((0L, 1L, ""))) // survives, empty
    assert(out(4L) == ((2L, 0L, "eta theta\niota kappa")))
    assert(out(5L) == ((2L, 0L, "solo line\nsolo line")))
  }

  test("blank lines are structure, not boilerplate (round-5 review)") {
    val docs = Seq(
      (1L, "para one\n\npara two"),
      (2L, "other text\n\nmore text")).toDF("doc_id", "text")
    val out = Dedup.dedupLines(docs, minDocs = 2).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    // the shared empty separator line survives in BOTH docs
    assert(out(1L) == "para one\n\npara two")
    assert(out(2L) == "other text\n\nmore text")
  }

  test("minDocs threshold: a line must cross documents to be boilerplate") {
    val docs = Seq(
      (1L, "x\ny"), (2L, "x\nz"), (3L, "x\nw")).toDF("doc_id", "text")
    val strict = Dedup.dedupLines(docs, minDocs = 4).collect()
    assert(strict.forall(_.getLong(2) == 0L), "below threshold: nothing drops")
    val loose = Dedup.dedupLines(docs, minDocs = 3)
      .select(sum("n_dropped")).head.getLong(0)
    assert(loose == 3L) // 'x' dropped from all three docs
  }

  test("line dedup is idempotent (survivor counts never drop twice)") {
    // surviving lines kept their cross-doc distinct counts below the
    // threshold, so a second pass must be the identity — seeded random
    // corpora with heavy line sharing
    val rnd = new scala.util.Random(11)
    val pool = (0 until 12).map(i => s"line $i ${"x" * (i % 4)}")
    val docs = (0L until 40L).map { id =>
      val n = 1 + rnd.nextInt(6)
      (id, Seq.fill(n)(pool(rnd.nextInt(pool.length))).mkString("\n"))
    }.toDF("doc_id", "text")
    val once = Dedup.dedupLines(docs, minDocs = 3)
      .select("doc_id", "text").localCheckpoint()
    val twice = Dedup.dedupLines(once, minDocs = 3)
      .select("doc_id", "n_dropped", "text")
    assert(twice.agg(sum("n_dropped")).head.getLong(0) == 0L,
      "second pass dropped lines — dedup not idempotent")
    val a = once.collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val b = twice.collect().map(r => (r.getLong(0), r.getString(2))).toMap
    assert(a == b)
  }

  test("dd_lines entry: counts are consistent and boilerplate is removed") {
    val dir = "/root/testdata/sf0.001"
    val corpus = graft.queries.DataQueries.linesCorpus(spark, dir)
    val out = graft.queries.DataQueries.ddLines(spark, dir)
    // invariant: n_kept + n_dropped = total lines per doc
    val totals = corpus.select(col("doc_id"),
        size(split(col("text"), "\n")).cast("long").as("n_lines"))
    val bad = out.join(totals, Seq("doc_id"))
      .filter(col("n_kept") + col("n_dropped") =!= col("n_lines")).count()
    assert(bad == 0)
    // the planted boilerplate line (docs ≡ 0 mod 7) is gone from output
    val survivors = out.filter(col("text")
      .contains("subscribe to our newsletter")).count()
    assert(survivors == 0, "planted boilerplate must be dropped")
    // but unique content survives: most docs keep most lines
    val dropStats = out.agg(sum("n_kept"), sum("n_dropped")).head
    assert(dropStats.getLong(0) > dropStats.getLong(1) * 3,
      "dedup must not be destroying unique content")
  }
}
