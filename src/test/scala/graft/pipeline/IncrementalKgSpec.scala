package graft.pipeline

import graft.SparkSpec
import graft.extract.Gazetteer
import org.apache.spark.sql.functions._

/** merge(A, B) ≡ fromPages(A ∪ B): incremental materialization is exact. */
class IncrementalKgSpec extends SparkSpec {

  private val gaz = Gazetteer(Gazetteer.DefaultEntities)
  private lazy val pages = graft.pages.PageGen.pages(spark, "/root/testdata/sf0.001")

  private def tripleSet(df: org.apache.spark.sql.DataFrame): Set[(String, String, String)] =
    df.select("s", "p", "o").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet

  private def compMap(df: org.apache.spark.sql.DataFrame): Map[String, String] =
    df.collect().map(r => r.getString(0) -> r.getString(1)).toMap

  test("two-batch merge equals the full-batch graph") {
    val full = IncrementalKg.fromPages(pages, gaz)
    val merged = IncrementalKg.merge(
      IncrementalKg.fromPages(pages.filter(col("doc_id") % 2 === 0), gaz),
      IncrementalKg.fromPages(pages.filter(col("doc_id") % 2 === 1), gaz))
    val fullT = tripleSet(full.triples)
    assert(fullT.nonEmpty)
    assert(tripleSet(merged.triples) == fullT)
    // merged component labels agree with the full map on every node
    val fm = compMap(full.components)
    val mm = compMap(merged.components)
    assert(fm.keySet == mm.keySet)
    assert(fm == mm)
  }

  test("three-batch left fold equals the full-batch graph") {
    val batches = (0 until 3).map(k =>
      IncrementalKg.fromPages(pages.filter(col("doc_id") % 3 === k), gaz))
    val folded = batches.reduce(IncrementalKg.merge)
    val full = IncrementalKg.fromPages(pages, gaz)
    assert(tripleSet(folded.triples) == tripleSet(full.triples))
    assert(compMap(folded.components) == compMap(full.components))
  }

  test("seeded pseudo-random 3-way split folds to the full graph") {
    // Knuth-hash split — batch boundaries uncorrelated with doc order
    val part = pmod(col("doc_id") * 2654435761L, lit(3))
    val batches = (0 until 3).map(k =>
      IncrementalKg.fromPages(pages.filter(part === k), gaz))
    val folded = batches.reduce(IncrementalKg.merge)
    val full = IncrementalKg.fromPages(pages, gaz)
    assert(tripleSet(folded.triples) == tripleSet(full.triples))
    assert(compMap(folded.components) == compMap(full.components))
  }

  test("merging a graph with itself is idempotent") {
    val full = IncrementalKg.fromPages(pages, gaz)
    val merged = IncrementalKg.merge(full, full)
    assert(tripleSet(merged.triples) == tripleSet(full.triples))
    assert(compMap(merged.components) == compMap(full.components))
  }

  test("merged triples and components carry no duplicate rows") {
    // set-equality above can't see dups; the driver's hash oracle can
    val merged = IncrementalKg.merge(
      IncrementalKg.fromPages(pages.filter(col("doc_id") % 2 === 0), gaz),
      IncrementalKg.fromPages(pages.filter(col("doc_id") % 2 === 1), gaz))
    assert(merged.triples.count() == merged.triples.distinct().count())
    assert(merged.components.count() ==
      merged.components.select("node").distinct().count())
  }

  test("delta accounting: disjoint-entity batch rewrites zero prev rows") {
    val gazA = Gazetteer(Gazetteer.DefaultEntities.take(4))
    val gazB = Gazetteer(Gazetteer.DefaultEntities.drop(4))
    val prev = IncrementalKg.fromPages(pages.filter(col("doc_id") % 2 === 0), gazA)
    val batch = IncrementalKg.fromPages(pages.filter(col("doc_id") % 2 === 1), gazB)
    val parts = IncrementalKg.mergeParts(prev, batch)
    // no shared entities → no touched components, no rewrites
    assert(parts.touchedPrevLabels.count() == 0)
    assert(parts.changedPrev.count() == 0)
    assert(parts.rewrittenPrev.count() == 0)
    // prev passes through untouched; the delta is exactly the batch
    assert(tripleSet(parts.untouchedTriples) == tripleSet(prev.triples))
    assert(tripleSet(parts.delta) == tripleSet(batch.triples))
    assert(tripleSet(parts.graph.triples) ==
      tripleSet(prev.triples) ++ tripleSet(batch.triples))
  }

  test("delta accounting: self-merge rewrites nothing and adds nothing") {
    val full = IncrementalKg.fromPages(pages, gaz)
    val parts = IncrementalKg.mergeParts(full, full)
    assert(parts.changedPrev.count() == 0)
    assert(parts.rewrittenPrev.count() == 0)
    assert(parts.delta.count() == 0)
    assert(tripleSet(parts.graph.triples) == tripleSet(full.triples))
  }

  test("merging a batch with no bridging entities leaves labels intact") {
    // batch2 with no mentions at all: empty components, empty triples
    val empty = IncrementalKg.fromPages(
      pages.filter(col("doc_id") < 0), gaz)
    val base = IncrementalKg.fromPages(pages, gaz)
    val merged = IncrementalKg.merge(base, empty)
    assert(tripleSet(merged.triples) == tripleSet(base.triples))
    assert(compMap(merged.components) == compMap(base.components))
  }
}
