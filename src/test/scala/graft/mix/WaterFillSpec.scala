package graft.mix

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Water-filling laws: closed forms on every level branch (all-fit,
  * mid-kink, below-first-kink), the maximality law Σmin(c, L) ≤ B <
  * Σmin(c, L+1) on random counts, and exact allocation accounting.
  */
class WaterFillSpec extends SparkSpec {
  import spark.implicits._

  private def docsOf(counts: Seq[Long]) =
    counts.zipWithIndex.map { case (c, i) =>
      (i.toLong, s"s$i", ("w " * c.toInt).trim)
    }.toDF("doc_id", "source", "text")

  private def run(counts: Seq[Long], num: Long, den: Long) =
    Mix.waterFill(docsOf(counts), num, den).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getInt(3), r.getLong(4))).toMap

  test("closed forms: all-fit, mid-kink, below-first-kink") {
    // total = 130. B = 260: everything fits, L = max count, no caps
    val all = run(Seq(10L, 20L, 100L), 2L, 1L)
    assert(all("s2") == ((100L, 100L, 0, 100L)))
    assert(all("s0") == ((10L, 10L, 0, 100L)))
    // B = 60 = 130·6/13: kink k=2 feasible (10+20+20 = 50 ≤ 60),
    // L = (60−30)/1 = 30 → allocs 10/20/30, Σ = 60 exactly
    val mid = run(Seq(10L, 20L, 100L), 6L, 13L)
    assert(mid("s0") == ((10L, 10L, 0, 30L)))
    assert(mid("s1") == ((20L, 20L, 0, 30L)))
    assert(mid("s2") == ((100L, 30L, 1, 30L)))
    // B = 15: below the first kink (3·10 = 30 > 15) → L = 15 div 3 = 5
    val low = run(Seq(10L, 20L, 100L), 15L, 130L)
    assert(low.values.forall(_._2 == 5L))
    assert(low.values.forall(_._4 == 5L))
  }

  test("maximality: Σmin(c, L) ≤ B < Σmin(c, L+1) whenever a cap binds " +
      "(random counts)") {
    val gen = Gen.nonEmptyListOf(Gen.choose(1L, 60L))
    val p = Prop.forAll(gen) { counts =>
      val total = counts.sum
      val b = total / 2
      val m = run(counts, 1L, 2L)
      val level = m.values.head._4
      val fill = counts.map(math.min(_, level)).sum
      val fillUp = counts.map(math.min(_, level + 1)).sum
      fill <= b && (fillUp > b || counts.forall(_ <= level))
    }
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(12).withWorkers(1), p)
    assert(res.passed, res.status.toString)
  }

  test("allocation accounting on real data (sf0.001)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val rows = Mix.waterFill(docs).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getInt(3), r.getLong(4)))
    val b = rows.map(_._1).sum / 2
    val alloc = rows.map(_._2).sum
    val capped = rows.count(_._3 == 1)
    assert(alloc <= b)
    // one more unit of level would overshoot (or nothing is capped)
    assert(capped == 0 || b - alloc < capped.toLong)
    assert(rows.forall { case (tok, al, cap, lvl) =>
      al == math.min(tok, lvl) && (cap == 1) == (tok > lvl) })
  }
}
