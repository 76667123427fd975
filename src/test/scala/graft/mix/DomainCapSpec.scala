package graft.mix

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** DomainCap: window-equivalence on random corpora (both the
  * production window path and the Aggregator alternative), bounded-
  * buffer algebra laws (merge associative/commutative, bounded at the
  * cap), and the plan contracts — the window path MUST carry Spark's
  * WindowGroupLimit map-side pre-truncation (losing it reverts the cap
  * to a full corpus-row shuffle at the domain key, where Zipf skew is
  * the norm), the aggregator path must be a partial ObjectHashAggregate
  * with no Window node; both scans pruned to the three key columns.
  */
class DomainCapSpec extends SparkSpec {
  import spark.implicits._
  import DomainCap._

  private def check(p: Prop, n: Int = 25): Unit = {
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(n).withWorkers(1), p)
    assert(res.passed, res.status.toString)
  }

  private def windowRef(rows: Seq[(Long, String, Long)], n: Int)
      : Set[(String, Long, Long, Long)] =
    rows.groupBy(_._2).flatMap { case (src, rs) =>
      rs.sortBy(r => (-r._3, r._1)).take(n).zipWithIndex.map {
        case ((id, _, nc), i) => (src, id, nc, (i + 1).toLong)
      }
    }.toSet

  test("capKeys and capKeysAgg ≡ reference top-n on random corpora") {
    val gen = Gen.listOfN(120, for {
      id <- Gen.choose(0L, 400L)
      src <- Gen.oneOf("a", "b", "c")
      nc <- Gen.choose(0L, 30L)
    } yield (id, src, nc)).map(_.distinctBy(_._1))
    check(Prop.forAll(gen, Gen.choose(1, 7)) { (rows, n) =>
      val df = rows.toDF("doc_id", "source", "n_chars")
      val ref = windowRef(rows, n)
      val win = capKeys(df, n)
        .as[(String, Long, Long, Long)].collect().toSet
      val agg = capKeysAgg(df, n)
        .as[(String, Long, Long, Long)].collect().toSet
      win == ref && agg == ref
    }, n = 15)
  }

  test("merge is associative, commutative, bounded at the cap") {
    val agg = new TopN(3)
    val keys = Gen.listOf(for {
      nc <- Gen.choose(0L, 5L); id <- Gen.choose(0L, 50L)
    } yield DocKey(nc, id))
    check(Prop.forAll(keys, keys, keys) { (a, b, c) =>
      def buf(xs: Seq[DocKey]) = xs.foldLeft(agg.zero)(agg.reduce)
      val (ba, bb, bc) = (buf(a), buf(b), buf(c))
      agg.merge(agg.merge(ba, bb), bc) == agg.merge(ba, agg.merge(bb, bc)) &&
        agg.merge(ba, bb) == agg.merge(bb, ba) &&
        agg.merge(ba, bb).items.length <= 3 &&
        agg.merge(ba, agg.zero) == ba
    })
  }

  private def sampleDocs = (0L until 200L)
    .map(i => (i, s"src${i % 5}", i % 17, s"text-$i"))
    .toDF("doc_id", "source", "n_chars", "text")

  test("window plan: WindowGroupLimit present, text pruned") {
    val plan = capKeys(sampleDocs, 4).queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rank-limit pushdown missing — the cap would shuffle every " +
        s"corpus row to its domain's reducer:\n$plan")
    assert(!plan.contains("text#"), s"text column survived pruning:\n$plan")
  }

  test("aggregator plan: partial ObjectHashAggregate, no Window, pruned") {
    val plan = capKeysAgg(sampleDocs, 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), s"no object agg in:\n$plan")
    assert(!plan.contains("Window"), s"window leaked into:\n$plan")
    assert(!plan.contains("text#"), s"text column survived pruning:\n$plan")
  }

  test("cap returns full survivor rows via semi-join") {
    val docs = (0L until 60L)
      .map(i => (i, s"s${i % 3}", 100L - i, s"body $i"))
      .toDF("doc_id", "source", "n_chars", "text")
    val out = cap(docs, 2).select("doc_id").as[Long].collect().toSet
    // per source s0/s1/s2: two lowest ids have the largest n_chars
    assert(out == Set(0L, 1L, 2L, 3L, 4L, 5L))
  }
}
