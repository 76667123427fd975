package graft.mix

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** DomainCap: window-equivalence on random corpora, bounded-buffer
  * algebra laws (merge associative/commutative, bounded at the cap),
  * and the plan contract — partial (map-side) aggregation, no Window
  * exchange of corpus rows.
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

  test("capKeys ≡ window row_number on random corpora") {
    val gen = Gen.listOfN(120, for {
      id <- Gen.choose(0L, 400L)
      src <- Gen.oneOf("a", "b", "c")
      nc <- Gen.choose(0L, 30L)
    } yield (id, src, nc)).map(_.distinctBy(_._1))
    check(Prop.forAll(gen, Gen.choose(1, 7)) { (rows, n) =>
      val df = rows.toDF("doc_id", "source", "n_chars")
      val got = capKeys(df, n)
        .as[(String, Long, Long, Long)].collect().toSet
      got == windowRef(rows, n)
    })
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

  test("plan: partial ObjectHashAggregate, no Window, only key columns") {
    val docs = (0L until 200L)
      .map(i => (i, s"src${i % 5}", i % 17, s"text-$i"))
      .toDF("doc_id", "source", "n_chars", "text")
    val plan = capKeys(docs, 4).queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), s"no object agg in:\n$plan")
    assert(!plan.contains("Window"), s"window leaked into:\n$plan")
    // column pruning: the text column must not survive into the plan
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
