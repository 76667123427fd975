package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** As-of join vs a brute-force reference (per-left-row argmax over the
  * right table), plus physical-plan shape: one exchange per side, no
  * range-explode join, no window funnel.
  */
class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def refAsof(l: Seq[(String, Long, Long)],
      r: Seq[(String, Long, Long)]): Set[(String, Long, Long, Long)] =
    l.flatMap { case (k, ts, id) =>
      r.filter(x => x._1 == k && x._2 <= ts)
        .sortBy(x => (x._2, x._3)).lastOption
        .map(m => (k, ts, id, m._3))
    }.toSet

  test("matches brute-force reference on deterministic data") {
    val l = (0 until 200).map(i =>
      (s"u${i % 9}", (i * 13 % 97).toLong, i.toLong))
    val r = (0 until 150).map(i =>
      (s"u${i % 11}", (i * 29 % 89).toLong, (1000 + i).toLong))
    // make right unique on (k, ts) for determinism
    val rUniq = r.groupBy(x => (x._1, x._2)).map(_._2.maxBy(_._3)).toSeq
    val lDf = l.toDF("k", "ts", "lid").repartition(4)
    val rDf = rUniq.toDF("k", "ts", "rid").repartition(3)
    val out = AsofJoinApi.asofJoin(lDf, rDf, keys = Seq("k"), ts = "ts")
    // output: k, ts, lid, k, ts, rid — pick by position
    val got = out.collect().map(row =>
      (row.getString(0), row.getLong(1), row.getLong(2),
        row.getLong(5))).toSet
    assert(got == refAsof(l, rUniq.map(x => (x._1, x._2, x._3))))
  }

  test("plan shape: AsofJoinExec with one exchange per side, sorts planted by Catalyst") {
    val lDf = (0 until 50).map(i => (s"k$i", i.toLong, i.toLong))
      .toDF("k", "ts", "lid").repartition(4)
    val rDf = (0 until 50).map(i => (s"k$i", i.toLong, i.toLong))
      .toDF("k", "ts", "rid").repartition(3)
    val out = AsofJoinApi.asofJoin(lDf, rDf, Seq("k"), "ts")
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), plan)
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 2, plan)
    assert(!plan.toLowerCase.contains("cartesian"), plan)
    assert(out.count() == 50)
  }

  test("null keys and null timestamps never match") {
    val lDf = Seq((Some("a"), Some(5L), 1L), (None, Some(5L), 2L),
      (Some("a"), None, 3L)).toDF("k", "ts", "lid")
    val rDf = Seq((Some("a"), Some(1L), 10L), (None, Some(1L), 11L),
      (Some("a"), None, 12L)).toDF("k", "ts", "rid")
    val out = AsofJoinApi.asofJoin(lDf, rDf, Seq("k"), "ts")
    val got = out.collect().map(r => (r.getLong(2), r.getLong(5))).toSet
    assert(got == Set((1L, 10L)))
  }

  test("exact-timestamp match is inclusive (ts >= right ts)") {
    val lDf = Seq(("a", 5L, 1L)).toDF("k", "ts", "lid")
    val rDf = Seq(("a", 5L, 10L), ("a", 6L, 11L)).toDF("k", "ts", "rid")
    val got = AsofJoinApi.asofJoin(lDf, rDf, Seq("k"), "ts")
      .collect().map(r => r.getLong(5)).toSeq
    assert(got == Seq(10L))
  }

  test("left rows before any right row are dropped (inner semantics)") {
    val lDf = Seq(("a", 1L, 1L), ("a", 9L, 2L)).toDF("k", "ts", "lid")
    val rDf = Seq(("a", 5L, 10L)).toDF("k", "ts", "rid")
    val got = AsofJoinApi.asofJoin(lDf, rDf, Seq("k"), "ts")
      .collect().map(r => (r.getLong(2), r.getLong(5))).toSet
    assert(got == Set((2L, 10L)))
  }

  test("left-outer keeps unmatched left rows with null right columns") {
    val lDf = Seq(("a", 1L, 1L), ("a", 9L, 2L), ("c", 5L, 3L))
      .toDF("k", "ts", "lid")
    val rDf = Seq(("a", 5L, 10L)).toDF("k", "ts", "rid")
    val out = AsofJoinApi.asofJoin(lDf, rDf, Seq("k"), "ts", outer = true)
    val got = out.collect().map(r =>
      (r.getLong(2), if (r.isNullAt(5)) None else Some(r.getLong(5))))
      .toSet
    assert(got == Set((1L, None), (2L, Some(10L)), (3L, None)))
    // null LEFT key survives as unmatched in outer mode
    val lNull = Seq((Some("a"), 9L, 1L), (None, 9L, 2L))
      .toDF("k", "ts", "lid")
    val got2 = AsofJoinApi.asofJoin(lNull, rDf, Seq("k"), "ts",
        outer = true)
      .collect().map(r =>
        (r.getLong(2), if (r.isNullAt(5)) None else Some(r.getLong(5))))
      .toSet
    assert(got2 == Set((1L, Some(10L)), (2L, None)))
  }

  test("outer matches brute force on the random dataset") {
    val l = (0 until 120).map(i =>
      (s"u${i % 9}", (i * 13 % 97).toLong, i.toLong))
    val r = (0 until 60).map(i =>
      (s"u${i % 13}", (i * 29 % 89).toLong, (1000 + i).toLong))
    val rUniq = r.groupBy(x => (x._1, x._2)).map(_._2.maxBy(_._3)).toSeq
    val out = AsofJoinApi.asofJoin(l.toDF("k", "ts", "lid").repartition(4),
      rUniq.toDF("k", "ts", "rid").repartition(3), Seq("k"), "ts",
      outer = true)
    val got = out.collect().map(r => (r.getLong(2),
      if (r.isNullAt(5)) None else Some(r.getLong(5)))).toSet
    val inner = refAsof(l, rUniq).map(x => (x._3, Some(x._4)))
    val matched = inner.map(_._1)
    val want = inner ++ l.map(_._3).filterNot(matched).map(_ -> None)
    assert(got == want)
  }

  test("composite keys") {
    val lDf = Seq(("a", 1L, 9L, 1L), ("a", 2L, 9L, 2L), ("b", 1L, 9L, 3L))
      .toDF("k1", "k2", "ts", "lid")
    val rDf = Seq(("a", 1L, 4L, 10L), ("a", 2L, 5L, 11L), ("b", 2L, 1L, 12L))
      .toDF("k1", "k2", "ts", "rid")
    val got = AsofJoinApi.asofJoin(lDf, rDf, Seq("k1", "k2"), "ts")
      .collect().map(r => (r.getLong(3), r.getLong(7))).toSet
    assert(got == Set((1L, 10L), (2L, 11L)))
  }
}
