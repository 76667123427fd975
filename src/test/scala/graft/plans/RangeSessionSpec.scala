package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec, ShuffleQueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._
import java.sql.Timestamp
import java.time.Instant

/** Range (interval) join and gap sessionization vs brute-force
  * references, plus the plan properties that make them scale:
  * the range join must never plan a cartesian/BNLJ, and
  * sessionization must cost exactly one shuffle end-to-end.
  */
class RangeSessionSpec extends SparkSpec {
  import spark.implicits._

  private def ts(us: Long): Timestamp =
    Timestamp.from(Instant.ofEpochSecond(1700000000L + us / 1000000L,
      (us % 1000000L) * 1000L))

  /** Count materialized shuffle exchanges after executing the frame. */
  private def shuffleCount(df: DataFrame): Int = {
    df.collect()
    var n = 0
    def walk(p: SparkPlan): Unit = p match {
      case q: ShuffleQueryStageExec => n += 1; q.plan.children.foreach(walk)
      case q: QueryStageExec => walk(q.plan)
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case e: ShuffleExchangeLike => n += 1; e.children.foreach(walk)
      case other => other.children.foreach(walk)
    }
    walk(df.queryExecution.executedPlan)
    n
  }

  // deterministic pseudo-random microsecond offsets (sub-second parts
  // exercise the exact BETWEEN filter past the 1 s bucket granularity)
  private def us(i: Int, a: Long, m: Long): Long =
    ((i * a + 17L) % m) * 1000000L + (i * 997L % 1000000L)

  private val probes = (0 until 300).map(i =>
    (i.toLong, ts(us(i, 7919L, 5000L))))
  private val ivals = (0 until 80).map { i =>
    val s = us(i, 104729L, 5000L)
    val len = (i % 5).toLong * 900L * 1000000L // 0 s .. 1 h, incl. empty
    (1000L + i, ts(s), ts(s + len))
  }

  private def refPairs: Set[(Long, Long)] =
    (for {
      (pid, pts) <- probes
      (iid, s, e) <- ivals
      if !pts.before(s) && !pts.after(e)
    } yield (pid, iid)).toSet

  test("interval join matches brute force, incl. inclusive endpoints") {
    val p = probes.toDF("pid", "p_ts").repartition(5)
    val iv = ivals.toDF("iid", "s", "e").repartition(3)
    val got = RangeJoinApi.intervalJoin(p, iv, "p_ts", "s", "e",
        bucketSeconds = 600L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got == refPairs)
    assert(got.nonEmpty)
  }

  test("interval join result is invariant to bucket width") {
    val p = probes.toDF("pid", "p_ts")
    val iv = ivals.toDF("iid", "s", "e")
    for (w <- Seq(60L, 3600L, 86400L)) {
      val got = RangeJoinApi.intervalJoin(p, iv, "p_ts", "s", "e",
          bucketSeconds = w)
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      assert(got == refPairs, s"bucketSeconds=$w")
    }
  }

  test("interval join plans an equi-join — no cartesian/BNLJ; each pair met once") {
    val p = probes.toDF("pid", "p_ts")
    val iv = ivals.toDF("iid", "s", "e")
    val out = RangeJoinApi.intervalJoin(p, iv, "p_ts", "s", "e",
      bucketSeconds = 600L)
    val rows = out.select("pid", "iid").collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    // probe lands in exactly one bucket => no post-join dedup needed
    assert(rows.length == rows.map(r => (r.getLong(0), r.getLong(1)))
      .toSet.size)
  }

  test("keyed interval join restricts to the equi-key") {
    val p = Seq((1L, "a", ts(0L)), (2L, "b", ts(0L)))
      .toDF("pid", "k", "p_ts")
    val iv = Seq((10L, "a", ts(-1000000L), ts(1000000L)))
      .toDF("iid", "k", "s", "e")
    val got = RangeJoinApi.intervalJoin(p, iv, "p_ts", "s", "e",
        keys = Seq("k"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L)))
  }

  private def refSessions(ev: Seq[(Long, Long, Long)], gapUs: Long)
      : Set[(Long, Long, Long)] = // (user, session_idx, n_events)
    ev.groupBy(_._1).toSeq.flatMap { case (u, rows) =>
      val sorted = rows.sortBy(r => (r._2, r._3))
      var idx = 0L
      var prev = Long.MinValue
      val counts = scala.collection.mutable.Map[Long, Long]()
      for ((_, t, _) <- sorted) {
        if (prev == Long.MinValue || t - prev > gapUs) idx += 1
        counts(idx) = counts.getOrElse(idx, 0L) + 1
        prev = t
      }
      counts.map { case (i, n) => (u, i, n) }
    }.toSet

  test("sessionize matches brute force on deterministic data") {
    val ev = (0 until 500).map { i =>
      val u = (i % 13).toLong
      val t = ((i * 6151L) % 3000L) * 1000000L + (i * 131L % 1000000L)
      (u, t, i.toLong)
    }
    val df = ev.map { case (u, t, id) => (u, ts(t), id) }
      .toDF("user_id", "ts", "event_id").repartition(5)
    val got = Sessionize.sessions(df, "user_id", "ts", "event_id", 300L)
      .select("user_id", "session_idx", "n_events")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == refSessions(ev, 300L * 1000000L))
  }

  test("gap boundary: exactly gapSeconds stays in-session; +1 us splits") {
    val df = Seq(
      (1L, ts(0L), 1L),
      (1L, ts(60L * 1000000L), 2L),      // == gap -> same session
      (1L, ts(120L * 1000000L + 1L), 3L) // gap + 1 us -> new session
    ).toDF("user_id", "ts", "event_id")
    val got = Sessionize.sessions(df, "user_id", "ts", "event_id", 60L)
      .select("session_idx", "n_events")
      .as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L), (2L, 1L)))
  }

  test("sessionize end-to-end costs exactly one shuffle") {
    val df = (0 until 200).map(i =>
        ((i % 7).toLong, ts(i * 1000000L), i.toLong))
      .toDF("user_id", "ts", "event_id")
    val sess = Sessionize.sessions(df, "user_id", "ts", "event_id", 30L)
    // window's hashpartitioning(user_id) satisfies the (user_id,
    // session_idx) groupBy's clustered distribution — no second exchange
    assert(shuffleCount(sess) == 1,
      sess.queryExecution.executedPlan.toString)
  }
}
