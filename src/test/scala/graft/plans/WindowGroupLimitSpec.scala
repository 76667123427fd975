package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.expressions.{Window => W}
import org.apache.spark.sql.functions._

/** Pins the plan shape that makes declarative top-k-per-key scale on
  * Spark 4 WITHOUT a custom operator: `Filter(row_number() <= k)` over a
  * window triggers the optimizer's InsertWindowGroupLimits (SPARK-37099)
  * — a PARTIAL WindowGroupLimit truncates every map partition to k rows
  * per key BEFORE the exchange, and a Final one finishes after it, so
  * the shuffle carries ≤ k·partitions rows per key instead of the
  * corpus. A custom top-k stack was prototyped this round and
  * deliberately dropped when this builtin proved to cover the pattern
  * (brief's escalation order: compose existing ops first) — this spec
  * is the regression guard that the engine's q3-shaped queries keep
  * getting the bounded-exchange plan.
  */
class WindowGroupLimitSpec extends SparkSpec {
  import spark.implicits._

  test("rank filter plans partial+final WindowGroupLimit around one exchange") {
    val df = (0 until 500)
      .map(i => (s"k${i % 7}", (i * 37 % 101).toLong, i.toLong))
      .toDF("key", "score", "id").repartition(5)
    val out = df.withColumn("rn", row_number().over(
        W.partitionBy("key").orderBy(col("score").desc, col("id"))))
      .filter(col("rn") <= 3)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit") &&
      plan.contains("Partial") && plan.contains("Final"), plan)
    // Partial must sit BELOW the exchange (map-side truncation)
    val partialIdx = plan.indexOf("Partial")
    val exchangeIdx = plan.indexOf("Exchange hashpartitioning")
    assert(exchangeIdx >= 0 && partialIdx > exchangeIdx,
      s"partial=$partialIdx exchange=$exchangeIdx\n$plan")
    assert(out.count() == 21)
  }
}
