package graft.canon

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** AQE skew-join handling (the north rule names "salted broadcast joins
  * and AQE skew-join handling for head entities"): [[Salting]] covers
  * the shapes AQE cannot fix (hot aggregation keys, repeated map
  * joins); this spec pins that the runtime half of the story actually
  * engages — a head-entity-skewed sort-merge join gets its hot
  * partition SPLIT by AQE (isSkewJoin), with results identical to the
  * unsplit join.
  */
class AqeSkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits the hot partition of a head-entity join") {
    // 50k rows of one hot key + a long tail, joined against a map side
    // too big to broadcast under the tightened thresholds
    val big = spark.range(50000).select(lit("hot").as("k"), col("id"))
      .union(spark.range(5000).select(concat(lit("t"), col("id") % 500).as("k"),
        col("id")))
    val small = spark.range(500).select(concat(lit("t"), col("id")).as("k"),
        col("id").as("v"))
      .union(Seq(("hot", -1L)).toDF("k", "v"))

    val conf = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val saved = conf.keys.map(k => k -> spark.conf.getOption(k)).toMap
    conf.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val joined = big.join(small, Seq("k"))
      // collect() executes joined's OWN QueryExecution (count() would
      // plan a separate aggregate query and leave this plan unfinalized)
      val n = joined.collect().length
      assert(n == 50000 + 5000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isSkewJoin=true") || plan.contains("skew=true"),
        s"AQE did not mark the join skewed:\n${plan.take(2000)}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
