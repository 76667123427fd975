package graft.canon

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

/** Bucketing for co-located joins (the brief's "repartition()/bucketing
  * for co-located joins"): two tables bucketed on the join key join
  * WITHOUT any shuffle exchange — the plan shape a nightly 100 TB
  * docs ⋈ mentions join relies on (both sides pre-bucketed by doc_id,
  * every join is map-side co-located). This spec pins that Spark
  * actually elides the exchanges for our table layout, and that the
  * same join over plain (unbucketed) parquet shuffles both sides.
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  private def shuffles(df: org.apache.spark.sql.DataFrame): Int = {
    df.collect() // execute so AQE finalizes the plan
    // under AQE, materialized exchanges appear as ShuffleQueryStageExec
    // LEAVES (their exchange is in `plan`, not `children`) — walk both
    import org.apache.spark.sql.execution.adaptive.{
      AdaptiveSparkPlanExec, QueryStageExec, ShuffleQueryStageExec}
    def count(p: org.apache.spark.sql.execution.SparkPlan): Int = p match {
      case q: QueryStageExec => // Shuffle/Broadcast/Result stages are
        // LEAVES whose subtree hangs off `plan`, not `children`
        (q match { case _: ShuffleQueryStageExec => 1; case _ => 0 }) +
          count(q.plan)
      case a: AdaptiveSparkPlanExec => count(a.executedPlan)
      case e: ShuffleExchangeLike => 1 + e.children.map(count).sum
      case other => other.children.map(count).sum
    }
    count(df.queryExecution.executedPlan)
  }

  test("bucketed doc tables join with zero shuffle exchanges") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "lang", "source")
    val mentions = graft.extract.MentionScan.mentionsIdx(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"),
      graft.extract.Gazetteer(graft.extract.Gazetteer.DefaultEntities))

    // broadcast would hide the co-location; force the join strategies
    // a corpus-scale pair would use
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      spark.sql("DROP TABLE IF EXISTS b_docs")
      spark.sql("DROP TABLE IF EXISTS b_mentions")
      docs.write.bucketBy(4, "doc_id").sortBy("doc_id")
        .mode("overwrite").saveAsTable("b_docs")
      mentions.write.bucketBy(4, "doc_id").sortBy("doc_id")
        .mode("overwrite").saveAsTable("b_mentions")

      val bucketed = spark.table("b_docs")
        .join(spark.table("b_mentions"), Seq("doc_id"))
      val plain = docs.join(mentions, Seq("doc_id"))

      assert(shuffles(bucketed) == 0,
        "bucketed join must be co-located (no exchanges)")
      assert(shuffles(plain) >= 2,
        "control: the unbucketed join shuffles both sides")
      // identical results either way
      assert(bucketed.count() == plain.count())
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_docs")
      spark.sql("DROP TABLE IF EXISTS b_mentions")
    }
  }
}
