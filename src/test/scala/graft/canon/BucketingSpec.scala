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

  /** Execute + count real shuffles in the final AQE plan, and return
    * the rows. Under AQE, materialized exchanges appear as
    * ShuffleQueryStageExec LEAVES whose wrapped exchange hangs off
    * `plan` — count the stage once and skip its own exchange node.
    */
  private def runAndCountShuffles(df: org.apache.spark.sql.DataFrame)
      : (Array[org.apache.spark.sql.Row], Int) = {
    val rows = df.collect() // executes df's own QueryExecution
    import org.apache.spark.sql.execution.adaptive.{
      AdaptiveSparkPlanExec, QueryStageExec, ShuffleQueryStageExec}
    def count(p: org.apache.spark.sql.execution.SparkPlan): Int = p match {
      case q: ShuffleQueryStageExec => // 1 per stage; q.plan IS the
        // exchange — recurse below it or each shuffle counts twice
        1 + q.plan.children.map(count).sum
      case q: QueryStageExec => count(q.plan)
      case a: AdaptiveSparkPlanExec => count(a.executedPlan)
      case e: ShuffleExchangeLike => 1 + e.children.map(count).sum
      case other => other.children.map(count).sum
    }
    (rows, count(df.queryExecution.executedPlan))
  }

  test("bucketed doc tables join with zero shuffle exchanges") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "lang", "source")
    val mentions = graft.extract.MentionScan.mentionsIdx(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"),
      graft.extract.Gazetteer(graft.extract.Gazetteer.DefaultEntities))

    // broadcast would hide the co-location; force the join strategies a
    // corpus-scale pair would use (save/restore, not blind unset)
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> spark.conf.getOption(k)).toMap
    keys.foreach(spark.conf.set(_, "-1"))
    try {
      spark.sql("DROP TABLE IF EXISTS b_docs")
      spark.sql("DROP TABLE IF EXISTS b_mentions")
      docs.write.bucketBy(4, "doc_id").sortBy("doc_id")
        .mode("overwrite").saveAsTable("b_docs")
      mentions.write.bucketBy(4, "doc_id").sortBy("doc_id")
        .mode("overwrite").saveAsTable("b_mentions")

      val cols = Seq("doc_id", "lang", "source", "e", "tf").map(col)
      val (bRows, bShuffles) = runAndCountShuffles(
        spark.table("b_docs").join(spark.table("b_mentions"), Seq("doc_id"))
          .select(cols: _*))
      val (pRows, pShuffles) = runAndCountShuffles(
        docs.join(mentions, Seq("doc_id")).select(cols: _*))

      assert(bShuffles == 0,
        "bucketed join must be co-located (no exchanges)")
      assert(pShuffles >= 2,
        "control: the unbucketed join shuffles both sides")
      // identical row CONTENT either way (not just cardinality)
      assert(bRows.map(_.toString).sorted.toSeq ==
        pRows.map(_.toString).sorted.toSeq)
      assert(bRows.nonEmpty)
    } finally {
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
      spark.sql("DROP TABLE IF EXISTS b_docs")
      spark.sql("DROP TABLE IF EXISTS b_mentions")
    }
  }
}
