package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Scratch: total shuffle write bytes for dedup-tier runs (plan-audit
  * evidence for the hashed-token / shingle-array exchanges and the
  * narrow-row exact dedup; not part of the driver contract).
  */
object ShuffleAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    @volatile var bytes = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        bytes += s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
    })
    def audit(name: String)(f: => Long): Unit = {
      bytes = 0
      val n = f
      Thread.sleep(1000)
      println(s"AUDIT $name rows=$n shuffle_write_bytes=$bytes")
    }
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .localCheckpoint()
    audit("dd_jaccard")(graft.dedup.Dedup.jaccardPairs(docs, 0.7).count())
    audit("dd_minhash_verify") {
      val corpus = graft.queries.DataQueries
        .minhashCorpus(spark, "/root/testdata/sf0.1").localCheckpoint()
      Thread.sleep(500); bytes = 0
      graft.dedup.Dedup.minHashCandidates(corpus, 3,
        graft.dedup.Dedup.MinHashParams(64, 16, 42L), 0.8).count()
    }
    // exact dedup audits under its REAL plan (survivor ids broadcast;
    // the -1 thresholds above exist to expose join shuffles in the
    // jaccard/minhash tiers, but for exact they'd force the middle
    // regime the bucketed layout removes)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "10485760")
    audit("dd_exact")(graft.dedup.Dedup.exact(docs).count())
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    // control: the pre-round-5 window formulation (full rows through the
    // sha2-keyed exchange) — kept here only to quantify the delta
    audit("dd_exact_window_control") {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      val w = Window.partitionBy(sha2(col("text"), 256)).orderBy(col("doc_id"))
      docs.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).drop("rn").count()
    }
    spark.stop()
  }
}
