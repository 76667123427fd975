package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Scratch: total shuffle write bytes for one dd_jaccard run (plan-audit
  * evidence for the hashed-token join; not part of the driver contract).
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
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val n = graft.dedup.Dedup.jaccardPairs(docs, 0.7).count()
    Thread.sleep(1000)
    println(s"AUDIT pairs=$n shuffle_write_bytes=$bytes")
    spark.stop()
  }
}
