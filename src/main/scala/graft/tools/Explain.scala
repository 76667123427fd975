package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan-inspection helper: prints formatted physical plans for
  * representative queries so pushdown / broadcast / codegen / pruning can
  * be reviewed (and regressions spotted) without the UI.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val targets = if (args.nonEmpty) args.toSeq
      else Seq("q6_filter", "q2_join_agg", "kg_mentions", "dd_exact", "ann_top1")
    for (name <- targets; fn <- graft.SparkEntry.queries.get(name)) {
      println(s"\n===== $name =====")
      fn(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
