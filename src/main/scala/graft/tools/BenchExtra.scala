package graft.tools

import org.apache.spark.sql.SparkSession

/** Extra benchmark main for optimization work (round 6) — NOT part of the
  * driver contract ([[graft.Bench]] stays frozen). Times a selected subset
  * of declared queries in isolation with the noop sink (guide §1.4: every
  * column of every row computed, nothing collected, write cost excluded)
  * and optionally dumps `.explain("formatted")` per query to a directory.
  *
  * Usage:
  *   SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *     sbt "runMain graft.tools.BenchExtra q1,q2,... [plansDir]"
  * With no query list, runs nothing and prints the available names.
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val all = graft.SparkEntry.queries
    if (args.isEmpty) {
      println(all.keys.toSeq.sorted.mkString(","))
      spark.stop(); return
    }
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val plansDir = if (args.length > 1) Some(args(1)) else None
    plansDir.foreach(d => new java.io.File(d).mkdirs())

    // same session warmup as Bench
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    all.get("q1_agg").foreach(f => f(spark, sfDir).count())

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val out = names.flatMap { n =>
      all.get(n) match {
        case None => println(s"!! unknown query: $n"); None
        case Some(fn) =>
          spark.sparkContext.setJobDescription(n)
          plansDir.foreach { d =>
            val df = fn(spark, sfDir)
            val plan = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            val p = java.nio.file.Paths.get(d, s"$n.txt")
            java.nio.file.Files.write(p,
              plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          }
          val runs = (1 to 2).map { _ =>
            time(fn(spark, sfDir).write.format("noop")
              .mode("overwrite").save())
          }
          spark.sparkContext.setJobDescription(null)
          println(f"$n%-24s noop min ${runs.min}%8.3f s  runs ${runs.map(r => f"$r%.3f").mkString(" ")}")
          Some(n -> runs.min)
      }
    }
    println("{" + out.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString(",") + "}")
    spark.stop()
  }
}
