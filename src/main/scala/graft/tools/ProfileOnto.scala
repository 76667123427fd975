package graft.tools
import org.apache.spark.sql.SparkSession

/** Scratch profiler: first-touch latency of the shared ontology
  * extraction (not part of the driver contract). */
object ProfileOnto {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    spark.read.parquet(s"$dir/lineitem.parquet").count()
    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"PROF $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    time("onto_integrity 1st")(graft.queries.OntologyQueries.ontoIntegrity(spark, dir).count())
    time("onto_integrity 2nd")(graft.queries.OntologyQueries.ontoIntegrity(spark, dir).count())
    for (q <- Seq("onto_classes", "onto_parents", "onto_props", "onto_rels",
        "onto_skipped", "onto_identifiers", "onto_topo", "onto_limits", "onto_diff"))
      time(q)(graft.queries.OntologyQueries.queries(q)(spark, dir).count())
    spark.stop()
  }
}
