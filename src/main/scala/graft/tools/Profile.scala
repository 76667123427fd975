package graft.tools

import org.apache.spark.sql.SparkSession
import graft.ontology._

/** Scratch profiler for operator stage costs (not part of the driver
  * contract).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"PROF $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val t = FixtureOntology.combined(spark, dir).localCheckpoint()
    time("combined count")(t.count())
    val cls = Extract.classesWithIds(t)
    time("classesWithIds")(cls.count())
    time("parentResolution")(Extract.parentResolution(t, cls).count())
    time("dataProperties")(Extract.dataProperties(t).count())
    time("propertyAssignment")(Extract.propertyAssignment(t, cls).count())
    time("objectProperties") {
      val dp = Extract.dataProperties(t)
      Extract.objectProperties(t, dp).count()
    }
    time("relationships") {
      val (r, s) = Extract.relationships(t, cls); r.count(); s.count()
    }
    time("entityTypes") {
      val (e, r, s) = Extract.entityTypes(t); e.count(); r.count(); s.count()
    }
    time("entityTypes again") {
      val (e, _, _) = Extract.entityTypes(t); e.count()
    }
    time("preflight") {
      graft.shape.Preflight.validate(FixtureOntology.df(spark)).count()
    }
    time("preflight again") {
      graft.shape.Preflight.validate(FixtureOntology.df(spark)).count()
    }
    spark.stop()
  }
}
