package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM-wide session; suites use
  * `lazy val` so Spark starts only when a Spark-touching test runs).
  */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", {
        // temp warehouse for bucketed-table specs, removed on JVM exit
        // (one per test JVM; without the hook every run leaves litter)
        val dir = java.nio.file.Files.createTempDirectory("graft-warehouse")
        sys.addShutdownHook {
          import java.nio.file.{Files => JF}
          import java.util.Comparator
          if (JF.exists(dir))
            JF.walk(dir).sorted(Comparator.reverseOrder[java.nio.file.Path]())
              .forEach(p => JF.deleteIfExists(p))
        }
        dir.toString
      })
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
}
