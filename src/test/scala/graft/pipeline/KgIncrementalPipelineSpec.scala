package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Resumable incremental ingestion: KgPipeline.merge ≡ a fresh full run
  * over the union corpus, with the same kill/resume contract as run().
  */
class KgIncrementalPipelineSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  /** Write a documents-only sf dir holding the given parity slice. */
  private def halfDir(parity: Int): String = {
    val dir = Files.createTempDirectory(s"half$parity").toString
    spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") % 2 === parity)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def tripleSet(df: org.apache.spark.sql.DataFrame): Set[(String, String, String)] =
    df.select("s", "p", "o").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet

  test("merge of a second batch equals the full-corpus pipeline run") {
    val (a, b) = (halfDir(0), halfDir(1))
    val outA = Files.createTempDirectory("outA").toString
    val outM = Files.createTempDirectory("outM").toString
    val outFull = Files.createTempDirectory("outFull").toString

    KgPipeline.run(spark, a, outA)
    val merged = KgPipeline.merge(spark, outA, b, outM)
    val full = KgPipeline.run(spark, sfDir, outFull)

    val fullT = tripleSet(full.canonicalTriples)
    assert(fullT.nonEmpty)
    assert(tripleSet(merged.canonicalTriples) == fullT)
    // component snapshots agree too
    def comps(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(comps(merged.components) == comps(full.components))
  }

  test("pre-components output dirs (old layout) still resume and merge") {
    import java.nio.file.{Files => JF, Paths}
    import java.util.Comparator
    val (a, b) = (halfDir(0), halfDir(1))
    val outA = Files.createTempDirectory("outA3").toString
    KgPipeline.run(spark, a, outA)
    // simulate an output written before the components snapshot existed
    val compDir = Paths.get(s"$outA/phase=components")
    JF.walk(compDir).sorted(Comparator.reverseOrder[java.nio.file.Path]())
      .forEach(p => JF.delete(p))
    // resume rebuilds + commits the snapshot instead of crashing
    val resumed = KgPipeline.run(spark, a, outA)
    assert(resumed.components.count() > 0)
    assert(JF.exists(compDir.resolve("_SUCCESS")))
    // merge against an old-layout prev dir works too
    JF.walk(compDir).sorted(Comparator.reverseOrder[java.nio.file.Path]())
      .forEach(p => JF.delete(p))
    val outM = Files.createTempDirectory("outM3").toString
    val merged = KgPipeline.merge(spark, outA, b, outM)
    val outFull = Files.createTempDirectory("outFull3").toString
    val full = KgPipeline.run(spark, sfDir, outFull)
    assert(tripleSet(merged.canonicalTriples) == tripleSet(full.canonicalTriples))
  }

  test("a merge killed mid-batch resumes to the identical result") {
    val (a, b) = (halfDir(0), halfDir(1))
    val outA = Files.createTempDirectory("outA2").toString
    val outM = Files.createTempDirectory("outM2").toString
    KgPipeline.run(spark, a, outA)

    intercept[RuntimeException] {
      KgPipeline.merge(spark, outA, b, outM,
        failAfterPhase = Some("mentions"))
    }
    // batch pages+mentions committed, rest missing; resume completes
    val resumed = KgPipeline.merge(spark, outA, b, outM)

    val outFull = Files.createTempDirectory("outFull2").toString
    val full = KgPipeline.run(spark, sfDir, outFull)
    assert(tripleSet(resumed.canonicalTriples) == tripleSet(full.canonicalTriples))
  }
}
