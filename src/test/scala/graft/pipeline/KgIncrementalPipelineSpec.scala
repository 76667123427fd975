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
    // the delta chain resolves COMPONENTS through the legacy base too —
    // rebuilt from the raw triples phase, never from canonical triples
    // (whose co-occur edges are self-loops; round-4 pass-3 review)
    val mc = merged.components.collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val fc = full.components.collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(mc == fc)
    assert(merged.components.count() == full.components.count())
  }

  test("delta materialization: adds/removes are batch-sized and chained " +
       "merges resolve to the full-corpus result") {
    import java.nio.file.{Files => JF, Paths}
    // three thirds, folded through two merges
    def thirdDir(k: Int): String = {
      val dir = Files.createTempDirectory(s"third$k").toString
      spark.read.parquet(s"$sfDir/documents.parquet")
        .filter(col("doc_id") % 3 === k)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      dir
    }
    val (d0, d1, d2) = (thirdDir(0), thirdDir(1), thirdDir(2))
    val out0 = Files.createTempDirectory("dm0").toString
    val out1 = Files.createTempDirectory("dm1").toString
    val out2 = Files.createTempDirectory("dm2").toString
    KgPipeline.run(spark, d0, out0)
    val m1 = KgPipeline.merge(spark, out0, d1, out1)
    val m2 = KgPipeline.merge(spark, out1, d2, out2) // chains through m1
    // both merges materialized as deltas (manifest present, adds dir
    // committed, NO full canonical rewrite)
    for (o <- Seq(out1, out2)) {
      assert(JF.exists(Paths.get(o, "merge_manifest.json")))
      assert(JF.exists(Paths.get(o, "phase=canonical_adds", "_SUCCESS")))
      assert(!JF.exists(Paths.get(o, "phase=canonical", "_SUCCESS")))
    }
    // adds/removes are batch-sized, not corpus-sized
    val batchTriples = m2.triples.count()
    val adds = spark.read.parquet(s"$out2/phase=canonical_adds").count()
    val removes = spark.read.parquet(s"$out2/phase=canonical_removes").count()
    assert(adds <= batchTriples + removes,
      s"adds $adds not batch-shaped (batch $batchTriples, removes $removes)")
    // resolved chain == full-corpus run
    val outFull = Files.createTempDirectory("dmFull").toString
    val full = KgPipeline.run(spark, sfDir, outFull)
    assert(tripleSet(m2.canonicalTriples) == tripleSet(full.canonicalTriples))
    def comps(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(comps(m2.components) == comps(full.components))
    // row-count equality too: the Map collapse above cannot see a
    // duplicate-node row with a conflicting label in the resolved chain
    assert(m2.components.count() == full.components.count())
    // a third merge with compaction forced writes a full snapshot and
    // still resolves identically
    val d3 = Files.createTempDirectory("third3").toString
    spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") % 3 === 0) // re-merge slice 0 (idempotent set)
      .write.mode("overwrite").parquet(s"$d3/documents.parquet")
    val out3 = Files.createTempDirectory("dm3").toString
    spark.conf.set("spark.graft.merge.compactEvery", "1")
    val m3 =
      try KgPipeline.merge(spark, out2, d3, out3)
      finally spark.conf.unset("spark.graft.merge.compactEvery")
    assert(JF.exists(Paths.get(out3, "phase=canonical", "_SUCCESS")))
    assert(!JF.exists(Paths.get(out3, "merge_manifest.json")))
    assert(tripleSet(m3.canonicalTriples) == tripleSet(full.canonicalTriples))
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
