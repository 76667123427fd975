package graft.pipeline

import graft.SparkSpec
import java.nio.file.{Files, Paths}
import java.util.Comparator

class KgPipelineSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def freshDir(): String = {
    val d = Files.createTempDirectory("kgpipe").toString
    d
  }

  private def rm(dir: String): Unit = {
    val p = Paths.get(dir)
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(f => Files.delete(f))
  }

  test("end-to-end: byte-identical invariant holds, triples non-empty, lineage written") {
    val out = freshDir()
    try {
      val res = KgPipeline.run(spark, sfDir, out)
      assert(res.invariantViolations == 0)
      assert(res.triples.count() > 0)
      assert(res.canonicalTriples.count() > 0)
      // per-phase lineage exists with positive row counts
      for (phase <- Seq("pages", "mentions", "triples", "canonical")) {
        val lin = spark.read.parquet(s"$out/lineage/phase=$phase")
        assert(lin.agg(org.apache.spark.sql.functions.sum("rows")).head.getLong(0) > 0,
          s"lineage for $phase")
      }
    } finally rm(out)
  }

  test("kill/resume: restart after failpoint completes without recomputing done phases") {
    val out = freshDir()
    try {
      intercept[RuntimeException] {
        KgPipeline.run(spark, sfDir, out, failAfterPhase = Some("mentions"))
      }
      assert(Files.exists(Paths.get(s"$out/phase=mentions/_SUCCESS")))
      assert(!Files.exists(Paths.get(s"$out/phase=canonical/_SUCCESS")))
      val mentionsMtime = Files.getLastModifiedTime(
        Paths.get(s"$out/phase=mentions/_SUCCESS"))

      // resume: completes remaining phases, does not rewrite finished ones
      val res = KgPipeline.run(spark, sfDir, out)
      assert(Files.exists(Paths.get(s"$out/phase=canonical/_SUCCESS")))
      assert(Files.getLastModifiedTime(
        Paths.get(s"$out/phase=mentions/_SUCCESS")) == mentionsMtime,
        "mentions phase must not be recomputed on resume")

      // resumed output identical to a fresh uninterrupted run
      val fresh = freshDir()
      try {
        val res2 = KgPipeline.run(spark, sfDir, fresh)
        val a = res.canonicalTriples.collect().map(_.toString).sorted
        val b = res2.canonicalTriples.collect().map(_.toString).sorted
        assert(a.sameElements(b), "resumed run differs from fresh run")
      } finally rm(fresh)
    } finally rm(out)
  }

  test("canonicalization merges co-mentioned entities into one component") {
    val out = freshDir()
    try {
      val res = KgPipeline.run(spark, sfDir, out)
      import org.apache.spark.sql.functions._
      // all canonical mention objects collapse to component representatives
      val objs = res.canonicalTriples
        .filter(col("p") === graft.extract.MentionScan.MentionsPred)
        .select("o").distinct().collect().map(_.getString(0)).toSet
      val rawEnts = graft.extract.Gazetteer.DefaultEntities.map("urn:ent:" + _).toSet
      assert(objs.subsetOf(rawEnts))
      assert(objs.size < rawEnts.size, "expected coreferent entities to merge")
    } finally rm(out)
  }
}
