package graft.streaming

import graft.SparkSpec
import graft.extract.Gazetteer
import graft.pipeline.IncrementalKg
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Streaming incremental KG: a stream of page micro-batches delta-merged
  * through the manifest chain must produce EXACTLY the canonical triples
  * of one batch run over the union corpus, and a kill mid-stream must
  * resume from the chain head without double-applying a replayed batch.
  */
class KgStreamSpec extends SparkSpec {

  private val gaz = Gazetteer(Gazetteer.DefaultEntities)

  private def fullBatchTriples(pages: org.apache.spark.sql.DataFrame) = {
    val docs = pages.select(col("doc_id"),
      graft.extract.ExtractMainText(col("html")).as("text"))
    IncrementalKg.fromPages(docs, gaz).triples
      .collect().map(_.toString).sorted.toSeq
  }

  test("mergeBatch chain over slices ≡ one batch; replay is a no-op") {
    val pages = graft.pages.PageGen.pages(spark, "/root/testdata/sf0.001")
      .localCheckpoint()
    val out = Files.createTempDirectory("kgstream_direct").toString
    for (b <- 0 until 3)
      KgStream.mergeBatch(pages.filter(col("doc_id") % 3 === b), gaz, out, b)
    val streamed = KgStream.canonical(spark, out)
      .collect().map(_.toString).sorted.toSeq
    assert(streamed == fullBatchTriples(pages))
    // replaying the tail batch (at-least-once delivery) must not change
    // the chain: HEAD already points at m2
    val headBefore = KgStream.readHead(out)
    KgStream.mergeBatch(pages.filter(col("doc_id") % 3 === 2), gaz, out, 2L)
    assert(KgStream.readHead(out) == headBefore)
    // HEAD is monotone: re-delivering an OLDER batch (stale checkpoint /
    // manual rerun) must not rewind the chain either
    KgStream.mergeBatch(pages.filter(col("doc_id") % 3 === 0), gaz, out, 0L)
    assert(KgStream.readHead(out) == headBefore)
    assert(KgStream.canonical(spark, out)
      .collect().map(_.toString).sorted.toSeq == streamed)
  }

  test("compaction GCs superseded snapshot dirs (round-5 review)") {
    val pages = graft.pages.PageGen.pages(spark, "/root/testdata/sf0.001")
      .localCheckpoint()
    val out = Files.createTempDirectory("kgstream_gc").toString
    val saved = spark.conf.getOption("spark.graft.merge.compactEvery")
    spark.conf.set("spark.graft.merge.compactEvery", "2")
    try {
      for (b <- 0 until 5)
        KgStream.mergeBatch(pages.filter(col("doc_id") % 5 === b), gaz, out, b)
      // with compactEvery=2, batches 2 and 4 compact to full snapshots —
      // every directory before the last compaction is unreachable + GC'd
      val dirs = Files.list(Paths.get(out)).toArray.map(_.toString)
        .filter(_.matches(".*/m\\d+$")).map(_.split("/m").last.toInt).sorted
      assert(dirs.toSeq == Seq(4), s"stale snapshot dirs not GC'd: ${dirs.toSeq}")
      // and the surviving chain still resolves to the full-corpus graph
      val streamed = KgStream.canonical(spark, out)
        .collect().map(_.toString).sorted.toSeq
      assert(streamed == fullBatchTriples(pages))
    } finally {
      saved match {
        case Some(v) => spark.conf.set("spark.graft.merge.compactEvery", v)
        case None => spark.conf.unset("spark.graft.merge.compactEvery")
      }
    }
  }

  test("file-source stream, kill after a committed batch, resume from checkpoint") {
    val pages = graft.pages.PageGen.pages(spark, "/root/testdata/sf0.001")
      .localCheckpoint()
    // three files → three micro-batches (maxFilesPerTrigger = 1)
    val src = Files.createTempDirectory("kgstream_src").toString
    for (b <- 0 until 3) {
      val tmp = Files.createTempDirectory(s"kgstream_slice$b").toString
      pages.filter(col("doc_id") % 3 === b).coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      val part = Files.list(Paths.get(tmp)).toArray.map(_.toString)
        .filter(_.endsWith(".parquet")).head
      Files.move(Paths.get(part), Paths.get(src, s"batch$b.parquet"))
    }
    val out = Files.createTempDirectory("kgstream_out").toString
    val ckpt = Files.createTempDirectory("kgstream_ckpt").toString
    val stream = spark.readStream.schema(pages.schema)
      .option("maxFilesPerTrigger", "1").parquet(src)

    // run 1: crash INSIDE the second foreachBatch AFTER its merge
    // committed — the offset log has not sealed that batch, so the
    // restart replays it against an already-advanced HEAD
    val q1 = stream.writeStream.option("checkpointLocation", ckpt)
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
          KgStream.mergeBatch(b.toDF(), gaz, out, id)
          if (id == 1L) throw new RuntimeException("kill mid-stream")
      }.start()
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.awaitTermination()
    }
    assert(KgStream.readHead(out).isDefined, "kill happened after a commit")

    // run 2: same checkpoint resumes — replays batch 1 (no-op via HEAD)
    // then merges the remaining batch
    val q2 = KgStream.start(stream, gaz, out, ckpt)
    try q2.processAllAvailable() finally q2.stop()

    val streamed = KgStream.canonical(spark, out)
      .collect().map(_.toString).sorted.toSeq
    assert(streamed == fullBatchTriples(pages))
    assert(KgStream.readHead(out).exists(_.endsWith("/m2")))
  }
}
