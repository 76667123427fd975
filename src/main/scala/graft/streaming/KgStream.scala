package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.extract.Gazetteer
import graft.pipeline.{IncrementalKg, KgPipeline}

/** Streaming incremental KG construction (round-5): a pages stream →
  * per-micro-batch graph build (`IncrementalKg.fromPages`, the same
  * dictionary-encoded front end as batch) → delta MERGE into a
  * manifest-chained materialization (`KgPipeline.commitMerge`, the
  * Iceberg-MERGE-INTO-shaped commit of the batch tier).
  *
  * Commit log = the manifest chain plus a HEAD pointer: each micro-batch
  * b commits its delta under `outDir/m<b>` with a manifest pointing at
  * the previous head, then atomically advances `outDir/HEAD`. Replays
  * are no-ops (commitMerge is idempotent per directory and HEAD only
  * moves forward), so exactly-once materialization holds under the
  * foreachBatch at-least-once contract. A killed stream restarted from
  * its checkpoint resumes at the first uncommitted batch and the chain
  * continues from HEAD — the streaming analogue of the batch
  * kill/resume protocol (KgStreamSpec).
  *
  * Scale shape: every per-batch cost is the batch tier's (merge work ∝
  * micro-batch, untouched corpus never rewritten); chain depth is
  * bounded by the same compaction knob (`spark.graft.merge.compactEvery`).
  */
object KgStream {

  private def headPath(outDir: String) = Paths.get(outDir, "HEAD")

  /** Current committed snapshot directory, if any batch has committed. */
  def readHead(outDir: String): Option[String] =
    if (Files.exists(headPath(outDir)))
      Some(new String(Files.readAllBytes(headPath(outDir)), "UTF-8").trim)
    else None

  private def writeHead(outDir: String, dir: String): Unit = {
    Files.createDirectories(Paths.get(outDir))
    val tmp = Paths.get(outDir, ".HEAD.tmp")
    Files.write(tmp, dir.getBytes("UTF-8"))
    Files.move(tmp, headPath(outDir), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Merge one micro-batch of pages (doc_id, html) into the chain.
    * Exposed for tests; `start` wires it into foreachBatch.
    */
  def mergeBatch(pages: DataFrame, gaz: Gazetteer, outDir: String,
                 batchId: Long): Unit = {
    val spark = pages.sparkSession
    val dir = s"$outDir/m$batchId"
    val head = readHead(outDir)
    // HEAD is monotone: a batch at or below the committed head is a
    // replay (Structured Streaming re-delivers the last unsealed batch)
    // OR a rerun against a stale checkpoint — either way committing it
    // again must not rewind the chain past already-merged batches
    val headBatch = head.flatMap(h =>
      "m(\\d+)$".r.findFirstMatchIn(h).map(_.group(1).toLong))
    if (headBatch.exists(_ >= batchId)) return
    val docs = pages.select(col("doc_id"),
      graft.extract.ExtractMainText(col("html")).as("text"))
    if (docs.isEmpty) return
    val graph = IncrementalKg.fromPages(docs, gaz)
    head match {
      case None => KgPipeline.commitGraph(graph, dir)
      case Some(prev) => KgPipeline.commitMerge(spark, prev, graph, dir)
    }
    writeHead(outDir, dir)
    // retention: a compaction commits a FULL snapshot that references no
    // earlier directory, so every older m<k> (and its catalog tables) is
    // unreachable — without GC a long-running stream's storage grows with
    // total batches processed, not corpus size (round-5 review).
    // Delta commits keep their chain intact and GC nothing.
    val gcOn = spark.conf.getOption("spark.graft.stream.gc")
      .forall(_.toBoolean)
    if (gcOn && KgPipeline.isFullSnapshot(dir)) {
      val root = Paths.get(outDir)
      Files.list(root).forEach { p =>
        val n = p.getFileName.toString
        "^m(\\d+)$".r.findFirstMatchIn(n).map(_.group(1).toLong) match {
          case Some(k) if k < batchId =>
            KgPipeline.dropSnapshotTables(spark, p.toString)
            Files.walk(p)
              .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
              .forEach(q => Files.deleteIfExists(q))
          case _ => ()
        }
      }
    }
  }

  /** Resolved canonical triples of the stream's current HEAD. */
  def canonical(spark: org.apache.spark.sql.SparkSession,
                outDir: String): DataFrame =
    KgPipeline.loadCanonical(spark,
      readHead(outDir).getOrElse(
        throw new IllegalStateException(s"no committed head under $outDir")))

  /** Start the ingestion: every micro-batch delta-merges into `outDir`.
    * `checkpointDir` is the Structured Streaming offset log — restart
    * with the same one to resume after a kill.
    */
  def start(pages: DataFrame, gaz: Gazetteer, outDir: String,
            checkpointDir: String): StreamingQuery =
    pages.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        mergeBatch(batch.toDF(), gaz, outDir, batchId)
      }
      .start()
}
