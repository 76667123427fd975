package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming Count-Min Sketch — the incremental form of the batch
  * sketch ([[graft.sketch.Cms]]). Because the CMS matrix is a plain
  * keyed integer sum, the streaming build is LITERALLY the batch
  * aggregation run in update mode: Spark's streaming state IS the
  * matrix (≤ Depth × Width counters total — state bounded by the
  * sketch dimensions, not the stream length, no timeout needed), and
  * stream-of-batches ≡ one batch holds by the commutativity that
  * already makes the batch sketch partitioning-invariant
  * (CmsStreamSpec).
  */
object CmsStream {

  /** Update-mode streaming matrix: same (r, b, n) schema as
    * [[graft.sketch.Cms.matrix]], n = running total per cell.
    */
  def matrix(tokens: Dataset[String]): DataFrame =
    tokens.toDF("tok")
      .select(posexplode(array(
        (0 until graft.sketch.Cms.Depth)
          .map(i => graft.sketch.Cms.bucketCol(i, col("tok"))): _*))
        .as(Seq("r", "b")))
      .groupBy("r", "b")
      .agg(count(lit(1)).as("n"))

  /** Convenience: run a memory-sink update-mode query over a streaming
    * token source and return the sink table name to query.
    */
  def startMemorySink(tokens: Dataset[String], name: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    matrix(tokens).writeStream
      .format("memory")
      .queryName(name)
      .outputMode(OutputMode.Update)
      .start()
}
