package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.dedup.Dedup

/** Streaming MinHash-LSH near-duplicate candidates — the incremental
  * form of the batch banding tier (`Dedup.minHashCandidatePairs`): as
  * documents arrive, each is signed (same seeded hash family as the
  * batch tier), banded, and matched against the documents previously
  * seen in its band buckets; every (earlier, newer) collision is
  * emitted as a candidate pair.
  *
  * Scale shape: state is keyed by the band's SIGNATURE SLICE itself
  * (exact equality classes, matching the batch tier's slice keys),
  * holding only doc ids, capped at `maxBucket` per bucket (the
  * streaming analogue of the SimHash hot-bucket guard: a degenerate
  * bucket stops accumulating quadratic candidates and state — the
  * batch tier has no such cap, so a bucket past the cap is the one
  * place the two tiers intentionally diverge). Texts never enter
  * state; exact Jaccard verification is a downstream batch join,
  * exactly like the batch tier's verify stage. Pairs can repeat across
  * bands/batches — candidate streams are Append-mode and deduplicated
  * downstream, as the batch tier's `.distinct()` does.
  */
object NearDupStream {

  final case class CandPair(a: Long, b: Long)

  def candidatePairs(docs: DataFrame, n: Int, params: Dedup.MinHashParams,
                     maxBucket: Int = 1024): Dataset[CandPair] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bands = params.bands
    val rpb = params.rowsPerBand
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) =>
        val sig = Dedup.minHashSignature(Dedup.shingles(text, n), params)
        Iterator.tabulate(bands) { b =>
          val slice = sig.slice(b * rpb, (b + 1) * rpb)
          (b + ":" + slice.mkString(","), id)
        }
      }
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[(String, Long)],
         state: GroupState[Seq[Long]]) =>
          val seen = state.getOption.getOrElse(Seq.empty)
          val incoming = rows.map(_._2).toArray.sorted
          val out = Seq.newBuilder[CandPair]
          var cur = seen
          for (id <- incoming if !cur.contains(id)) {
            if (cur.length < maxBucket) {
              for (prev <- cur)
                out += (if (prev < id) CandPair(prev, id) else CandPair(id, prev))
              cur = cur :+ id
            } // over the cap: bucket is degenerate — stop pairing/growing
          }
          if (cur ne seen) state.update(cur)
          out.result().iterator
      }
  }
}
