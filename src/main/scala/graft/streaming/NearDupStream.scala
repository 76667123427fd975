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
  * holding only doc ids as a SORTED array (binary-search membership —
  * O(log n) per arrival instead of the O(n) scan a Seq.contains costs,
  * O(n²) per degenerate bucket per batch), capped at `maxBucket` per
  * bucket (the streaming analogue of the SimHash hot-bucket guard: a
  * degenerate bucket stops accumulating quadratic candidates and state
  * — the batch tier has no such cap, so a bucket past the cap is the
  * one place the two tiers intentionally diverge).
  *
  * State lifetime (round-5 advisor): the number of bucket KEYS grows
  * with the corpus for the life of the stream — unbounded state in a
  * long-running ingestion. `idleTimeout` bounds it: buckets idle past
  * the duration are evicted via ProcessingTimeTimeout (near-dup
  * candidacy across a longer horizon than the TTL belongs to a batch
  * backfill, the standard lambda split). `None` keeps NoTimeout for
  * exact batch≡stream parity.
  *
  * Texts never enter state; exact Jaccard verification is a downstream
  * batch join, exactly like the batch tier's verify stage. Pairs can
  * repeat across bands/batches — candidate streams are Append-mode and
  * deduplicated downstream, as the batch tier's `.distinct()` does.
  */
object NearDupStream {

  final case class CandPair(a: Long, b: Long)

  def candidatePairs(docs: DataFrame, n: Int, params: Dedup.MinHashParams,
                     maxBucket: Int = 1024,
                     idleTimeout: Option[String] = None): Dataset[CandPair] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bands = params.bands
    val rpb = params.rowsPerBand
    val timeoutConf = idleTimeout match {
      case Some(_) => GroupStateTimeout.ProcessingTimeTimeout
      case None => GroupStateTimeout.NoTimeout
    }
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) =>
        val sig = Dedup.minHashSignatureFromHashes(
          Dedup.shingleHashes(text, n), params)
        Iterator.tabulate(bands) { b =>
          val slice = sig.slice(b * rpb, (b + 1) * rpb)
          (b + ":" + slice.mkString(","), id)
        }
      }
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf) {
        (_: String, rows: Iterator[(String, Long)],
         state: GroupState[Array[Long]]) =>
          if (state.hasTimedOut) {
            state.remove() // idle bucket: reclaim its state
            Iterator.empty
          } else {
            var cur = state.getOption.getOrElse(Array.empty[Long])
            val before = cur
            val incoming = rows.map(_._2).toArray.sorted
            val out = Seq.newBuilder[CandPair]
            for (id <- incoming) {
              val pos = java.util.Arrays.binarySearch(cur, id)
              if (pos < 0 && cur.length < maxBucket) {
                for (prev <- cur)
                  out += (if (prev < id) CandPair(prev, id)
                          else CandPair(id, prev))
                val ins = -pos - 1 // sorted insertion point
                val next = new Array[Long](cur.length + 1)
                System.arraycopy(cur, 0, next, 0, ins)
                next(ins) = id
                System.arraycopy(cur, ins, next, ins + 1, cur.length - ins)
                cur = next
              } // over the cap: degenerate bucket — stop pairing/growing
            }
            if (cur ne before) state.update(cur)
            idleTimeout.foreach(state.setTimeoutDuration)
            out.result().iterator
          }
      }
  }
}
