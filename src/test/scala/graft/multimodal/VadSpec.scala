package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** VAD laws: exact agreement with a driver-side replay of the sawtooth
  * closed form across sample counts (incl. partial last frames), and
  * threshold degenerate cases (everything active = one segment spanning
  * all frames; nothing active = zero segments).
  */
class VadSpec extends SparkSpec {
  import spark.implicits._

  private def mediaDf(ns: Seq[(Long, Int)]) =
    ns.map { case (id, n) => (id, Multimodal.encodeWav(8000, n)) }
      .toDF("doc_id", "media")

  /** Driver replay: sample i = (i mod 4096) − 2048, frames of `frame`. */
  private def replay(n: Int, frame: Int, thr: Long): (Long, Long, Long, Long) = {
    val en = Array.ofDim[Long]((n + frame - 1) / frame)
    for (i <- 0 until n) en(i / frame) += math.abs((i % 4096) - 2048).toLong
    var act = 0L; var segs = 0L; var longest = 0L; var run = 0L
    for (e <- en) {
      if (e > thr) { act += 1; run += 1; if (run == 1) segs += 1
        if (run > longest) longest = run }
      else run = 0
    }
    (en.length.toLong, act, segs, longest)
  }

  test("sawtooth replay across lengths incl. partial last frames") {
    val ns = Seq(1L -> 8000, 2L -> 9200, 3L -> 20000, 4L -> 255, 5L -> 257)
    val out = Multimodal.vadSegments(mediaDf(ns)).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    for ((id, n) <- ns)
      assert(out(id) == replay(n, 256, 256L * 1024), s"doc $id n=$n")
    // the default threshold genuinely splits: some active, some not
    val (_, act, segs, _) = replay(20000, 256, 256L * 1024)
    assert(act > 0 && segs > 1 && act < replay(20000, 256, 256L * 1024)._1)
  }

  test("degenerate thresholds: all-active is one full-span segment; none-active is zero") {
    val df = mediaDf(Seq(1L -> 10000))
    val all = Multimodal.vadSegments(df, threshold = -1L).collect()(0)
    assert(all.getLong(2) == all.getLong(1)) // n_active == n_frames
    assert(all.getLong(3) == 1L && all.getLong(4) == all.getLong(1))
    val none = Multimodal.vadSegments(df, threshold = Long.MaxValue).collect()(0)
    assert(none.getLong(2) == 0L && none.getLong(3) == 0L && none.getLong(4) == 0L)
  }
}
