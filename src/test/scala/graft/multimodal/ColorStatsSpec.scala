package graft.multimodal

import graft.SparkSpec

/** colorStats laws: exact closed-form replay of the gradient payload,
  * BMP ≡ PNG orientation invariance (same logical image, different
  * storage order), and degenerate dark thresholds.
  */
class ColorStatsSpec extends SparkSpec {
  import spark.implicits._

  /** Scalar closed-form replay: channel c at (x, y of file row r) =
    * (3x + c + r) mod 251, summed over all rows (order-free). */
  private def expected(w: Int, h: Int, thr: Int)
      : (Long, Long, Long, Long) = {
    var sr = 0L; var sg = 0L; var sb = 0L; var dark = 0L
    for (r <- 0 until h; x <- 0 until w) {
      val rv = (3 * x + r) % 251
      val gv = (3 * x + 1 + r) % 251
      val bv = (3 * x + 2 + r) % 251
      sr += rv; sg += gv; sb += bv
      if ((rv + gv + bv) / 3 < thr) dark += 1
    }
    val n = w.toLong * h
    (sr / n, sg / n, sb / n, 10000L * dark / n)
  }

  private def statsOf(bytes: Array[Byte], thr: Int = 64)
      : (Long, Long, Long, Long, Long, Long) = {
    val df = Seq((1L, bytes)).toDF("doc_id", "media")
    val r = Multimodal.colorStats(df, thr).collect().head
    (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5), r.getLong(6))
  }

  test("closed-form replay on BMP and PNG, several sizes") {
    for ((w, h) <- Seq((9, 7), (64, 64), (17, 33))) {
      val (er, eg, eb, ebp) = expected(w, h, 64)
      for (bytes <- Seq(Multimodal.encodeBmp(w, h),
          Multimodal.encodePng(w, h))) {
        val (gw, gh, mr, mg, mb, bp) = statsOf(bytes)
        assert((gw, gh) == (w.toLong, h.toLong))
        assert((mr, mg, mb, bp) == (er, eg, eb, ebp))
      }
    }
  }

  test("orientation invariance: BMP (bottom-up) ≡ PNG (top-down)") {
    for ((w, h) <- Seq((12, 5), (31, 31))) {
      assert(statsOf(Multimodal.encodeBmp(w, h)) ==
        statsOf(Multimodal.encodePng(w, h)))
    }
  }

  test("degenerate thresholds: 0 → dark_bp 0; 256 → dark_bp 10000") {
    val bytes = Multimodal.encodeBmp(16, 16)
    assert(statsOf(bytes, 0)._6 == 0L)
    assert(statsOf(bytes, 256)._6 == 10000L)
  }

  test("non-image rows are dropped") {
    val wav = Multimodal.encodeWav(8000, 100)
    val df = Seq((1L, wav)).toDF("doc_id", "media")
    assert(Multimodal.colorStats(df).count() == 0L)
  }
}
