package graft.multimodal

import graft.SparkSpec
import graft.dedup.Dedup

/** Perceptual image hashing (round-5): pixel codecs round-trip, dHash is
  * invariant under exact-factor downscale (the planted resized-twin
  * recall property), and the hamming pigeonhole mines twin pairs without
  * a quadratic join. The mm_phash driver oracle replays the hashes from
  * the gradient formula; here the same derivation is asserted engine-side.
  */
class PerceptualHashSpec extends SparkSpec {

  /** Block image: 8×8 grid of constant-color cells — smooth at the hash's
    * sampling scale, arbitrary content across cells.
    */
  private def blockImage(w: Int, h: Int, seed: Int): Array[Array[Byte]] = {
    val rows = Array.ofDim[Byte](h, 3 * w)
    for (y <- 0 until h; x <- 0 until w) {
      val cell = (y * 8 / h) * 8 + (x * 8 / w)
      val v = ((cell * 37 + seed * 101) % 251).toByte
      rows(y)(3 * x) = v
      rows(y)(3 * x + 1) = ((cell * 53 + seed * 7) % 251).toByte
      rows(y)(3 * x + 2) = ((cell * 11 + seed * 13) % 251).toByte
    }
    rows
  }

  private def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)

  test("BMP pixel decode/encode round-trips, visual top-down orientation") {
    val bytes = Multimodal.encodeBmp(70, 34) // rowSize padding exercised
    val rows = Multimodal.decodeBmpPixels(bytes).get
    assert(rows.length == 34 && rows(0).length == 210)
    // stored bottom-up: visual row 0 is gradient offset h-1 = 33
    assert((rows(0)(0) & 0xff) == 33 && (rows(33)(0) & 0xff) == 0)
    // pixel round-trip (padding bytes are don't-care: the gradient
    // encoder patterns them, the from-pixels encoder zeroes them)
    val reenc = Multimodal.encodeBmpFromPixels(rows)
    assert(reenc.length == bytes.length)
    assert(Multimodal.decodeBmpPixels(reenc).get.map(_.toSeq).toSeq ==
      rows.map(_.toSeq).toSeq)
  }

  test("PNG from-pixels encode inverts decodePngPixels, valid checksums") {
    val img = blockImage(100, 60, seed = 3)
    val png = Multimodal.encodePngFromPixels(img)
    val back = Multimodal.decodePngPixels(png).get
    assert(back.map(_.toSeq).toSeq == img.map(_.toSeq).toSeq)
    // and the metadata path still reads it (CRC not validated there, but
    // dims must be) — plus the stored-block size formula holds
    val meta = Multimodal.decodePng(png).get
    assert(meta.width == 100 && meta.height == 60)
    assert(png.length == Multimodal.encodePng(100, 60).length)
  }

  test("dHash/aHash invariant under exact-factor downscale; twins mined via pigeonhole") {
    val base = blockImage(144, 144, seed = 1)
    val twin = Multimodal.resamplePixels(base, 72, 72)
    val other = blockImage(144, 144, seed = 9)
    val (hBase, hTwin) = (Multimodal.dHash(base), Multimodal.dHash(twin))
    val hOther = Multimodal.dHash(other)
    // 144 and 72 are both multiples of 9·8's grid: identical sample points
    assert(hBase == hTwin, "exact-factor twin must hash identically")
    assert(Multimodal.aHash(base) == Multimodal.aHash(twin))
    assert(hamming(hBase, hOther) > 3, "independent images must differ")

    // non-exact factor (144 → 96): samples move ≤ 1 source pixel — block
    // images stay within the standard ≤3 hamming near-dup threshold
    val twin96 = Multimodal.resamplePixels(base, 96, 96)
    assert(hamming(hBase, Multimodal.dHash(twin96)) <= 3)

    // mine pairs over (id, hash) with the SimHash hamming pigeonhole —
    // the scale path: bucketed, never quadratic
    val spark2 = spark
    import spark2.implicits._
    val sims = Seq((1L, hBase), (2L, Multimodal.dHash(twin96)),
      (3L, hOther)).toDF("doc_id", "sim")
    val pairs = Dedup.simHashPairsFromSims(sims, maxDist = 3)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("extreme aspect ratios resize without a zero dimension (round-5 review)") {
    val spark2 = spark
    import spark2.implicits._
    val media = Seq((1L, "image", Multimodal.encodeBmp(200, 1)))
      .toDF("doc_id", "kind", "media")
    val r = Multimodal.resize(media, maxSide = 100).head()
    assert(r.getInt(1) == 100 && r.getInt(2) == 1) // clamped, not 0
    assert(Multimodal.decodeBmp(r.getAs[Array[Byte]]("media"))
      .exists(m => m.width == 100 && m.height == 1))
  }

  test("resize really resamples image pixels (not a synthetic payload)") {
    val spark2 = spark
    import spark2.implicits._
    val img = blockImage(128, 128, seed = 5)
    val media = Seq(
      (1L, "image", Multimodal.encodeBmpFromPixels(img)),
      (2L, "image", Multimodal.encodePngFromPixels(img)))
      .toDF("doc_id", "kind", "media")
    val out = Multimodal.resize(media, maxSide = 64).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("media")).toMap
    val want = Multimodal.resamplePixels(img, 64, 64).map(_.toSeq).toSeq
    assert(Multimodal.decodeBmpPixels(out(1L)).get.map(_.toSeq).toSeq == want)
    assert(Multimodal.decodePngPixels(out(2L)).get.map(_.toSeq).toSeq == want)
  }

  test("engine hashes over real containers equal the oracle's formula") {
    // replicate the mm_phash DuckDB derivation independently and compare
    // against the engine's decode→hash over actual BMP/PNG bytes
    def gray(w: Int, h: Int, isPng: Boolean, gx: Int, gy: Int): Int = {
      val xi = gx * w / 9; val yi = gy * h / 8
      val py = if (isPng) yi else h - 1 - yi
      val b = 3 * xi + py
      (b % 251 + (b + 1) % 251 + (b + 2) % 251) / 3
    }
    def formulaHashes(id: Long): (Long, Long) = {
      val w = (64 + id % 64).toInt; val h = (64 + (id / 2) % 64).toInt
      val png = id % 6 == 0
      var dh = 0L; var ah = 0L; var sum = 0
      val g = Array.tabulate(8, 8)((gy, gx) => gray(w, h, png, gx, gy))
      for (gy <- 0 until 8; gx <- 0 until 8) {
        sum += g(gy)(gx)
        if (gray(w, h, png, gx + 1, gy) > g(gy)(gx)) dh |= 1L << (gy * 8 + gx)
      }
      val mu = sum / 64
      for (gy <- 0 until 8; gx <- 0 until 8)
        if (g(gy)(gx) > mu) ah |= 1L << (gy * 8 + gx)
      (dh, ah)
    }
    for (id <- Seq(0L, 6L, 12L, 3L, 9L, 21L, 63L)) {
      val w = (64 + id % 64).toInt; val h = (64 + (id / 2) % 64).toInt
      val bytes = if (id % 6 == 0) Multimodal.encodePng(w, h)
                  else Multimodal.encodeBmp(w, h)
      val rows = Multimodal.decodePixels(bytes).get
      assert((Multimodal.dHash(rows), Multimodal.aHash(rows)) ==
        formulaHashes(id), s"id=$id")
    }
  }
}
