package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, batch decode / feature-extract / resize /
  * frame-sample as per-partition batch transforms.
  *
  * The Spark-side plumbing — schema, partitioning, batch shape
  * (mapPartitions processes a full batch of rows per iterator pull, the
  * Scala analogue of a Pandas-UDF `mapInPandas` batch) — is real and
  * tested, and since round 3 so are the CODECS for every uncompressed
  * container the sandbox can host without media libraries:
  *  - image: Windows BMP (BITMAPFILEHEADER + BITMAPINFOHEADER, 24bpp,
  *    4-byte-padded bottom-up rows) — header-complete encode + decode;
  *  - audio: RIFF/WAVE PCM (fmt + data chunks, 16-bit mono) — ditto;
  *  - video: YUV4MPEG2 (ASCII stream header + FRAME-delimited planar
  *    frames, C444) — ditto.
  * Compressed codecs (JPEG/Opus/H.264) still need a native library and
  * remain out of scope here; the legacy "GFT1" synthetic container is
  * still accepted by [[decode]] for old fixtures.
  */
object Multimodal {

  val Magic = "GFT1"

  final case class Meta(kind: String, width: Int, height: Int,
                        channels: Int, nFrames: Int, sampleRate: Int)

  // ---------------------------------------------------------------- BMP

  /** 24bpp bottom-up BMP. Pixel payload is a deterministic gradient
    * (byte i of the row data = (x + y) mod 251) so files are bit-stable
    * across runs and fully parseable by any standard viewer.
    */
  def encodeBmp(width: Int, height: Int): Array[Byte] = {
    val rowSize = ((3 * width + 3) / 4) * 4
    val dataSize = rowSize * height
    val buf = ByteBuffer.allocate(54 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
    buf.putInt(54 + dataSize) // file size
    buf.putInt(0)             // reserved
    buf.putInt(54)            // pixel data offset
    buf.putInt(40)            // BITMAPINFOHEADER size
    buf.putInt(width)
    buf.putInt(height)
    buf.putShort(1)           // planes
    buf.putShort(24)          // bpp
    buf.putInt(0)             // BI_RGB (uncompressed)
    buf.putInt(dataSize)
    buf.putInt(2835)          // 72 dpi
    buf.putInt(2835)
    buf.putInt(0)             // palette colors
    buf.putInt(0)             // important colors
    // row y's byte x is (x+y) mod 251 — a sliding window over one
    // periodic pattern buffer, so filling is arraycopy-speed, not a
    // per-byte mod loop (the encoder is on the fixture hot path)
    val out = buf.array()
    val pattern = gradient(rowSize + height)
    var y = 0
    while (y < height) {
      System.arraycopy(pattern, y, out, 54 + y * rowSize, rowSize)
      y += 1
    }
    out
  }

  /** pattern(i) = i mod 251 — shared by the BMP and Y4M payload fills. */
  private def gradient(n: Int): Array[Byte] = {
    val p = new Array[Byte](n)
    var i = 0
    while (i < n) { p(i) = (i % 251).toByte; i += 1 }
    p
  }

  def decodeBmp(bytes: Array[Byte]): Option[Meta] = {
    if (bytes.length < 54 || bytes(0) != 'B' || bytes(1) != 'M') return None
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val width = buf.getInt(18)
    val height = buf.getInt(22)
    val bpp = buf.getShort(28).toInt
    // round-3 advice: bpp must be a real BMP depth (bpp=0 passed the old
    // `% 8` check and decoded as channels=0), and the pixel array the
    // header promises must actually fit in the file — otherwise a
    // malformed header "successfully" decodes wild dimensions
    val validDepth = bpp == 8 || bpp == 16 || bpp == 24 || bpp == 32
    if (width <= 0 || height == 0 || !validDepth) None
    else {
      // Long math throughout: (bpp/8)*width can overflow Int for a
      // crafted header, and math.abs(Int.MinValue) is negative — either
      // would defeat the fit check below (round-4 review)
      val rowSize = (((bpp / 8).toLong * width + 3) / 4) * 4
      val absH = math.abs(height.toLong)
      // division form: rowSize * absH itself can wrap 64 bits for
      // near-max width AND height (second-pass review)
      if (absH > Int.MaxValue || rowSize > (bytes.length.toLong - 54) / absH)
        None
      // negative height = top-down DIB; dimensions are |height|
      else Some(Meta("image", width, absH.toInt, bpp / 8, 1, 0))
    }
  }

  // ---------------------------------------------------------------- PNG

  /** Truecolor 8-bit PNG (colour type 2), all-None row filters, zlib
    * STORED deflate blocks. Stored blocks make the byte size a closed
    * formula over (w, h) — 8 sig + 25 IHDR + 12 IEND + IDAT of
    * 2 (zlib hdr) + raw + 5·ceil(raw/65535) + 4 (adler), raw =
    * h·(1+3w) — so the DuckDB oracle can recompute the file size from
    * the PNG spec without running DEFLATE. Row y's pixel bytes are the
    * same (x+y) mod 251 gradient as BMP rows.
    */
  def encodePng(width: Int, height: Int): Array[Byte] = {
    val rowLen = 3 * width
    val raw = new Array[Byte](height * (1 + rowLen))
    val pattern = gradient(rowLen + height)
    var y = 0; var pos = 0
    while (y < height) {
      raw(pos) = 0 // filter: None
      System.arraycopy(pattern, y, raw, pos + 1, rowLen)
      pos += 1 + rowLen; y += 1
    }
    val nBlocks = math.max(1, (raw.length + 65534) / 65535)
    val zlib = new Array[Byte](2 + raw.length + 5 * nBlocks + 4)
    zlib(0) = 0x78; zlib(1) = 0x01 // CMF/FLG, (0x7801 % 31 == 0)
    var in = 0; var outp = 2
    while (in < raw.length || (raw.length == 0 && in == 0)) {
      val len = math.min(65535, raw.length - in)
      val last = in + len >= raw.length
      zlib(outp) = if (last) 1 else 0
      zlib(outp + 1) = (len & 0xff).toByte
      zlib(outp + 2) = ((len >> 8) & 0xff).toByte
      zlib(outp + 3) = (~len & 0xff).toByte
      zlib(outp + 4) = ((~len >> 8) & 0xff).toByte
      System.arraycopy(raw, in, zlib, outp + 5, len)
      in += len; outp += 5 + len
      if (last) in = raw.length + 1 // exit also for raw.length == 0
    }
    val adler = new java.util.zip.Adler32
    adler.update(raw)
    val av = adler.getValue
    zlib(outp) = ((av >> 24) & 0xff).toByte
    zlib(outp + 1) = ((av >> 16) & 0xff).toByte
    zlib(outp + 2) = ((av >> 8) & 0xff).toByte
    zlib(outp + 3) = (av & 0xff).toByte

    val out = ByteBuffer.allocate(8 + 25 + 12 + zlib.length + 12)
    out.put(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a))
    def chunk(typ: String, data: Array[Byte]): Unit = {
      out.putInt(data.length)
      val tb = typ.getBytes(StandardCharsets.US_ASCII)
      out.put(tb).put(data)
      val crc = new java.util.zip.CRC32
      crc.update(tb); crc.update(data)
      out.putInt(crc.getValue.toInt)
    }
    val ihdr = ByteBuffer.allocate(13)
    ihdr.putInt(width).putInt(height)
    ihdr.put(8.toByte)  // bit depth
    ihdr.put(2.toByte)  // colour type: truecolor RGB
    ihdr.put(0.toByte).put(0.toByte).put(0.toByte) // deflate/adaptive/none
    chunk("IHDR", ihdr.array())
    chunk("IDAT", zlib)
    chunk("IEND", Array.emptyByteArray)
    out.array()
  }

  private val PngSig =
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

  /** PNG metadata from the IHDR chunk (any bit depth / colour type). */
  def decodePng(bytes: Array[Byte]): Option[Meta] = {
    if (bytes == null || bytes.length < 33) return None
    var i = 0
    while (i < 8) { if (bytes(i) != PngSig(i)) return None; i += 1 }
    val buf = ByteBuffer.wrap(bytes) // PNG ints are big-endian (default)
    if (buf.getInt(8) != 13) return None // IHDR data length
    val typ = new String(bytes, 12, 4, StandardCharsets.US_ASCII)
    if (typ != "IHDR") return None
    val w = buf.getInt(16)
    val h = buf.getInt(20)
    val colourType = bytes(25) & 0xff
    val channels = colourType match {
      case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
      case _ => return None
    }
    if (w <= 0 || h <= 0) None
    else Some(Meta("image", w, h, channels, 1, 0))
  }

  /** Full pixel decode for 8-bit truecolor PNGs: concatenate IDAT
    * chunks, inflate (java.util.zip.Inflater — handles any zlib stream,
    * not just our stored blocks), and undo all five scanline filters
    * (None/Sub/Up/Average/Paeth). Returns rows of 3·w samples.
    */
  def decodePngPixels(bytes: Array[Byte]): Option[Array[Array[Byte]]] = {
    val meta = decodePng(bytes).getOrElse(return None)
    if ((bytes(24) & 0xff) != 8 || (bytes(25) & 0xff) != 2) return None
    // crafted IHDR dims: h*(1+3w) can wrap Int (NegativeArraySize) or
    // demand absurd allocations — bound by what the file could plausibly
    // inflate to (round-4 review). DEFLATE caps expansion at ~1032:1.
    // rawLen ≤ 2^31·(3·2^31+1) < 2^64, so a wrap lands NEGATIVE — the
    // <= 0 test closes the residual 64-bit wrap (second-pass review)
    val rawLen = meta.height.toLong * (1L + 3L * meta.width)
    if (rawLen <= 0 || rawLen > Int.MaxValue ||
        rawLen > bytes.length.toLong * 1032L)
      return None
    // walk chunks, gather IDAT payloads
    val idat = new java.io.ByteArrayOutputStream()
    var off = 8
    while (off + 8 <= bytes.length) {
      val len = ByteBuffer.wrap(bytes).getInt(off)
      if (len < 0 || off + 12 + len > bytes.length) return None
      val typ = new String(bytes, off + 4, 4, StandardCharsets.US_ASCII)
      if (typ == "IDAT") idat.write(bytes, off + 8, len)
      off += 12 + len
      if (typ == "IEND") off = bytes.length
    }
    val inflater = new java.util.zip.Inflater()
    inflater.setInput(idat.toByteArray)
    val rowLen = 3 * meta.width
    val raw = new Array[Byte](meta.height * (1 + rowLen))
    try {
      var done = 0
      while (done < raw.length && !inflater.finished()) {
        val n = inflater.inflate(raw, done, raw.length - done)
        if (n == 0 && inflater.needsInput()) return None // truncated
        done += n
      }
      if (done < raw.length) return None
    } catch { case _: java.util.zip.DataFormatException => return None }
    finally inflater.end()
    // unfilter
    val bpp = 3
    val rows = Array.ofDim[Byte](meta.height, rowLen)
    var y = 0
    while (y < meta.height) {
      val filter = raw(y * (1 + rowLen)) & 0xff
      val src = y * (1 + rowLen) + 1
      val cur = rows(y)
      val prev = if (y > 0) rows(y - 1) else null
      def left(x: Int) = if (x >= bpp) cur(x - bpp) & 0xff else 0
      def up(x: Int) = if (prev != null) prev(x) & 0xff else 0
      def upLeft(x: Int) = if (prev != null && x >= bpp) prev(x - bpp) & 0xff else 0
      var x = 0
      while (x < rowLen) {
        val v = raw(src + x) & 0xff
        val out = filter match {
          case 0 => v
          case 1 => v + left(x)
          case 2 => v + up(x)
          case 3 => v + (left(x) + up(x)) / 2
          case 4 =>
            val (a, b, c) = (left(x), up(x), upLeft(x))
            val p = a + b - c
            val (pa, pb, pc) = (math.abs(p - a), math.abs(p - b), math.abs(p - c))
            v + (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
          case _ => return None
        }
        cur(x) = (out & 0xff).toByte
        x += 1
      }
      y += 1
    }
    Some(rows)
  }

  // ------------------------------------------------- pixels + perceptual

  /** Pixel rows (visual top-down, 3·w bytes each) for 24bpp BMPs. BMP
    * stores rows BOTTOM-UP (positive height), so visual row y is stored
    * row h-1-y.
    */
  def decodeBmpPixels(bytes: Array[Byte]): Option[Array[Array[Byte]]] = {
    val meta = decodeBmp(bytes).getOrElse(return None)
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    if (buf.getShort(28).toInt != 24) return None
    val storedHeight = buf.getInt(22) // sign = row order
    val rowSize = ((3 * meta.width + 3) / 4) * 4
    val rows = Array.ofDim[Byte](meta.height, 3 * meta.width)
    var y = 0
    while (y < meta.height) {
      val stored = if (storedHeight > 0) meta.height - 1 - y else y
      System.arraycopy(bytes, 54 + stored * rowSize, rows(y), 0, 3 * meta.width)
      y += 1
    }
    Some(rows)
  }

  /** Pixel decode dispatch: BMP or truecolor PNG → visual top-down rows. */
  def decodePixels(bytes: Array[Byte]): Option[Array[Array[Byte]]] = {
    if (bytes == null || bytes.length < 4) return None
    if (bytes(0) == 'B' && bytes(1) == 'M') decodeBmpPixels(bytes)
    else if (bytes(0) == 0x89.toByte && bytes(1) == 'P') decodePngPixels(bytes)
    else None
  }

  /** Encode visual top-down pixel rows as a 24bpp bottom-up BMP. */
  def encodeBmpFromPixels(rows: Array[Array[Byte]]): Array[Byte] = {
    val height = rows.length
    val width = rows(0).length / 3
    val out = encodeBmp(width, height) // header + (overwritten) payload
    val rowSize = ((3 * width + 3) / 4) * 4
    var y = 0
    while (y < height) {
      val stored = height - 1 - y
      System.arraycopy(rows(y), 0, out, 54 + stored * rowSize, 3 * width)
      var pad = 3 * width
      while (pad < rowSize) { out(54 + stored * rowSize + pad) = 0; pad += 1 }
      y += 1
    }
    out
  }

  /** Encode visual top-down pixel rows as the stored-block truecolor PNG
    * (same container structure as [[encodePng]], arbitrary content).
    */
  def encodePngFromPixels(rows: Array[Array[Byte]]): Array[Byte] = {
    val height = rows.length
    val width = rows(0).length / 3
    val out = encodePng(width, height) // structure + gradient payload
    // overwrite the stored-block payload in place: raw scanlines sit at
    // fixed offsets inside the zlib stream (filter byte + row), split
    // across 65535-byte stored blocks — recompute adler + IDAT crc after
    val rowLen = 3 * width
    val raw = new Array[Byte](height * (1 + rowLen))
    var y = 0; var pos = 0
    while (y < height) {
      raw(pos) = 0
      System.arraycopy(rows(y), 0, raw, pos + 1, rowLen)
      pos += 1 + rowLen; y += 1
    }
    val idatStart = 8 + 25 // after sig + IHDR chunk
    val zlibStart = idatStart + 8
    var in = 0; var outp = zlibStart + 2
    while (in < raw.length) {
      val len = math.min(65535, raw.length - in)
      System.arraycopy(raw, in, out, outp + 5, len)
      in += len; outp += 5 + len
    }
    val adler = new java.util.zip.Adler32
    adler.update(raw)
    val av = adler.getValue
    out(outp) = ((av >> 24) & 0xff).toByte
    out(outp + 1) = ((av >> 16) & 0xff).toByte
    out(outp + 2) = ((av >> 8) & 0xff).toByte
    out(outp + 3) = (av & 0xff).toByte
    // recompute IDAT CRC (type + data)
    val idatLen = ByteBuffer.wrap(out).getInt(idatStart)
    val crc = new java.util.zip.CRC32
    crc.update(out, idatStart + 4, 4 + idatLen)
    ByteBuffer.wrap(out).putInt(idatStart + 8 + idatLen, crc.getValue.toInt)
    out
  }

  /** Nearest-neighbor resample of visual pixel rows to (w2, h2) —
    * source pixel of target (x, y) is (x·w/w2, y·h/h2), integer floor,
    * so an exact-factor downscale preserves the sample grid (and with it
    * the perceptual hash — the planted-twin recall property).
    */
  def resamplePixels(rows: Array[Array[Byte]], w2: Int, h2: Int): Array[Array[Byte]] = {
    val h = rows.length
    val w = rows(0).length / 3
    val out = Array.ofDim[Byte](h2, 3 * w2)
    var y = 0
    while (y < h2) {
      val sy = y * h / h2
      var x = 0
      while (x < w2) {
        val sx = x * w / w2
        out(y)(3 * x) = rows(sy)(3 * sx)
        out(y)(3 * x + 1) = rows(sy)(3 * sx + 1)
        out(y)(3 * x + 2) = rows(sy)(3 * sx + 2)
        x += 1
      }
      y += 1
    }
    out
  }

  /** Grayscale at grid column gx ∈ [0, 9), row gy ∈ [0, 8): the
    * nearest-neighbor sample (gx·w/9, gy·h/8), gray = (r+g+b)/3 —
    * integer math end-to-end so the hash replays exactly in SQL.
    */
  private def gridGray(rows: Array[Array[Byte]], w: Int, h: Int,
                       gx: Int, gy: Int): Int = {
    val xi = gx * w / 9
    val yi = gy * h / 8
    val r = rows(yi)(3 * xi) & 0xff
    val g = rows(yi)(3 * xi + 1) & 0xff
    val b = rows(yi)(3 * xi + 2) & 0xff
    (r + g + b) / 3
  }

  /** Difference hash over a 9×8 nearest-neighbor gray grid: bit y·8+x is
    * set iff gray(x+1, y) > gray(x, y) — the standard dHash (row-wise
    * gradient signs), robust to scaling/re-encode, integer-exact.
    */
  def dHash(rows: Array[Array[Byte]]): Long = {
    val h = rows.length
    val w = rows(0).length / 3
    var hash = 0L
    var gy = 0
    while (gy < 8) {
      var gx = 0
      while (gx < 8) {
        if (gridGray(rows, w, h, gx + 1, gy) > gridGray(rows, w, h, gx, gy))
          hash |= 1L << (gy * 8 + gx)
        gx += 1
      }
      gy += 1
    }
    hash
  }

  /** Average hash over the same grid's 8×8 sub-block: bit y·8+x is set
    * iff gray(x, y) > the integer mean of the 64 grays. (Variant note:
    * classic aHash resamples to its own 8×8 grid; sharing the dHash grid
    * keeps one sampling pass and one SQL-replayable definition.)
    */
  def aHash(rows: Array[Array[Byte]]): Long = {
    val h = rows.length
    val w = rows(0).length / 3
    val g = new Array[Int](64)
    var sum = 0
    var gy = 0
    while (gy < 8) {
      var gx = 0
      while (gx < 8) {
        val v = gridGray(rows, w, h, gx, gy)
        g(gy * 8 + gx) = v; sum += v
        gx += 1
      }
      gy += 1
    }
    val mean = sum / 64
    var hash = 0L
    var i = 0
    while (i < 64) { if (g(i) > mean) hash |= 1L << i; i += 1 }
    hash
  }

  /** Perceptual hashes for the image rows of a media table:
    * `(doc_id, dhash, ahash)`. Batch shape: one decode + two 72-sample
    * grid passes per image inside mapPartitions; non-image / undecodable
    * rows are dropped. Downstream near-dup mining hamming-buckets these
    * 64-bit fingerprints with the SimHash pigeonhole plumbing
    * (`Dedup.simHashPairsFromSims`) — candidates ∝ true visual twins,
    * never quadratic.
    */
  def perceptualHashes(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.flatMap { case (id, bytes) =>
          decodePixels(bytes).map(rows => (id, dHash(rows), aHash(rows)))
        }
      }
      .toDF("doc_id", "dhash", "ahash")
  }

  /** Channel statistics for the image rows: per-image integer channel
    * means and the dark-pixel share in basis points — the cheap
    * brightness/exposure quality filters an image-curation pipeline
    * runs before the expensive perceptual tiers (mm_phash). One decode
    * kernel inside mapPartitions, zero shuffles; integer floor division
    * keeps every stat bit-stable across engines and partitionings.
    * Stats sum over ALL pixels, so they are orientation-invariant —
    * BMP's bottom-up storage and PNG's top-down decode agree by
    * construction (the spec pins it).
    */
  def colorStats(media: DataFrame, darkThreshold: Int = 64): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.flatMap { case (id, bytes) =>
          decodePixels(bytes).map { rows =>
            val h = rows.length
            val w = rows(0).length / 3
            var sr = 0L; var sg = 0L; var sb = 0L; var dark = 0L
            var y = 0
            while (y < h) {
              val row = rows(y)
              var x = 0
              while (x < w) {
                val r = row(3 * x) & 0xff
                val g = row(3 * x + 1) & 0xff
                val b = row(3 * x + 2) & 0xff
                sr += r; sg += g; sb += b
                if ((r + g + b) / 3 < darkThreshold) dark += 1
                x += 1
              }
              y += 1
            }
            val n = w.toLong * h
            (id, w.toLong, h.toLong, sr / n, sg / n, sb / n,
              10000L * dark / n)
          }
        }
      }
      .toDF("doc_id", "width", "height", "mean_r", "mean_g", "mean_b",
        "dark_bp")
  }

  // ---------------------------------------------------------------- WAV

  /** RIFF/WAVE, PCM (format 1), 16-bit mono. Sample i = (i mod 4096) - 2048
    * — a deterministic sawtooth, again bit-stable and player-valid.
    */
  def encodeWav(sampleRate: Int, nSamples: Int): Array[Byte] = {
    val dataLen = nSamples * 2
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes(StandardCharsets.US_ASCII))
    buf.putInt(36 + dataLen)
    buf.put("WAVE".getBytes(StandardCharsets.US_ASCII))
    buf.put("fmt ".getBytes(StandardCharsets.US_ASCII))
    buf.putInt(16)            // fmt chunk size
    buf.putShort(1)           // PCM
    buf.putShort(1)           // mono
    buf.putInt(sampleRate)
    buf.putInt(sampleRate * 2) // byte rate
    buf.putShort(2)           // block align
    buf.putShort(16)          // bits per sample
    buf.put("data".getBytes(StandardCharsets.US_ASCII))
    buf.putInt(dataLen)
    var i = 0
    while (i < nSamples) {
      buf.putShort(((i % 4096) - 2048).toShort)
      i += 1
    }
    buf.array()
  }

  def decodeWav(bytes: Array[Byte]): Option[Meta] = {
    if (bytes.length < 44) return None
    val asc = new String(bytes, 0, 12, StandardCharsets.US_ASCII)
    if (!asc.startsWith("RIFF") || !asc.regionMatches(8, "WAVE", 0, 4)) return None
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    // walk chunks to find fmt (robust to extra chunks before it)
    var off = 12
    while (off + 8 <= bytes.length) {
      val id = new String(bytes, off, 4, StandardCharsets.US_ASCII)
      val size = buf.getInt(off + 4)
      if (id == "fmt " && off + 8 + 16 <= bytes.length) {
        val channels = buf.getShort(off + 10).toInt
        val sampleRate = buf.getInt(off + 12)
        return Some(Meta("audio", 0, 0, channels, 0, sampleRate))
      }
      // malformed chunk sizes: negative makes zero/backward progress
      // (infinite loop); huge positive overflows `off` past the bound
      // check into a SIOOBE — both are undecodable, not crashes
      if (size < 0 || size > bytes.length - off - 8) return None
      off += 8 + size + (size & 1) // chunks are word-aligned
    }
    None
  }

  /** PCM payload of a 16-bit mono WAV: walk chunks to `data`, read LE
    * shorts. Same chunk-walk hardening as [[decodeWav]].
    */
  def decodeWavSamples(bytes: Array[Byte]): Option[Array[Short]] = {
    if (bytes.length < 44) return None
    val asc = new String(bytes, 0, 12, StandardCharsets.US_ASCII)
    if (!asc.startsWith("RIFF") || !asc.regionMatches(8, "WAVE", 0, 4)) return None
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    var off = 12
    while (off + 8 <= bytes.length) {
      val id = new String(bytes, off, 4, StandardCharsets.US_ASCII)
      val size = buf.getInt(off + 4)
      if (size < 0 || size > bytes.length - off - 8) return None
      if (id == "data") {
        val n = size / 2
        val out = new Array[Short](n)
        var i = 0
        while (i < n) { out(i) = buf.getShort(off + 8 + 2 * i); i += 1 }
        return Some(out)
      }
      off += 8 + size + (size & 1)
    }
    None
  }

  /** Audio feature extraction + fingerprint over WAV rows: non-overlapping
    * windows of `window` samples (last window may be partial), per-window
    * energy e_w = Σ|s| (64-bit integer — order-free, bit-exact), and an
    * energy-delta fingerprint packing bit k = [e_{k+1} > e_k] — the
    * Haitsma–Kalker (ISMIR'02) robust-hash shape at its simplest. The
    * fingerprint is an integer, so near-dup audio joins ride the same
    * hamming-pigeonhole bucketing the SimHash/phash tiers use — never a
    * quadratic self-join. mapPartitions batch shape, kernel per row;
    * non-audio rows are dropped by the decode (None ⇒ flatMap skips).
    */
  def audioFingerprint(media: DataFrame, window: Int = 1024): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.flatMap { case (id, bytes) =>
          decodeWavSamples(bytes).map { s =>
            val nw = (s.length + window - 1) / window
            val en = new Array[Long](nw)
            var i = 0
            while (i < s.length) { en(i / window) += math.abs(s(i).toLong); i += 1 }
            // cap at bit 62: keeps fp non-negative, so the SQL replay
            // needs no signed-reassembly bridge (nw here is ≤ 20 anyway)
            var fp = 0L
            var k = 1
            while (k < nw && k <= 63) {
              if (en(k) > en(k - 1)) fp |= 1L << (k - 1)
              k += 1
            }
            (id, nw.toLong, fp)
          }
        }
      }
      .toDF("doc_id", "n_windows", "fp")
  }

  /** Energy-threshold voice-activity detection over the WAV rows:
    * frames of `frame` samples (last partial kept), a frame is ACTIVE
    * when its Σ|s| energy exceeds `threshold` (default = frame × 1024,
    * the sawtooth's mean |sample| — splits frames near 50/50 so the
    * segment structure is non-trivial), and consecutive active frames
    * merge into segments (gaps-and-islands). Output per doc:
    * (n_frames, n_active, n_segments, longest) — the
    * speech/silence summary a media-curation funnel thresholds on.
    *
    * Scale shape: one mapPartitions decode kernel, bounded per-row
    * work, relational integer output, ZERO shuffles before the
    * caller's ordering. Integer energies replay exactly in SQL from
    * the closed-form sawtooth payload (the mm_audio_fp oracle trick).
    */
  def vadSegments(media: DataFrame, frame: Int = 256,
                  threshold: Long = 256L * 1024): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.flatMap { case (id, bytes) =>
          decodeWavSamples(bytes).map { s =>
            val nf = (s.length + frame - 1) / frame
            val en = new Array[Long](nf)
            var i = 0
            while (i < s.length) { en(i / frame) += math.abs(s(i).toLong); i += 1 }
            var active = 0L; var segs = 0L; var longest = 0L
            var run = 0L
            var k = 0
            while (k < nf) {
              if (en(k) > threshold) {
                active += 1; run += 1
                if (run == 1) segs += 1
                if (run > longest) longest = run
              } else run = 0
              k += 1
            }
            (id, nf.toLong, active, segs, longest)
          }
        }
      }
      .toDF("doc_id", "n_frames", "n_active", "n_segments", "longest")
  }

  // ---------------------------------------------------------------- Y4M

  private def y4mHeader(width: Int, height: Int): String =
    s"YUV4MPEG2 W$width H$height F25:1 Ip A1:1 C444\n"

  /** YUV4MPEG2, C444 (three full planes per frame — frame payload is
    * exactly w*h*3 bytes, like the RGB math downstream expects). Plane
    * bytes are the same deterministic gradient as BMP rows.
    */
  def encodeY4m(width: Int, height: Int, nFrames: Int): Array[Byte] = {
    val header = y4mHeader(width, height).getBytes(StandardCharsets.US_ASCII)
    val frameHdr = "FRAME\n".getBytes(StandardCharsets.US_ASCII)
    val frameLen = width * height * 3
    val out = new Array[Byte](header.length + nFrames * (frameHdr.length + frameLen))
    System.arraycopy(header, 0, out, 0, header.length)
    val pattern = gradient(frameLen + nFrames) // frame f byte i = (i+f)%251
    var pos = header.length
    var f = 0
    while (f < nFrames) {
      System.arraycopy(frameHdr, 0, out, pos, frameHdr.length)
      pos += frameHdr.length
      System.arraycopy(pattern, f, out, pos, frameLen)
      pos += frameLen
      f += 1
    }
    out
  }

  def decodeY4m(bytes: Array[Byte]): Option[Meta] = {
    if (bytes.length < 10) return None
    val headEnd = bytes.indexOf('\n'.toByte)
    if (headEnd < 0) return None
    val head = new String(bytes, 0, headEnd, StandardCharsets.US_ASCII)
    if (!head.startsWith("YUV4MPEG2")) return None
    val params = head.split(' ').toSeq
    def param(p: Char): Option[Int] =
      params.collectFirst { case s if s.length > 1 && s.head == p =>
        s.tail.toIntOption }.flatten
    (param('W'), param('H')) match {
      case (Some(w), Some(h)) if w > 0 && h > 0 =>
        val colorspace = params.collectFirst {
          case s if s.startsWith("C") => s.tail }.getOrElse("420")
        // Long: w*h*3 overflows Int for foreign headers (round-4 review —
        // a negative frameLen either crashed the walk or spun it forever)
        val frameLen: Long = colorspace match {
          case "444" => w.toLong * h * 3
          case "422" => w.toLong * h * 2
          case _ => w.toLong * h * 3 / 2 // 420 family
        }
        // round-3 advice: the spec allows per-frame parameters
        // ("FRAME <params>\n"), so frames are counted by walking the
        // actual frame headers (scan to each newline), not by dividing
        // the body by a fixed 6-byte header
        var pos: Long = headEnd + 1
        var nFrames = 0
        // 3·w·h < 1.5·2^63 so a 64-bit wrap is always negative; a
        // wrapped (or absurd) frameLen means zero decodable frames
        // (second-pass review: the wrap crashed the walk)
        var ok = frameLen > 0
        while (ok && pos + 5 <= bytes.length &&
            bytes(pos.toInt) == 'F' && bytes(pos.toInt + 1) == 'R' &&
            bytes(pos.toInt + 2) == 'A' && bytes(pos.toInt + 3) == 'M' &&
            bytes(pos.toInt + 4) == 'E') {
          var nl = pos.toInt + 5
          while (nl < bytes.length && bytes(nl) != '\n') nl += 1
          if (nl >= bytes.length || nl + 1 + frameLen > bytes.length) ok = false
          else { nFrames += 1; pos = nl + 1 + frameLen }
        }
        Some(Meta("video", w, h, 3, nFrames, 0))
      case _ => None
    }
  }

  // --------------------------------------------------------------- JPEG

  /** JPEG SOF metadata: frame dims/components, baseline-vs-progressive,
    * and the header-segment count (through SOS). */
  final case class JpegInfo(width: Int, height: Int, channels: Int,
                            progressive: Boolean, nSegments: Int)

  /** Synthesize a structurally valid JFIF stream: SOI, APP0(JFIF), DQT,
    * SOF0/SOF2 carrying the dims, a stub DHT, SOS, then an
    * entropy-coded payload of ⌊w·h/16⌋ gradient bytes (values < 0xFF so
    * no byte-stuffing ambiguity), EOI. Total size is the closed form
    * 146 + ⌊w·h/16⌋ the `mm_jpeg` oracle recomputes (JpegSpec pins the
    * constant). The entropy data is NOT a decodable scan (a Huffman
    * coder is out of scope — the STUBBED step per the brief); every
    * header byte is real, which is all [[decodeJpegInfo]] reads.
    */
  def encodeJpeg(width: Int, height: Int,
                 progressive: Boolean): Array[Byte] = {
    require(width > 0 && width <= 0xffff && height > 0 && height <= 0xffff,
      s"JPEG dims out of 16-bit range: ${width}x$height")
    val k = width * height / 16
    val bb = ByteBuffer.allocate(146 + k) // JPEG is big-endian
    bb.putShort(0xFFD8.toShort) // SOI
    bb.putShort(0xFFE0.toShort); bb.putShort(16) // APP0
    bb.put("JFIF".getBytes(StandardCharsets.US_ASCII)); bb.put(0.toByte)
    bb.put(1.toByte); bb.put(1.toByte) // version 1.1
    bb.put(0.toByte) // aspect-ratio units
    bb.putShort(1); bb.putShort(1) // density
    bb.put(0.toByte); bb.put(0.toByte) // no thumbnail
    bb.putShort(0xFFDB.toShort); bb.putShort(67); bb.put(0.toByte) // DQT
    var i = 0
    while (i < 64) { bb.put(((i % 254) + 1).toByte); i += 1 }
    bb.putShort((if (progressive) 0xFFC2 else 0xFFC0).toShort) // SOF
    bb.putShort(17); bb.put(8.toByte)
    bb.putShort(height.toShort); bb.putShort(width.toShort)
    bb.put(3.toByte) // YCbCr
    bb.put(1.toByte); bb.put(0x22.toByte); bb.put(0.toByte) // Y 2x2
    bb.put(2.toByte); bb.put(0x11.toByte); bb.put(0.toByte) // Cb
    bb.put(3.toByte); bb.put(0x11.toByte); bb.put(0.toByte) // Cr
    bb.putShort(0xFFC4.toShort); bb.putShort(20); bb.put(0.toByte) // DHT
    val counts = new Array[Byte](16); counts(1) = 1
    bb.put(counts); bb.put(0.toByte)
    bb.putShort(0xFFDA.toShort); bb.putShort(12); bb.put(3.toByte) // SOS
    bb.put(1.toByte); bb.put(0.toByte)
    bb.put(2.toByte); bb.put(0x11.toByte)
    bb.put(3.toByte); bb.put(0x11.toByte)
    bb.put(0.toByte); bb.put(63.toByte); bb.put(0.toByte)
    i = 0
    while (i < k) { bb.put((i % 251).toByte); i += 1 } // no 0xFF bytes
    bb.putShort(0xFFD9.toShort) // EOI
    bb.array()
  }

  /** Marker-walking JPEG header parse — what `file(1)`/exiftool do:
    * skip 0xFF fill bytes, step length-delimited segments, read the
    * frame header from any SOF0–SOF15 (except the non-frame C4/C8/CC),
    * stop at SOS (entropy data is not length-delimited) or EOI. Returns
    * None on truncation, a missing SOF, zero dims, or a component
    * count the segment length can't hold — the same
    * hostile-input hardening as [[decodeBmp]]/[[decodeWav]]. Works on
    * real-world JPEGs, not just [[encodeJpeg]]'s: fill bytes, extra
    * APPn/COM segments and restart markers all walk correctly
    * (JpegSpec splices a COM segment in and checks the count).
    */
  def decodeJpegInfo(bytes: Array[Byte]): Option[JpegInfo] = {
    if (bytes == null || bytes.length < 4 ||
        (bytes(0) & 0xff) != 0xFF || (bytes(1) & 0xff) != 0xD8) return None
    def u8(p: Int) = bytes(p) & 0xff
    def u16(p: Int) = (u8(p) << 8) | u8(p + 1)
    var off = 2
    var segs = 0
    var sof: Option[(Int, Int, Int, Boolean)] = None
    while (off + 1 < bytes.length) {
      if (u8(off) != 0xFF) return None
      var m = off + 1
      while (m < bytes.length && u8(m) == 0xFF) m += 1 // fill bytes
      if (m >= bytes.length) return None
      val marker = u8(m)
      if (marker == 0xD9) off = bytes.length // EOI
      else if ((marker >= 0xD0 && marker <= 0xD7) || marker == 0x01)
        off = m + 1 // standalone RSTn / TEM
      else {
        if (m + 2 >= bytes.length) return None
        val len = u16(m + 1)
        if (len < 2 || m + 1 + len > bytes.length) return None
        segs += 1
        if (marker >= 0xC0 && marker <= 0xCF && marker != 0xC4 &&
            marker != 0xC8 && marker != 0xCC) {
          if (len < 8) return None
          val h = u16(m + 4); val w = u16(m + 6); val nc = u8(m + 8)
          if (w == 0 || h == 0 || nc == 0 || len < 8 + 3 * nc) return None
          sof = Some((w, h, nc, marker == 0xC2))
        }
        if (marker == 0xDA) off = bytes.length // SOS: entropy follows
        else off = m + 1 + len
      }
    }
    sof.map { case (w, h, nc, prog) => JpegInfo(w, h, nc, prog, segs) }
  }

  // ------------------------------------------------------------ dispatch

  /** Decode any supported container by magic: BMP / PNG / JPEG / WAV /
    * Y4M (real formats) plus the legacy GFT1 synthetic container.
    */
  def decode(bytes: Array[Byte]): Option[Meta] = {
    if (bytes == null || bytes.length < 4) return None
    if (bytes(0) == 'B' && bytes(1) == 'M') decodeBmp(bytes)
    else if (bytes(0) == 0x89.toByte && bytes(1) == 'P' && bytes(2) == 'N' &&
             bytes(3) == 'G') decodePng(bytes)
    else if ((bytes(0) & 0xff) == 0xFF && (bytes(1) & 0xff) == 0xD8)
      decodeJpegInfo(bytes).map(j =>
        Meta("image", j.width, j.height, j.channels, 1, 0))
    else if (bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' &&
             bytes(3) == 'F') decodeWav(bytes)
    else if (bytes(0) == 'Y' && bytes(1) == 'U' && bytes(2) == 'V') decodeY4m(bytes)
    else decodeStub(bytes)
  }

  /** Legacy synthetic container (pre-round-3 fixtures): "GFT1|" header. */
  def decodeStub(bytes: Array[Byte]): Option[Meta] = {
    if (bytes == null || bytes.length < 5) return None
    val head = new String(bytes, 0, math.min(bytes.length, 64),
      StandardCharsets.US_ASCII)
    if (!head.startsWith(Magic + "|")) return None
    head.split('|') match {
      case Array(_, kind, w, h, c, f, sr, _*) =>
        try Some(Meta(kind, w.toInt, h.toInt, c.toInt, f.toInt, sr.toInt))
        catch { case _: NumberFormatException => None }
      case _ => None
    }
  }

  /** Re-encode a Meta in its kind's real container (used by resize). */
  def encodeFor(meta: Meta): Array[Byte] = meta.kind match {
    case "image" => encodeBmp(meta.width, meta.height)
    case "audio" => encodeWav(meta.sampleRate, meta.sampleRate) // keep 1s
    case "video" => encodeY4m(meta.width, meta.height, meta.nFrames)
    case _ => encode(meta)
  }

  /** [[encodeFor]] that preserves the source container: an image that
    * arrived as PNG re-encodes as PNG, not BMP (resize must not swap
    * formats under the caller).
    */
  def encodeSameContainer(orig: Array[Byte], meta: Meta): Array[Byte] =
    if (meta.kind == "image" && orig.length >= 4 &&
        orig(0) == 0x89.toByte && orig(1) == 'P')
      encodePng(meta.width, meta.height)
    else encodeFor(meta)

  /** Legacy synthetic encoder (GFT1), kept for the stub container tests. */
  def encode(meta: Meta): Array[Byte] = {
    val header = s"$Magic|${meta.kind}|${meta.width}|${meta.height}|" +
      s"${meta.channels}|${meta.nFrames}|${meta.sampleRate}|"
    val hb = header.getBytes(StandardCharsets.US_ASCII)
    val payloadLen = meta.kind match {
      case "image" => meta.width * meta.height * meta.channels
      case "video" => meta.width * meta.height * meta.channels * meta.nFrames
      case "audio" => meta.sampleRate * 2 // 1s of 16-bit samples
      case _ => 0
    }
    val out = new Array[Byte](hb.length + payloadLen)
    System.arraycopy(hb, 0, out, 0, hb.length)
    out
  }

  // ---------------------------------------------------------------- GIF

  /** GIF89a with a REAL LZW codec, pure JVM from the published spec
    * (GIF89a, CompuServe 1990; the LZW variant is Welch 1984 with
    * GIF's variable code widths and clear/end codes). Layout: header,
    * logical screen descriptor, 256-entry global color table
    * (deterministic palette: entry i = (i, 2i mod 256, 3i mod 256)),
    * image descriptor, min-code-size byte (8), LZW data in ≤255-byte
    * sub-blocks, trailer. Pixel INDEX at (x, y) is the (x+y) mod 251
    * gradient every other container here uses, so index-derived stats
    * replay as closed forms in SQL without running LZW — while the
    * values themselves only come out right if the LZW round trip is
    * bit-correct. The encoder emits a genuine compressor (greedy
    * longest-match dictionary, width growth at the decoder's exact
    * schedule, proactive CLEAR when the 4096-entry space fills), not
    * the single-codes-only "uncompressed GIF" shortcut — GifSpec
    * cross-checks the output against the JDK's own ImageIO decoder,
    * an independent implementation.
    */
  def encodeGif(width: Int, height: Int): Array[Byte] = {
    require(width > 0 && width <= 0xffff && height > 0 && height <= 0xffff)
    val n = width * height
    val idx = new Array[Int](n)
    var p = 0; var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { idx(p) = (x + y) % 251; p += 1; x += 1 }
      y += 1
    }
    val lzw = lzwEncode(idx, 8)
    val out = new java.io.ByteArrayOutputStream(
      13 + 768 + 10 + 1 + lzw.length + lzw.length / 255 + 3)
    out.write("GIF89a".getBytes(StandardCharsets.US_ASCII))
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    u16(width); u16(height)
    out.write(0xF7) // GCT present, 8-bit color resolution, 256 entries
    out.write(0)    // background color index
    out.write(0)    // aspect ratio
    var i = 0
    while (i < 256) {
      out.write(i); out.write((2 * i) & 0xff); out.write((3 * i) & 0xff)
      i += 1
    }
    out.write(0x2C) // image descriptor
    u16(0); u16(0); u16(width); u16(height)
    out.write(0)    // no local color table, not interlaced
    out.write(8)    // LZW min code size
    var off = 0
    while (off < lzw.length) {
      val len = math.min(255, lzw.length - off)
      out.write(len); out.write(lzw, off, len)
      off += len
    }
    out.write(0)    // block terminator
    out.write(0x3B) // trailer
    out.toByteArray
  }

  /** GIF-variant LZW compress: codes LSB-first at variable width
    * starting minCodeSize+1; dictionary keyed (prefix code, symbol);
    * width grows when the DECODER's next-entry counter reaches 2^w
    * (the encoder runs one entry ahead, hence the +1 in the check);
    * a CLEAR resets the table when the 4096-entry space fills.
    */
  private[multimodal] def lzwEncode(indices: Array[Int],
                                    minCodeSize: Int): Array[Byte] = {
    val clear = 1 << minCodeSize
    val end = clear + 1
    val out = new java.io.ByteArrayOutputStream()
    var bitBuf = 0L; var bitCnt = 0
    var width = minCodeSize + 1
    def emit(code: Int): Unit = {
      bitBuf |= code.toLong << bitCnt; bitCnt += width
      while (bitCnt >= 8) {
        out.write((bitBuf & 0xff).toInt); bitBuf >>>= 8; bitCnt -= 8
      }
    }
    var dict = new java.util.HashMap[Long, Integer]()
    var encNext = end + 1   // encoder's next entry code (runs one ahead)
    var decNext = end + 1   // DECODER's counter — drives the width
    var sinceClear = 0      // decoder adds no entry after the 1st code
    emit(clear)
    def bookkeep(): Unit = { // decoder state after it reads the code
      sinceClear += 1
      if (sinceClear >= 2 && decNext < 4096) {
        decNext += 1
        if (decNext == (1 << width) && width < 12) width += 1
      }
    }
    var prev = indices(0)
    var i = 1
    while (i < indices.length) {
      val key = prev.toLong << 12 | indices(i)
      val hit = dict.get(key)
      if (hit != null) prev = hit.intValue()
      else {
        emit(prev); bookkeep()
        if (encNext < 4096) { dict.put(key, encNext); encNext += 1 }
        else {
          emit(clear)
          dict = new java.util.HashMap[Long, Integer]()
          encNext = end + 1; decNext = end + 1; sinceClear = 0
          width = minCodeSize + 1
        }
        prev = indices(i)
      }
      i += 1
    }
    emit(prev); bookkeep()
    emit(end)
    if (bitCnt > 0) out.write((bitBuf & 0xff).toInt)
    out.toByteArray
  }

  /** GIF-variant LZW decompress (the dual of [[lzwEncode]], incl. the
    * code==next "KwKwK" case and deferred-clear tolerance). Returns
    * None on any malformed stream rather than wild output. */
  private[multimodal] def lzwDecode(data: Array[Byte], minCodeSize: Int,
                                    expected: Int): Option[Array[Int]] = {
    val clear = 1 << minCodeSize
    val end = clear + 1
    val out = new Array[Int](expected)
    var produced = 0
    var bitBuf = 0L; var bitCnt = 0; var pos = 0
    var width = minCodeSize + 1
    // dict entries as (prefix entry index, last symbol); roots implicit
    val prefixOf = new Array[Int](4096)
    val symOf = new Array[Int](4096)
    val lenOf = new Array[Int](4096)
    var next = end + 1
    var prevCode = -1
    def readCode(): Int = {
      while (bitCnt < width && pos < data.length) {
        bitBuf |= (data(pos) & 0xffL) << bitCnt; bitCnt += 8; pos += 1
      }
      if (bitCnt < width) return -1
      val c = (bitBuf & ((1L << width) - 1)).toInt
      bitBuf >>>= width; bitCnt -= width
      c
    }
    def expand(code: Int, extra: Int): Boolean = {
      // write entry `code` (+ optional first-symbol repeat) at produced
      val len = if (code < clear) 1 else lenOf(code)
      if (produced + len + extra > expected) return false
      var c = code; var q = produced + len - 1
      while (c >= clear) { out(q) = symOf(c); q -= 1; c = prefixOf(c) }
      out(q) = c
      if (extra == 1) out(produced + len) = out(produced)
      produced += len + extra
      true
    }
    var running = true
    while (running) {
      val code = readCode()
      if (code < 0) return None
      if (code == clear) {
        next = end + 1; width = minCodeSize + 1; prevCode = -1
      } else if (code == end) {
        running = false
      } else if (prevCode < 0) {
        if (code >= clear) return None // first code must be a root
        if (!expand(code, 0)) return None
        prevCode = code
      } else {
        val prevLen = if (prevCode < clear) 1 else lenOf(prevCode)
        if (code < next && (code < clear || code >= end + 1)) {
          val mark = produced
          if (!expand(code, 0)) return None
          if (next < 4096) {
            prefixOf(next) = prevCode; symOf(next) = out(mark)
            lenOf(next) = prevLen + 1; next += 1
            if (next == (1 << width) && width < 12) width += 1
          }
        } else if (code == next && next < 4096) {
          // KwKwK: entry being defined right now
          val mark = produced
          if (!expand(prevCode, 1)) return None
          prefixOf(next) = prevCode; symOf(next) = out(mark)
          lenOf(next) = prevLen + 1; next += 1
          if (next == (1 << width) && width < 12) width += 1
        } else return None
        prevCode = code
      }
    }
    if (produced == expected) Some(out) else None
  }

  /** GIF metadata via the real parse (dims from the image descriptor,
    * extensions skipped per spec). */
  def decodeGif(bytes: Array[Byte]): Option[Meta] =
    decodeGifIndices(bytes).map { case (w, h, _) =>
      Meta("image", w, h, 3, 1, 0)
    }

  /** Full GIF decode to the palette-index array: header + LSD + GCT,
    * any 0x21 extension blocks skipped (label + sub-blocks), image
    * descriptor (+ optional local color table), LZW data reassembled
    * from sub-blocks and decompressed. None on malformed input. */
  def decodeGifIndices(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    if (bytes.length < 14) return None
    val sig = new String(bytes, 0, 6, StandardCharsets.US_ASCII)
    if (sig != "GIF89a" && sig != "GIF87a") return None
    def u16(p: Int) = (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8)
    var p = 6
    p += 4 // logical screen dims (the image descriptor's govern)
    val packed = bytes(p) & 0xff; p += 3
    if ((packed & 0x80) != 0) p += 3 * (2 << (packed & 7)) // skip GCT
    while (p < bytes.length && (bytes(p) & 0xff) == 0x21) {
      p += 2 // extension introducer + label
      while (p < bytes.length && bytes(p) != 0) p += 1 + (bytes(p) & 0xff)
      p += 1
    }
    if (p >= bytes.length || (bytes(p) & 0xff) != 0x2C) return None
    if (p + 10 > bytes.length) return None
    val w = u16(p + 5); val h = u16(p + 7)
    val ipacked = bytes(p + 9) & 0xff
    p += 10
    if ((ipacked & 0x80) != 0) p += 3 * (2 << (ipacked & 7)) // local CT
    if (p >= bytes.length) return None
    val minCode = bytes(p) & 0xff; p += 1
    if (minCode < 2 || minCode > 8) return None
    if (w <= 0 || h <= 0 || w.toLong * h > Int.MaxValue) return None
    val lzw = new java.io.ByteArrayOutputStream()
    var ok = true
    while (ok && p < bytes.length && bytes(p) != 0) {
      val len = bytes(p) & 0xff
      if (p + 1 + len > bytes.length) ok = false
      else { lzw.write(bytes, p + 1, len); p += 1 + len }
    }
    if (!ok) return None
    lzwDecode(lzw.toByteArray, minCode, w * h).map((w, h, _))
  }

  /** Synthesize a deterministic media table from documents: kind cycles
    * image/audio/video by doc_id; dimensions derive from doc_id. Every
    * row is a REAL container (BMP / WAV / Y4M) — the mm_meta oracle
    * recomputes width/height/sample-rate/file-size from the container
    * specs, so a decoder reading anything but the actual headers fails
    * the hash check.
    */
  def mediaTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.select(col("doc_id")).as[Long].map { id =>
      val w = (64 + id % 64).toInt
      val h = (64 + (id / 2) % 64).toInt
      (id % 3) match {
        // image rows alternate containers: PNG (id % 6 == 0) exercises
        // the compressed-container decode path, BMP the uncompressed one
        case 0 => (id, "image",
          if (id % 6 == 0) encodePng(w, h) else encodeBmp(w, h))
        // duration varies by doc_id (0.5-1.25 s) so the audio
        // fingerprint tier sees real variance; doc_ids congruent mod 11
        // are bit-identical twins the dedup tier must find
        case 1 => (id, "audio", encodeWav(16000, (8000 + id % 11 * 1200).toInt))
        case _ => (id, "video", encodeY4m(w, h, (1 + id % 30).toInt))
      }
    }.toDF("doc_id", "kind", "media")
  }

  /** Batch decode: mapPartitions over (id, bytes) — one partition = one
    * batch, mirroring `mapInPandas` batch shape. Output: typed metadata
    * struct columns + payload size.
    */
  def decodeMeta(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (id, bytes) =>
          decode(bytes) match {
            case Some(m) => (id, m.kind, m.width, m.height, m.channels,
              m.nFrames, m.sampleRate, bytes.length.toLong, true)
            case None => (id, "unknown", 0, 0, 0, 0, 0,
              if (bytes == null) 0L else bytes.length.toLong, false)
          }
        }
      }
      .toDF("doc_id", "kind", "width", "height", "channels", "n_frames",
        "sample_rate", "n_bytes", "decoded")
  }

  /** Resize: recompute target dims preserving aspect ratio (integer
    * floor math — deterministic), then re-encode in the same real
    * container. Image rows are ACTUALLY RESAMPLED (nearest-neighbor over
    * the decoded pixels — round 5; previously a same-dims synthetic
    * payload); video re-encodes its frame geometry; audio rows pass
    * through unchanged (no spatial dims).
    */
  def resize(media: DataFrame, maxSide: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.flatMap { case (id, bytes) =>
          decode(bytes).map { m =>
            val longest = math.max(m.width, m.height)
            // clamp to >=1: extreme aspect ratios (200x1 at maxSide 100)
            // floor the short side to 0, which no raster container can
            // encode (round-5 review — the resample path crashed there)
            val (w2, h2) =
              if (longest <= maxSide) (m.width, m.height)
              else (math.max(1, m.width * maxSide / longest),
                math.max(1, m.height * maxSide / longest))
            val resized = m.copy(width = w2, height = h2)
            val out =
              if ((w2, h2) == (m.width, m.height)) bytes
              else if (m.kind == "image") {
                val px = decodePixels(bytes)
                  .map(resamplePixels(_, w2, h2))
                px match {
                  case Some(rows) if bytes(0) == 0x89.toByte =>
                    encodePngFromPixels(rows)
                  case Some(rows) => encodeBmpFromPixels(rows)
                  case None => encodeSameContainer(bytes, resized)
                }
              } else encodeSameContainer(bytes, resized)
            (id, w2, h2, out)
          }
        }
      }
      .toDF("doc_id", "width", "height", "media")
  }

  /** Frame sampling for video rows: every `stride`-th frame index. */
  def frameSample(media: DataFrame, stride: Int): DataFrame = {
    val meta = decodeMeta(media)
    meta.filter(col("kind") === "video")
      .select(col("doc_id"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride)))
          .as("frame_idx"))
  }
}
