package graft.ann

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

  private def scalaBruteTopK(k: Int, queryIds: Set[Long]): Map[Long, Seq[Long]] = {
    val all = emb.select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0),
        r.getAs[scala.collection.Seq[Float]](1).map(_.toDouble).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    queryIds.map { q =>
      val qv = all.find(_._1 == q).get._2
      val ranked = all.filter(_._1 != q)
        .map { case (id, v) => (id, cos(qv, v)) }
        .sortBy { case (id, c) => (-c, id) }(
          Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long))
        .take(k).map(_._1).toSeq
      q -> ranked
    }.toMap
  }

  test("brute-force cosine top-k matches driver-side reference") {
    val queryIds = Set(0L, 50L, 100L)
    val got = Similarity.bruteForceTopK(emb, col("vec_id").isin(queryIds.toSeq: _*), 5)
      .collect().groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rows) =>
        q -> rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("cand_id")).toSeq }
    assert(got == scalaBruteTopK(5, queryIds))
  }

  test("LSH top-k achieves high top-5 recall vs brute force") {
    val queryIds = (0L until 500L by 25L).toSet
    val brute = scalaBruteTopK(5, queryIds)
    val lsh = Similarity.lshTopK(emb, col("vec_id").isin(queryIds.toSeq: _*), 5)
      .collect().groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rows) => q -> rows.map(_.getAs[Long]("cand_id")).toSet }
    val recalls = queryIds.toSeq.map { q =>
      val found = lsh.getOrElse(q, Set.empty)
      brute(q).count(found).toDouble / 5
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.6, s"mean top-5 recall $mean too low")
  }

  test("trained IVF codebook: deterministic, recall >= sampled at equal C") {
    val queryIds = (0L until 500L by 25L).toSet
    val qPred = col("vec_id").isin(queryIds.toSeq: _*)
    val initPred = col("vec_id") % 31 === 5 // same C as the sampled tier
    // determinism: identical codebook under different partitioning
    val cb1 = Similarity.trainCodebook(emb, initPred, iters = 3)
    val cb2 = Similarity.trainCodebook(emb.repartition(7), initPred, iters = 3)
    assert(cb1.length == cb2.length && cb1.nonEmpty)
    assert(cb1.zip(cb2).forall { case ((i1, v1), (i2, v2)) =>
      i1 == i2 && v1.sameElements(v2) })

    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val brute = scalaBruteTopK(5, queryIds)
      val got = df.collect().groupBy(_.getAs[Long]("query_id"))
        .map { case (q, rows) => q -> rows.map(_.getAs[Long]("cand_id")).toSet }
      val rs = queryIds.toSeq.map(q =>
        brute(q).count(got.getOrElse(q, Set.empty)).toDouble / 5)
      rs.sum / rs.size
    }
    val sampled = recallOf(Similarity.ivfTopK(emb, qPred, initPred, 5, nProbe = 4))
    val trained = recallOf(
      Similarity.ivfTopKTrained(emb, qPred, initPred, 5, nProbe = 4, iters = 3))
    // Lloyd's tightens the lists: trained must not be worse (small slack
    // for boundary flips). Absolute recall is modest by design here —
    // these are random-ish embeddings (no cluster structure) on a tiny
    // corpus with nProbe/C = 1/8 of the lists scanned; the StressBench
    // `ivf` section records both tiers at sf0.1.
    assert(trained >= sampled - 0.02,
      s"trained recall $trained < sampled $sampled")
    assert(trained >= 0.5, s"trained recall $trained below floor")
  }

  test("trained IVF codebook beats sampled centroids on CLUSTERED data") {
    // the sf corpora are ~uniform on the sphere (no structure to learn);
    // real embedding spaces are clustered — plant 20 Gaussian clusters
    // and show Lloyd's aligns the inverted lists with them
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val dim = 32
    val centers = Array.fill(20)(Array.fill(dim)(rnd.nextGaussian().toFloat))
    val vecs: Seq[(Long, Seq[Float])] = (0 until 2000).map { i =>
      val c = centers(i % 20)
      (i.toLong, c.toSeq.map(x => x + 0.15f * rnd.nextGaussian().toFloat))
    }
    val cemb = vecs.toDF("vec_id", "embedding")
    val queryIds = (0L until 2000L by 97L).toSet
    val qPred = col("vec_id").isin(queryIds.toSeq: _*)
    val initPred = col("vec_id") % 100 === 7 // C = 20 = true cluster count

    // driver-side exact truth
    val all = vecs.map { case (id, v) => (id, v.map(_.toDouble).toArray) }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val truth = queryIds.map { q =>
      val qv = all.find(_._1 == q).get._2
      q -> all.filter(_._1 != q).map { case (id, v) => (id, cos(qv, v)) }
        .sortBy { case (id, c) => (-c, id) }(
          Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long))
        .take(5).map(_._1).toSet
    }.toMap
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.collect().groupBy(_.getAs[Long]("query_id"))
        .map { case (q, rows) => q -> rows.map(_.getAs[Long]("cand_id")).toSet }
      val rs = queryIds.toSeq.map(q =>
        truth(q).count(got.getOrElse(q, Set.empty)).toDouble / 5)
      rs.sum / rs.size
    }
    val sampled = recallOf(
      Similarity.ivfTopK(cemb, qPred, initPred, 5, nProbe = 2))
    val trained = recallOf(
      Similarity.ivfTopKTrained(cemb, qPred, initPred, 5, nProbe = 2, iters = 5))
    assert(trained > sampled,
      s"trained $trained must beat sampled $sampled on clustered data")
    assert(trained >= 0.8, s"trained recall $trained below clustered floor")
  }

  test("semanticDedup: prunes within-cluster twin families to min-id; " +
      "cluster scope documented by a cross-cluster miss") {
    // two well-separated clusters on orthogonal axes; dups = tiny
    // per-component perturbations (cosine ~ 1), distinct rows otherwise
    def v(axis: Int, eps: Float): Seq[Float] =
      Seq.tabulate(8)(i => (if (i == axis) 1f else 0f) +
        (if (i == (axis + 1) % 8) eps else 0f))
    val rows = Seq(
      (0L, v(0, 0.00f)), (1L, v(0, 0.01f)), (2L, v(0, 0.02f)), // family A
      (3L, v(0, 0.9f)),                                        // A-ish, far
      (10L, v(4, 0.00f)), (11L, v(4, 0.01f)),                  // family B
      (12L, v(4, 0.9f)))
    val emb2 = rows.toDF("vec_id", "embedding")
    // centroids: one per cluster (ids 0 and 10) — modular pred replaced
    // by an explicit id set for the synthetic fixture
    val got = Similarity.semanticDedup(emb2,
        centroidPred = col("vec_id").isin(0L, 10L), threshold = 0.995)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 0L, 11L -> 10L),
      s"unexpected prune set: $got")
    // the far members survive even though they share the cluster —
    // threshold scoping inside the cluster
    assert(!got.contains(3L) && !got.contains(12L))
  }

  test("trained IVF on an empty corpus returns empty like the sampled tier") {
    val empty = emb.filter(col("vec_id") < 0)
    assert(Similarity.ivfTopKTrained(empty, col("vec_id") >= 0,
      col("vec_id") % 31 === 5, 5).isEmpty)
  }

  test("quantized top-1 is deterministic and integer-exact") {
    val a = Similarity.quantizedTop1(emb, col("vec_id") < 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val b = Similarity.quantizedTop1(emb.repartition(7), col("vec_id") < 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(a.sameElements(b))
  }
}

class TextAnalysisSpec extends SparkSpec {
  import graft.text.TextAnalysis

  test("language detection separates the profiled languages") {
    assert(TextAnalysis.detectLanguage(
      "the dog runs over the field and the other animals said") == "en")
    assert(TextAnalysis.detectLanguage(
      "der hund läuft über das feld und die anderen tiere") == "de")
    assert(TextAnalysis.detectLanguage(
      "le chien court dans le champ avec les autres animaux") == "fr")
    assert(TextAnalysis.detectLanguage(
      "el perro corre sobre el campo con los animales") == "es")
    assert(TextAnalysis.detectLanguage("") == "und")
  }

  test("rolling-hash window fingerprints: shared windows collide, others don't") {
    val a = "one two three four five six seven"
    val b = "zero one two three four five nine" // shares window "one..five"
    val c = "x y z w v u t"
    val ha = TextAnalysis.windowHashes(a, 5).toSet
    val hb = TextAnalysis.windowHashes(b, 5).toSet
    val hc = TextAnalysis.windowHashes(c, 5).toSet
    assert((ha & hb).nonEmpty)
    assert((ha & hc).isEmpty)
  }

  test("bpe-ish token count segments punctuation (Column form)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq("hello, world! it's 42").toDF("text")
      .select(TextAnalysis.bpeishTokenCount(col("text")).as("n"))
    // hello , world ! it ' s 42 → 8
    assert(df.head.getLong(0) == 8L)
  }
}

class MultimodalSpec extends SparkSpec {
  import graft.multimodal.Multimodal

  test("legacy GFT1 container encode/decode round-trips metadata") {
    val m = Multimodal.Meta("image", 128, 96, 3, 1, 16000)
    val decoded = Multimodal.decodeStub(Multimodal.encode(m))
    assert(decoded.contains(m))
    assert(Multimodal.decode("garbage".getBytes) == None)
    assert(Multimodal.decode(null) == None)
  }

  test("BMP: header fields parse back; row padding and 54-byte headers " +
       "give the spec file size") {
    val bytes = Multimodal.encodeBmp(33, 20) // odd width forces row padding
    assert(bytes(0) == 'B' && bytes(1) == 'M')
    val rowSize = ((3 * 33 + 3) / 4) * 4 // 100, padded from 99
    assert(bytes.length == 54 + rowSize * 20)
    assert(Multimodal.decode(bytes).contains(
      Multimodal.Meta("image", 33, 20, 3, 1, 0)))
    // file-size field in the header matches reality (LE u32 at offset 2)
    val fs = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt(2)
    assert(fs == bytes.length)
  }

  test("WAV: RIFF/fmt/data framing parses back; chunk walk tolerates " +
       "extra chunks") {
    val bytes = Multimodal.encodeWav(16000, 16000)
    assert(bytes.length == 44 + 32000)
    assert(Multimodal.decode(bytes).contains(
      Multimodal.Meta("audio", 0, 0, 1, 0, 16000)))
    // insert a LIST chunk between WAVE and fmt — decoder must skip it
    val list = "LIST".getBytes ++ Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes
    val padded = bytes.take(12) ++ list ++ bytes.drop(12)
    assert(Multimodal.decodeWav(padded).exists(_.sampleRate == 16000))
    // a malformed NEGATIVE chunk size must return None, not spin the
    // chunk walk forever (size -8 makes zero forward progress)
    val evil = bytes.take(12) ++ "JUNK".getBytes ++
      Array[Byte](-8, -1, -1, -1) ++ bytes.drop(20)
    assert(Multimodal.decodeWav(evil).isEmpty)
    // a HUGE positive size must not overflow `off` into a SIOOBE
    val huge = bytes.take(12) ++ "JUNK".getBytes ++
      Array[Byte](-12, -1, -1, 0x7f) ++ bytes.drop(20) // 0x7FFFFFF4
    assert(Multimodal.decodeWav(huge).isEmpty)
  }

  test("Y4M: stream header + FRAME framing parses back with frame count") {
    val bytes = Multimodal.encodeY4m(16, 8, 5)
    assert(new String(bytes.take(9)) == "YUV4MPEG2")
    assert(Multimodal.decode(bytes).contains(
      Multimodal.Meta("video", 16, 8, 3, 5, 0)))
    // C420 frame-size math: frameLen = w*h*3/2
    val c420 = "YUV4MPEG2 W4 H4 F25:1 Ip A1:1 C420\n".getBytes ++
      Array.fill(2 * (6 + 24))(0.toByte).patch(0, "FRAME\n".getBytes, 6)
        .patch(30, "FRAME\n".getBytes, 6)
    assert(Multimodal.decodeY4m(c420).exists(_.nFrames == 2))
  }

  test("resize preserves aspect ratio with integer floor math and " +
       "re-encodes real containers") {
    val media = Multimodal.mediaTable(spark, "/root/testdata/sf0.001")
    val resized = Multimodal.resize(media, maxSide = 32).collect()
    assert(resized.nonEmpty)
    for (r <- resized) {
      val w = r.getAs[Int]("width"); val h = r.getAs[Int]("height")
      assert(w <= 32 && h <= 32)
      val redecoded = Multimodal.decode(r.getAs[Array[Byte]]("media")).get
      assert(redecoded.width == w && redecoded.height == h)
    }
    // images keep their source container through the resize: BMP rows
    // stay BMP, PNG rows stay PNG (and neither falls back to GFT1)
    val imgs = resized.filter(r =>
      Multimodal.decode(r.getAs[Array[Byte]]("media")).get.kind == "image")
    assert(imgs.exists(_.getAs[Array[Byte]]("media")(0) == 'B'))
    assert(imgs.exists(_.getAs[Array[Byte]]("media")(0) == 0x89.toByte))
  }

  test("PNG: stored-block encode matches the closed size formula and " +
       "round-trips pixels through Inflater") {
    val (w, h) = (33, 20)
    val bytes = Multimodal.encodePng(w, h)
    val raw = h * (1 + 3 * w)
    val nBlocks = (raw + 65534) / 65535
    assert(bytes.length == 63 + raw + 5 * nBlocks)
    assert(Multimodal.decode(bytes).contains(
      Multimodal.Meta("image", w, h, 3, 1, 0)))
    // pixel round trip: row y byte x = (x+y) mod 251
    val rows = Multimodal.decodePngPixels(bytes).get
    assert(rows.length == h && rows(0).length == 3 * w)
    for (y <- 0 until h; x <- 0 until 3 * w)
      assert((rows(y)(x) & 0xff) == (x + y) % 251)
    // a >65535-byte raw stream needs multiple stored blocks
    val big = Multimodal.encodePng(200, 120) // raw = 72120 > 65535
    val bigRaw = 120 * (1 + 600)
    assert(big.length == 63 + bigRaw + 5 * 2)
    assert(Multimodal.decodePngPixels(big).isDefined)
  }

  test("PNG: foreign Deflater-compressed stream with Sub/Up/Paeth filters " +
       "decodes (the Inflater path is not stored-block-specific)") {
    val (w, h) = (8, 4)
    val rowLen = 3 * w
    // target pixels: (x*7 + y*13) mod 256
    val px = Array.tabulate(h, rowLen)((y, x) => ((x * 7 + y * 13) % 256).toByte)
    // filter rows: y0 Sub, y1 Up, y2 Paeth, y3 None
    val raw = new java.io.ByteArrayOutputStream()
    def u(b: Byte) = b & 0xff
    for (y <- 0 until h) {
      val filter = y match { case 0 => 1; case 1 => 2; case 2 => 4; case _ => 0 }
      raw.write(filter)
      for (x <- 0 until rowLen) {
        val cur = u(px(y)(x))
        val left = if (x >= 3) u(px(y)(x - 3)) else 0
        val up = if (y > 0) u(px(y - 1)(x)) else 0
        val ul = if (y > 0 && x >= 3) u(px(y - 1)(x - 3)) else 0
        val pred = filter match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 4 =>
            val p = left + up - ul
            val (pa, pb, pc) =
              (math.abs(p - left), math.abs(p - up), math.abs(p - ul))
            if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul
        }
        raw.write((cur - pred) & 0xff)
      }
    }
    val deflater = new java.util.zip.Deflater(9)
    deflater.setInput(raw.toByteArray); deflater.finish()
    val zbuf = new Array[Byte](raw.size() + 64)
    val zlen = deflater.deflate(zbuf)
    deflater.end()
    // assemble: sig + IHDR + IDAT(compressed) + IEND
    val out = java.nio.ByteBuffer.allocate(8 + 25 + 12 + zlen + 12)
    out.put(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a))
    def chunk(typ: String, data: Array[Byte]): Unit = {
      out.putInt(data.length); val tb = typ.getBytes("US-ASCII")
      out.put(tb).put(data)
      val crc = new java.util.zip.CRC32; crc.update(tb); crc.update(data)
      out.putInt(crc.getValue.toInt)
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
    ihdr.putInt(w).putInt(h).put(8.toByte).put(2.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte)
    chunk("IHDR", ihdr.array()); chunk("IDAT", zbuf.take(zlen))
    chunk("IEND", Array.emptyByteArray)
    val rows = Multimodal.decodePngPixels(out.array()).get
    for (y <- 0 until h; x <- 0 until rowLen)
      assert(u(rows(y)(x)) == u(px(y)(x)), s"pixel ($y,$x)")
  }

  test("BMP guard: bogus depths and header-promised overruns are rejected") {
    val good = Multimodal.encodeBmp(16, 16)
    def patched(off: Int, v: Byte): Array[Byte] = {
      val b = good.clone(); b(off) = v; b
    }
    assert(Multimodal.decodeBmp(patched(28, 0)).isEmpty)  // bpp = 0
    assert(Multimodal.decodeBmp(patched(28, 7)).isEmpty)  // bpp = 7
    // width inflated to 2^24: promised pixel array exceeds the file
    val wide = good.clone(); wide(21) = 1
    assert(Multimodal.decodeBmp(wide).isEmpty)
    assert(Multimodal.decodeBmp(good).isDefined)
  }

  test("malformed headers with overflowing dimensions are rejected, " +
       "not crashed on (round-4 review)") {
    // Y4M: 30000x30000 C444 frameLen overflows Int; walk must not AIOOBE
    val y4m = "YUV4MPEG2 W30000 H30000 F25:1 Ip A1:1 C444\n".getBytes ++
      "FRAME\n".getBytes ++ Array.fill(64)(0.toByte)
    assert(Multimodal.decodeY4m(y4m).exists(_.nFrames == 0))
    // Y4M C422 negative-wrap frameLen: must not loop forever
    val y4m2 = ("YUV4MPEG2 W5 H429496729 F25:1 Ip A1:1 C422\n").getBytes ++
      "FRAME\n".getBytes ++ Array.fill(64)(0.toByte)
    assert(Multimodal.decodeY4m(y4m2).exists(_.nFrames == 0))
    // PNG: IHDR declaring 65535x65535 passes meta decode but pixel
    // decode must refuse (raw length wraps Int) instead of throwing
    val png = Multimodal.encodePng(4, 4)
    val evil = png.clone()
    val bb = java.nio.ByteBuffer.wrap(evil)
    bb.putInt(16, 65535); bb.putInt(20, 65535)
    assert(Multimodal.decodePng(evil).exists(_.width == 65535))
    assert(Multimodal.decodePngPixels(evil).isEmpty)
    // BMP: bpp=32 with width 2^29 (rowSize wraps Int) and
    // height=Int.MinValue (abs is negative) must both be rejected
    val bmp = Multimodal.encodeBmp(16, 16)
    val wide = bmp.clone()
    val wb = java.nio.ByteBuffer.wrap(wide).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    wb.putShort(28, 32); wb.putInt(18, 1 << 29)
    assert(Multimodal.decodeBmp(wide).isEmpty)
    val minH = bmp.clone()
    java.nio.ByteBuffer.wrap(minH).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(22, Int.MinValue)
    assert(Multimodal.decodeBmp(minH).isEmpty)
    // second-pass corners: products that wrap 64 bits too
    val maxBoth = bmp.clone()
    val mb = java.nio.ByteBuffer.wrap(maxBoth).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    mb.putShort(28, 32); mb.putInt(18, Int.MaxValue); mb.putInt(22, Int.MaxValue)
    assert(Multimodal.decodeBmp(maxBoth).isEmpty)
    val pngMax = Multimodal.encodePng(4, 4).clone()
    val pb = java.nio.ByteBuffer.wrap(pngMax)
    pb.putInt(16, Int.MaxValue); pb.putInt(20, Int.MaxValue)
    assert(Multimodal.decodePngPixels(pngMax).isEmpty)
    val y4mWrap = ("YUV4MPEG2 W2147483647 H1431655767 F25:1 Ip A1:1 C444\n")
      .getBytes ++ "FRAME\n".getBytes ++ Array.fill(64)(0.toByte)
    assert(Multimodal.decodeY4m(y4mWrap).exists(_.nFrames == 0))
  }

  test("Y4M: per-frame parameters are counted correctly") {
    // FRAME headers with params ("FRAME Xsomething\n") — the old
    // body/(6+frameLen) division undercounts these
    val frameLen = 4 * 4 * 3
    val head = "YUV4MPEG2 W4 H4 F25:1 Ip A1:1 C444\n".getBytes
    val f1 = "FRAME Xtag\n".getBytes ++ Array.fill(frameLen)(1.toByte)
    val f2 = "FRAME\n".getBytes ++ Array.fill(frameLen)(2.toByte)
    val f3 = "FRAME Xanother Ylonger\n".getBytes ++ Array.fill(frameLen)(3.toByte)
    val bytes = head ++ f1 ++ f2 ++ f3
    assert(Multimodal.decodeY4m(bytes).exists(_.nFrames == 3))
    // a truncated final frame is not counted
    assert(Multimodal.decodeY4m(bytes.dropRight(1)).exists(_.nFrames == 2))
  }
}

/** dd_embed: embedding-cosine near-dup tier (round-2 addition). */
class EmbedDedupSpec extends graft.SparkSpec {
  test("embedding near-dup pairs: every planted twin found, no random pairs") {
    val dir = "/root/testdata/sf0.001"
    val result = graft.queries.DataQueries.ddEmbed(spark, dir).collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")))
    import org.apache.spark.sql.functions._
    val plantedIds = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") % 40 === 0)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(plantedIds.nonEmpty)
    // all planted (k, k+1000000) pairs found (cosine >= ~0.999 >> 0.99)
    val expected = plantedIds.map(k => (k, k + 1000000L))
    assert(expected.subsetOf(result.toSet),
      s"missing ${(expected -- result.toSet).size} of ${expected.size}")
    // and nothing else: random 64-dim cosines never reach 0.99
    assert(result.length == expected.size)
    result.foreach { case (a, b) => assert(b == a + 1000000L) }
  }
}
