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
    // images stay BMP through the resize (not GFT1)
    val img = resized.find(r =>
      Multimodal.decode(r.getAs[Array[Byte]]("media")).get.kind == "image").get
    assert(img.getAs[Array[Byte]]("media")(0) == 'B')
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
