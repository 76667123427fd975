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

  test("container encode/decode round-trips metadata") {
    val m = Multimodal.Meta("image", 128, 96, 3, 1, 16000)
    val decoded = Multimodal.decodeStub(Multimodal.encode(m))
    assert(decoded.contains(m))
    assert(Multimodal.decodeStub("garbage".getBytes) == None)
    assert(Multimodal.decodeStub(null) == None)
  }

  test("resize preserves aspect ratio with integer floor math") {
    val media = Multimodal.mediaTable(spark, "/root/testdata/sf0.001")
    val resized = Multimodal.resize(media, maxSide = 32).collect()
    assert(resized.nonEmpty)
    for (r <- resized) {
      assert(r.getAs[Int]("width") <= 32 && r.getAs[Int]("height") <= 32)
      val redecoded = Multimodal.decodeStub(r.getAs[Array[Byte]]("media")).get
      assert(redecoded.width == r.getAs[Int]("width"))
    }
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
