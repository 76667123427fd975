package graft.queries

import graft.SparkSpec
import graft.ann.Similarity
import graft.dedup.Dedup
import org.apache.spark.sql.functions._

/** Round-3 additions: IVF-Flat ANN tier and the end-to-end curation
  * funnel. The DuckDB oracles check cross-engine exactness; these specs
  * check the SEMANTIC properties (argmax assignment, probe-all ≡ brute
  * force, twin recall, funnel monotonicity).
  */
class DataPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

  test("IVF nProbe=1 candidates are exactly the query's argmax cell") {
    val cents = emb.filter(col("vec_id") % 31 === 5)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0),
        r.getAs[scala.collection.Seq[Float]](1).toArray)).sortBy(_._1)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        d += (a(i) * b(i)).toDouble
        na += (a(i) * a(i)).toDouble; nb += (b(i) * b(i)).toDouble
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val all = emb.select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getAs[scala.collection.Seq[Float]](1).toArray))
    // driver-side reference assignment: argmax cosine, ties to smaller id
    val cellOf = all.map { case (id, v) =>
      id -> cents.map { case (cid, cv) => (cos(v, cv), cid) }
        .maxBy { case (c, cid) => (c, -cid) }._2
    }.toMap
    // nProbe=1 with an uncapped k scans exactly the argmax cell, so the
    // candidate set per query must equal that cell's members minus itself
    val got = Similarity.ivfTopK(emb, col("vec_id") % 50 === 0,
        col("vec_id") % 31 === 5, k = Int.MaxValue, nProbe = 1)
      .select("query_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }
    assert(got.nonEmpty)
    got.foreach { case (q, cands) =>
      val cell = cellOf(q)
      val expected = cellOf.collect {
        case (id, c) if c == cell && id != q => id }.toSet
      assert(cands == expected, s"query $q cell mismatch")
    }
  }

  test("IVF with nProbe = C scans everything and equals brute force") {
    val c = emb.filter(col("vec_id") % 31 === 5).count().toInt
    val ivf = DataQueriesTestAccess.normalize(
      Similarity.ivfTopK(emb, col("vec_id") % 50 === 0,
        col("vec_id") % 31 === 5, k = 5, nProbe = c))
    val brute = DataQueriesTestAccess.normalize(
      Similarity.bruteForceTopK(emb, col("vec_id") % 50 === 0, k = 5))
    assert(ivf.nonEmpty && ivf == brute)
  }

  test("IVF recalls planted near-twins at nProbe=4") {
    val corpus = DataQueries.embedCorpus(spark, sfDir)
    val res = Similarity.ivfTopK(corpus, col("vec_id") >= 1000000L,
        col("vec_id") % 31 === 5, k = 1, nProbe = 4)
      .select("query_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val twins = corpus.filter(col("vec_id") >= 1000000L)
      .select("vec_id").collect().map(_.getLong(0))
    assert(twins.nonEmpty)
    val recalled = twins.count(q => res.get(q).contains(q - 1000000L))
    // a 0.999-cosine twin lands in the same Voronoi cell virtually always
    assert(recalled.toDouble / twins.length >= 0.9,
      s"twin recall ${recalled.toDouble / twins.length}")
  }

  test("bounded top-k buffer equals a naive full sort on seeded random data") {
    // many ties + tiny k stress the insertion-buffer's tiebreak ordering
    val rnd = new scala.util.Random(5)
    // last component fixed at 1: nonzero norms (no NaN cosines), while
    // the {-1,0,1} components still produce heavy score ties
    val data = (0L until 300L).map { i =>
      (i, Seq.fill(7)((rnd.nextInt(3) - 1).toFloat) :+ 1.0f)
    }
    val df = data.toDF("vec_id", "embedding")
    val got = Similarity.bruteForceTopK(df, col("vec_id") % 37 === 0, k = 4)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        d += (a(i) * b(i)).toDouble
        na += (a(i) * a(i)).toDouble; nb += (b(i) * b(i)).toDouble
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val expected = data.filter(_._1 % 37 == 0).flatMap { case (q, qv) =>
      data.filter(_._1 != q)
        .map { case (c, cv) => (c, cos(qv, cv)) }
        .sortBy { case (c, s) => (-s, c) }(
          Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long))
        .take(4).zipWithIndex
        .map { case ((c, _), i) => (q, i + 1, c) }
    }.toSet
    assert(got.nonEmpty && got == expected)
  }

  test("curation funnel is monotone and stages are labeled in order") {
    val f = DataQueries.ddPipeline(spark, sfDir).collect()
    assert(f.map(_.getString(1)).toSeq ==
      Seq("raw", "quality", "exact_dedup", "near_dedup"))
    val docs = f.map(_.getLong(2))
    val toks = f.map(_.getLong(3))
    assert(docs.zip(docs.tail).forall { case (a, b) => b <= a })
    assert(toks.zip(toks.tail).forall { case (a, b) => b <= a })
    assert(docs.head == spark.read.parquet(s"$sfDir/documents.parquet").count())
    assert(docs.last > 0)
  }

  test("funnel quality stage matches a direct filter recount") {
    val q = graft.text.TextAnalysis.quality(
      spark.read.parquet(s"$sfDir/documents.parquet"))
    val expected = q.filter(col("n_tokens") >= 20 &&
      col("stopword_ratio") > 0.02).count()
    val f = DataQueries.ddPipeline(spark, sfDir).collect()
    assert(f(1).getLong(2) == expected)
  }

  test("funnel near-dup stage drops exactly the larger ids of >=0.8 pairs") {
    val q = graft.text.TextAnalysis.quality(
      spark.read.parquet(s"$sfDir/documents.parquet"))
    val qual = q.filter(col("n_tokens") >= 20 && col("stopword_ratio") > 0.02)
    val exact = Dedup.exact(qual)
    val droppable = Dedup.jaccardPairs(exact, 0.8)
      .select("b").distinct().count()
    val f = DataQueries.ddPipeline(spark, sfDir).collect()
    assert(f(2).getLong(2) - f(3).getLong(2) == droppable)
  }
}

private object DataQueriesTestAccess {
  /** Stable comparable form of a top-k result. */
  def normalize(df: org.apache.spark.sql.DataFrame): Seq[(Long, Int, Long)] =
    df.select("query_id", "rank", "cand_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq.sorted
}

/** txt_repetition: Gopher/C4 repetition signals, hand-checked. */
class RepetitionSpec extends graft.SparkSpec {
  import org.apache.spark.sql.functions._
  test("token/bigram repetition counts match hand computation") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b a"),     // 5 toks, 2 distinct, top=3; bigrams: ab,ba,ab,ba → 4, 2 distinct, dup 2
      (2L, "x y z"),          // no repetition
      (3L, ""),               // empty
      (4L, "w")               // single token, no bigrams
    ).toDF("doc_id", "text")
    val r = graft.text.TextAnalysis.repetition(docs)
      .select("doc_id", "n_tokens", "n_distinct", "top_token_n",
        "dup_bigram_n", "top_token_share", "dup_bigram_frac")
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getLong(1) == 5 && r(1L).getLong(2) == 2 &&
      r(1L).getLong(3) == 3 && r(1L).getLong(4) == 2)
    assert(r(1L).getDouble(5) == 3.0 / 5 && r(1L).getDouble(6) == 2.0 / 4)
    assert(r(2L).getLong(3) == 1 && r(2L).getLong(4) == 0)
    assert(r(3L).getLong(1) == 0 && r(3L).getLong(3) == 0 &&
      r(3L).getDouble(5) == 0.0)
    assert(r(4L).getLong(1) == 1 && r(4L).getLong(4) == 0 &&
      r(4L).getDouble(6) == 0.0)
  }
}
