package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec, ShuffleQueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

/** Round-4 verdict items #1 and #2 — plan-shape proofs for the two
  * 100 TB dedup warts:
  *
  *  1. `Dedup.exact` must never ship corpus text through a shuffle: the
  *     winner-per-hash decision is an aggregate over (sha2, id) and the
  *     survivor semi-join either broadcasts the id set or co-locates over
  *     a bucketed-by-doc_id layout.
  *  2. `Dedup.minHashCandidates` must verify candidates from per-doc
  *     shingle-hash ARRAYS computed once (no two-text UDF, no per-pair
  *     re-shingling).
  */
class DedupPlanSpec extends SparkSpec {
  import spark.implicits._

  /** Execute, then collect the output column names of every materialized
    * shuffle exchange in the final AQE plan (the attributes that actually
    * crossed the wire).
    */
  private def runAndShuffledColumns(df: DataFrame): Seq[Seq[String]] = {
    df.collect()
    val out = Seq.newBuilder[Seq[String]]
    def walk(p: SparkPlan): Unit = p match {
      case q: ShuffleQueryStageExec =>
        out += q.plan.output.map(_.name)
        q.plan.children.foreach(walk)
      case q: QueryStageExec => walk(q.plan)
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case e: ShuffleExchangeLike =>
        out += e.output.map(_.name)
        e.children.foreach(walk)
      case other => other.children.foreach(walk)
    }
    walk(df.queryExecution.executedPlan)
    out.result()
  }

  private def docsDf(rows: Seq[(Long, String, String, String)]) =
    rows.toDF("doc_id", "text", "lang", "source")

  private val corpus = docsDf(Seq(
    (1L, "a b c " * 200, "en", "s"), (2L, "a b c " * 200, "en", "s"),
    (3L, "x y z " * 200, "en", "s"), (4L, "x y z " * 200, "en", "s"),
    (5L, "unique text here", "en", "s")))

  test("exact dedup: no shuffle exchange carries the text column") {
    val result = Dedup.exact(corpus)
    val shuffled = runAndShuffledColumns(result)
    assert(shuffled.nonEmpty, "the (hash, id) aggregate must shuffle")
    shuffled.foreach { cols =>
      assert(!cols.contains("text"),
        s"exchange carried corpus text: $cols")
    }
    assert(result.select("doc_id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 3L, 5L))
  }

  test("exact dedup over a bucketed corpus, broadcast off: text never shuffles") {
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> spark.conf.getOption(k)).toMap
    keys.foreach(spark.conf.set(_, "-1"))
    try {
      spark.sql("DROP TABLE IF EXISTS b_dedup_docs")
      corpus.write.bucketBy(4, "doc_id").sortBy("doc_id")
        .mode("overwrite").saveAsTable("b_dedup_docs")
      val result = Dedup.exact(spark.table("b_dedup_docs"))
      val shuffled = runAndShuffledColumns(result)
      // without broadcast the semi join shuffles ONLY the survivor-id
      // side (narrow rows) to the bucketed layout; the corpus side reads
      // co-located. The aggregate's exchange carries (hash, id).
      shuffled.foreach { cols =>
        assert(!cols.contains("text"),
          s"exchange carried corpus text over the bucketed layout: $cols")
      }
      assert(result.count() == 3)
    } finally {
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
      spark.sql("DROP TABLE IF EXISTS b_dedup_docs")
    }
  }

  test("minhash verify: array-based, no UDF, shingles computed once per doc") {
    val base = (0 until 40).map(i => s"w$i").mkString(" ")
    val near = (0 until 40).map(i => if (i == 7) "zz" else s"w$i").mkString(" ")
    val far = (100 until 140).map(i => s"w$i").mkString(" ")
    val docs = docsDf(Seq(
      (1L, base, "en", "s"), (2L, near, "en", "s"), (3L, far, "en", "s")))
    val params = Dedup.MinHashParams(64, 16, 42L)
    val result = Dedup.minHashCandidates(docs, n = 3, params,
      verifyThreshold = 0.5)

    val planStr = result.queryExecution.executedPlan.toString
    // no two-text verify UDF anywhere in the plan
    assert(!planStr.contains("UDF"), "verify must not use a Scala UDF")
    // the shingle pass happened ONCE, inside the localCheckpointed
    // (doc_id, sh, sig) table: the candidate+verify plan itself contains
    // zero typed-map stages — it reads the materialized arrays
    assert(!planStr.contains("MapElements"),
      "shingling must not re-run inside the verify plan")
    assert(planStr.contains("array_intersect"),
      "verify must score via codegen'd array intersection")

    // values match the exact shingle-Jaccard oracle
    val got = result.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got.keySet == Set((1L, 2L)))
    val expected = Dedup.ngramJaccard(base, near, 3)
    assert(math.abs(got((1L, 2L)) - expected) < 1e-12)
  }
}
