package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** kg_void laws: closed-form partitions on a planted corpus, and the
  * accounting identities on real data (total triples = Σ partitions;
  * distinct counts are NOT sums — the reason the dataset row is a
  * second aggregate).
  */
class VoidSpec extends SparkSpec {
  import spark.implicits._

  test("closed form on a planted corpus") {
    val dir = java.nio.file.Files.createTempDirectory("void").toString
    Seq((1L, "spark join other words", "en", "s1", 20L),
        (2L, "spark alone here", "en", "s1", 15L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = KgQueries.kgVoid(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    // mentions: (1,spark),(1,join),(2,spark) → 3 triples, 2 docs,
    // 2 entities; co-occurrence: one distinct (join,spark) pair
    assert(rows("urn:graft:mentions") == ((3L, 2L, 2L)))
    assert(rows("urn:graft:coOccursWith") == ((1L, 1L, 1L)))
    // dataset: 4 triples; subjects = 2 docs + urn:ent:join = 3;
    // objects = 2 entity objects ∪ {urn:ent:spark} = 2
    assert(rows("(dataset)") == ((4L, 3L, 2L)))
  }

  test("accounting identities on real data (sf0.001)") {
    val rows = KgQueries.kgVoid(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val (tot, parts) = rows.partition(_._1 == "(dataset)")
    assert(tot.length == 1 && parts.nonEmpty)
    assert(tot.head._2 == parts.map(_._2).sum) // triples sum exactly
    // distinct subjects/objects are sub-additive, not additive
    assert(tot.head._3 <= parts.map(_._3).sum)
    assert(tot.head._4 <= parts.map(_._4).sum)
  }
}
